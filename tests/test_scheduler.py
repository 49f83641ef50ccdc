"""Scheduler table + Euler step tests.

Golden values are derived independently from the schedule's defining math
(SURVEY.md item 10), not copied from reference outputs: with shift=1 the
global sigma table is sigma_i = (N - i)/N descending, stage boundaries follow
stage_range, and the gamma correction is
    corrected = ori / (sqrt(1 + 1/gamma) (1 - ori) + ori),  start = 1 - corrected.
"""

import math

import numpy as np
import jax.numpy as jnp

from deepv_tpu.config import SchedulerConfig
from deepv_tpu.models.scheduler import FlowMatchSchedule, euler_step


def make():
    return FlowMatchSchedule(SchedulerConfig(num_train_timesteps=1000, gamma=0.3333,
                                             stage_range=(0, 1 / 3, 2 / 3, 1)))


def test_global_sigma_endpoints():
    sched = make()
    assert math.isclose(sched.sigma_max, 1.0, rel_tol=1e-6)
    assert math.isclose(sched.sigma_min, 1.0 / 1000, rel_tol=1e-6)


def test_stage_start_end_sigmas():
    sched = make()
    gamma = 0.3333
    # stage 0 starts at sigma=1; boundaries at indices 333 and 666.
    assert math.isclose(sched.start_sigmas[0], 1.0, rel_tol=1e-6)
    s333 = (1000 - 333) / 1000
    s666 = (1000 - 666) / 1000
    assert math.isclose(sched.end_sigmas[0], s333, rel_tol=1e-6)
    assert math.isclose(sched.ori_start_sigmas[1], s333, rel_tol=1e-6)

    def corrected_start(ori_sigma):
        ori = 1 - ori_sigma
        return 1 - ori / (math.sqrt(1 + 1 / gamma) * (1 - ori) + ori)

    assert math.isclose(sched.start_sigmas[1], corrected_start(s333), rel_tol=1e-6)
    assert math.isclose(sched.start_sigmas[2], corrected_start(s666), rel_tol=1e-6)
    assert math.isclose(sched.end_sigmas[2], 0.0, abs_tol=1e-9)


def test_stage_ratios_sum_to_one():
    sched = make()
    total = sum(sched.timestep_ratios[i][1] - sched.timestep_ratios[i][0] for i in range(3))
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    assert sched.timestep_ratios[0][0] == 0.0
    assert sched.timestep_ratios[2][1] == 1.0


def test_stage_schedule_shapes_and_sigma_ladder():
    sched = make()
    for stage in range(3):
        ss = sched.stage_schedule(5, stage)
        assert ss.timesteps.shape == (5,)
        assert ss.sigmas.shape == (6,)
        # sigma ladder always goes 1 -> 1/N -> 0 (ref scheduler.py:196-204)
        assert math.isclose(float(ss.sigmas[0]), 1.0, rel_tol=1e-6)
        assert math.isclose(float(ss.sigmas[-2]), 1.0 / 1000, rel_tol=1e-4)
        assert float(ss.sigmas[-1]) == 0.0
        # timesteps are descending within the stage
        assert np.all(np.diff(ss.timesteps) < 0)


def test_stage_timestep_endpoints_follow_ratios():
    sched = make()
    N = 1000
    sig = (np.linspace(1, N, N, dtype=np.float32)[::-1]) / N  # shift=1 sigmas
    tsteps = sig * N
    for stage in range(3):
        r0, r1 = sched.timestep_ratios[stage]
        ss = sched.stage_schedule(5, stage)
        t_max = float(tsteps[int(r0 * N)])
        t_min = float(tsteps[min(int(r1 * N), N - 1)])
        # the per-stage table is linspace(t_max, t_min, N+1)[:-1], so its last
        # entry sits one linspace step above t_min (ref scheduler.py:142-145)
        t_last = t_min + (t_max - t_min) / N
        assert math.isclose(float(ss.timesteps[0]), t_max, rel_tol=1e-5)
        assert math.isclose(float(ss.timesteps[-1]), t_last, rel_tol=1e-4)


def test_euler_step_math_and_dtype():
    x = jnp.full((2, 3), 1.0, dtype=jnp.bfloat16)
    v = jnp.full((2, 3), 2.0, dtype=jnp.bfloat16)
    out = euler_step(x, v, jnp.float32(-0.25))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), 0.5, rtol=1e-2)


def test_full_euler_integration_recovers_straight_path():
    # flow matching with constant velocity v: integrating all sigma deltas
    # from 1 to 0 moves x exactly by -v.
    sched = make()
    x = jnp.ones((4, 4), jnp.float32)
    v = 2.0 * jnp.ones((4, 4), jnp.float32)
    ss = sched.stage_schedule(7, 0)
    for i in range(len(ss.timesteps)):
        x = euler_step(x, v, jnp.float32(ss.sigmas[i + 1] - ss.sigmas[i]))
    np.testing.assert_allclose(np.asarray(x), 1.0 - 2.0, rtol=1e-5)


def test_renoise_coeffs():
    sched = make()
    gamma = 0.3333
    for stage in (1, 2):
        alpha, beta = sched.renoise_coeffs(stage)
        ori_sigma = 1 - sched.ori_start_sigmas[stage]
        expect_alpha = 1 / (math.sqrt(1 + 1 / gamma) * (1 - ori_sigma) + ori_sigma)
        assert math.isclose(alpha, expect_alpha, rel_tol=1e-9)
        assert math.isclose(beta, alpha * (1 - ori_sigma) / math.sqrt(gamma), rel_tol=1e-9)
        # renoising preserves marginal variance for unit-variance inputs:
        # alpha^2 + beta^2 * (marginal var of block noise = 1+gamma-..) ~ 1.
        assert 0 < alpha <= 1
