"""Pyramid flow-matching Euler schedule, TPU-native formulation.

Capability parity with the reference ``PyramidFlowMatchEulerDiscreteScheduler``
(ref model/scheduler.py:27-297), redesigned functionally: all schedule tables
are computed once in numpy at construction (they are pure functions of the
config), and the sampling loop consumes per-stage ``(timesteps, sigmas)``
arrays so the Euler update can live inside a ``lax.scan`` with no mutable
step-index state (the reference mutates ``self._step_index`` per step,
ref scheduler.py:289).

Euler update (ref scheduler.py:278-289):  ``x_{i+1} = x_i + (s_{i+1}-s_i) v``
computed in float32 and cast back to the model dtype.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig


def _global_sigmas(num_train_timesteps: int, shift: float) -> np.ndarray:
    """Global sigma table with the SD3 shift transform (ref scheduler.py:70-88).

    Index i corresponds to t = N - i (descending), sigma = shift*s/(1+(shift-1)s).
    """
    t = np.linspace(1, num_train_timesteps, num_train_timesteps, dtype=np.float32)[::-1].copy()
    s = t / num_train_timesteps
    return shift * s / (1 + (shift - 1) * s)


@dataclasses.dataclass(frozen=True)
class StageSchedule:
    """Immutable per-stage inference schedule."""

    timesteps: np.ndarray   # [n] timestep values fed to the DiT embedding
    sigmas: np.ndarray      # [n+1] sigma ladder for the Euler update


class FlowMatchSchedule:
    """All schedule tables for pyramid flow matching; pure and immutable.

    Mirrors the observable behaviour of the reference scheduler:
      - ``init_sigmas_for_each_stage``   (ref scheduler.py:90-149)
      - ``set_timesteps(n, stage)``       (ref scheduler.py:179-206)
      - the block-noise renoising constants used between pyramid stages
        (ref pipeline.py:457-460).
    """

    def __init__(self, config: SchedulerConfig = SchedulerConfig()):
        self.config = config
        N = config.num_train_timesteps
        sigmas = _global_sigmas(N, config.shift)
        timesteps = sigmas * N

        stages = config.stages
        stage_range = config.stage_range
        gamma = config.gamma

        self.ori_start_sigmas = {}
        self.start_sigmas = {}
        self.end_sigmas = {}
        stage_distance = []
        for i_s in range(stages):
            start_idx = max(int(stage_range[i_s] * N), 0)
            end_idx = min(int(stage_range[i_s + 1] * N), N)
            start_sigma = float(sigmas[start_idx])
            end_sigma = float(sigmas[end_idx]) if end_idx < N else 0.0
            self.ori_start_sigmas[i_s] = start_sigma
            if i_s != 0:
                # gamma-corrected jump point (ref scheduler.py:112-117)
                ori = 1 - start_sigma
                corrected = (1 / (math.sqrt(1 + 1 / gamma) * (1 - ori) + ori)) * ori
                start_sigma = 1 - corrected
            stage_distance.append(start_sigma - end_sigma)
            self.start_sigmas[i_s] = start_sigma
            self.end_sigmas[i_s] = end_sigma

        tot = sum(stage_distance)
        self.timestep_ratios = {}
        for i_s in range(stages):
            start_ratio = 0.0 if i_s == 0 else sum(stage_distance[:i_s]) / tot
            end_ratio = 1.0 if i_s == stages - 1 else sum(stage_distance[: i_s + 1]) / tot
            self.timestep_ratios[i_s] = (start_ratio, end_ratio)

        # Per-stage full-resolution tables (ref scheduler.py:138-149).
        self.timesteps_per_stage = {}
        self.sigmas_per_stage = {}
        for i_s in range(stages):
            r0, r1 = self.timestep_ratios[i_s]
            t_max = timesteps[int(r0 * N)]
            t_min = timesteps[min(int(r1 * N), N - 1)]
            self.timesteps_per_stage[i_s] = np.linspace(t_max, t_min, N + 1)[:-1]
            self.sigmas_per_stage[i_s] = np.linspace(1.0, 0.0, N + 1)[:-1]

        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])

    def stage_schedule(self, num_inference_steps: int, stage_index: int) -> StageSchedule:
        """Per-stage inference schedule (ref scheduler.py:179-206).

        Returns ``timesteps`` [n] and ``sigmas`` [n+1] (with the trailing 0
        appended, ref scheduler.py:204) as static numpy arrays suitable for
        stacking into a ``lax.scan``.
        """
        tbl = self.timesteps_per_stage[stage_index]
        timesteps = np.linspace(float(tbl[0]), float(tbl[-1]), num_inference_steps)
        stbl = self.sigmas_per_stage[stage_index]
        ratios = np.linspace(float(stbl[0]), float(stbl[-1]), num_inference_steps)
        sigmas = np.concatenate([ratios, [0.0]])
        return StageSchedule(timesteps=timesteps.astype(np.float32), sigmas=sigmas.astype(np.float32))

    def renoise_coeffs(self, stage_index: int) -> Tuple[float, float]:
        """(alpha, beta) for inter-stage renoising ``alpha*x + beta*noise``
        with correlated block noise (ref pipeline.py:457-460)."""
        assert stage_index > 0
        gamma = self.config.gamma
        ori_sigma = 1 - self.ori_start_sigmas[stage_index]
        alpha = 1 / (math.sqrt(1 + 1 / gamma) * (1 - ori_sigma) + ori_sigma)
        beta = alpha * (1 - ori_sigma) / math.sqrt(gamma)
        return alpha, beta


def euler_step(sample: jnp.ndarray, velocity: jnp.ndarray, dsigma: jnp.ndarray) -> jnp.ndarray:
    """One flow-matching Euler step in float32 (ref scheduler.py:278-286)."""
    out = sample.astype(jnp.float32) + dsigma.astype(jnp.float32) * velocity.astype(jnp.float32)
    return out.astype(velocity.dtype)
