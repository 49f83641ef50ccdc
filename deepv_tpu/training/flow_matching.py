"""Flow-matching training for the MMDiT: plain and pyramid-aware objectives.

The reference is inference-only (SURVEY.md: no training loop anywhere), but a
framework needs one. Two objectives:

  - ``flow_matching_loss``: generic velocity regression v = noise - data on a
    single-resolution clip. Cheap, used as the sharding demonstrator in
    parallel/dryrun.py.
  - ``pyramid_flow_matching_loss``: the objective that actually trains *this*
    model — it reproduces, per training example, exactly the state the
    sampler visits at inference:

      * the packed multi-clip layout of past-condition clips at pyramid
        resolutions plus the noisy current unit (shared code:
        ``pipeline.padded_conditions``, the rebuild of ref pipeline.py:626-658
        / ref mmdit.py:1358-1436 packing);
      * per-stage endpoints. Within stage s the sampler integrates the
        renormalised sigma ratio 1 -> 0 through ``x += dsigma * v``
        (ref scheduler.py:278-289), i.e. along the segment

            x(r) = r * x_start + (1 - r) * x_end,   v_target = x_start - x_end

        where x_end is the stage's data endpoint at stage resolution,
        corrupted to the stage's *global* end sigma
        (x_end = (1-sigma_end) x1_s + sigma_end eps; sigma_end = 0 for the
        final stage), and x_start is the stage's start point: pure noise for
        stage 0, else the gamma-corrected renoise of the upsampled previous
        endpoint ``alpha * up2x(x_end_prev) + beta * block_noise``
        (ref pipeline.py:452-465, ref scheduler.py:112-117);
      * the timestep embedding interpolates the same per-stage global
        timestep range ``set_timesteps`` exposes (ref scheduler.py:179-206).

    A model that minimises this loss makes the inference Euler integration
    land on x_end at r=0 — the objective is *derived from the sampler*, not
    an approximation of it.

Stage index and unit index are static (stage changes the latent resolution,
so each stage is necessarily its own XLA program; unit index selects how many
clean context frames are real inside the fixed padded layout). A full
training run compiles at most 3 stages x 7 unit indices programs, amortised
over the whole run; sample both in the host loop.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import MMDiTConfig, PipelineConfig
from ..models.mmdit import mmdit_forward
from ..models.scheduler import FlowMatchSchedule
from ..ops.block_noise import sample_block_noise
from ..ops.resample import up2x_nearest


def flow_matching_loss(mcfg: MMDiTConfig, params, batch: Dict, key: jax.Array) -> jnp.ndarray:
    """MSE between predicted and true velocity on x_sigma = s*x0 + (1-s)*x1."""
    x1 = batch["latents"]                       # clean latents [b, C, t, h, w]
    b = x1.shape[0]
    k_noise, k_sigma = jax.random.split(key)
    x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
    sigma = jax.random.uniform(k_sigma, (b,), jnp.float32, 1e-4, 1.0 - 1e-4)
    s = sigma.reshape(b, 1, 1, 1, 1).astype(x1.dtype)
    xs = s * x0 + (1 - s) * x1
    v_target = (x0 - x1).astype(jnp.float32)

    v = mmdit_forward(mcfg, params, [xs],
                      batch["text_embeds"], batch["text_mask"], batch["pooled"],
                      timestep=sigma * 1000.0)
    return jnp.mean(jnp.square(v.astype(jnp.float32) - v_target))


def pyramid_flow_matching_loss(mcfg: MMDiTConfig, pcfg: PipelineConfig,
                               schedule: FlowMatchSchedule, params,
                               batch: Dict, key: jax.Array,
                               stage: int, unit_index: int,
                               firstframe_mask: bool = True) -> jnp.ndarray:
    """Pyramid-flow velocity loss at one (stage, unit_index).

    batch["latents"]: clean packed latents [b, C, T, H, W] at full latent
    resolution with T >= unit_index + 1 latent frames (frame 0 is the
    conditioning image frame; frame_per_unit latent frames per unit). The
    past-condition clips are teacher-forced from the clean frames through the
    same ``padded_conditions`` layout inference compiles.
    """
    from ..pipeline import _pyramid_list, padded_conditions  # circular at import time

    lat = batch["latents"]
    fpu = pcfg.frame_per_unit
    n_stages = len(pcfg.stages)
    assert 0 <= stage < n_stages
    ctx_frames = unit_index * fpu
    cur = lat[:, :, ctx_frames:ctx_frames + fpu]
    b = lat.shape[0]

    # clean context pyramid + the shared shape-stable condition layout
    clean = _pyramid_list(lat[:, :, :ctx_frames], n_stages - 1)
    conditions, times, valid = padded_conditions(
        pcfg, clean, unit_index, firstframe_mask, num_rows=1)[stage]

    # stage endpoints (see module docstring)
    cur_pyr = _pyramid_list(cur, n_stages - 1)
    k_end, k_prev, k_block, k_ratio = jax.random.split(key, 4)
    sigma_end = jnp.float32(schedule.end_sigmas[stage])
    x1 = cur_pyr[stage].astype(jnp.float32)
    x_end = (1 - sigma_end) * x1 + sigma_end * jax.random.normal(k_end, x1.shape)
    if stage == 0:
        x_start = jax.random.normal(k_prev, x1.shape)
    else:
        sigma_prev_end = jnp.float32(schedule.ori_start_sigmas[stage])
        x1_prev = cur_pyr[stage - 1].astype(jnp.float32)
        x_end_prev = ((1 - sigma_prev_end) * x1_prev
                      + sigma_prev_end * jax.random.normal(k_prev, x1_prev.shape))
        alpha, beta = schedule.renoise_coeffs(stage)
        x_start = (alpha * up2x_nearest(x_end_prev)
                   + beta * sample_block_noise(k_block, x1.shape,
                                               pcfg.scheduler.gamma))

    ratio = jax.random.uniform(k_ratio, (b,), jnp.float32, 0.0, 1.0)
    r = ratio.reshape(b, 1, 1, 1, 1)
    x = r * x_start + (1 - r) * x_end
    v_target = x_start - x_end

    # per-stage global timestep range, same endpoints as set_timesteps
    tbl = schedule.timesteps_per_stage[stage]
    t_max, t_min = float(tbl[0]), float(tbl[-1])
    timestep = ratio * t_max + (1 - ratio) * t_min

    clips = list(conditions) + [x.astype(lat.dtype)]
    v = mmdit_forward(mcfg, params, clips,
                      batch["text_embeds"], batch["text_mask"], batch["pooled"],
                      timestep=timestep,
                      frame_times=list(times), frame_valid=list(valid))
    return jnp.mean(jnp.square(v.astype(jnp.float32) - v_target))


def make_train_step(mcfg: MMDiTConfig, optimizer: optax.GradientTransformation):
    """Returns a jittable (params, opt_state, batch, key) -> (params, opt_state, loss)."""

    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: flow_matching_loss(mcfg, p, batch, key))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_pyramid_train_step(mcfg: MMDiTConfig, pcfg: PipelineConfig,
                            schedule: FlowMatchSchedule,
                            optimizer: optax.GradientTransformation):
    """Pyramid-aware step; (stage, unit_index) are static — jit once and call
    with varying values (3 stages share the unit-padded layout, so the whole
    training run compiles 3 x n_distinct_unit_layouts = 3 programs)."""

    @functools.partial(jax.jit, static_argnames=("stage", "unit_index"))
    def train_step(params, opt_state, batch, key, stage: int, unit_index: int):
        loss, grads = jax.value_and_grad(
            lambda p: pyramid_flow_matching_loss(
                mcfg, pcfg, schedule, p, batch, key, stage, unit_index))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
