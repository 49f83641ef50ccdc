"""Padded-conditions layout == the reference's literal condition walk.

``InferencePipeline._padded_conditions`` re-derives the reference's per-stage
past-condition pyramid (ref pipeline.py:626-658) into ONE fixed padded layout
per stage, with per-frame time ids + validity masks, so each pyramid stage
compiles once for the whole rollout. This is the most intricate
fidelity-bearing transformation in the repo: a subtle off-by-one would
silently corrupt conditioning.

These tests build the *literal* reference condition walk (a direct
translation of the torch slicing loop) as unpadded clips, run
``mmdit_forward`` in static-layout mode, and assert f64 equality with the
padded ``frame_times``/``frame_valid`` forward — for every
unit_index 1..7 x firstframe_mask {0,1} x CFG rows {2,3} (28 layouts,
3 pyramid stages each).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import MMDiTConfig, PipelineConfig
from deepv_tpu.models.mmdit import init_mmdit_params, mmdit_forward
from deepv_tpu.pipeline import InferencePipeline

MCFG = MMDiTConfig(
    sample_size=16, patch_size=2, in_channels=14, num_layers=2,
    attention_head_dim=8, num_attention_heads=4,
    caption_projection_dim=32, pooled_projection_dim=16,
    pos_embed_max_size=32, joint_attention_dim=24,
)
PCFG = PipelineConfig()
FPU = PCFG.frame_per_unit          # 1 in the deployed config
N_STAGES = len(PCFG.stages)        # 3
LH = LW = 16                       # full latent resolution (stage sizes 4/8/16)


def reference_condition_walk(clean, unit_index, firstframe_mask, num_rows):
    """Literal translation of the reference walk (ref pipeline.py:626-658).

    clean: pyramid list low -> high res, each [1, c, L, h, w] with L ==
    unit_index latent frames (the ``generated`` list concatenated).
    Returns per stage the *unpadded* clip list, oldest -> newest.
    """
    def tile(x):
        return jnp.concatenate([x] * num_rows, axis=0)

    fm = int(firstframe_mask)
    out = []
    for i_s in range(N_STAGES):
        last_cond_latent = clean[i_s][:, :, -FPU:]
        stage_input = [tile(last_cond_latent)]

        cur_unit_num = unit_index
        cur_stage = i_s
        cur_unit_ptx = 1
        while cur_unit_ptx < cur_unit_num - fm:
            cur_stage = max(cur_stage - 1, 0)
            if cur_stage == 0:
                break
            cur_unit_ptx += 1
            cond = clean[cur_stage][
                :, :, -(cur_unit_ptx * FPU): -((cur_unit_ptx - 1) * FPU)]
            stage_input.append(tile(cond))
        if cur_stage == 0 and cur_unit_ptx < cur_unit_num - fm:
            cond = clean[0][:, :, fm: -(cur_unit_ptx * FPU)]
            stage_input.append(tile(cond))

        out.append(list(reversed(stage_input)))
    return out


def _make_case(key, unit_index, num_rows):
    """Random clean pyramid (L == unit_index frames), current latents, ctx."""
    ks = jax.random.split(key, 8)
    clean = []
    for i_s in range(N_STAGES):
        f = PCFG.stages[-1] // PCFG.stages[i_s] if False else 2 ** (N_STAGES - 1 - i_s)
        clean.append(jax.random.normal(
            ks[i_s], (1, MCFG.in_channels, unit_index, LH // f, LW // f), jnp.float64))
    cur = [jax.random.normal(
        ks[3 + i_s], (1, MCFG.in_channels, FPU, LH // 2 ** (N_STAGES - 1 - i_s),
                      LW // 2 ** (N_STAGES - 1 - i_s)), jnp.float64)
        for i_s in range(N_STAGES)]
    text = jax.random.normal(ks[6], (num_rows, 7, MCFG.joint_attention_dim), jnp.float64)
    mask = jnp.ones((num_rows, 7), jnp.int32)
    pooled = jax.random.normal(ks[7], (num_rows, MCFG.pooled_projection_dim), jnp.float64)
    return clean, cur, text, mask, pooled


def _history_inputs(key, num_rows):
    if num_rows == 2:
        return None, None
    hist1 = jax.random.normal(key, (1, MCFG.in_channels, 1, LH, LW), jnp.float64)
    hist = jnp.concatenate([hist1] * num_rows, axis=0)
    hlen = (LH // PCFG.history_downsample_ratio // MCFG.patch_size) * \
           (LW // PCFG.history_downsample_ratio // MCFG.patch_size)
    hmask = jnp.concatenate([jnp.zeros((num_rows - 1, hlen), jnp.int32),
                             jnp.ones((1, hlen), jnp.int32)], axis=0)
    return hist, hmask


@pytest.mark.slow
@pytest.mark.parametrize("firstframe_mask", [False, True])
@pytest.mark.parametrize("num_rows", [2, 3])
def test_padded_conditions_match_reference_walk(firstframe_mask, num_rows):
    with jax.enable_x64():
        params = jax.tree.map(
            lambda a: a.astype(jnp.float64),
            init_mmdit_params(jax.random.PRNGKey(0), MCFG))

        pipe = InferencePipeline.__new__(InferencePipeline)
        pipe.cfg = PCFG

        for unit_index in range(1, PCFG.max_temporal_length):
            if firstframe_mask and unit_index < 1:
                continue
            key = jax.random.PRNGKey(100 * unit_index + 10 * num_rows
                                     + int(firstframe_mask))
            clean, cur, text, mask, pooled = _make_case(key, unit_index, num_rows)
            hist, hmask = _history_inputs(jax.random.PRNGKey(7), num_rows)
            t = jnp.full((num_rows,), 600.0, jnp.float64)

            ref_walk = reference_condition_walk(clean, unit_index,
                                                firstframe_mask, num_rows)
            padded = pipe._padded_conditions(clean, unit_index,
                                             firstframe_mask, num_rows)

            for i_s in range(N_STAGES):
                model_in = jnp.concatenate([cur[i_s]] * num_rows, axis=0)

                # reference layout: unpadded clips, static consecutive times
                ref_clips = ref_walk[i_s] + [model_in]
                out_ref = mmdit_forward(
                    MCFG, params, ref_clips, text, mask, pooled, t,
                    history=hist, history_mask=hmask,
                    history_downsample_ratio=PCFG.history_downsample_ratio)

                # shape-stable layout: padded clips + dynamic times/valid
                conds, times, valid = padded[i_s]
                pad_clips = list(conds) + [model_in]
                out_pad = mmdit_forward(
                    MCFG, params, pad_clips, text, mask, pooled, t,
                    history=hist, history_mask=hmask,
                    history_downsample_ratio=PCFG.history_downsample_ratio,
                    frame_times=list(times), frame_valid=list(valid))

                np.testing.assert_allclose(
                    np.asarray(out_pad), np.asarray(out_ref), atol=1e-9,
                    err_msg=(f"unit_index={unit_index} fm={firstframe_mask} "
                             f"rows={num_rows} stage={i_s}"))
