"""Micro-profile of the denoise hot path at deployment shapes on the real TPU.

Times each pyramid stage's scan program in isolation, the MMDiT forward per
stage, and the attention kernel against its jnp fallback, to locate slack
between the measured step time and the chip's matmul rate.

Usage: python scripts/bench_denoise.py
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def main():
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.pipeline import InferencePipeline, _pyramid_list

    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    dtype = jnp.bfloat16
    H, W = 384, 512
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])

    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype)
    print(f"attn_impl={pipe.attn_impl}")

    ds = pcfg.vae_downsample
    lh, lw = H // ds, W // ds
    key = jax.random.PRNGKey(0)
    # clean context: unit_index=4 mid-rollout layout
    u = 4
    clean_full = jax.random.normal(key, (1, mcfg.in_channels, u, lh, lw), dtype)
    clean = _pyramid_list(clean_full, len(pcfg.stages) - 1)
    conds = pipe._padded_conditions(clean, u, True, 2)

    pe, pm, pp = pipe._embeds_for("empty")
    text = jnp.concatenate([pe, pe], 0)
    mask = jnp.concatenate([pm, pm], 0)
    pooled = jnp.concatenate([pp, pp], 0)

    from deepv_tpu.pipeline import _denoise_stage
    from deepv_tpu.models.mmdit import mmdit_forward

    n_steps = pcfg.num_inference_steps
    for i_s in range(3):
        ss = pipe.schedule.stage_schedule(n_steps, i_s)
        ts = jnp.asarray(ss.timesteps)
        dsig = jnp.asarray(ss.sigmas[1:] - ss.sigmas[:-1])
        f = lh // pcfg.stages[-1] * pcfg.stages[i_s]
        lat = jax.random.normal(key, (1, mcfg.in_channels, 1, f * 2 // 2,
                                      (lw // pcfg.stages[-1]) * pcfg.stages[i_s]), dtype)
        lat = jax.random.normal(key, (1, mcfg.in_channels, 1,
                                      lh // (2 ** (2 - i_s)), lw // (2 ** (2 - i_s))), dtype)
        conditions, times, valid = conds[i_s]

        def run_stage():
            return _denoise_stage(
                mcfg, params["mmdit"], conditions, times, valid, lat,
                text, mask, pooled, ts, dsig,
                jnp.float32(3.5), jnp.float32(6.0), None, None,
                num_rows=2, history_downsample_ratio=2,
                zero_depth=False, attn_impl=pipe.attn_impl)

        sync(run_stage())
        t0 = time.time()
        out = run_stage()
        sync(out)
        dt = time.time() - t0
        print(f"stage {i_s}: {dt*1e3:7.1f} ms for {n_steps} steps "
              f"-> {dt/n_steps*1e3:6.1f} ms/step")

        # single forward, both attention impls
        clips = list(conditions) + [jnp.concatenate([lat, lat], 0)]
        t0_val = float(np.asarray(ts)[0])
        for impl in ("pallas", "ref"):
            fwd = jax.jit(functools.partial(
                lambda mp, c, impl_: mmdit_forward(
                    mcfg, mp, c, text, mask, pooled,
                    jnp.full((2,), t0_val, jnp.float32),
                    frame_times=list(times), frame_valid=list(valid),
                    attn_impl=impl_), impl_=impl))
            sync(fwd(params["mmdit"], clips))
            reps = 5
            t0 = time.time()
            for _ in range(reps):
                y = fwd(params["mmdit"], clips)
            sync(y)
            dt = (time.time() - t0) / reps
            ntok = sum(c.shape[2] * c.shape[3] * c.shape[4] // 4 for c in clips) + 77
            print(f"  forward[{impl:6s}]: {dt*1e3:6.1f} ms  (S~{ntok})")


if __name__ == "__main__":
    main()
