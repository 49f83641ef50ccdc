"""Probe: why is the CFG-3 (history-guided) denoise stage ~1.9x the CFG-2
stage when its FLOPs are only ~1.5x?

probe_boundary_window.py measured per-stage scan times of 74.5/120.7/365.2 ms
(rows=2) vs 165.9/219.9/703.2 ms (rows=3) — every chunk>=2 unit pays the
gap, 4x per chunk. This isolates _denoise_stage at the deployment shapes for
rows 2 vs 3 (with the production history tokens for rows=3), per stage and
per attention impl, with warnings surfaced (a silent VMEM-guard fallback to
the jnp path would explain a superlinear jump).

Run exclusively.
"""

import functools
import os
import sys
import time
import warnings

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def main():
    warnings.simplefilter("always")
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.pipeline import InferencePipeline, _denoise_stage, _pyramid_list

    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    dtype = jnp.bfloat16
    H, W = 384, 512
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])
    print("[probe] params ready", file=sys.stderr)

    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype)

    ds = pcfg.vae_downsample
    lh, lw = H // ds, W // ds
    key = jax.random.PRNGKey(0)
    u = 4                                     # chunk>=2 unit layout
    clean_full = jax.random.normal(key, (1, mcfg.in_channels, u, lh, lw), dtype)
    clean = _pyramid_list(clean_full, len(pcfg.stages) - 1)
    pe, pm, pp = pipe._embeds_for("empty")

    hist1 = jax.random.normal(key, (1, mcfg.in_channels, 1, lh, lw), dtype)
    hlen = (lw // pcfg.history_downsample_ratio // mcfg.patch_size) * \
           (lh // pcfg.history_downsample_ratio // mcfg.patch_size)

    n_steps = pcfg.num_inference_steps
    for rows in (2, 3):
        conds = pipe._padded_conditions(clean, u, False, rows)
        text = jnp.concatenate([pe] * rows, 0)
        mask = jnp.concatenate([pm] * rows, 0)
        pooled = jnp.concatenate([pp] * rows, 0)
        if rows == 3:
            hist = jnp.concatenate([hist1] * 3, axis=0)
            hist_mask = jnp.concatenate([jnp.zeros((2, hlen), jnp.int32),
                                         jnp.ones((1, hlen), jnp.int32)], axis=0)
        else:
            hist = hist_mask = None
        for i_s in range(3):
            ss = pipe.schedule.stage_schedule(n_steps, i_s)
            ts = jnp.asarray(ss.timesteps)
            dsig = jnp.asarray(ss.sigmas[1:] - ss.sigmas[:-1])
            lat = jax.random.normal(key, (1, mcfg.in_channels, 1,
                                          lh // (2 ** (2 - i_s)),
                                          lw // (2 ** (2 - i_s))), dtype)
            conditions, times, valid = conds[i_s]
            for impl in ("pallas", "ref"):
                def run():
                    return _denoise_stage(
                        mcfg, params["mmdit"], conditions, times, valid, lat,
                        text, mask, pooled, ts, dsig,
                        jnp.float32(3.5), jnp.float32(6.0), hist, hist_mask,
                        num_rows=rows, history_downsample_ratio=2,
                        zero_depth=False, attn_impl=impl)
                t0 = time.time()
                sync(run())
                cold = time.time() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    sync(run())
                    best = min(best, time.time() - t0)
                print(f"[probe] rows={rows} stage {i_s} [{impl:6s}]: "
                      f"{best*1e3:7.1f} ms /{n_steps} steps "
                      f"({best/n_steps*1e3:6.1f} ms/step; cold {cold:.1f}s)")


if __name__ == "__main__":
    main()
