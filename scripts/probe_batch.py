"""Probe: batch scaling of the two hot programs (multi-request serving).

Measures the MMDiT stage forwards at CFG-row counts 2/4/8 (1, 2, 4 requests)
and the decoder resnet chain at batch 1/2/4, all chained inside single
jitted programs. Decides whether multi-request batching raises aggregate
frames/s/chip, and investigates the probe_decode finding that a batch-2
decode window was ~32% slower than two serial batch-1 windows.

Usage: python scripts/probe_batch.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def main():
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.pipeline import InferencePipeline, _pyramid_list
    from deepv_tpu.models.mmdit import mmdit_forward
    from deepv_tpu.models.vae import _dec_window

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

    ds = pcfg.vae_downsample
    lh, lw = H // ds, W // ds
    key = jax.random.PRNGKey(0)
    u = 4
    clean = _pyramid_list(
        jax.random.normal(key, (1, mcfg.in_channels, u, lh, lw), dtype),
        len(pcfg.stages) - 1)
    pe, pm, pp = pipe._embeds_for("empty")

    print("== MMDiT forward batch scaling (rows = CFG x requests) ==")
    for i_s in (2, 1, 0):
        base = None
        for rows in (2, 4, 8):
            conds = pipe._padded_conditions(clean, u, True, rows)
            conditions, times, valid = conds[i_s]
            text = jnp.concatenate([pe] * rows, 0)
            mask = jnp.concatenate([pm] * rows, 0)
            pooled = jnp.concatenate([pp] * rows, 0)
            lat = jax.random.normal(key, (rows, mcfg.in_channels, 1,
                                          lh // (2 ** (2 - i_s)),
                                          lw // (2 ** (2 - i_s))), dtype)
            n = 5

            def many(mp, c):
                def body(i, xx):
                    v = mmdit_forward(mcfg, mp, list(c[:-1]) + [xx], text, mask,
                                      pooled, jnp.full((rows,), 600.0, jnp.float32),
                                      frame_times=list(times), frame_valid=list(valid),
                                      attn_impl=pipe.attn_impl)
                    return (xx + 0.1 * v).astype(xx.dtype)
                return lax.fori_loop(0, n, body, c[-1])

            f = jax.jit(many)
            clips = tuple(conditions) + (lat,)
            try:
                sync(f(params["mmdit"], clips))
            except Exception as e:
                print(f"  stage {i_s} rows {rows}: FAILED {type(e).__name__}: {str(e)[:100]}")
                continue
            t0 = time.time()
            y = f(params["mmdit"], clips)
            sync(y)
            dt = (time.time() - t0) / n
            if rows == 2:
                base = dt
            print(f"  stage {i_s} rows {rows}: {dt*1e3:7.1f} ms/forward "
                  f"({dt/base:4.2f}x rows-2; per-request {dt/(rows//2)*1e3:6.1f} ms)")

    print("== decoder window batch scaling ==")
    dec = params["vae"]["decoder"]
    base = None
    for b in (1, 2, 4):
        z0 = jax.random.normal(key, (b, 16, 1, lh, lw), dtype)
        z1 = jax.random.normal(jax.random.PRNGKey(1), (b, 16, 1, lh, lw), dtype)
        try:
            y, cache = _dec_window(vcfg, dec, z0, None, "init")
            sync(y)
            y, _ = _dec_window(vcfg, dec, z1, cache, "cont")
            sync(y)
        except Exception as e:
            print(f"  batch {b}: FAILED {type(e).__name__}: {str(e)[:100]}")
            continue
        reps = 4
        t0 = time.time()
        for _ in range(reps):
            y, _ = _dec_window(vcfg, dec, z1, cache, "cont")
        sync(y)
        dt = (time.time() - t0) / reps
        if b == 1:
            base = dt
        print(f"  batch {b}: {dt*1e3:7.1f} ms/window ({dt/base:4.2f}x b1; "
              f"per-stream {dt/b*1e3:6.1f} ms)")


if __name__ == "__main__":
    main()
