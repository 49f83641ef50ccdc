"""Probe: full-size interactive-session step latency on the real TPU.

Measures per-step wall time (sync'd to decoded pixels) across two chunks of
an InteractiveSession — including the chunk-boundary step that pays the
overlap re-encode + re-decode — with and without ``reuse_decoder_cache``.
These are the serving numbers of record for docs.

Usage: python scripts/probe_serve_latency.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

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
    from deepv_tpu.pipeline import InferencePipeline
    from deepv_tpu.serve import InteractiveSession

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
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    act = "Move forward. The perspective hasn't changed."

    for reuse in (False, True):
        for warm in (False, True):          # first pass compiles
            sess = InteractiveSession(pipe, reuse_decoder_cache=reuse,
                                      history_limit_chunks=2)
            sess.start(img, seed=3)
            times = []
            for i in range(12):             # chunk 1 (8 units) + 4 of chunk 2
                t0 = time.time()
                out = sess.step(act)
                sync(out["rgb"])
                times.append(time.time() - t0)
            if warm:
                marks = " ".join(f"{t:5.2f}" for t in times)
                print(f"reuse={int(reuse)}: per-step s: {marks}")
                print(f"  boundary step (8): {times[7]:.2f}s; "
                      f"steady median: {sorted(times[1:7])[3]:.2f}s")


if __name__ == "__main__":
    main()
