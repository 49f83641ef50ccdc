"""Probe: exact STREAMING multi-chunk rollout with fused cache priming.

The per-window exact streaming boundary OOMs at full size (probe_mem.py):
every in-flight decode window holds a fresh ~1.5 GB/stream cache generation,
and the host enqueues the whole boundary ahead of the device. The fused
one-program warm (models/vae.py::_dec_prime_warm) plus a drain after priming
should fit. This probe validates that and times the streaming sustained rate.

Usage: python scripts/probe_stream_prime.py [n_chunks]
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

    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 3
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
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    n_unit_cfg = pcfg.max_temporal_length - pcfg.num_input_unit
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."]
                       * (pcfg.max_temporal_length - 1 + (n_chunks - 1) * n_unit_cfg))
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}

    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                             decode_window=1, stream_decode=True)
    assert pipe._prime_need is not None
    t0 = time.time()
    out = pipe.generate(batch, seed=0)
    sync(out["pred_img"]); sync(out["pred_disparity"])
    frames = int(out["pred_img"].shape[2])
    print(f"warmup {n_chunks}-chunk ({frames} frames): {time.time()-t0:.1f}s "
          f"(incl. compile)", flush=True)
    del out
    t0 = time.time()
    out = pipe.generate(batch, seed=1)
    sync(out["pred_img"]); sync(out["pred_disparity"])
    dt = time.time() - t0
    print(f"steady: {frames} frames / {dt:.2f}s -> {frames/dt:.2f} fps",
          flush=True)


if __name__ == "__main__":
    main()
