"""Probe: HBM budget of the chunk-boundary variants, measured sectionally.

Runs, in one process (safe sections first, try/except around each):
  1. non-streaming 2-chunk rollout (the known-good bench sustained mode)
  2. carry re-encode variants (serial/batched rows, window sweep)
  3. exact streaming 2-chunk rollout, prime OFF (full warm re-decode)
  4. exact streaming 2-chunk rollout, prime ON  (cache priming)

Reports wall time or the OOM, plus device memory_stats when the backend
exposes them.

Usage: python scripts/probe_mem.py
"""

import gc
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


def mem(tag):
    try:
        s = jax.local_devices()[0].memory_stats()
        used = s.get("bytes_in_use", 0) / 2**30
        peak = s.get("peak_bytes_in_use", 0) / 2**30
        print(f"  [mem] {tag}: in_use {used:.2f} GiB, peak {peak:.2f} GiB",
              flush=True)
    except Exception as e:
        print(f"  [mem] {tag}: unavailable ({type(e).__name__})", flush=True)


def main():
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.models.vae import vae_encode, gaussian_sample
    from deepv_tpu.pipeline import InferencePipeline

    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    dtype = jnp.bfloat16
    H, W = 384, 512
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])
    mem("params ready")
    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    n_unit_cfg = pcfg.max_temporal_length - pcfg.num_input_unit
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."]
                       * (pcfg.max_temporal_length - 1 + n_unit_cfg))
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}

    def rollout(name, **kw):
        print(f"== {name} ==", flush=True)
        try:
            pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds,
                                     dtype=dtype, decode_window=1, **kw)
            t0 = time.time()
            out = pipe.generate(batch, seed=0)
            sync(out["pred_img"]); sync(out["pred_disparity"])
            warm = time.time() - t0
            del out
            t0 = time.time()
            out = pipe.generate(batch, seed=1)
            sync(out["pred_img"]); sync(out["pred_disparity"])
            dt = time.time() - t0
            frames = int(out["pred_img"].shape[2])
            print(f"  ok: warm {warm:.1f}s, steady {dt:.2f}s "
                  f"({frames / dt:.2f} fps)", flush=True)
            mem(name)
            del out, pipe
        except Exception as e:
            print(f"  FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
            mem(name + " (failed)")
        gc.collect()

    # 1. known-good baseline
    rollout("non-streaming 2-chunk", stream_decode=False)

    # 2. carry re-encode variants
    print("== carry re-encode (25 frames rgb+disp) ==", flush=True)
    carry = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, 25, H, W),
                               minval=-1.0, maxval=1.0).astype(dtype)
    key = jax.random.PRNGKey(9)

    def serial(win):
        parts = [vae_encode(vcfg, params["vae"], carry[i:i + 1],
                            temporal_chunk=True, window_size=win)
                 for i in range(2)]
        return gaussian_sample(jnp.concatenate(parts, axis=0), key)

    def batched(win):
        return gaussian_sample(vae_encode(vcfg, params["vae"], carry,
                                          temporal_chunk=True,
                                          window_size=win), key)

    ref = None
    for name, fn in [("serial w8 (current)", lambda: serial(8)),
                     ("serial w12", lambda: serial(12)),
                     ("batched w8", lambda: batched(8)),
                     ("batched w12", lambda: batched(12))]:
        try:
            sync(fn())
            t0 = time.time()
            for _ in range(3):
                r = fn()
                sync(r)
            dt = (time.time() - t0) / 3
            v = np.asarray(r, np.float32)
            dev = 0.0 if ref is None else float(np.max(np.abs(v - ref)))
            if ref is None:
                ref = v
            print(f"  {name:22s} {dt*1e3:8.1f} ms   max|d| vs serial w8: "
                  f"{dev:.2e}", flush=True)
            del r
        except Exception as e:
            print(f"  {name:22s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        gc.collect()
    del carry, ref
    gc.collect()

    # 3./4. exact streaming, riskier last
    rollout("streaming 2-chunk, prime OFF", stream_decode=True,
            prime_decoder_cache=False)
    rollout("streaming 2-chunk, prime ON", stream_decode=True,
            prime_decoder_cache=True)


if __name__ == "__main__":
    main()
