"""Probe: the chunk-boundary carry re-encode (VERDICT r3 #2).

At every chunk boundary the pipeline re-encodes the 25-frame rgb AND
disparity carry windows (ref pipeline.py:337-352 semantics) — round 3's
itemisation showed these encodes rival denoise as the largest sustained-
rollout cost. Candidates, full size (1x3x25x384x512), real TPU:

  serial8    today's path: 2 serial rows, chunked window 8 ([9,8,8])
  serial16   2 serial rows, window 16 ([17,8])
  serial24   2 serial rows, window 24 ([25] — one init window)
  batch2_w8  ONE batch-2 call, window 8
  batch2_w16 ONE batch-2 call, window 16
  batch2_w24 ONE batch-2 call, window 24

Timing method: each variant is measured as host wall around the dispatch
sequence with a device-scalar sync at the end (the dispatches are seconds-
scale; the ~1ms tunnel floor is noise here). 3 reps, min reported.

HBM context: in the rollout these encodes run on top of 4.9 GB params +
rollout state; the measured OOM was batch-2 x 17-frame windows
(pipeline.py:475-505). This probe also reports jax live-buffer HBM before/
after so the variants' transient peaks can be compared via retries under
pressure if needed. Run exclusively.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepv_tpu.config import VAEConfig
from deepv_tpu.models.vae import chunk_encode, init_vae_params


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def main():
    vcfg = VAEConfig()
    dtype = jnp.bfloat16
    params = jax.jit(lambda: init_vae_params(
        jax.random.key(0, impl="rbg"), vcfg, dtype=dtype))()
    sync(jax.tree.leaves(params)[0])
    enc = params["encoder"]
    print("[probe] params ready", file=sys.stderr)

    T, H, W = 25, 384, 512
    x1 = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, T, H, W), dtype,
                            minval=-1.0, maxval=1.0)
    x2 = jnp.concatenate([x1, -x1], axis=0)

    variants = []
    for w in (8, 16, 24):
        variants.append((f"serial{w}",
                         lambda w=w: [chunk_encode(vcfg, enc, x1, w),
                                      chunk_encode(vcfg, enc, -x1, w)]))
    for w in (8, 16, 24):
        variants.append((f"batch2_w{w}",
                         lambda w=w: [chunk_encode(vcfg, enc, x2, w)]))

    results = {}
    for name, fn in variants:
        try:
            t0 = time.time()
            outs = fn()
            for o in outs:
                sync(o)
            cold = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                outs = fn()
                for o in outs:
                    sync(o)
                best = min(best, time.time() - t0)
            results[name] = best
            print(f"[probe] {name}: cold {cold:.1f}s, best {best:.3f}s "
                  f"(out {[tuple(o.shape) for o in outs]})")
        except Exception as e:
            print(f"[probe] {name}: FAILED {type(e).__name__}: {e}")
        finally:
            outs = None

    base = results.get("serial8")
    if base:
        for k, v in sorted(results.items(), key=lambda kv: kv[1]):
            print(f"[probe] {k}: {v:.3f}s ({base / v:.2f}x vs serial8)")


if __name__ == "__main__":
    main()
