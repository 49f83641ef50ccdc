"""Probe: why does a SINGLE-frame VAE encode cost ~1.8 s on the chip?

BENCH_r03 phase log: chunk 1's vae_encode phase (one [1,3,1,384,512] "full"
encode + gaussian_sample) took 1.7974 s — while 2x25 frames chunk-encode in
0.96 s (scripts/probe_boundary_encode.py). The 1-frame program is ~50x/frame
slower than the 25-frame one. Every rollout pays it at chunk 1 (conditioning)
and every boundary pays the batch-2 variant (history encode).

Measures, full size, real TPU: 1-frame full encode (batch 1 and 2), the
encoder alone vs + gaussian_sample, and a 9-frame init window for scale.
Also dumps a device trace for the 1-frame program if PROBE_TRACE=1.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepv_tpu.config import VAEConfig
from deepv_tpu.models.vae import _enc_window, gaussian_sample, init_vae_params


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def timeit(name, fn, reps=3):
    t0 = time.time()
    sync(fn())
    cold = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        best = min(best, time.time() - t0)
    print(f"[probe] {name}: cold {cold:.2f}s best {best:.3f}s")
    return best


def main():
    vcfg = VAEConfig()
    dtype = jnp.bfloat16
    params = jax.jit(lambda: init_vae_params(
        jax.random.key(0, impl="rbg"), vcfg, dtype=dtype))()
    sync(jax.tree.leaves(params)[0])
    enc = params["encoder"]
    print("[probe] params ready", file=sys.stderr)

    H, W = 384, 512
    key = jax.random.PRNGKey(0)
    x1 = jax.random.uniform(key, (1, 3, 1, H, W), dtype, minval=-1.0, maxval=1.0)
    x2 = jnp.concatenate([x1, -x1], axis=0)
    x9 = jax.random.uniform(key, (1, 3, 9, H, W), dtype, minval=-1.0, maxval=1.0)

    timeit("full 1f b1 (enc only)", lambda: _enc_window(vcfg, enc, x1, None, "full")[0])
    timeit("full 1f b2 (enc only)", lambda: _enc_window(vcfg, enc, x2, None, "full")[0])
    timeit("init 9f b1 (enc only)", lambda: _enc_window(vcfg, enc, x9, None, "init")[0])

    @jax.jit
    def enc_sample(x, k):
        m = _enc_window(vcfg, enc, x, None, "full")[0]
        return gaussian_sample(m, k)

    timeit("full 1f b1 + sample", lambda: enc_sample(x1, key))
    timeit("full 1f b2 + sample", lambda: enc_sample(x2, key))

    if os.environ.get("PROBE_TRACE") == "1":
        out_dir = "/tmp/probe_1f_trace"
        with jax.profiler.trace(out_dir):
            for _ in range(2):
                sync(_enc_window(vcfg, enc, x1, None, "full")[0])
        print(f"[probe] trace written to {out_dir}")


if __name__ == "__main__":
    main()
