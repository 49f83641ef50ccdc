"""Probe: full-size VAE decode cost — serial vs batched vs per-unit windows.

Resolves the decode_batched question (batch rgb+disparity in one call vs two
serial calls) and measures the true decode share of a chunk, with a drained
queue before each timing.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def main():
    from bench import fast_params
    from deepv_tpu.config import MMDiTConfig, VAEConfig
    from deepv_tpu.models.vae import vae_decode, _dec_window

    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    dtype = jnp.bfloat16
    params = fast_params(mcfg, vcfg, dtype)["vae"]
    sync(jax.tree.leaves(params)[0])

    lh, lw = 48, 64
    z1 = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8, lh, lw), dtype)
    z2 = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8, lh, lw), dtype)

    for window in (1, 2):
        def serial():
            a = vae_decode(vcfg, params, z1, temporal_chunk=True, window_size=window)
            b = vae_decode(vcfg, params, z2, temporal_chunk=True, window_size=window)
            return a, b

        def batched():
            return vae_decode(vcfg, params, jnp.concatenate([z1, z2], 0),
                              temporal_chunk=True, window_size=window)

        for name, fn in (("serial", serial), ("batched", batched)):
            out = fn(); sync(out[0] if isinstance(out, tuple) else out)  # warm
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                out = fn()
                sync(out[0] if isinstance(out, tuple) else out)
                if isinstance(out, tuple):
                    sync(out[1])
            dt = (time.time() - t0) / reps
            print(f"window={window} {name:8s}: {dt*1e3:7.0f} ms / chunk-pair")

    # streaming windows (per-unit init + cont), rgb+disp as separate streams
    def stream():
        outs = []
        y, c1 = _dec_window(vcfg, params["decoder"], z1[:, :, :1], None, "init")
        yd, c2 = _dec_window(vcfg, params["decoder"], z2[:, :, :1], None, "init")
        outs += [y, yd]
        for i in range(1, 8):
            y, c1 = _dec_window(vcfg, params["decoder"], z1[:, :, i:i + 1], c1, "cont")
            yd, c2 = _dec_window(vcfg, params["decoder"], z2[:, :, i:i + 1], c2, "cont")
            outs += [y, yd]
        return outs

    out = stream(); sync(out[-1])
    t0 = time.time()
    for _ in range(3):
        out = stream()
        sync(out[-1])
    print(f"stream windows  : {(time.time()-t0)/3*1e3:7.0f} ms / chunk-pair")


if __name__ == "__main__":
    main()
