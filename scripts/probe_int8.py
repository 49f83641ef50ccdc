"""Probe: int8 vs bf16 convolution throughput at the decoder's hot shapes.

The v5e MXU runs int8 at 2x the bf16 rate. Measures whether XLA's conv
actually reaches that for the 3x3x3 causal convs (with the dequant epilogue
included), deciding whether a quality-gated int8 decode path is worth
building.

Usage: python scripts/probe_int8.py
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
from jax import lax


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def conv_bf16(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=((2, 0), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def conv_int8(x8, w8, sx, sw):
    """int8 x int8 -> int32 conv, dequantised with per-channel weight scales."""
    y = lax.conv_general_dilated(
        x8, w8, window_strides=(1, 1, 1), padding=((2, 0), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw).reshape(1, -1, 1, 1, 1)
            ).astype(jnp.bfloat16)


def bench(name, step, x0, n=10, flops=0):
    """step: x -> x (same shape/dtype) so the loop cannot be hoisted."""
    run = jax.jit(lambda a: lax.fori_loop(0, n, lambda i, xx: step(xx), a))
    try:
        sync(run(x0))
    except Exception as e:
        print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:100]}")
        return
    t0 = time.time()
    sync(run(x0))
    dt = (time.time() - t0) / n
    print(f"  {name:14s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    shapes = [(128, 8, 384, 512), (256, 4, 192, 256), (512, 2, 96, 128)]
    for (C, T, H, W) in shapes:
        print(f"[{C}ch t{T} {H}x{W}]")
        ks = jax.random.split(key, 2)
        x = jax.random.normal(ks[0], (1, C, T, H, W), jnp.bfloat16)
        w = jax.random.normal(ks[1], (C, C, 3, 3, 3), jnp.bfloat16) * 0.02
        flops = 2 * C * C * 27 * T * H * W

        x8 = jnp.clip(x.astype(jnp.float32) * 42.0, -127, 127).astype(jnp.int8)
        w8 = jnp.clip(w.astype(jnp.float32) * 1000.0, -127, 127).astype(jnp.int8)
        sx = jnp.float32(1 / 42.0)
        sw = jnp.full((C,), 1 / 1000.0, jnp.float32)
        rescale = 1.0 / (27 * C) ** 0.5 / 0.02

        # chained: bf16 output feeds the next conv; int8 output requantises
        # (the epilogue a real int8 decode path would pay)
        t_bf = bench("bf16", lambda xx: conv_bf16(xx, w) * rescale, x,
                     flops=flops)
        t_i8 = bench(
            "int8+requant",
            lambda xx: jnp.clip(
                conv_int8(xx, w8, sx, sw).astype(jnp.float32) * rescale * 42.0,
                -127, 127).astype(jnp.int8),
            x8, flops=flops)
        if t_bf and t_i8:
            print(f"  speedup: {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
