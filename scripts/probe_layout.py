"""Probe: decoder resnet block in NCDHW vs channels-last NDHWC layout.

One CausalResnetBlock3D (GN -> silu -> conv3x3x3 -> GN -> silu -> conv ->
+residual) chained N times inside a single jitted program at the decoder's
top-resolution shape, per layout. Decides whether the decode path should be
refactored to channels-last (the decode window trace shows ~23% copies).

Usage: python scripts/probe_layout.py
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


def gn_ncthw(x, g, w, b):
    """Current implementation: per-frame stats via transpose to [bt,c,h,w]."""
    B, C, T, H, W = x.shape
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
    xf = x2.astype(jnp.float32).reshape(B * T, g, C // g, -1)
    mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + 1e-6)
    xf = xf.reshape(B * T, C, H, W)
    out = xf * w.astype(jnp.float32).reshape(1, C, 1, 1) + b.astype(jnp.float32).reshape(1, C, 1, 1)
    return out.astype(x.dtype).reshape(B, T, C, H, W).transpose(0, 2, 1, 3, 4)


def gn_ncthw_notrans(x, g, w, b):
    """No-transpose variant: stats directly over (c//g, h, w) per (b, g, t)."""
    B, C, T, H, W = x.shape
    xf = x.astype(jnp.float32).reshape(B, g, C // g, T, H, W)
    mean = jnp.mean(xf, axis=(2, 4, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 4, 5), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + 1e-6)
    out = xf.reshape(B, C, T, H, W) * w.astype(jnp.float32).reshape(1, C, 1, 1, 1) \
        + b.astype(jnp.float32).reshape(1, C, 1, 1, 1)
    return out.astype(x.dtype)


def gn_nthwc(x, g, w, b):
    """Channels-last: x [b, t, h, w, c]; stats over (h, w, c//g) per (b,t,g)."""
    B, T, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, T, H, W, g, C // g)
    mean = jnp.mean(xf, axis=(2, 3, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3, 5), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + 1e-6)
    out = xf.reshape(B, T, H, W, C) * w.astype(jnp.float32) + b.astype(jnp.float32)
    return out.astype(x.dtype)


def conv_ncdhw(x, wgt):
    return lax.conv_general_dilated(
        x, wgt, window_strides=(1, 1, 1), padding=((2, 0), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def conv_ndhwc(x, wgt):
    # x [b, t, h, w, c]; weight torch [o, i, kt, kh, kw] -> DHWIO
    wl = wgt.transpose(2, 3, 4, 1, 0)
    return lax.conv_general_dilated(
        x, wl, window_strides=(1, 1, 1), padding=((2, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def resnet_ncdhw(x, p, gn):
    h = gn(x, 32, p["nw"], p["nb"])
    h = jax.nn.silu(h)
    h = conv_ncdhw(h, p["w1"])
    h = gn(h, 32, p["nw"], p["nb"])
    h = jax.nn.silu(h)
    h = conv_ncdhw(h, p["w2"])
    return x + h


def resnet_ndhwc(x, p):
    h = gn_nthwc(x, 32, p["nw"], p["nb"])
    h = jax.nn.silu(h)
    h = conv_ndhwc(h, p["w1"])
    h = gn_nthwc(h, 32, p["nw"], p["nb"])
    h = jax.nn.silu(h)
    h = conv_ndhwc(h, p["w2"])
    return x + h


def bench(name, fn, x, p, n=10):
    f = jax.jit(lambda x0: lax.fori_loop(0, n, lambda i, xx: fn(xx, p), x0))
    try:
        sync(f(x))
    except Exception as e:
        print(f"  {name:26s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return float("nan")
    t0 = time.time()
    y = f(x)
    sync(y)
    dt = (time.time() - t0) / n
    c = p["w1"].shape[0]
    T, H, W = (x.shape[2:] if x.shape[1] == c else x.shape[1:4])
    flops = 2 * 2 * c * c * 27 * T * H * W          # 2 convs
    print(f"  {name:26s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s-conv")
    return dt


def main():
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    shapes = [(128, 8, 384, 512), (256, 4, 192, 256), (512, 2, 96, 128)]
    for (C, T, H, W) in shapes:
        print(f"[{C}ch t{T} {H}x{W}]")
        ks = jax.random.split(key, 3)
        p = {"w1": jax.random.normal(ks[0], (C, C, 3, 3, 3), dtype) * 0.02,
             "w2": jax.random.normal(ks[1], (C, C, 3, 3, 3), dtype) * 0.02,
             "nw": jnp.ones((C,), dtype), "nb": jnp.zeros((C,), dtype)}
        x_cf = jax.random.normal(ks[2], (1, C, T, H, W), dtype)
        x_cl = x_cf.transpose(0, 2, 3, 4, 1)

        bench("NCDHW + transpose-GN", lambda xx, pp: resnet_ncdhw(xx, pp, gn_ncthw), x_cf, p)
        bench("NCDHW + direct-GN", lambda xx, pp: resnet_ncdhw(xx, pp, gn_ncthw_notrans), x_cf, p)
        bench("NDHWC channels-last", lambda xx, pp: resnet_ndhwc(xx, pp), x_cl, p)

        # numeric agreement
        a = resnet_ncdhw(x_cf, p, gn_ncthw)
        bcl = resnet_ndhwc(x_cl, p).transpose(0, 4, 1, 2, 3)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bcl.astype(jnp.float32))))
        print(f"  max |NCDHW - NDHWC| = {err:.3e}")


if __name__ == "__main__":
    main()
