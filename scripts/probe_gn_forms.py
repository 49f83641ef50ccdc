"""Probe: which native-layout GroupNorm formulations the remote TPU
compile helper accepts, on the decode-window subgraph that crashes it.

The full cont-mode ``_dec_window`` fails post-optimization with a grouped
``reduce(dimensions={2,1,3})`` checker error at the c=128 top-resolution
level whenever GN reduces in the native [b, c, t, h, w] layout. This
probe compiles a conv -> GN -> silu -> conv chain at that level with
several GN forms (try/except each, per CLAUDE.md) and times them, so the
fix is chosen from measurement instead of 7-minute full-window guesses.

Usage: python scripts/probe_gn_forms.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from deepv_tpu.ops.causal_conv import causal_conv3d


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def gn_transpose(x, g, w, b_):
    """Round-1 form: transpose to [b*t, c, h, w] + 4-D kernel (baseline)."""
    from deepv_tpu.ops.basic import group_norm
    b, c, t, h, w_sp = x.shape
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w_sp)
    y = group_norm(x2, g, w, b_)
    return y.reshape(b, t, c, h, w_sp).transpose(0, 2, 1, 3, 4)


def gn_matmul(x, g, w, b_):
    """Native layout, group aggregation via constant same-group matmul."""
    b, c, t, h, w_sp = x.shape
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ct)
    n = (c // g) * h * w_sp
    gid = jnp.arange(c) // (c // g)
    gavg = (gid[:, None] == gid[None, :]).astype(ct) / n
    s34 = xf.sum(axis=(3, 4))
    mean = jnp.einsum("bct,cd->bdt", s34, gavg,
                      precision=lax.Precision.HIGHEST)[:, :, :, None, None]
    d = xf - mean
    ss34 = jnp.square(d).sum(axis=(3, 4))
    var = jnp.einsum("bct,cd->bdt", ss34, gavg,
                     precision=lax.Precision.HIGHEST)
    rstd = lax.rsqrt(var + 1e-6)[:, :, :, None, None]
    return (d * rstd * w.astype(ct).reshape(1, c, 1, 1, 1)
            + b_.astype(ct).reshape(1, c, 1, 1, 1)).astype(x.dtype)


def gn_matmul_barrier(x, g, w, b_):
    """Same, but the reduce input is barriered so no upstream transpose
    can fold into the reduce."""
    b, c, t, h, w_sp = x.shape
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = lax.optimization_barrier(x.astype(ct))
    n = (c // g) * h * w_sp
    gid = jnp.arange(c) // (c // g)
    gavg = (gid[:, None] == gid[None, :]).astype(ct) / n
    s34 = xf.sum(axis=(3, 4))
    mean = jnp.einsum("bct,cd->bdt", s34, gavg,
                      precision=lax.Precision.HIGHEST)[:, :, :, None, None]
    d = xf - mean
    ss34 = jnp.square(d).sum(axis=(3, 4))
    var = jnp.einsum("bct,cd->bdt", ss34, gavg,
                     precision=lax.Precision.HIGHEST)
    rstd = lax.rsqrt(var + 1e-6)[:, :, :, None, None]
    return (d * rstd * w.astype(ct).reshape(1, c, 1, 1, 1)
            + b_.astype(ct).reshape(1, c, 1, 1, 1)).astype(x.dtype)


def gn_dot(x, g, w, b_):
    """Native layout, spatial sums via dot-with-ones (no reduce op)."""
    b, c, t, h, w_sp = x.shape
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ct)
    n = (c // g) * h * w_sp
    gid = jnp.arange(c) // (c // g)
    gavg = (gid[:, None] == gid[None, :]).astype(ct) / n
    ones = jnp.ones((h * w_sp,), ct)
    x4 = xf.reshape(b, c, t, h * w_sp)
    s34 = jnp.einsum("bctk,k->bct", x4, ones,
                     precision=lax.Precision.HIGHEST)
    mean = jnp.einsum("bct,cd->bdt", s34, gavg,
                      precision=lax.Precision.HIGHEST)[:, :, :, None, None]
    d = xf - mean
    d4 = d.reshape(b, c, t, h * w_sp)
    ss34 = jnp.einsum("bctk,bctk->bct", d4, d4,
                      precision=lax.Precision.HIGHEST)
    var = jnp.einsum("bct,cd->bdt", ss34, gavg,
                     precision=lax.Precision.HIGHEST)
    rstd = lax.rsqrt(var + 1e-6)[:, :, :, None, None]
    return (d * rstd * w.astype(ct).reshape(1, c, 1, 1, 1)
            + b_.astype(ct).reshape(1, c, 1, 1, 1)).astype(x.dtype)


def gn_matmul_b16barrier(x, g, w, b_):
    """Barrier the bf16 input (already a materialised buffer), cast after:
    blocks upstream-transpose folding without an f32 materialisation."""
    b, c, t, h, w_sp = x.shape
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = lax.optimization_barrier(x).astype(ct)
    n = (c // g) * h * w_sp
    gid = jnp.arange(c) // (c // g)
    gavg = (gid[:, None] == gid[None, :]).astype(ct) / n
    s34 = xf.sum(axis=(3, 4))
    mean = jnp.einsum("bct,cd->bdt", s34, gavg,
                      precision=lax.Precision.HIGHEST)[:, :, :, None, None]
    d = xf - mean
    ss34 = jnp.square(d).sum(axis=(3, 4))
    var = jnp.einsum("bct,cd->bdt", ss34, gavg,
                     precision=lax.Precision.HIGHEST)
    rstd = lax.rsqrt(var + 1e-6)[:, :, :, None, None]
    return (d * rstd * w.astype(ct).reshape(1, c, 1, 1, 1)
            + b_.astype(ct).reshape(1, c, 1, 1, 1)).astype(x.dtype)


def gn_onepass_b16barrier(x, g, w, b_):
    """Single pass over the big tensor: E[x^2]-E[x]^2 moments, bf16-barriered
    input. One read for the moments + one read-write to normalise."""
    b, c, t, h, w_sp = x.shape
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xb = lax.optimization_barrier(x)
    xf = xb.astype(ct)
    n = (c // g) * h * w_sp
    gid = jnp.arange(c) // (c // g)
    gavg = (gid[:, None] == gid[None, :]).astype(ct) / n
    s34 = xf.sum(axis=(3, 4))
    q34 = jnp.square(xf).sum(axis=(3, 4))
    mean = jnp.einsum("bct,cd->bdt", s34, gavg,
                      precision=lax.Precision.HIGHEST)
    ex2 = jnp.einsum("bct,cd->bdt", q34, gavg,
                     precision=lax.Precision.HIGHEST)
    var = ex2 - jnp.square(mean)
    meanb = mean[:, :, :, None, None]
    rstd = lax.rsqrt(var + 1e-6)[:, :, :, None, None]
    return ((xf - meanb) * rstd * w.astype(ct).reshape(1, c, 1, 1, 1)
            + b_.astype(ct).reshape(1, c, 1, 1, 1)).astype(x.dtype)


def gn_flat_reduce(x, g, w, b_):
    """Native layout, contiguous flatten to [b, c, t, h*w] + last-axis
    reduce (no barrier)."""
    b, c, t, h, w_sp = x.shape
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ct)
    n = (c // g) * h * w_sp
    gid = jnp.arange(c) // (c // g)
    gavg = (gid[:, None] == gid[None, :]).astype(ct) / n
    x4 = xf.reshape(b, c, t, h * w_sp)
    s34 = x4.sum(axis=3)
    mean = jnp.einsum("bct,cd->bdt", s34, gavg,
                      precision=lax.Precision.HIGHEST)[:, :, :, None, None]
    d = xf - mean
    ss34 = jnp.square(d).reshape(b, c, t, h * w_sp).sum(axis=3)
    var = jnp.einsum("bct,cd->bdt", ss34, gavg,
                     precision=lax.Precision.HIGHEST)
    rstd = lax.rsqrt(var + 1e-6)[:, :, :, None, None]
    return (d * rstd * w.astype(ct).reshape(1, c, 1, 1, 1)
            + b_.astype(ct).reshape(1, c, 1, 1, 1)).astype(x.dtype)


def gn_none(x, g, w, b_):
    """No-GN baseline: isolates the conv cost of the chain."""
    return x


FORMS = {
    "nognorm": gn_none,
    "transpose": gn_transpose,
    "matmul_b16barrier": gn_matmul_b16barrier,
    "onepass_b16barrier": gn_onepass_b16barrier,
    "flat_reduce": gn_flat_reduce,
}


def main():
    dtype = jnp.bfloat16
    b, c, t, h, w_sp = 1, 128, 8, 384, 512
    g = 32
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, c, t, h, w_sp), dtype)
    kw = jax.random.normal(key, (c, c, 3, 3, 3), dtype) * 0.02
    kb = jnp.zeros((c,), dtype)
    gw = jnp.ones((c,), jnp.float32)
    gb = jnp.zeros((c,), jnp.float32)
    cache = jax.random.normal(key, (b, c, 2, h, w_sp), dtype)
    sync(x), sync(kw), sync(cache)

    for name, gn in FORMS.items():
        @jax.jit
        def chain(x, cache, kw, kb, gw, gb, gn=gn):
            # conv(cont) -> GN -> silu -> conv(cont): reproduces the
            # conv-output-into-reduce pattern of the failing window
            y, c1 = causal_conv3d(x, {"weight": kw, "bias": kb}, cache,
                                  mode="cont")
            y = gn(y, g, gw, gb)
            y = y * jax.nn.sigmoid(y)
            y, c2 = causal_conv3d(y, {"weight": kw, "bias": kb}, cache,
                                  mode="cont")
            return y

        try:
            t0 = time.time()
            out = chain(x, cache, kw, kb, gw, gb)
            sync(out)
            t_compile = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                out = chain(x, cache, kw, kb, gw, gb)
            sync(out)
            dt = (time.time() - t0) / 3
            print(f"[gn_forms] {name:16s} OK   compile {t_compile:6.1f}s  "
                  f"run {dt * 1e3:8.2f} ms")
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"[gn_forms] {name:16s} FAIL {msg}")


if __name__ == "__main__":
    main()
