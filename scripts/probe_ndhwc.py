"""Probe: NCDHW vs NDHWC activations for the streaming decoder's hot chain.

Attribution (scripts/probe_dec_copies.py) pinned the decode window's
non-matmul time on XLA's conv input prep in NCDHW: concat(cache, x) write,
a full layout copy, and a width pad — ~3 extra passes per conv. TPU convs
natively want features on the lane axis, so channels-last activations may
remove the relayouts. This probe times the cont-mode
concat -> conv -> GN -> silu -> conv chain in both layouts at the decoder's
two expensive levels. Weights stay in torch [o,i,kt,kh,kw] layout in both
cases (consumed via dimension numbers — the repo's design invariant).

Usage: python scripts/probe_ndhwc.py
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


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


# -- NCDHW (current) ---------------------------------------------------------

def conv_ncdhw(x, w, b):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y + b.astype(y.dtype).reshape(1, -1, 1, 1, 1)


def gn_ncdhw(x, g, w, b_):
    from deepv_tpu.ops.basic import group_norm
    b, c, t, h, w_sp = x.shape
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w_sp)
    y = group_norm(x2, g, w, b_)
    return y.reshape(b, t, c, h, w_sp).transpose(0, 2, 1, 3, 4)


def chain_ncdhw(x, cache, kw, kb, gw, gb, g):
    xp = jnp.concatenate([cache, x], axis=2)
    y = conv_ncdhw(xp, kw, kb)
    y = gn_ncdhw(y, g, gw, gb)
    y = y * jax.nn.sigmoid(y)
    yp = jnp.concatenate([cache, y], axis=2)  # same-shape stand-in cache
    return conv_ncdhw(yp, kw, kb)


# -- NDHWC -------------------------------------------------------------------

def conv_ndhwc(x, w, b):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y + b.astype(y.dtype).reshape(1, 1, 1, 1, -1)


def gn_ndhwc(x, g, w, b_):
    b, t, h, w_sp, c = x.shape
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ct)
    n = (c // g) * h * w_sp
    gid = jnp.arange(c) // (c // g)
    gavg = (gid[:, None] == gid[None, :]).astype(ct) / n
    s = xf.sum(axis=(2, 3))                                   # [b, t, c]
    mean = jnp.einsum("btc,cd->btd", s, gavg,
                      precision=lax.Precision.HIGHEST)[:, :, None, None, :]
    d = xf - mean
    ss = jnp.square(d).sum(axis=(2, 3))
    var = jnp.einsum("btc,cd->btd", ss, gavg,
                     precision=lax.Precision.HIGHEST)
    rstd = lax.rsqrt(var + 1e-6)[:, :, None, None, :]
    return (d * rstd * w.astype(ct).reshape(1, 1, 1, 1, c)
            + b_.astype(ct).reshape(1, 1, 1, 1, c)).astype(x.dtype)


def chain_ndhwc(x, cache, kw, kb, gw, gb, g):
    xp = jnp.concatenate([cache, x], axis=1)
    y = conv_ndhwc(xp, kw, kb)
    y = gn_ndhwc(y, g, gw, gb)
    y = y * jax.nn.sigmoid(y)
    yp = jnp.concatenate([cache, y], axis=1)
    return conv_ndhwc(yp, kw, kb)


def run(name, fn, x, cache, kw, kb, gw, gb, g):
    f = jax.jit(lambda *a: fn(*a, g))
    try:
        t0 = time.time()
        sync(f(x, cache, kw, kb, gw, gb))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(4):
            out = f(x, cache, kw, kb, gw, gb)
        sync(out)
        dt = (time.time() - t0) / 4
        print(f"[ndhwc] {name:28s} OK   compile {tc:6.1f}s  run {dt*1e3:8.2f} ms")
    except Exception as e:
        print(f"[ndhwc] {name:28s} FAIL {str(e).splitlines()[0][:110]}")


def main():
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    for c, t, h, w_sp in ((128, 8, 384, 512), (256, 4, 192, 256)):
        g = 32
        kw = jax.random.normal(key, (c, c, 3, 3, 3), dtype) * 0.02
        kb = jnp.zeros((c,), dtype)
        gw = jnp.ones((c,), jnp.float32)
        gb = jnp.zeros((c,), jnp.float32)

        x1 = jax.random.normal(key, (1, c, t, h, w_sp), dtype)
        c1 = jax.random.normal(key, (1, c, 2, h, w_sp), dtype)
        sync(x1)
        run(f"ncdhw c{c} t{t} {h}x{w_sp}", chain_ncdhw, x1, c1, kw, kb, gw, gb, g)

        x2 = jnp.moveaxis(x1, 1, -1)
        c2 = jnp.moveaxis(c1, 1, -1)
        sync(x2)
        run(f"ndhwc c{c} t{t} {h}x{w_sp}", chain_ndhwc, x2, c2, kw, kb, gw, gb, g)


if __name__ == "__main__":
    main()
