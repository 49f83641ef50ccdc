"""Micro-benchmark: 3x3x3 causal conv strategies at the VAE decoder's shapes.

Run on the real TPU to pick the conv formulation for the decode hot path
(ARCHITECTURE.md round-2 candidate: XLA's direct 3D conv sustained ~81 TF/s
vs ~131 TF/s matmul on this chip).

Strategies:
  direct    lax.conv_general_dilated NCDHW (current ops/basic.py::conv3d)
  wstack    stack the 3 W-taps into channels once, conv kernel 3x3x1
  wtstack   stack W- and T-taps into channels, conv kernel 1x3x1
  igemm     full im2col: 27 taps stacked into channels, 1x1x1 conv (= GEMM)
  igemm_dot same but as an explicit dot_general over [thw, 27c] x [27c, co]

Usage:  python scripts/bench_conv.py [--quick]
"""

import os
import sys
import time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def direct(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=((2, 0), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _pad(x):
    return jnp.pad(x, ((0, 0), (0, 0), (2, 0), (1, 1), (1, 1)))


def wstack(x, w):
    xp = _pad(x)
    W = x.shape[-1]
    xs = jnp.concatenate([xp[..., i:i + W] for i in range(3)], axis=1)
    co, ci = w.shape[:2]
    # [co, ci, kt, kh, kw] -> taps-in-channels [co, 3*ci, kt, kh, 1]
    wr = jnp.concatenate([w[..., i:i + 1] for i in range(3)], axis=1)
    return lax.conv_general_dilated(
        xs, wr, window_strides=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def wtstack(x, w):
    xp = _pad(x)
    W = x.shape[-1]
    T = x.shape[2]
    xs = jnp.concatenate([xp[..., i:i + W] for i in range(3)], axis=1)
    xts = jnp.concatenate([xs[:, :, i:i + T] for i in range(3)], axis=1)
    wr = jnp.concatenate([w[..., i:i + 1] for i in range(3)], axis=1)
    wr = jnp.concatenate([wr[:, :, i:i + 1] for i in range(3)], axis=1)
    return lax.conv_general_dilated(
        xts, wr, window_strides=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def igemm(x, w):
    xp = _pad(x)
    T, H, W = x.shape[2:]
    xs = jnp.concatenate([xp[..., i:i + W] for i in range(3)], axis=1)
    xs = jnp.concatenate([xs[:, :, :, i:i + H] for i in range(3)], axis=1)
    xs = jnp.concatenate([xs[:, :, i:i + T] for i in range(3)], axis=1)
    wr = jnp.concatenate([w[..., i:i + 1] for i in range(3)], axis=1)
    wr = jnp.concatenate([wr[:, :, :, i:i + 1, :] for i in range(3)], axis=1)
    wr = jnp.concatenate([wr[:, :, i:i + 1] for i in range(3)], axis=1)
    return lax.conv_general_dilated(
        xs, wr, window_strides=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def igemm_dot(x, w):
    xp = _pad(x)
    b, c, _, _, _ = x.shape
    T, H, W = x.shape[2:]
    taps = []
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                taps.append(xp[:, :, dt:dt + T, dh:dh + H, dw:dw + W])
    xs = jnp.concatenate(taps, axis=1)                       # [b, 27c, T, H, W]
    xs = xs.transpose(0, 2, 3, 4, 1).reshape(b * T * H * W, 27 * c)
    wr = w.transpose(2, 3, 4, 1, 0).reshape(27 * c, w.shape[0])  # [27c, co]
    y = jnp.dot(xs, wr, preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(b, T, H, W, w.shape[0]).transpose(0, 4, 1, 2, 3)


# decoder conv shapes at full deployment size (384x512, decode window=1+1):
# (cin, cout, t, h, w) — t=3 approximates the 2-3 latent frame windows
SHAPES = [
    (512, 512, 3, 48, 64),
    (512, 512, 3, 96, 128),
    (256, 256, 3, 192, 256),
    (128, 128, 5, 384, 512),
    (256, 128, 3, 192, 256),   # block-boundary channel change
]

def pallas_igemm(x, w):
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from deepv_tpu.ops.conv_igemm import conv3d_igemm
    return conv3d_igemm(x, {"weight": w}, time_pad=2)


STRATS = {"direct": direct, "wstack": wstack, "wtstack": wtstack,
          "igemm": igemm, "igemm_dot": igemm_dot, "pallas_igemm": pallas_igemm}


def main():
    quick = "--quick" in sys.argv
    dtype = jnp.bfloat16
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    results = {}
    for (ci, co, t, h, w) in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, ci, t, h, w), dtype)
        wgt = jax.random.normal(jax.random.PRNGKey(1), (co, ci, 3, 3, 3), dtype) * 0.02
        flops = 2 * co * ci * 27 * t * h * w
        ref = None
        for name, fn in STRATS.items():
            if name in ("igemm", "igemm_dot") and ci * h * w * t * 27 * 2 > 4e9:
                continue   # 27x activation blowup too large
            f = jax.jit(fn)
            try:
                y = f(x, wgt)
                sync(y)
            except Exception as e:
                print(f"  {name}: FAILED {type(e).__name__}: {e}")
                continue
            if ref is None:
                ref = np.asarray(y, np.float32)
            else:
                err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
                assert err < 0.2, (name, err)   # bf16 tap-order noise
            n = 3 if quick else 20
            if ci == co:
                # chain iterations inside ONE jitted program: separate axon
                # dispatches carry a ~1ms tunnel floor that would swamp the
                # small shapes (see .claude/skills/verify/SKILL.md)
                rescale = 1.0 / (27 * ci) ** 0.5 / 0.02
                chained = jax.jit(lambda x0, w: jax.lax.fori_loop(
                    0, n, lambda i, xx: fn(xx, w) * rescale, x0))
                sync(chained(x, wgt))          # compile
                t0 = time.time()
                y = chained(x, wgt)
                sync(y)
                dt_s = (time.time() - t0) / n
            else:
                t0 = time.time()
                for _ in range(n):
                    y = f(x, wgt)
                sync(y)
                dt_s = (time.time() - t0) / n
            tfs = flops / dt_s / 1e12
            results[(ci, co, t, h, w, name)] = (dt_s, tfs)
            print(f"  [{ci:4d}->{co:4d} t{t} {h}x{w}] {name:10s} "
                  f"{dt_s * 1e3:7.2f} ms  {tfs:6.1f} TF/s")
    # matmul roofline probe at similar arithmetic size
    m = 4096
    a = jax.random.normal(jax.random.PRNGKey(2), (m, m), dtype)
    bm = jax.random.normal(jax.random.PRNGKey(3), (m, m), dtype)
    n = 20
    f = jax.jit(lambda a0, b: jax.lax.fori_loop(
        0, n, lambda i, aa: (jnp.dot(aa, b, preferred_element_type=jnp.float32)
                             / m ** 0.5).astype(dtype), a0))
    sync(f(a, bm))
    t0 = time.time()
    y = f(a, bm)
    sync(y)
    dt_s = (time.time() - t0) / n
    print(f"  matmul {m}^3: {dt_s*1e3:.2f} ms {2*m**3/dt_s/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
