"""Temporal rotary position embedding (RoPE) for the packed MMDiT sequence.

The reference builds dense ``[b, seq, 1, d/2, 2, 2]`` rotation-matrix tensors
(ref mmdit.py:999-1028 ``rope``/``EmbedNDRoPE``) and applies them with two
multiplies inside the attention loop (ref mmdit.py:131-136 ``apply_rope``).
Here we keep the cos/sin tables factored — ``[seq, d/2]`` each — and apply
the rotation to the interleaved (even, odd) feature pairs, which is both the
standard formulation and the memory-light one for a fused attention kernel.

Equivalence: the reference stacks ``[cos, -sin, sin, cos]`` per frequency and
contracts against ``x`` viewed as ``(..., d/2, 1, 2)``, i.e.
``out_even = cos*x_even - sin*x_odd; out_odd = sin*x_even + cos*x_odd`` —
exactly the interleaved rotation below.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_tables(pos: np.ndarray, dim: int, theta: float = 10000.0):
    """cos/sin tables for positions ``pos`` ([seq]) -> each [seq, dim//2].

    Computed in float64 on host (positions and tables are static per shape),
    matching the reference's float64 frequency computation (ref mmdit.py:1002).
    Returned at full precision; callers' jnp.asarray canonicalises to f32
    unless x64 is enabled (keeping the static and traced variants bit-equal
    in f64 equivalence tests).
    """
    assert dim % 2 == 0
    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = 1.0 / (theta ** scale)           # [dim/2]
    out = np.asarray(pos, dtype=np.float64)[:, None] * omega[None, :]
    return np.cos(out), np.sin(out)


def rope_tables_jax(pos: jnp.ndarray, dim: int, theta: float = 10000.0):
    """Traced variant of :func:`rope_tables` for positions computed on device.

    Uses the widest canonical float (f64 under x64, else f32) so it matches
    the host tables exactly in either mode.
    """
    scale = jnp.asarray(np.arange(0, dim, 2, dtype=np.float64)) / dim
    omega = 1.0 / (theta ** scale)
    out = pos.astype(scale.dtype)[:, None] * omega[None, :]
    return jnp.cos(out), jnp.sin(out)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved feature pairs of ``x`` [..., seq, heads, dim].

    cos/sin: [seq, dim//2]; broadcast over leading batch and heads axes.
    Computed in float32 or wider (the reference upcasts q/k to float before
    rotation, ref mmdit.py:132-136; f64 inputs rotate in f64).
    """
    dtype = x.dtype
    cdtype = jnp.promote_types(dtype, jnp.float32)
    *lead, s, h, d = x.shape
    xf = x.astype(cdtype).reshape(*lead, s, h, d // 2, 2)
    c = cos.astype(cdtype)[:, None, :, None]  # [seq, 1(head), d/2, 1]
    si = sin.astype(cdtype)[:, None, :, None]
    even = xf[..., 0:1]
    odd = xf[..., 1:2]
    rot = jnp.concatenate([c * even - si * odd, si * even + c * odd], axis=-1)
    return rot.reshape(*lead, s, h, d).astype(dtype)
