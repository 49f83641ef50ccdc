"""Packed masked attention — Pallas TPU kernel + jnp reference.

The MMDiT's hot op (SURVEY.md §3.2: 24 joint-attention blocks per denoise
step). XLA materialises the [b, h, S, S] logits in HBM; at S~2k, b=3, h=24
that is ~1.4 GB of traffic per layer — bandwidth-bound. The Pallas kernel
keeps the logits tile in VMEM and rebuilds the reference's combined
batch-id x temporal-causal mask (ref mmdit.py:1413-1434) on the fly from two
per-token vectors:

  allowed(q, k) = (valid_q == valid_k) & (time_q >= time_k)

For the packed sequence lengths in play (<= a few thousand tokens) the whole
K/V block fits VMEM, so the kernel is a single-pass softmax per q-tile — no
online-softmax bookkeeping needed.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        valid: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """jnp fallback. q/k/v: [b, s, h, d]; valid: [b, s]; times: [s]."""
    same = valid[:, :, None] == valid[:, None, :]
    causal = times[:, None] >= times[None, :]
    bias = jnp.where(jnp.logical_and(same, causal[None]), 0.0, -jnp.inf
                     ).astype(jnp.float32)[:, None]
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, valid_ref, times_ref, out_ref,
                 *, scale: float, block_q: int):
    q = q_ref[0]                      # [BQ, d]
    k = k_ref[0]                      # [S, d]
    v = v_ref[0]                      # [S, d]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [BQ, S]

    j = pl.program_id(1)
    vk = valid_ref[0, 0]              # [S] int32 (full row in VMEM)
    tk = times_ref[0, 0]              # [S] f32
    start = pl.multiple_of(j * block_q, block_q)
    vq = valid_ref[0, 0, pl.ds(start, block_q)]
    tq = times_ref[0, 0, pl.ds(start, block_q)]
    allowed = jnp.logical_and(vq[:, None] == vk[None, :],
                              tq[:, None] >= tk[None, :])
    logits = jnp.where(allowed, logits, -1e30)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v.dtype)
    out_ref[0] = jax.lax.dot_general(
        w, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(v.dtype)


def attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     valid: jnp.ndarray, times: jnp.ndarray,
                     block_q: int = 256, interpret: bool = False) -> jnp.ndarray:
    """Fused masked attention. q/k/v: [b, s, h, d]; valid [b, s] i32;
    times [s] f32. Returns [b, s, h, d]."""
    b, s, h, d = q.shape
    scale = 1.0 / math.sqrt(d)

    sp = _round_up(s, block_q)
    pad = sp - s

    def to_bh(x):   # [b, s, h, d] -> [b*h, sp, d]
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, s, d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    # padded tokens get valid=-1: they interact only with each other.
    # vectors are passed as [b, 1, sp] full-row blocks (TPU block-shape rule)
    validp = jnp.pad(valid.astype(jnp.int32), ((0, 0), (0, pad)), constant_values=-1)
    validb = validp[:, None]                                    # [b, 1, sp]
    timesp = jnp.pad(times.astype(jnp.float32), (0, pad))
    timesb = jnp.broadcast_to(timesp[None, None], (b, 1, sp))

    grid = (b * h, sp // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, sp), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, 1, sp), lambda i, j: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qb, kb, vb, validb, timesb)
    out = out[:, :s].reshape(b, h, s, d)
    return jnp.moveaxis(out, 1, 2)
