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


def _attention_reference_qk(q, k, v, valid_q, times_q, valid_k, times_k):
    """jnp path with independent query/key lengths (the guard fallback)."""
    same = valid_q[:, :, None] == valid_k[:, None, :]
    causal = times_q[:, None] >= times_k[None, :]
    bias = jnp.where(jnp.logical_and(same, causal[None]), 0.0, -jnp.inf
                     ).astype(jnp.float32)[:, None]
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        valid: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """jnp fallback. q/k/v: [b, s, h, d]; valid: [b, s]; times: [s]."""
    return _attention_reference_qk(q, k, v, valid, times, valid, times)


# The single-pass kernel holds the whole padded K/V row plus a [block_q, Sk]
# f32 logits tile (and its exp/normalise temporaries) in VMEM — ~16 MB/core
# on current TPUs. Past this sequence length the kernel would fail at
# compile time with an opaque Mosaic allocation error, so the wrapper
# detects the overflow analytically and falls back to the jnp path, which
# XLA tiles through HBM. Budget leaves headroom for compiler-managed
# double-buffering.
_VMEM_BUDGET_BYTES = 12 * 2 ** 20


def _kernel_vmem_bytes(block_q: int, skp: int, d: int, itemsize: int) -> int:
    kv = 2 * skp * d * itemsize            # K and V rows
    q_tile = block_q * d * itemsize
    logits = block_q * skp * 4             # f32 logits
    temporaries = 2 * logits               # exp + normalised weights
    out = block_q * d * itemsize
    vectors = 2 * (block_q + skp) * 8      # valid/time rows (i32 + f32)
    return kv + q_tile + logits + temporaries + out + vectors


def _attn_kernel(q_ref, k_ref, v_ref, validq_ref, timesq_ref,
                 validk_ref, timesk_ref, out_ref,
                 *, scale: float, block_q: int):
    q = q_ref[0]                      # [BQ, d]
    k = k_ref[0]                      # [Sk, d]
    v = v_ref[0]                      # [Sk, d]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [BQ, Sk]

    j = pl.program_id(1)
    vk = validk_ref[0, 0]             # [Sk] int32 (full row in VMEM)
    tk = timesk_ref[0, 0]             # [Sk] f32
    start = pl.multiple_of(j * block_q, block_q)
    vq = validq_ref[0, 0, pl.ds(start, block_q)]
    tq = timesq_ref[0, 0, pl.ds(start, block_q)]
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


def _attention_pallas_qk(q, k, v, valid_q, times_q, valid_k, times_k,
                         block_q: int, interpret: bool) -> jnp.ndarray:
    """Core call with independent query/key lengths. q: [b, sq, h, d];
    k/v: [b, sk, h, d]; valid_*: [b, s*] i32; times_*: [s*] f32."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    sqp = _round_up(sq, block_q)
    skp = _round_up(sk, 128)

    # VMEM guard: beyond the single-pass budget, route to the jnp path
    # instead of dying in Mosaic allocation (tests/test_attention.py pins
    # the boundary). A future online-softmax kernel would lift this.
    need = _kernel_vmem_bytes(min(block_q, sqp), skp, d, q.dtype.itemsize)
    if need > _VMEM_BUDGET_BYTES and not interpret:
        import warnings
        warnings.warn(
            f"attention_pallas: packed K/V row of {sk} tokens needs ~"
            f"{need >> 20} MiB VMEM (> {_VMEM_BUDGET_BYTES >> 20} MiB "
            "single-pass budget); falling back to the XLA attention path. "
            "Reduce the packed sequence (lower resolution / shorter "
            "context) to regain the fused kernel.", stacklevel=2)
        return _attention_reference_qk(q, k, v, valid_q, times_q,
                                       valid_k, times_k)

    def to_bh(x, s, sp):   # [b, s, h, d] -> [b*h, sp, d]
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, s, d)
        if sp - s:
            x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        return x

    qb = to_bh(q, sq, sqp)
    kb = to_bh(k, sk, skp)
    vb = to_bh(v, sk, skp)
    # padded tokens get valid=-1 (queries) / -2 (keys): a padded query never
    # matches any key group, a padded key never matches any query group.
    # vectors are passed as [b, 1, s] full-row blocks (TPU block-shape rule)
    vqp = jnp.pad(valid_q.astype(jnp.int32), ((0, 0), (0, sqp - sq)),
                  constant_values=-1)[:, None]
    vkp = jnp.pad(valid_k.astype(jnp.int32), ((0, 0), (0, skp - sk)),
                  constant_values=-2)[:, None]
    tqp = jnp.broadcast_to(
        jnp.pad(times_q.astype(jnp.float32), (0, sqp - sq))[None, None],
        (b, 1, sqp))
    tkp = jnp.broadcast_to(
        jnp.pad(times_k.astype(jnp.float32), (0, skp - sk))[None, None],
        (b, 1, skp))

    grid = (b * h, sqp // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, skp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, skp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, sqp), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, 1, sqp), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, 1, skp), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, 1, skp), lambda i, j: (i // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qb, kb, vb, vqp, tqp, vkp, tkp)
    out = out[:, :sq].reshape(b, h, sq, d)
    return jnp.moveaxis(out, 1, 2)


def attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     valid: jnp.ndarray, times: jnp.ndarray,
                     block_q: int = 256, interpret: bool = False,
                     n_last: int = 0) -> jnp.ndarray:
    """Fused masked attention. q/k/v: [b, s, h, d]; valid [b, s] i32;
    times [s] f32. Returns [b, s, h, d].

    ``n_last``: when > 0, the LAST n_last tokens are known to carry the
    strictly largest time id (the current denoising unit) — temporal
    causality then guarantees no earlier token attends them, so the
    attention splits exactly into [prefix -> prefix] and [last -> all],
    skipping the prefix x last logits block (~20-25% of the attention
    FLOPs at the deployment layout). n_last=0 runs the single fused call.
    """
    b, s, h, d = q.shape
    if 0 < n_last < s:
        sp = s - n_last
        out_p = _attention_pallas_qk(
            q[:, :sp], k[:, :sp], v[:, :sp],
            valid[:, :sp], times[:sp], valid[:, :sp], times[:sp],
            block_q, interpret)
        out_c = _attention_pallas_qk(
            q[:, sp:], k, v,
            valid[:, sp:], times[sp:], valid, times,
            min(block_q, _round_up(n_last, 128)), interpret)
        return jnp.concatenate([out_p, out_c], axis=1)
    return _attention_pallas_qk(q, k, v, valid, times, valid, times,
                                block_q, interpret)
