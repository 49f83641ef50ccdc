"""Implicit-GEMM Pallas kernel for the VAE's 3x3x3 causal convolutions.

Rebuild of the ref vae.py:225-252 conv path as an explicit MXU GEMM.
Measured on the v5e (scripts/bench_conv.py, chained-iteration timing):
this kernel ties XLA's direct conv at the decoder's large shapes (85.9 vs
84.9 TF/s at 128ch 384x512) but XLA wins at the rest (e.g. 110 TF/s at
512ch 96x128), so ``VAEConfig.conv_impl`` defaults to "xla" and this kernel
remains an exactness-gated option (tests/test_conv_igemm.py).
The formulation, kept for shapes/backends where a fused stencil-GEMM wins:

  - the input tile (one output frame x BH output rows, plus halos) is DMA'd
    from HBM once and the (kt, kw) taps are stacked into the contraction
    axis in VMEM, so each of the 3 remaining (kh) taps is one
    [BH*W, 9*Cin] x [9*Cin, BCO] MXU dot — K is 9x fatter than the direct
    conv's, and no [b,1,q,k]-style im2col copy ever touches HBM (a full
    im2col materialises 27x the activations; see scripts/bench_conv.py);
  - the row-shift for kh taps is free: with (H, W) flattened row-major,
    the dh-shifted window is the contiguous slice [dh*W : dh*W + BH*W];
  - weights stream per Cout block through the pallas pipeline; the input
    tile and its tap-stack are built once per (frame, row-tile) and reused
    across Cout blocks (scratch persists across sequential grid steps).

Layout: channels-last in-kernel ([*, Cin] lanes); accumulation f32.
Supports stride 1, kernel (3,3,3), causal temporal padding 2 (full/init
mode) or 0 (cont mode, cache frames already concatenated by the caller).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bh(h: int, w: int, ci: int, co_blk: int) -> int:
    """Largest row-tile fitting VMEM. Model: scratch (x tile + tap stack)
    plus the pipeline's double-buffered weight/bias/out blocks + f32 acc."""
    budget = 13 * 1024 * 1024
    w_al = ((w + 2 + 7) // 8) * 8
    fixed = 2 * (3 * 9 * ci * co_blk * 2 + co_blk * 2)
    for bh in (32, 16, 8, 4, 2, 1):
        if h % bh:
            continue
        x_tile = 3 * (bh + 2) * w_al * ci * 2
        xw = (bh + 2) * w * 9 * ci * 2
        out_blocks = 2 * bh * w * co_blk * 2
        acc = bh * w * co_blk * 4
        if fixed + x_tile + xw + out_blocks + acc <= budget:
            return bh
    return 1


def _kernel(x_hbm, w_ref, b_ref, out_ref, x_tile, xw, sem,
            *, bh: int, w_out: int, ci: int, t_out: int):
    i = pl.program_id(0)          # fused (batch, frame) index
    j = pl.program_id(1)          # row tile
    k = pl.program_id(2)          # cout block
    b_idx = i // t_out
    t_idx = i % t_out

    @pl.when(k == 0)
    def _load_and_stack():
        dma = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(t_idx, 3), pl.ds(j * bh, bh + 2)],
            x_tile, sem)
        dma.start()
        dma.wait()
        for dt in range(3):
            for dw in range(3):
                xw[:, (dt * 3 + dw) * ci:(dt * 3 + dw + 1) * ci] = (
                    x_tile[dt, :, dw:dw + w_out, :].reshape((bh + 2) * w_out, ci))

    acc = jnp.zeros((bh * w_out, out_ref.shape[-1]), jnp.float32)
    for dh in range(3):
        xs = xw[pl.ds(dh * w_out, bh * w_out), :]
        acc += jax.lax.dot_general(
            xs, w_ref[dh],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc += b_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype).reshape(bh, w_out, out_ref.shape[-1])


def conv3d_igemm(x: jnp.ndarray, params: dict, *, time_pad: int = 2) -> jnp.ndarray:
    """3x3x3 stride-1 conv, torch-layout weight [co, ci, 3, 3, 3].

    x: [b, ci, t, h, w]; output [b, co, t + time_pad - 2, h, w].
    time_pad=2 pads the temporal past (full/init causal mode); time_pad=0
    expects the kt-1 cache frames already concatenated (cont mode).
    """
    wgt = params["weight"]
    co, ci, kt, kh, kw = wgt.shape
    assert (kt, kh, kw) == (3, 3, 3), "igemm kernel is for 3x3x3 convs"
    b, _, t_in, h, w = x.shape
    t_out = t_in + time_pad - 2
    assert t_out >= 1

    co_blk = co if co <= 128 else 128
    assert co % co_blk == 0
    bh = _pick_bh(h, w, ci, co_blk)

    # channels-last, halo-padded copy in HBM; the width axis is padded up to
    # a multiple of 8 so the manual DMA slice is sublane-tile aligned
    w_al = ((w + 2 + 7) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (0, 0), (time_pad, 0), (1, 1), (1, w_al - w - 1)))
    xp = xp.transpose(0, 2, 3, 4, 1)                       # [b, t+2, h+2, w_al, ci]

    # [co, ci, kt, kh, kw] -> [kh, (kt, kw, ci), co]
    wr = wgt.transpose(3, 2, 4, 1, 0).reshape(3, 9 * ci, co).astype(x.dtype)
    bias = params.get("bias")
    bias = (jnp.zeros((co,), x.dtype) if bias is None else bias).astype(x.dtype)
    bias2 = bias.reshape(1, co)

    grid = (b * t_out, h // bh, co // co_blk)
    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, w_out=w, ci=ci, t_out=t_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x stays in HBM
            pl.BlockSpec((3, 9 * ci, co_blk), lambda i, j, k: (0, 0, k)),
            pl.BlockSpec((1, co_blk), lambda i, j, k: (0, k)),
        ],
        out_specs=pl.BlockSpec((1, bh, w, co_blk), lambda i, j, k: (i, j, 0, k)),
        out_shape=jax.ShapeDtypeStruct((b * t_out, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, bh + 2, w_al, ci), x.dtype),
            pltpu.VMEM(((bh + 2) * w, 9 * ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET[0],
    )(xp, wr, bias2)
    return out.reshape(b, t_out, h, w, co).transpose(0, 4, 1, 2, 3)


# test hook: interpret mode for CPU exactness checks
_INTERPRET = [False]


def supports_igemm(weight_shape: Tuple[int, ...], stride: Tuple[int, int, int],
                   dtype, h: int, w: int) -> bool:
    """Dispatch predicate: 3x3x3 stride-1 convs with MXU-aligned channels."""
    co, ci = weight_shape[:2]
    return (tuple(weight_shape[2:]) == (3, 3, 3)
            and tuple(stride) == (1, 1, 1)
            and dtype in (jnp.bfloat16, jnp.float32)
            and ci % 128 == 0 and co % 128 == 0
            and h % 2 == 0 and w % 2 == 0)
