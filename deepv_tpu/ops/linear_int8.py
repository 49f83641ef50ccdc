"""int8 linear path for the MMDiT's per-block matmuls (W8A8).

The v5e MXU runs int8 at 2x the bf16 rate. The denoise stage is
compute-bound (~91 TF/s measured, docs/ARCHITECTURE.md) and ~80% of its
FLOPs are the per-block D^2 linears (qkv/out and the 4D feed-forwards of
both streams; attention itself is ~20% at the stage-2 deployment shape), so
quantising the linears bounds the speedup at ~1.7x denoise.

Scheme: symmetric — per-output-channel weight scales from |w|max
(precomputed once at pipeline construction), dynamic per-token activation
scales from |x|max, int32 MXU accumulation, f32 dequant epilogue with the
bias added post-scale. This is a QUALITY-GATED fast path (pipeline option
``denoise_int8=True``, composing with ``flow_cache`` and the VAE's
``conv_impl="int8"``): outputs deviate by quantisation noise; the default
path stays exact. ``ops/basic.linear`` dispatches here when a param dict
carries the precomputed ``weight_int8`` entries, so which layers run int8
is decided purely by which dicts ``quantize_mmdit_params`` rewrites —
accuracy-critical layers (AdaLN modulation, final proj_out, embedders)
are never rewritten.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def quantize_linear(params: dict, keep_original: bool = True) -> dict:
    """Add ``weight_int8`` [out,in] + ``weight_scale`` [out] to a linear's
    param dict (torch layout, ops/basic.py invariant).

    ``keep_original=False`` drops the bf16 ``weight`` from the returned
    dict: ``ops/basic.linear`` never reads it once ``weight_int8`` is
    present, and for an inference pipeline the originals are ~3.8 GB of
    dead HBM at deployment size (the allfast OOM of
    scripts/probe_allfast_mem.py). The buffers are only actually freed
    when the caller also releases its own references to the unquantised
    tree."""
    wf = params["weight"].astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=1) / 127.0, 1e-12)
    w8 = jnp.round(wf / sw[:, None]).astype(jnp.int8)
    out = {**params, "weight_int8": w8, "weight_scale": sw}
    if not keep_original:
        del out["weight"]
    return out


def linear_int8(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    """y = dequant(q(x) @ q(W)^T) + b with W stored [out, in]."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    x8 = jnp.round(xf / sx).astype(jnp.int8)
    acc = lax.dot_general(
        x8, params["weight_int8"],
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * params["weight_scale"]
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# per-block linears worth quantising: the S-proportional D^2 matmuls of both
# streams. AdaLN ("norm*"), embedders and proj_out stay exact.
_BLOCK_LINEAR_KEYS = (
    "to_q", "to_k", "to_v", "to_out",
    "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out",
)
_FF_KEYS = ("ff", "ff_context")


def quantize_mmdit_params(params: dict, keep_original: bool = True) -> dict:
    """Precompute int8 weights/scales for every joint block's attention and
    feed-forward linears. Returns a rewritten copy; all other entries are
    kept. ``keep_original=False`` (what InferencePipeline passes) drops the
    bf16 block weights from the quantised tree — see ``quantize_linear``."""
    def quant_ff(ff: dict) -> dict:
        out = dict(ff)
        for k in ("proj", "out"):
            if k in out:
                out[k] = quantize_linear(out[k], keep_original)
        return out

    blocks = []
    for block in params["transformer_blocks"]:
        nb = dict(block)
        attn = dict(nb["attn"])
        for k in _BLOCK_LINEAR_KEYS:
            if k in attn:
                attn[k] = quantize_linear(attn[k], keep_original)
        nb["attn"] = attn
        for k in _FF_KEYS:
            if k in nb:
                nb[k] = quant_ff(nb[k])
        blocks.append(nb)
    return {**params, "transformer_blocks": blocks}
