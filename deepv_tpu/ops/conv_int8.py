"""int8 convolution path for the VAE decoder's top spatial level.

The v5e MXU runs int8 at 2x the bf16 rate, but measured end-to-end
(scripts/probe_int8.py, chained-iteration timing incl. the requant
epilogue) the win only materialises at the 384x512 level where the conv is
partly IO-bound at bf16: 1.60x there, 1.12x at 192x256, 1.00x at 96x128.
The dispatch therefore quantises only convs with H >= ``MIN_H`` (the top
level — ~half the decoder's FLOPs).

Scheme: symmetric int8 — per-output-channel weight scales from |w|max,
dynamic per-tensor activation scale from |x|max, int32 accumulation, f32
dequant epilogue. Weight quantisation recomputes per call when params are
traced jit arguments (the measured 1.16x decode win is NET of that cost);
``quantize_conv_weights`` precomputes ``weight_int8``/``weight_scale``
entries once at load time for layers that should skip it. This is a
QUALITY-GATED fast path (``VAEConfig.conv_impl="int8"``): outputs deviate
from bf16 by quantisation noise (~1% relative, tests/test_conv_int8.py);
the default path stays exact.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

MIN_H = 256   # quantise only at spatial levels where int8 measured faster


def supports_int8(weight_shape: Tuple[int, ...], stride: Tuple[int, int, int],
                  h: int) -> bool:
    return (tuple(weight_shape[2:]) == (3, 3, 3)
            and tuple(stride) == (1, 1, 1)
            and h >= MIN_H)


def quantize_conv_weights(params: dict) -> dict:
    """Precompute int8 weights + per-channel scales into the param dict
    (done once at load; ``conv3d_int8`` consumes them if present)."""
    wf = params["weight"].astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(1, 2, 3, 4)) / 127.0, 1e-12)
    w8 = jnp.round(wf / sw[:, None, None, None, None]).astype(jnp.int8)
    return {**params, "weight_int8": w8, "weight_scale": sw}


def quantize_vae_convs(tree_params: dict) -> dict:
    """Precompute int8 weights/scales for every 3x3x3 conv in a VAE
    encoder/decoder pytree (InferencePipeline does this once at construction
    when ``conv_impl="int8"``; layers the H>=MIN_H dispatch never routes to
    int8 just carry unused extra entries)."""
    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            w = out.get("weight")
            if (hasattr(w, "ndim") and w.ndim == 5
                    and tuple(w.shape[2:]) == (3, 3, 3)):
                out = quantize_conv_weights(out)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node
    return walk(tree_params)


quantize_vae_decoder = quantize_vae_convs  # legacy name (pre round-3)


def conv3d_int8(x: jnp.ndarray, params: dict, *,
                padding=((2, 0), (1, 1), (1, 1))) -> jnp.ndarray:
    """Quantised 3x3x3 conv. x: [b, ci, t, h, w]; weight torch-layout
    [co, ci, 3, 3, 3]. Returns x.dtype."""
    w = params["weight"]
    co = w.shape[0]

    if "weight_int8" in params:
        w8, sw = params["weight_int8"], params["weight_scale"]
    else:
        wf = w.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(1, 2, 3, 4)) / 127.0, 1e-12)
        w8 = jnp.round(wf / sw[:, None, None, None, None]).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)         # scalar
    x8 = jnp.round(xf / sx).astype(jnp.int8)

    y = lax.conv_general_dilated(
        x8, w8, window_strides=(1, 1, 1), padding=padding,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (sx * sw).reshape(1, co, 1, 1, 1)
    if "bias" in params and params["bias"] is not None:
        out = out + params["bias"].astype(jnp.float32).reshape(1, co, 1, 1, 1)
    return out.astype(x.dtype)
