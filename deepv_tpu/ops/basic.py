"""Functional layer primitives over torch-layout parameter pytrees.

Parameters are stored in the checkpoint's native layout — linear ``weight``
is ``[out, in]``, conv3d ``weight`` is ``[out, in, kt, kh, kw]`` — and the
apply functions use ``lax.dot_general`` / ``lax.conv_general_dilated``
dimension numbers to consume them without materialising transposes. This
makes the torch->jax weight converter a pure tree re-keying.

All matmuls accumulate in float32 (``preferred_element_type``) so bfloat16
activations keep MXU-native speed without precision loss.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def linear(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    """y = x @ W^T + b with W stored [out, in] (torch layout).

    Dispatches to the quality-gated W8A8 path when the dict carries
    precomputed ``weight_int8`` entries (ops/linear_int8.py) — which layers
    run int8 is decided by the quantiser, not here."""
    if "weight_int8" in params:
        from .linear_int8 import linear_int8
        return linear_int8(x, params)
    w = params["weight"]
    y = lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    ).astype(x.dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype)
    return y


def layer_norm(x: jnp.ndarray, eps: float = 1e-6,
               weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in at-least-float32 (f64
    inputs stay f64 so the torch oracles can pin the math exactly)."""
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ct)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(ct)
    if bias is not None:
        out = out + bias.astype(ct)
    return out.astype(x.dtype)


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray], eps: float) -> jnp.ndarray:
    """RMSNorm over the last axis in at-least-f32 (ref mmdit.py:435-464)."""
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    out = xf * lax.rsqrt(var + eps)
    out = out.astype(x.dtype)
    if weight is not None:
        out = out * weight.astype(x.dtype)
    return out


def group_norm(x: jnp.ndarray, num_groups: int, weight: jnp.ndarray,
               bias: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """GroupNorm over a channels-first tensor ``[b, c, *spatial]``.

    Matches the reference VAE's ``CausalGroupNorm`` applied per frame
    (ref vae.py:161-167): callers reshape time into batch first, so
    normalisation statistics never cross frames.
    """
    b, c = x.shape[0], x.shape[1]
    spatial = x.shape[2:]
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ct).reshape(b, num_groups, c // num_groups, -1)
    mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(b, c, *spatial)
    shape = (1, c) + (1,) * len(spatial)
    out = xf * weight.astype(ct).reshape(shape) + bias.astype(ct).reshape(shape)
    return out.astype(x.dtype)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """gelu(approximate='tanh'), the DiT feed-forward activation."""
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def conv3d(x: jnp.ndarray, params: dict,
           stride=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0))) -> jnp.ndarray:
    """3D convolution with torch-layout weights.

    x: [b, c_in, t, h, w]; weight: [c_out, c_in, kt, kh, kw].
    """
    y = lax.conv_general_dilated(
        x, params["weight"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    ).astype(x.dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype).reshape(1, -1, 1, 1, 1)
    return y


def conv2d(x: jnp.ndarray, params: dict, stride=(1, 1),
           padding=((0, 0), (0, 0))) -> jnp.ndarray:
    """2D convolution with torch-layout weights. x: [b, c, h, w]."""
    y = lax.conv_general_dilated(
        x, params["weight"].astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    ).astype(x.dtype)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype).reshape(1, -1, 1, 1)
    return y


# ---------------------------------------------------------------------------
# Parameter initialisers (torch layouts; for tests / benchmarks; real use
# loads converted checkpoints).
# ---------------------------------------------------------------------------

def init_linear(key, in_features: int, out_features: int, bias: bool = True,
                dtype=jnp.float32) -> dict:
    kw, _ = jax.random.split(key)
    bound = math.sqrt(6.0 / (in_features + out_features))  # xavier uniform
    p = {"weight": jax.random.uniform(kw, (out_features, in_features), dtype, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((out_features,), dtype)
    return p


def init_conv3d(key, c_in: int, c_out: int, kernel, bias: bool = True,
                dtype=jnp.float32) -> dict:
    if isinstance(kernel, int):
        kernel = (kernel, kernel, kernel)
    fan_in = c_in * kernel[0] * kernel[1] * kernel[2]
    std = 0.02
    p = {"weight": std * jax.random.truncated_normal(
        key, -2.0, 2.0, (c_out, c_in) + tuple(kernel), dtype)}
    if bias:
        p["bias"] = jnp.zeros((c_out,), dtype)
    return p


def init_conv2d(key, c_in: int, c_out: int, kernel, bias: bool = True,
                dtype=jnp.float32) -> dict:
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    fan_in = c_in * kernel[0] * kernel[1]
    bound = math.sqrt(6.0 / (fan_in + c_out * kernel[0] * kernel[1]))
    p = {"weight": jax.random.uniform(key, (c_out, c_in) + tuple(kernel), dtype, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((c_out,), dtype)
    return p


def init_norm(features: int, dtype=jnp.float32) -> dict:
    return {"weight": jnp.ones((features,), dtype), "bias": jnp.zeros((features,), dtype)}
