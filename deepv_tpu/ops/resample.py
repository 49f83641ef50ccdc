"""Spatial resampling ops with torch-`F.interpolate` semantics.

The pipeline depends on three resampling patterns (ref pipeline.py:226-240,
554-559; mmdit.py:977-996, 863-871):
  - exact 2x bilinear downsample (pyramid latents, history tokens): with
    half-pixel centres and no antialiasing this is exactly 2x2 mean pooling,
    which we implement directly (one reshape-mean, fuses into neighbours);
  - exact 2x nearest upsample (inter-stage latent growth): exact pixel
    duplication;
  - generic bilinear resize (positional-embedding crops): half-pixel-centre
    linear resize without antialias, matching torch ``align_corners=False``.

All ops take channels-first ``[..., h, w]`` arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def down2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear downsample; for even dims this is exactly 2x2 mean pooling
    (half-pixel centres), odd dims fall back to the generic resize."""
    *lead, h, w = x.shape
    if h % 2 or w % 2:
        return resize_bilinear(x, (h // 2, w // 2))
    x = x.reshape(*lead, h // 2, 2, w // 2, 2)
    return x.mean(axis=(-3, -1))


def up2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x nearest upsample == pixel duplication."""
    x = jnp.repeat(x, 2, axis=-2)
    return jnp.repeat(x, 2, axis=-1)


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """Generic bilinear resize, half-pixel centres, no antialias.

    Matches ``torch.nn.functional.interpolate(mode='bilinear')``.
    """
    h, w = size
    out_shape = x.shape[:-2] + (h, w)
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def resize_linear_1d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """1D linear resize over the last axis (ref mmdit.py:1310-1316)."""
    out_shape = x.shape[:-1] + (size,)
    return jax.image.resize(x, out_shape, method="linear", antialias=False)


def avg_pool2d(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping kxk average pool over the trailing two axes
    (ref pipeline.py:66 raymap downsampling)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // k, k, w // k, k)
    return x.mean(axis=(-3, -1))
