"""Flow-matching training step for the MMDiT.

The reference is inference-only (SURVEY.md: no training loop anywhere), but a
framework needs one: this implements the pyramid-flow objective's core —
velocity regression v = noise - data on linearly interpolated latents — as a
pure jitted step compatible with DP/TP sharding (see parallel/).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import MMDiTConfig
from ..models.mmdit import mmdit_forward


def flow_matching_loss(mcfg: MMDiTConfig, params, batch: Dict, key: jax.Array) -> jnp.ndarray:
    """MSE between predicted and true velocity on x_sigma = s*x0 + (1-s)*x1."""
    x1 = batch["latents"]                       # clean latents [b, C, t, h, w]
    b = x1.shape[0]
    k_noise, k_sigma = jax.random.split(key)
    x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
    sigma = jax.random.uniform(k_sigma, (b,), jnp.float32, 1e-4, 1.0 - 1e-4)
    s = sigma.reshape(b, 1, 1, 1, 1).astype(x1.dtype)
    xs = s * x0 + (1 - s) * x1
    v_target = (x0 - x1).astype(jnp.float32)

    v = mmdit_forward(mcfg, params, [xs],
                      batch["text_embeds"], batch["text_mask"], batch["pooled"],
                      timestep=sigma * 1000.0)
    return jnp.mean(jnp.square(v.astype(jnp.float32) - v_target))


def make_train_step(mcfg: MMDiTConfig, optimizer: optax.GradientTransformation):
    """Returns a jittable (params, opt_state, batch, key) -> (params, opt_state, loss)."""

    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(
            lambda p: flow_matching_loss(mcfg, p, batch, key))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
