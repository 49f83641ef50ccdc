"""Correlated 2x2 block-noise sampler for inter-stage renoising.

The reference draws each 2x2 pixel block from a 4-d multivariate normal with
covariance ``(1+gamma) I - gamma J`` in a Python loop over blocks
(ref pipeline.py:431-437) — millions of host-side distribution samples. Here
the same distribution is produced as one closed-form linear transform of iid
normals: ``noise = z @ L^T`` with ``L = cholesky((1+gamma) I - gamma J)``,
fully vectorised on device.

The covariance has eigenvalues ``1+gamma`` (multiplicity 3, orthogonal to 1)
and ``1-3*gamma`` (on the all-ones vector); with the deployed gamma=0.3333 it
is (barely) positive definite, so the Cholesky factor exists.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def block_cholesky(gamma: float) -> np.ndarray:
    """Cholesky factor of the 2x2-block covariance (static, host-side)."""
    cov = (1.0 + gamma) * np.eye(4) - gamma * np.ones((4, 4))
    return np.linalg.cholesky(cov)


def sample_block_noise(key: jax.Array, shape, gamma: float,
                       dtype=jnp.float32) -> jnp.ndarray:
    """Sample noise of shape ``[b, c, t, h, w]`` where every 2x2 spatial block
    follows N(0, (1+gamma) I - gamma J).  (ref pipeline.py:431-437)
    """
    b, c, t, h, w = shape
    L = jnp.asarray(block_cholesky(gamma), dtype=jnp.float32)
    z = jax.random.normal(key, (b, c, t, h // 2, w // 2, 4), dtype=jnp.float32)
    blocks = z @ L.T  # [..., 4] correlated within each block
    blocks = blocks.reshape(b, c, t, h // 2, w // 2, 2, 2)
    noise = blocks.transpose(0, 1, 2, 3, 5, 4, 6).reshape(b, c, t, h, w)
    return noise.astype(dtype)
