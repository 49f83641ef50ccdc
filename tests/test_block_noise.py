"""Correlated block-noise sampler tests: moments match the target law."""

import numpy as np
import jax

from deepv_tpu.ops.block_noise import block_cholesky, sample_block_noise


def test_cholesky_reconstructs_covariance():
    gamma = 0.3333
    L = block_cholesky(gamma)
    cov = L @ L.T
    expect = (1 + gamma) * np.eye(4) - gamma * np.ones((4, 4))
    np.testing.assert_allclose(cov, expect, atol=1e-10)


def test_sample_moments():
    gamma = 0.3333
    key = jax.random.PRNGKey(0)
    noise = np.asarray(sample_block_noise(key, (2, 64, 4, 32, 32), gamma))
    assert noise.shape == (2, 64, 4, 32, 32)

    # collect all 2x2 blocks as 4-vectors in (p, q) order
    blocks = noise.reshape(2, 64, 4, 16, 2, 16, 2).transpose(0, 1, 2, 3, 5, 4, 6)
    vecs = blocks.reshape(-1, 4)
    emp_cov = np.cov(vecs.T)
    expect = (1 + gamma) * np.eye(4) - gamma * np.ones((4, 4))
    np.testing.assert_allclose(emp_cov, expect, atol=0.02)
    assert abs(vecs.mean()) < 0.01


def test_block_layout_is_spatial_2x2():
    """Within-block correlation must be between spatially adjacent pixels."""
    gamma = 0.3333
    key = jax.random.PRNGKey(1)
    noise = np.asarray(sample_block_noise(key, (1, 4096, 1, 8, 8), gamma))[0, :, 0]
    # pixels (0,0) and (0,1) share a block -> correlation ~ -gamma/(1+gamma)
    a = noise[:, 0, 0]
    b = noise[:, 0, 1]
    corr = np.corrcoef(a, b)[0, 1]
    assert corr < -0.1
    # pixels (0,1) and (0,2) are in different blocks -> near zero
    c = noise[:, 0, 2]
    corr2 = np.corrcoef(b, c)[0, 1]
    assert abs(corr2) < 0.05
