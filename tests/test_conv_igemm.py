"""Implicit-GEMM conv kernel vs the XLA reference conv (interpret mode on
CPU; the on-chip compiled parity + perf check lives in scripts/bench_conv.py
and the bench smoke)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.ops import conv_igemm
from deepv_tpu.ops.basic import conv3d, init_conv3d


@pytest.fixture(autouse=True)
def interpret_mode():
    conv_igemm._INTERPRET[0] = True
    yield
    conv_igemm._INTERPRET[0] = False


@pytest.mark.parametrize("b,ci,co,t,h,w", [
    (1, 128, 128, 2, 8, 8),
    (2, 128, 256, 1, 4, 8),
    (1, 256, 128, 3, 8, 16),
])
def test_igemm_matches_conv3d_full_mode(b, ci, co, t, h, w):
    p = init_conv3d(jax.random.PRNGKey(0), ci, co, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, ci, t, h, w), jnp.float32)
    ref = conv3d(x, p, padding=((2, 0), (1, 1), (1, 1)))
    out = conv_igemm.conv3d_igemm(x, p, time_pad=2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_igemm_matches_conv3d_cont_mode():
    """time_pad=0: the caller has already concatenated the 2 cache frames."""
    ci = co = 128
    p = init_conv3d(jax.random.PRNGKey(0), ci, co, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, ci, 4, 8, 8), jnp.float32)
    ref = conv3d(x, p, padding=((0, 0), (1, 1), (1, 1)))
    out = conv_igemm.conv3d_igemm(x, p, time_pad=0)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_supports_predicate():
    assert conv_igemm.supports_igemm((128, 256, 3, 3, 3), (1, 1, 1),
                                     jnp.bfloat16, 48, 64)
    assert not conv_igemm.supports_igemm((128, 256, 3, 3, 3), (1, 2, 2),
                                         jnp.bfloat16, 48, 64)
    assert not conv_igemm.supports_igemm((128, 3, 3, 3, 3), (1, 1, 1),
                                         jnp.bfloat16, 48, 64)
    assert not conv_igemm.supports_igemm((128, 128, 1, 1, 1), (1, 1, 1),
                                         jnp.bfloat16, 48, 64)
