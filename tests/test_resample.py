"""Resampling ops vs torch F.interpolate semantics (torch CPU as oracle)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from deepv_tpu.ops.resample import (avg_pool2d, down2x_bilinear, resize_bilinear,
                                    resize_linear_1d, up2x_nearest)


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def test_down2x_matches_torch_bilinear():
    x = rand((2, 3, 16, 24))
    ours = np.asarray(down2x_bilinear(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x), size=(8, 12), mode="bilinear").numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_up2x_matches_torch_nearest():
    x = rand((2, 3, 8, 12))
    ours = np.asarray(up2x_nearest(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest").numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_generic_bilinear_matches_torch():
    x = rand((1, 4, 24, 32))
    for size in [(6, 8), (12, 16), (5, 7)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(x), size))
        ref = F.interpolate(torch.from_numpy(x), size=size, mode="bilinear").numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_linear_1d_matches_torch():
    x = rand((1, 1, 24))
    ours = np.asarray(resize_linear_1d(jnp.asarray(x), 6))
    ref = F.interpolate(torch.from_numpy(x), size=6, mode="linear").numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_avg_pool_matches_torch():
    x = rand((3, 4, 48, 64))
    ours = np.asarray(avg_pool2d(jnp.asarray(x), 8))
    ref = F.avg_pool2d(torch.from_numpy(x), kernel_size=8, stride=8).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)
