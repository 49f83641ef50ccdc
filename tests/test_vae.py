"""Causal video VAE tests: chunked == full equivalence, tiling, shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import VAEConfig
from deepv_tpu.models.vae import (chunk_decode, chunk_encode, decoder_apply,
                                  encoder_apply, gaussian_mode, gaussian_sample,
                                  init_vae_params, vae_decode, vae_encode)

CFG = VAEConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_vae_params(jax.random.PRNGKey(0), CFG)


def rand_video(t, h=32, w=32, c=3, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (1, c, t, h, w), jnp.float32)


def test_encode_shape_57_to_8(params):
    x = rand_video(57)
    m = vae_encode(CFG, params, x)
    assert m.shape == (1, 2 * CFG.encoder_out_channels, 8, 4, 4)


def test_encode_shape_25_to_4(params):
    x = rand_video(25)
    m = vae_encode(CFG, params, x)
    assert m.shape[2] == 4


def test_encode_shape_1_to_1(params):
    x = rand_video(1)
    m = vae_encode(CFG, params, x)
    assert m.shape[2] == 1


def test_decode_shape_8_to_57(params):
    z = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.encoder_out_channels, 8, 4, 4))
    y = vae_decode(CFG, params, z)
    assert y.shape == (1, 3, 57, 32, 32)


def test_chunked_encode_equals_full(params):
    x = rand_video(57)
    full = vae_encode(CFG, params, x)
    chunked = vae_encode(CFG, params, x, temporal_chunk=True, window_size=16)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1.5e-3, rtol=1e-2)


def test_chunked_decode_equals_full(params):
    """Run in float64: random-init groupnorm chains amplify rounding noise
    ~1e5x in f32 (semantics are exact — f64 agrees to ~1e-6)."""
    with jax.enable_x64():
        p64 = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        z = jax.random.normal(jax.random.PRNGKey(2),
                              (1, CFG.encoder_out_channels, 8, 4, 4), jnp.float64)
        full = vae_decode(CFG, p64, z)
        for window in (1, 2):
            chunked = vae_decode(CFG, p64, z, temporal_chunk=True, window_size=window)
            assert chunked.shape == full.shape
            np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-5)


def test_chunked_encode_irregular_tail(params):
    # 41 = 17 + 16 + 8 exercises the trailing partial window (ref vae.py:875-876)
    x = rand_video(41)
    full = vae_encode(CFG, params, x)
    chunked = vae_encode(CFG, params, x, temporal_chunk=True, window_size=16)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1.5e-3, rtol=1e-2)


def test_tiled_decode_structure(params):
    """Tiling is approximate by construction (tiles see zero-padded borders,
    same as the reference); assert structure, determinism, and the fallback:
    a tile covering the whole plane must be bit-identical to untiled."""
    z = jax.random.normal(jax.random.PRNGKey(3), (1, CFG.encoder_out_channels, 2, 8, 8))
    full = vae_decode(CFG, params, z)
    tiled = vae_decode(CFG, params, z, use_tiling=True, tile_sample_min_size=32)
    assert tiled.shape == full.shape
    tiled2 = vae_decode(CFG, params, z, use_tiling=True, tile_sample_min_size=32)
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(tiled2))
    # tile >= plane: the tiling branch is skipped entirely (ref vae.py:890)
    big = vae_decode(CFG, params, z, use_tiling=True, tile_sample_min_size=64)
    np.testing.assert_array_equal(np.asarray(big), np.asarray(full))


def test_blend_seams_exact():
    """Seam blend math (ref vae.py:942-952) on synthetic constant tiles."""
    from deepv_tpu.models.vae import _blend_h, _blend_v
    a = jnp.zeros((1, 1, 1, 8, 8))
    b = jnp.ones((1, 1, 1, 8, 8))
    out = _blend_v(a, b, 4)
    # rows 0..3 of b become 0*(1-y/4) + 1*(y/4) = y/4
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, :4, 0]), [0, 0.25, 0.5, 0.75], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 4:, 0]), 1.0)
    out = _blend_h(a, b, 4)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0, :4]), [0, 0.25, 0.5, 0.75], atol=1e-6)


def test_tiled_encode_shape(params):
    x = rand_video(9, h=64, w=64)
    m = vae_encode(CFG, params, x, use_tiling=True, tile_sample_min_size=32)
    assert m.shape == (1, 2 * CFG.encoder_out_channels, 2, 8, 8)


def test_tiled_chunked_decode_matches_reference_combination(params):
    """The pipeline's decode path: tiling + temporal chunking together
    (ref pipeline.py:713)."""
    z = jax.random.normal(jax.random.PRNGKey(4), (1, CFG.encoder_out_channels, 3, 8, 8))
    a = vae_decode(CFG, params, z, use_tiling=True, tile_sample_min_size=32)
    b = vae_decode(CFG, params, z, use_tiling=True, tile_sample_min_size=32,
                   temporal_chunk=True, window_size=1)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1.5e-3, rtol=1e-2)


def test_gaussian_sample_and_mode():
    moments = jnp.concatenate([
        jnp.full((1, 4, 2, 3, 3), 1.5),
        jnp.full((1, 4, 2, 3, 3), -40.0),  # tiny variance after clamp at -30
    ], axis=1)
    mode = gaussian_mode(moments)
    np.testing.assert_allclose(np.asarray(mode), 1.5)
    s = gaussian_sample(moments, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s), 1.5, atol=1e-3)


def test_encoder_channels_match_config(params):
    m, _ = encoder_apply(CFG, params["encoder"], rand_video(9))
    assert m.shape[1] == 2 * CFG.encoder_out_channels


def test_decoder_bf16(params):
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    z = jax.random.normal(jax.random.PRNGKey(5), (1, CFG.encoder_out_channels, 2, 4, 4), jnp.bfloat16)
    y = vae_decode(CFG, p16, z)
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, dtype=np.float32)).all()
