"""int8 conv path: quantisation error bounds, dispatch gating, decoder run."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deepv_tpu.config import VAEConfig
from deepv_tpu.models.vae import decoder_apply, init_vae_params
from deepv_tpu.ops.basic import conv3d
from deepv_tpu.ops.causal_conv import causal_conv3d
from deepv_tpu.ops.conv_int8 import conv3d_int8, supports_int8


def _params(key, co, ci):
    kw, kb = jax.random.split(key)
    return {"weight": jax.random.normal(kw, (co, ci, 3, 3, 3)) * 0.05,
            "bias": jax.random.normal(kb, (co,)) * 0.01}


def test_int8_matches_f32_within_quant_noise():
    p = _params(jax.random.PRNGKey(0), 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 256, 32))
    ref = conv3d(x, p, padding=((2, 0), (1, 1), (1, 1)))
    got = conv3d_int8(x, p)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    scale = float(np.abs(np.asarray(ref)).max())
    # symmetric 8-bit: worst-case relative error ~ (1/127) amplified by the
    # 27*ci-tap contraction's noise accumulation — a few percent of range
    assert err.max() / scale < 0.05, err.max() / scale
    assert err.mean() / scale < 0.005


def test_quantize_conv_weights_precompute():
    """Precomputed int8 weights give bit-identical output to the on-the-fly
    quantisation path."""
    from deepv_tpu.ops.conv_int8 import quantize_conv_weights
    p = _params(jax.random.PRNGKey(9), 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 8, 2, 256, 16))
    a = conv3d_int8(x, p)
    b = conv3d_int8(x, quantize_conv_weights(p))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vae_config_rejects_bad_conv_impl():
    import pytest
    with pytest.raises(ValueError):
        VAEConfig(conv_impl="IGEMM")


def test_int8_dispatch_gating():
    # below MIN_H the int8 impl must fall back to the exact xla path
    p = _params(jax.random.PRNGKey(2), 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 2, 64, 32))
    assert not supports_int8(p["weight"].shape, (1, 1, 1), 64)
    y_int8, _ = causal_conv3d(x, p, None, mode="full", impl="int8")
    y_xla, _ = causal_conv3d(x, p, None, mode="full", impl="xla")
    np.testing.assert_array_equal(np.asarray(y_int8), np.asarray(y_xla))
    # at/above MIN_H it quantises (different, but close)
    x2 = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 2, 256, 16))
    assert supports_int8(p["weight"].shape, (1, 1, 1), 256)
    y8, _ = causal_conv3d(x2, p, None, mode="full", impl="int8")
    yx, _ = causal_conv3d(x2, p, None, mode="full", impl="xla")
    d = np.abs(np.asarray(y8) - np.asarray(yx))
    assert 0 < d.max() < 0.05 * np.abs(np.asarray(yx)).max()


def test_int8_chunked_close_to_full():
    """Dynamic per-window activation scales make chunked int8 differ from
    full int8 only by quantisation noise, and both stay close to f32."""
    p = _params(jax.random.PRNGKey(5), 4, 4)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 5, 256, 16))
    full, _ = causal_conv3d(x, p, None, mode="full", impl="int8")
    y0, c = causal_conv3d(x[:, :, :2], p, None, mode="init", impl="int8")
    y1, _ = causal_conv3d(x[:, :, 2:], p, c, mode="cont", impl="int8")
    chunked = jnp.concatenate([y0, y1], axis=2)
    scale = float(np.abs(np.asarray(full)).max())
    assert np.abs(np.asarray(chunked) - np.asarray(full)).max() / scale < 0.05


def test_int8_decoder_runs():
    """A decoder pass with conv_impl="int8" runs and stays close to the
    exact path (tiny config upsampled enough to cross MIN_H at the top)."""
    cfg = dataclasses.replace(VAEConfig.tiny(), conv_impl="int8")
    params = init_vae_params(jax.random.PRNGKey(7), VAEConfig.tiny())
    z = jax.random.normal(jax.random.PRNGKey(8),
                          (1, cfg.encoder_out_channels, 2, 40, 4))
    ref_cfg = VAEConfig.tiny()
    want, _ = decoder_apply(ref_cfg, params["decoder"], z, mode="full")
    got, _ = decoder_apply(cfg, params["decoder"], z, mode="full")
    assert got.shape == want.shape
    scale = float(np.abs(np.asarray(want)).max())
    assert np.abs(np.asarray(got) - np.asarray(want)).max() / scale < 0.2
    assert np.isfinite(np.asarray(got)).all()


def test_pipeline_precomputes_int8_weights():
    """conv_impl="int8" quantises the decoder tree once at construction."""
    from deepv_tpu.ops.conv_int8 import quantize_vae_decoder
    params = init_vae_params(jax.random.PRNGKey(11), VAEConfig.tiny())
    qd = quantize_vae_decoder(params["decoder"])
    assert "weight_int8" in qd["conv_in"]
    assert qd["conv_in"]["weight_int8"].dtype == jnp.int8
    assert "weight_int8" not in qd["post_quant_conv"]   # 1x1x1: not eligible
    # outputs unchanged vs on-the-fly quantisation
    cfg = dataclasses.replace(VAEConfig.tiny(), conv_impl="int8")
    z = jax.random.normal(jax.random.PRNGKey(12),
                          (1, cfg.encoder_out_channels, 2, 40, 4))
    a, _ = decoder_apply(cfg, params["decoder"], z, mode="full")
    b, _ = decoder_apply(cfg, qd, z, mode="full")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
