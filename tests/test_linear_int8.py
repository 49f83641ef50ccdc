"""Quality gate for the W8A8 MMDiT linear path (ops/linear_int8.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepv_tpu.config import MMDiTConfig
from deepv_tpu.models.mmdit import init_mmdit_params, mmdit_forward
from deepv_tpu.ops.basic import init_linear, linear
from deepv_tpu.ops.linear_int8 import (linear_int8, quantize_linear,
                                       quantize_mmdit_params)

CFG = MMDiTConfig(
    sample_size=16, patch_size=2, in_channels=14, num_layers=2,
    attention_head_dim=8, num_attention_heads=4, caption_projection_dim=32,
    pooled_projection_dim=16, pos_embed_max_size=32, joint_attention_dim=24)


def test_linear_int8_per_layer_tolerance():
    p = init_linear(jax.random.PRNGKey(0), 64, 48)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 17, 64), jnp.float32)
    exact = np.asarray(linear(x, p), np.float32)
    q = np.asarray(linear_int8(x, quantize_linear(p)), np.float32)
    rel = np.abs(q - exact) / (np.abs(exact).mean() + 1e-12)
    assert rel.mean() < 0.01 and rel.max() < 0.2, (rel.mean(), rel.max())


def test_basic_linear_dispatches_on_quantized_dict():
    p = init_linear(jax.random.PRNGKey(2), 32, 32)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 32), jnp.float32)
    qp = quantize_linear(p)
    np.testing.assert_array_equal(np.asarray(linear(x, qp)),
                                  np.asarray(linear_int8(x, qp)))


def test_quantize_mmdit_rewrites_only_block_linears():
    params = init_mmdit_params(jax.random.PRNGKey(4), CFG)
    q = quantize_mmdit_params(params)
    b0 = q["transformer_blocks"][0]
    assert "weight_int8" in b0["attn"]["to_q"]
    assert "weight_int8" in b0["ff"]["proj"]
    # accuracy-critical layers stay exact
    assert "weight_int8" not in b0["norm1"]["linear"]
    assert "weight_int8" not in q["proj_out"]
    assert "weight_int8" not in q["context_embedder"]
    # originals preserved (checkpointing path untouched)
    np.testing.assert_array_equal(
        np.asarray(b0["attn"]["to_q"]["weight"]),
        np.asarray(params["transformer_blocks"][0]["attn"]["to_q"]["weight"]))


def test_mmdit_forward_int8_deviation_bounded():
    """End-to-end forward: quantisation noise stays ~1% relative, and the
    int8 forward is NOT identical to exact (the fast path really runs)."""
    params = init_mmdit_params(jax.random.PRNGKey(5), CFG)
    qparams = quantize_mmdit_params(params)
    ks = jax.random.split(jax.random.PRNGKey(6), 4)
    x = jax.random.normal(ks[0], (2, 14, 2, 8, 8), jnp.float32)
    text = jax.random.normal(ks[1], (2, 7, CFG.joint_attention_dim), jnp.float32)
    mask = jnp.ones((2, 7), jnp.int32)
    pooled = jax.random.normal(ks[2], (2, CFG.pooled_projection_dim), jnp.float32)
    t = jnp.asarray([500.0, 500.0])

    def fwd(p):
        return mmdit_forward(CFG, p, [x], text, mask, pooled, t)

    exact = np.asarray(fwd(params), np.float32)
    q = np.asarray(fwd(qparams), np.float32)
    assert q.shape == exact.shape
    denom = np.abs(exact).mean() + 1e-12
    rel = np.abs(q - exact) / denom
    assert rel.mean() < 0.05, rel.mean()
    assert np.abs(q - exact).max() > 0  # it actually took the int8 path
