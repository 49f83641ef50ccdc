"""MMDiT tests: packed layout, mask causality, history gating, shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import MMDiTConfig
from deepv_tpu.models.mmdit import (PackedLayout, build_attention_bias,
                                    init_mmdit_params, mmdit_forward,
                                    sincos_2d, timestep_embedding)

CFG = MMDiTConfig.tiny()
B = 2
CTX = 7


@pytest.fixture(scope="module")
def params():
    return init_mmdit_params(jax.random.PRNGKey(0), CFG)


def make_inputs(clips_shapes, seed=0, ctx=CTX):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    clips = [jax.random.normal(ks[i % 8], (B, CFG.in_channels) + s, jnp.float32)
             for i, s in enumerate(clips_shapes)]
    text = jax.random.normal(ks[0], (B, ctx, CFG.joint_attention_dim))
    mask = jnp.ones((B, ctx), jnp.int32)
    pooled = jax.random.normal(ks[1], (B, CFG.pooled_projection_dim))
    t = jnp.full((B,), 500.0)
    return clips, text, mask, pooled, t


def test_forward_returns_last_clip_shape(params):
    shapes = [(1, 4, 4), (1, 8, 8), (1, 16, 16)]
    clips, text, mask, pooled, t = make_inputs(shapes)
    out = mmdit_forward(CFG, params, clips, text, mask, pooled, t)
    assert out.shape == (B, CFG.out_channels, 1, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_single_clip(params):
    clips, text, mask, pooled, t = make_inputs([(2, 8, 8)])
    out = mmdit_forward(CFG, params, clips, text, mask, pooled, t)
    assert out.shape == (B, CFG.out_channels, 2, 8, 8)


def test_layout_time_ids_and_lengths():
    layout = PackedLayout(CFG, [(1, 4, 4), (2, 8, 8)], ctx_len=5)
    p = CFG.patch_size
    assert layout.clip_tokens == [1 * 4, 2 * 16]
    assert layout.seq_len == 5 + 4 + 32
    # ctx at time 0; clip0 frame at 0; clip1 frames at 1, 2
    assert np.all(layout.time_ids[:5] == 0)
    assert np.all(layout.time_ids[5:9] == 0)
    assert np.all(layout.time_ids[9:25] == 1)
    assert np.all(layout.time_ids[25:] == 2)


def test_attention_bias_semantics():
    layout = PackedLayout(CFG, [(2, 2, 2)], ctx_len=3)
    ctx_valid = jnp.asarray([[1, 1, 0]])  # last ctx token padded
    valid = jnp.concatenate([ctx_valid, jnp.ones((1, layout.video_len), jnp.int32)], axis=1)
    bias = np.asarray(build_attention_bias(valid, layout.causal))[0, 0]
    # valid ctx -> valid ctx allowed
    assert bias[0, 1] == 0
    # valid -> padding blocked, padding -> valid blocked, padding -> padding allowed
    assert bias[0, 2] == -np.inf
    assert bias[2, 0] == -np.inf
    assert bias[2, 2] == 0
    # frame-0 video tokens (idx 3) can see ctx (time 0) but not frame 1 (idx 4)
    assert bias[3, 0] == 0
    assert bias[3, 3 + 1] == -np.inf  # second token of frame 0? idx 4 is frame0 too
    # video causality: frame 1 sees frame 0, frame 0 does not see frame 1
    f0, f1 = 3, 3 + 1  # first token of each frame (1 token per frame here? 2x2/patch2 = 1)
    assert bias[f1, f0] == 0
    assert bias[f0, f1] == -np.inf


def test_temporal_causality_behavioural(params):
    """Perturbing the FUTURE (last) clip must not change... nothing — the last
    clip is the output. Instead: perturbing a PAST clip changes the output,
    while perturbing the future noisy unit must not change what past tokens
    would produce. We verify causality directly: output for the last clip
    must be invariant to adding an extra *later* frame? Not expressible.
    Practical check: the condition clips influence the output (conditioning
    works), and a change in the last clip's own future frame does not leak
    into its first frame's prediction."""
    shapes = [(3, 8, 8)]
    clips, text, mask, pooled, t = make_inputs(shapes)
    out1 = mmdit_forward(CFG, params, clips, text, mask, pooled, t)
    # perturb only the last frame of the clip
    clips2 = [clips[0].at[:, :, -1].add(10.0)]
    out2 = mmdit_forward(CFG, params, clips2, text, mask, pooled, t)
    a, b = np.asarray(out1), np.asarray(out2)
    # frames 0 and 1 unchanged (causal), frame 2 changed
    np.testing.assert_allclose(b[:, :, 0], a[:, :, 0], atol=1e-5)
    np.testing.assert_allclose(b[:, :, 1], a[:, :, 1], atol=1e-5)
    assert np.abs(b[:, :, 2] - a[:, :, 2]).max() > 1e-3


def test_condition_clips_affect_output(params):
    shapes = [(1, 4, 4), (1, 8, 8)]
    clips, text, mask, pooled, t = make_inputs(shapes)
    out1 = mmdit_forward(CFG, params, clips, text, mask, pooled, t)
    clips2 = [clips[0] + 1.0, clips[1]]
    out2 = mmdit_forward(CFG, params, clips2, text, mask, pooled, t)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


def test_text_mask_blocks_padding_influence(params):
    clips, text, mask, pooled, t = make_inputs([(1, 8, 8)])
    out1 = mmdit_forward(CFG, params, clips, text, mask, pooled, t)
    # change embedding content of a MASKED text token -> no effect
    mask0 = mask.at[:, -2:].set(0)
    outa = mmdit_forward(CFG, params, clips, text, mask0, pooled, t)
    text2 = text.at[:, -1].add(7.0)
    outb = mmdit_forward(CFG, params, clips, text2, mask0, pooled, t)
    np.testing.assert_allclose(np.asarray(outa), np.asarray(outb), atol=1e-5)
    # but masking tokens at all changes the result vs unmasked
    assert np.abs(np.asarray(out1) - np.asarray(outa)).max() > 1e-5


def test_history_gated_by_mask(params):
    clips, text, mask, pooled, t = make_inputs([(1, 8, 8)])
    hist = jax.random.normal(jax.random.PRNGKey(9), (B, CFG.in_channels, 1, 8, 8))
    hlen = (8 // 2 // CFG.patch_size) * (8 // 2 // CFG.patch_size)
    hmask_off = jnp.zeros((B, hlen), jnp.int32)
    hmask_on = jnp.ones((B, hlen), jnp.int32)
    out_off = mmdit_forward(CFG, params, clips, text, mask, pooled, t,
                            history=hist, history_mask=hmask_off)
    out_off2 = mmdit_forward(CFG, params, clips, text, mask, pooled, t,
                             history=hist + 3.0, history_mask=hmask_off)
    # masked history content is invisible
    np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_off2), atol=1e-5)
    out_on = mmdit_forward(CFG, params, clips, text, mask, pooled, t,
                           history=hist, history_mask=hmask_on)
    assert np.abs(np.asarray(out_on) - np.asarray(out_off)).max() > 1e-5


def test_batch_rows_independent(params):
    """CFG batching correctness: row 0 result must not depend on row 1."""
    clips, text, mask, pooled, t = make_inputs([(1, 4, 4), (1, 8, 8)])
    out = mmdit_forward(CFG, params, clips, text, mask, pooled, t)
    clips2 = [c.at[1].add(5.0) for c in clips]
    out2 = mmdit_forward(CFG, params, clips2, text, mask, pooled, t)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out[0]), atol=1e-5)
    assert np.abs(np.asarray(out2[1]) - np.asarray(out[1])).max() > 1e-4


def test_timestep_embedding_properties():
    emb = np.asarray(timestep_embedding(jnp.asarray([0.0, 500.0]), 256))
    assert emb.shape == (2, 256)
    # t=0: cos part = 1, sin part = 0 (flip_sin_to_cos puts cos first)
    np.testing.assert_allclose(emb[0, :128], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 128:], 0.0, atol=1e-6)


def test_sincos_table_shape():
    tab = sincos_2d(32, 8, base_size=4)
    assert tab.shape == (64, 32)
    # rows differ (positions are distinct)
    assert np.abs(tab[0] - tab[-1]).max() > 0.1


def test_jit_and_bf16(params):
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    clips, text, mask, pooled, t = make_inputs([(1, 8, 8)])
    clips = [c.astype(jnp.bfloat16) for c in clips]
    fwd = jax.jit(lambda c, te, m, po, ts: mmdit_forward(CFG, p16, c, te, m, po, ts))
    out = fwd(clips, text.astype(jnp.bfloat16), mask, pooled.astype(jnp.bfloat16), t)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
