"""Checkpoint key inventory vs the reference module naming.

The old converter test synthesized its snapshot from the inverse of the
converter's own rules — circular. These tests instead derive the expected
diffusers state-dict key inventory (names AND shapes) from the reference
module constructors:

  - MMDiT attribute tree: ref mmdit.py:1160-1250 (pos_embed=PatchEmbed3D with
    proj/proj_history convs + persistent pos_embed buffer ref mmdit.py:794-797,
    825-830; time_text_embed=CombinedTimestepConditionEmbeddings
    ref mmdit.py:739-753 with TimestepEmbedding/TextProjection linear_1/2;
    transformer_blocks.N per ref mmdit.py:327-433 with diffusers FeedForward
    net.0.proj / net.2 naming ref mmdit.py:88-113 and attention to_out.0
    ref mmdit.py:249-255; norm_out/proj_out ref mmdit.py:1239-1240)
  - CausalVideoVAE attribute tree: ref vae.py:630-696 (encoder),
    697-760 (decoder), 823-824 (quant convs), with CausalConv3d wrapping its
    nn.Conv3d as ``.conv`` (ref vae.py:202), resnet norm1/conv1/norm2/conv2/
    conv_shortcut (ref vae.py:278-295), down/up-samplers as single-element
    ModuleLists (ref vae.py:497-520, 563-570), and the diffusers Attention
    mid-block (group_norm/to_q/to_k/to_v/to_out.0, ref vae.py:439-445)

then assert that ``convert_mmdit_state`` / ``convert_vae_state`` consume
EVERY key and produce exactly the parameter tree ``init_*_params`` builds —
same paths, same shapes, no leftovers, nothing missing.
"""

import numpy as np
import jax
import jax.numpy as jnp

from deepv_tpu.config import MMDiTConfig, VAEConfig
from deepv_tpu.io.weights import convert_mmdit_state, convert_vae_state
from deepv_tpu.models.mmdit import init_mmdit_params
from deepv_tpu.models.vae import init_vae_params


def _flatten_shapes(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_shapes(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten_shapes(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = tuple(tree.shape)
    return out


# ---------------------------------------------------------------------------
# reference state-dict inventories
# ---------------------------------------------------------------------------

def reference_mmdit_state(cfg: MMDiTConfig) -> dict:
    """Expected ``MMDiT.state_dict()`` keys+shapes (ref mmdit.py:1160-1250)."""
    D = cfg.inner_dim
    C, p = cfg.in_channels, cfg.patch_size
    M = cfg.pos_embed_max_size
    hd = cfg.attention_head_dim
    keys = {}

    def lin(name, out_f, in_f):
        keys[f"{name}.weight"] = (out_f, in_f)
        keys[f"{name}.bias"] = (out_f,)

    # PatchEmbed3D (ref mmdit.py:794-830): proj + proj_history Conv2d,
    # persistent sincos buffer
    keys["pos_embed.proj.weight"] = (D, C, p, p)
    keys["pos_embed.proj.bias"] = (D,)
    keys["pos_embed.proj_history.weight"] = (D, C, p, p)
    keys["pos_embed.proj_history.bias"] = (D,)
    keys["pos_embed.pos_embed"] = (1, M * M, D)

    # CombinedTimestepConditionEmbeddings (ref mmdit.py:739-753)
    lin("time_text_embed.timestep_embedder.linear_1", D, 256)
    lin("time_text_embed.timestep_embedder.linear_2", D, D)
    lin("time_text_embed.text_embedder.linear_1", D, cfg.pooled_projection_dim)
    lin("time_text_embed.text_embedder.linear_2", D, D)
    lin("context_embedder", cfg.caption_projection_dim, cfg.joint_attention_dim)

    for i in range(cfg.num_layers):
        last = i == cfg.num_layers - 1
        b = f"transformer_blocks.{i}"
        lin(f"{b}.norm1.linear", 6 * D, D)
        # last block: AdaLayerNormContinuous (2D), else AdaLayerNormZero (6D)
        lin(f"{b}.norm1_context.linear", (2 if last else 6) * D, D)
        for q in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{b}.attn.{q}", D, D)
        for n in ("norm_q", "norm_k", "norm_add_q", "norm_add_k"):
            keys[f"{b}.attn.{n}.weight"] = (hd,)
        lin(f"{b}.attn.to_out.0", D, D)        # to_out = [Linear, Dropout]
        if not last:
            lin(f"{b}.attn.to_add_out", D, D)
        lin(f"{b}.ff.net.0.proj", 4 * D, D)    # GELU module's proj linear
        lin(f"{b}.ff.net.2", D, 4 * D)
        if not last:
            lin(f"{b}.ff_context.net.0.proj", 4 * D, D)
            lin(f"{b}.ff_context.net.2", D, 4 * D)

    lin("norm_out.linear", 2 * D, D)
    lin("proj_out", p * p * cfg.out_channels, D)
    return {k: np.zeros(s, np.float32) for k, s in keys.items()}


def _resnet_keys(keys, base, c_in, c_out):
    """CausalResnetBlock3D (ref vae.py:278-295)."""
    keys[f"{base}.norm1.weight"] = (c_in,)
    keys[f"{base}.norm1.bias"] = (c_in,)
    keys[f"{base}.conv1.conv.weight"] = (c_out, c_in, 3, 3, 3)
    keys[f"{base}.conv1.conv.bias"] = (c_out,)
    keys[f"{base}.norm2.weight"] = (c_out,)
    keys[f"{base}.norm2.bias"] = (c_out,)
    keys[f"{base}.conv2.conv.weight"] = (c_out, c_out, 3, 3, 3)
    keys[f"{base}.conv2.conv.bias"] = (c_out,)
    if c_in != c_out:
        keys[f"{base}.conv_shortcut.conv.weight"] = (c_out, c_in, 1, 1, 1)
        keys[f"{base}.conv_shortcut.conv.bias"] = (c_out,)


def _midblock_keys(keys, base, ch):
    """CausalUNetMidBlock2D (ref vae.py:412-458): resnet, attn, resnet."""
    _resnet_keys(keys, f"{base}.resnets.0", ch, ch)
    _resnet_keys(keys, f"{base}.resnets.1", ch, ch)
    a = f"{base}.attentions.0"
    keys[f"{a}.group_norm.weight"] = (ch,)
    keys[f"{a}.group_norm.bias"] = (ch,)
    for q in ("to_q", "to_k", "to_v"):
        keys[f"{a}.{q}.weight"] = (ch, ch)
        keys[f"{a}.{q}.bias"] = (ch,)
    keys[f"{a}.to_out.0.weight"] = (ch, ch)
    keys[f"{a}.to_out.0.bias"] = (ch,)


def reference_vae_state(cfg: VAEConfig) -> dict:
    """Expected ``CausalVideoVAE.state_dict()`` keys+shapes
    (ref vae.py:630-760, 823-824)."""
    keys = {}
    z = cfg.encoder_out_channels

    # --- encoder (ref vae.py:631-696) ---
    ech = cfg.encoder_block_out_channels
    keys["encoder.conv_in.conv.weight"] = (ech[0], cfg.encoder_in_channels, 3, 3, 3)
    keys["encoder.conv_in.conv.bias"] = (ech[0],)
    c_prev = ech[0]
    for i, c_out in enumerate(ech):
        for j in range(cfg.encoder_layers_per_block[i]):
            _resnet_keys(keys, f"encoder.down_blocks.{i}.resnets.{j}",
                         c_prev if j == 0 else c_out, c_out)
        if cfg.encoder_spatial_down_sample[i]:
            keys[f"encoder.down_blocks.{i}.downsamplers.0.conv.conv.weight"] = \
                (c_out, c_out, 3, 3, 3)
            keys[f"encoder.down_blocks.{i}.downsamplers.0.conv.conv.bias"] = (c_out,)
        if cfg.encoder_temporal_down_sample[i]:
            keys[f"encoder.down_blocks.{i}.temporal_downsamplers.0.conv.conv.weight"] = \
                (c_out, c_out, 3, 3, 3)
            keys[f"encoder.down_blocks.{i}.temporal_downsamplers.0.conv.conv.bias"] = (c_out,)
        c_prev = c_out
    _midblock_keys(keys, "encoder.mid_block", ech[-1])
    keys["encoder.conv_norm_out.weight"] = (ech[-1],)
    keys["encoder.conv_norm_out.bias"] = (ech[-1],)
    keys["encoder.conv_out.conv.weight"] = (2 * z, ech[-1], 3, 3, 3)
    keys["encoder.conv_out.conv.bias"] = (2 * z,)

    # --- decoder (ref vae.py:697-760) ---
    dch = cfg.decoder_block_out_channels
    rev = list(reversed(dch))
    keys["decoder.conv_in.conv.weight"] = (dch[-1], cfg.decoder_in_channels, 3, 3, 3)
    keys["decoder.conv_in.conv.bias"] = (dch[-1],)
    _midblock_keys(keys, "decoder.mid_block", dch[-1])
    c_prev = rev[0]
    for i, c_out in enumerate(rev):
        for j in range(cfg.decoder_layers_per_block[i]):
            _resnet_keys(keys, f"decoder.up_blocks.{i}.resnets.{j}",
                         c_prev if j == 0 else c_out, c_out)
        if cfg.decoder_spatial_up_sample[i]:
            keys[f"decoder.up_blocks.{i}.upsamplers.0.conv.conv.weight"] = \
                (4 * c_out, c_out, 3, 3, 3)
            keys[f"decoder.up_blocks.{i}.upsamplers.0.conv.conv.bias"] = (4 * c_out,)
        if cfg.decoder_temporal_up_sample[i]:
            keys[f"decoder.up_blocks.{i}.temporal_upsamplers.0.conv.conv.weight"] = \
                (2 * c_out, c_out, 3, 3, 3)
            keys[f"decoder.up_blocks.{i}.temporal_upsamplers.0.conv.conv.bias"] = (2 * c_out,)
        c_prev = c_out
    keys["decoder.conv_norm_out.weight"] = (dch[0],)
    keys["decoder.conv_norm_out.bias"] = (dch[0],)
    keys["decoder.conv_out.conv.weight"] = (cfg.decoder_out_channels, dch[0], 3, 3, 3)
    keys["decoder.conv_out.conv.bias"] = (cfg.decoder_out_channels,)

    # --- top-level quant convs (ref vae.py:823-824) ---
    keys["quant_conv.conv.weight"] = (2 * z, 2 * z, 1, 1, 1)
    keys["quant_conv.conv.bias"] = (2 * z,)
    keys["post_quant_conv.conv.weight"] = (cfg.decoder_in_channels, z, 1, 1, 1)
    keys["post_quant_conv.conv.bias"] = (cfg.decoder_in_channels,)
    return {k: np.zeros(s, np.float32) for k, s in keys.items()}


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def _assert_trees_identical(converted, expected, what):
    got = _flatten_shapes(converted)
    want = _flatten_shapes(expected)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"{what}: converter left these params unfilled: {missing}"
    assert not extra, f"{what}: converter produced unexpected paths: {extra}"
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"{what}: shape mismatches (got, want): {bad}"


def test_mmdit_converter_consumes_reference_inventory():
    cfg = MMDiTConfig.tiny()
    state = reference_mmdit_state(cfg)
    converted = convert_mmdit_state(state, dtype=jnp.float32)
    expected = init_mmdit_params(jax.random.PRNGKey(0), cfg)
    _assert_trees_identical(converted, expected, "mmdit")


def test_mmdit_converter_deployment_config_shapes():
    """Full 24-layer deployment config: key count and a shape spot-check
    without materialising 2B params (zeros are cheap)."""
    cfg = MMDiTConfig()
    state = reference_mmdit_state(cfg)
    converted = convert_mmdit_state(state, dtype=jnp.float32)
    got = _flatten_shapes(converted)
    assert len(got) == len(state)
    assert got["transformer_blocks.23.norm1_context.linear.weight"] == \
        (2 * cfg.inner_dim, cfg.inner_dim)
    assert "transformer_blocks.23.attn.to_add_out.weight" not in got
    assert got["proj_out.weight"] == (cfg.patch_size ** 2 * cfg.in_channels,
                                      cfg.inner_dim)


def test_vae_converter_consumes_reference_inventory():
    cfg = VAEConfig.tiny()
    state = reference_vae_state(cfg)
    converted = convert_vae_state(state, dtype=jnp.float32)
    expected = init_vae_params(jax.random.PRNGKey(0), cfg)
    _assert_trees_identical(converted, expected, "vae")


def test_vae_converter_deployment_config():
    cfg = VAEConfig()   # deployed topology: 8x spatial AND 8x temporal
    state = reference_vae_state(cfg)
    converted = convert_vae_state(state, dtype=jnp.float32)
    expected = init_vae_params(jax.random.PRNGKey(0), cfg)
    _assert_trees_identical(converted, expected, "vae-deploy")
