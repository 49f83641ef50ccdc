"""End-to-end checkpoint conversion: synthesize an HF-style snapshot
(diffusers key names, safetensors, config.json) from tiny models, load it
through io/weights.load_checkpoint, and run forwards."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import MMDiTConfig, VAEConfig
from deepv_tpu.io.weights import load_checkpoint
from deepv_tpu.models.mmdit import init_mmdit_params, mmdit_forward
from deepv_tpu.models.vae import init_vae_params, vae_decode, vae_encode


def flatten_with_names(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_with_names(v, f"{prefix}{k}." if not isinstance(v, jnp.ndarray) else f"{prefix}{k}"))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(flatten_with_names(v, f"{prefix}{i}."))
    else:
        out[prefix] = tree
    return out


def mmdit_ckpt_names(flat):
    """our tree path -> diffusers checkpoint name (inverse of _MMDIT_RULES)."""
    out = {}
    for k, v in flat.items():
        k2 = k.replace(".ff.proj.", ".ff.net.0.proj.")
        k2 = k2.replace(".ff.out.", ".ff.net.2.")
        k2 = k2.replace(".ff_context.proj.", ".ff_context.net.0.proj.")
        k2 = k2.replace(".ff_context.out.", ".ff_context.net.2.")
        k2 = k2.replace(".attn.to_out.", ".attn.to_out.0.")
        out[k2] = v
    return out


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    from safetensors.numpy import save_file

    root = tmp_path_factory.mktemp("ckpt")
    mcfg = MMDiTConfig.tiny()
    vcfg = VAEConfig.tiny()

    mp = init_mmdit_params(jax.random.PRNGKey(0), mcfg)
    vp = init_vae_params(jax.random.PRNGKey(1), vcfg)

    tdir = root / "transformer"
    tdir.mkdir()
    flat = {k: np.asarray(v) for k, v in flatten_with_names(mp).items()}
    save_file(mmdit_ckpt_names(flat), str(tdir / "diffusion_pytorch_model.safetensors"))
    with open(tdir / "config.json", "w") as f:
        json.dump({k: getattr(mcfg, k) for k in (
            "sample_size", "patch_size", "in_channels", "num_layers",
            "attention_head_dim", "num_attention_heads", "caption_projection_dim",
            "pooled_projection_dim", "pos_embed_max_size", "joint_attention_dim")}, f)

    vdir = root / "causal_video_vae"
    vdir.mkdir()
    vflat = {}
    for k, v in flatten_with_names(vp).items():
        k2 = k
        if k2.startswith("encoder.quant_conv."):
            k2 = k2[len("encoder."):]
        if k2.startswith("decoder.post_quant_conv."):
            k2 = k2[len("decoder."):]
        k2 = k2.replace(".downsampler.", ".downsamplers.0.conv.")
        k2 = k2.replace(".temporal_downsampler.", ".temporal_downsamplers.0.conv.")
        k2 = k2.replace(".upsampler.", ".upsamplers.0.conv.")
        k2 = k2.replace(".temporal_upsampler.", ".temporal_upsamplers.0.conv.")
        k2 = k2.replace(".to_out.", ".to_out.0.")
        # CausalConv3d wrapper: 5D weights live under <name>.conv.
        leafname = k2.rsplit(".", 1)[-1]
        if v.ndim == 5:
            k2 = k2[: -len("." + leafname)] + ".conv." + leafname
        vflat[k2] = np.asarray(v)
    # second pass: biases whose sibling weight moved under .conv follow it
    moved = {}
    for k, v in list(vflat.items()):
        if k.endswith(".conv.weight"):
            base = k[: -len(".conv.weight")]
            bias_key = base + ".bias"
            if bias_key in vflat:
                moved[base + ".conv.bias"] = vflat.pop(bias_key)
    vflat.update(moved)
    save_file(vflat, str(vdir / "diffusion_pytorch_model.safetensors"))
    with open(vdir / "config.json", "w") as f:
        json.dump({
            "encoder_out_channels": vcfg.encoder_out_channels,
            "encoder_layers_per_block": list(vcfg.encoder_layers_per_block),
            "encoder_block_out_channels": list(vcfg.encoder_block_out_channels),
            "encoder_norm_num_groups": vcfg.encoder_norm_num_groups,
            "decoder_in_channels": vcfg.decoder_in_channels,
            "decoder_layers_per_block": list(vcfg.decoder_layers_per_block),
            "decoder_block_out_channels": list(vcfg.decoder_block_out_channels),
            "decoder_norm_num_groups": vcfg.decoder_norm_num_groups,
            "sample_size": vcfg.sample_size,
        }, f)
    return str(root), mp, vp, mcfg, vcfg


def test_load_checkpoint_roundtrip(snapshot):
    root, mp, vp, mcfg, vcfg = snapshot
    lcfg, lvcfg, params = load_checkpoint(root, dtype=jnp.float32)
    assert lcfg.num_layers == mcfg.num_layers
    assert lvcfg.encoder_block_out_channels == vcfg.encoder_block_out_channels

    # every leaf equal to the original
    orig = flatten_with_names(mp)
    conv = flatten_with_names(params["mmdit"])
    assert set(orig) == set(conv), (set(orig) ^ set(conv))
    for k in orig:
        np.testing.assert_array_equal(np.asarray(orig[k]), np.asarray(conv[k]), err_msg=k)

    origv = flatten_with_names(vp)
    convv = flatten_with_names(params["vae"])
    assert set(origv) == set(convv), sorted(set(origv) ^ set(convv))[:8]
    for k in origv:
        np.testing.assert_array_equal(np.asarray(origv[k]), np.asarray(convv[k]), err_msg=k)


def test_converted_models_run(snapshot):
    root, mp, vp, mcfg, vcfg = snapshot
    lcfg, lvcfg, params = load_checkpoint(root, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 9, 32, 32))
    m = vae_encode(lvcfg, params["vae"], x)
    ref = vae_encode(vcfg, {"encoder": vp["encoder"]}, x)
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref), atol=1e-6)
