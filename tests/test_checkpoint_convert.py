"""End-to-end checkpoint conversion: synthesize an HF-style snapshot
(diffusers key names, safetensors, config.json) from tiny models, load it
through io/weights.load_checkpoint, and run forwards."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import MMDiTConfig, VAEConfig
from deepv_tpu.io.weights import load_checkpoint
from deepv_tpu.models.mmdit import init_mmdit_params, mmdit_forward
from deepv_tpu.models.vae import init_vae_params, vae_decode, vae_encode

from snapshot_utils import (flatten_with_names, write_transformer_dir,
                            write_vae_dir)


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    mcfg = MMDiTConfig.tiny()
    vcfg = VAEConfig.tiny()
    mp = init_mmdit_params(jax.random.PRNGKey(0), mcfg)
    vp = init_vae_params(jax.random.PRNGKey(1), vcfg)
    write_transformer_dir(root, mcfg, mp)
    write_vae_dir(root, vcfg, vp)
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
