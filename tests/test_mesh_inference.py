"""Mesh-aware deployment surface (VERDICT r2 #1): the full inference rollout
with ``InferencePipeline(mesh=...)`` — TP-sharded MMDiT denoise + spatial-CP
VAE encode/decode — must equal the single-device rollout.

The reference has no runnable multi-device inference (its CP scaffolding is
dormant, ref vae.py:22-153); this pins the rebuild's claim that the sharded
deployment program computes the same function.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.actions import action_vocabulary, prepare_motion_prompts
from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
from deepv_tpu.io.text_embeds import random_text_embeds
from deepv_tpu.models.mmdit import init_mmdit_params
from deepv_tpu.models.vae import init_vae_params
from deepv_tpu.parallel.mesh import make_mesh
from deepv_tpu.pipeline import InferencePipeline

# latent H = 8: divisible by the pyramid's 4x downsample * patch 2 AND by the
# 4 CP shards; pixel H = 64 divides 4 shards * the VAE's 8x downsample
H, W = 64, 64


def build_pipeline(dtype, mesh=None):
    vcfg = VAEConfig.tiny()
    # in_channels = 2*z + raymap = 2*4 + 6 = 14
    mcfg = MMDiTConfig(
        sample_size=16, patch_size=2, in_channels=14, num_layers=2,
        attention_head_dim=8, num_attention_heads=4,
        caption_projection_dim=32, pooled_projection_dim=16,
        pos_embed_max_size=32, joint_attention_dim=24,
    )
    params = {
        "mmdit": init_mmdit_params(jax.random.PRNGKey(0), mcfg),
        "vae": init_vae_params(jax.random.PRNGKey(1), vcfg),
    }
    params = jax.tree.map(lambda a: a.astype(dtype), params)
    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    return InferencePipeline(PipelineConfig(), mcfg, vcfg, params, embeds,
                             dtype=dtype, mesh=mesh)


def make_batch(prompt):
    img = jax.random.uniform(jax.random.PRNGKey(7), (1, 3, H, W),
                             minval=-1, maxval=1).astype(jnp.float32)
    return {"img": img,
            "prompt": np.array(prepare_motion_prompts("action", prompt)),
            "prompt_type": "action"}


def test_mesh_rollout_matches_single_device_f64():
    """One full chunk on a 4-way mesh == single device, in f64 (the PRNG
    stream is identical, so the only degrees of freedom are the TP matmul
    reassociation and the CP psum'd group-norm — both ~1e-12 in f64)."""
    with jax.enable_x64():
        batch = make_batch("(FN)(FN)(SR)(SL)(FN)(FN)(FN)")
        ref = build_pipeline(jnp.float64).generate(batch, seed=5)
        mesh = make_mesh((4,), ("tp",))
        out = build_pipeline(jnp.float64, mesh=mesh).generate(batch, seed=5)
        np.testing.assert_allclose(np.asarray(out["pred_img"]),
                                   np.asarray(ref["pred_img"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["pred_disparity"]),
                                   np.asarray(ref["pred_disparity"]), atol=1e-6)
        # poses decode through raymap_to_camera's normalise/cross/FoV chain,
        # which amplifies the TP matmul-reassociation noise ~10x over the
        # pixel path (measured: max |Δ| ≈ 2e-6 while pixels hold 1e-6)
        np.testing.assert_allclose(np.asarray(out["trans3d"]),
                                   np.asarray(ref["trans3d"]), atol=1e-5)


def test_mesh_interactive_session_matches_single_device():
    """The serving layer works on a mesh pipeline: an InteractiveSession on
    a 4-way mesh steps through one chunk and matches the single-device
    session's frames (f64). This is the multi-chip deployment surface the
    server (`serve.py --tp_shards`) exposes."""
    from deepv_tpu.serve import InteractiveSession

    with jax.enable_x64():
        batch = make_batch("(FN)(FN)")
        actions = InteractiveSession.actions_from_prompt_list(
            PipelineConfig(), list(batch["prompt"]))

        def roll(mesh):
            sess = InteractiveSession(build_pipeline(jnp.float64, mesh=mesh))
            sess.start(batch["img"], seed=11)
            return [np.asarray(sess.step(a)["rgb"]) for a in actions]

        ref = roll(None)
        out = roll(make_mesh((4,), ("tp",)))
        for a, b in zip(out, ref):
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_mesh_multichunk_rollout_runs():
    """The chunk boundary (3-row CFG with retrieved history, overlap carry,
    pose chaining) executes under the mesh end-to-end."""
    mesh = make_mesh((4,), ("tp",))
    pipe = build_pipeline(jnp.float32, mesh=mesh)
    out = pipe.generate(
        make_batch("(FN)(FN)(FN)(FN)(FN)(FN)(FN)(fRL)(SR)(BL)(FN)"), seed=2)
    assert out["pred_img"].shape == (1, 3, 89, H, W)
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()
    assert np.isfinite(np.asarray(out["trans3d"], np.float32)).all()
