"""The exact path a real ``SOTAMak1r/DeepVerse1.1`` download would take
(VERDICT r3 #8): a COMPLETE HF-layout snapshot on disk — transformer/ +
causal_video_vae/ + text_encoder{,_2,_3}/ + tokenizer{,_3}/ + per-subdir
config.json — loaded through ``run.load_pipeline`` into a multi-chunk
rollout. Every piece is separately tested elsewhere
(test_checkpoint_convert, test_text_e2e); this is the assembled route:
config.json -> converters -> live text encoders -> ``build_action_embeds``
(the missing-.pt fallback) -> chunked generation with a chunk boundary.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytest.importorskip("torch")
pytest.importorskip("transformers")

from deepv_tpu.config import MMDiTConfig, VAEConfig, create_model_config
from deepv_tpu.models.mmdit import init_mmdit_params
from deepv_tpu.models.vae import init_vae_params
from deepv_tpu.run import load_pipeline

from snapshot_utils import (CLIP_PROJ, T5_D, write_text_snapshot,
                            write_transformer_dir, write_vae_dir)


@pytest.fixture(scope="module")
def full_snapshot(tmp_path_factory):
    root = tmp_path_factory.mktemp("full_ckpt")
    vcfg = VAEConfig.tiny()                     # latent channels 4
    mcfg = MMDiTConfig(
        sample_size=16, patch_size=2,
        in_channels=2 * vcfg.encoder_out_channels + 6,   # rgb+disp+raymap
        num_layers=2, attention_head_dim=8, num_attention_heads=4,
        caption_projection_dim=32, pooled_projection_dim=2 * CLIP_PROJ,
        pos_embed_max_size=32, joint_attention_dim=T5_D)
    mp = init_mmdit_params(jax.random.PRNGKey(0), mcfg)
    vp = init_vae_params(jax.random.PRNGKey(1), vcfg)
    write_transformer_dir(root, mcfg, mp)
    write_vae_dir(root, vcfg, vp)
    write_text_snapshot(root)
    return str(root), mcfg, vcfg


def test_load_pipeline_from_full_snapshot_and_roll(full_snapshot):
    root, mcfg, vcfg = full_snapshot
    # text_embeds_len77.pt is MISSING upstream (SURVEY.md §2.6) — the loader
    # must fall back to regenerating the action cache from the snapshot's
    # own text towers
    model_cfg = create_model_config(root, max_temporal_length=4,
                                    num_input_unit=2, num_input_image=9)
    pipe = load_pipeline(root, model_cfg, dtype=jnp.float32)
    assert pipe.text_encoder is not None
    assert pipe.mcfg.num_layers == mcfg.num_layers
    assert pipe.vcfg.encoder_block_out_channels == vcfg.encoder_block_out_channels
    # the regenerated cache covers the closed action vocabulary
    assert "empty" in pipe.text_embeds
    some = next(iter(pipe.text_embeds.values()))
    assert some["prompt_embeds"].shape[1:] == (77, T5_D)

    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 64, 64),
                             minval=-1.0, maxval=1.0)
    # 6 prompts with T=4, overlap 2 -> TWO chunks: the rollout crosses a
    # chunk boundary (carry re-encode + retrieved history) off this snapshot
    prompts = np.array(
        ["empty"] + ["Move forward. The perspective hasn't changed."] * 5)
    out = pipe.generate({"img": img, "prompt": prompts,
                         "prompt_type": "action"}, seed=3)
    assert out["pred_img"].shape[:2] == (1, 3)
    assert out["pred_img"].shape[2] > out["trans3d"].shape[1] // 2
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()
    assert np.isfinite(np.asarray(out["pred_disparity"], np.float32)).all()
    assert len(out["motion_prompt_list"]) == 2      # two chunks rolled
