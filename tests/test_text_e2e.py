"""End-to-end text-encoder path (VERDICT r2 #5): the only user-facing route
that was untested — ``load_text_encoders`` -> ``SD3TextEncoder.__call__`` ->
77-token embeds/mask/pooled contract -> ``build_action_embeds`` -> a live
``prompt_type=text`` pipeline rollout.

A complete tiny checkpoint dir is synthesized on the fly: two character-level
CLIP tokenizers + a word-level T5 fast tokenizer, and three tiny towers
saved as safetensors with their config.json (the exact layout
``load_text_encoders`` expects, ref mmdit.py:1036-1046). The facade output is
pinned against the same torch towers driven through the same tokenizers —
covering tokenisation, padding, EOS pooling, and masking, not just tower
math (tests/test_text_encoders.py already covers the bare towers).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from deepv_tpu.actions import action_vocabulary
from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
from deepv_tpu.io.build_embeds import build_action_embeds
from deepv_tpu.io.weights import load_text_encoders
from deepv_tpu.models.vae import init_vae_params
from deepv_tpu.models.mmdit import init_mmdit_params
from deepv_tpu.pipeline import InferencePipeline

from snapshot_utils import CLIP_PROJ, T5_D, write_text_snapshot


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """Synthesized checkpoint dir + the torch oracle towers it was built
    from (snapshot_utils.write_text_snapshot)."""
    root = tmp_path_factory.mktemp("text_ckpt")
    towers = write_text_snapshot(root)
    return root, towers


@pytest.fixture(scope="module")
def encoder(ckpt):
    root, _ = ckpt
    enc = load_text_encoders(str(root), dtype=jnp.float32)
    assert enc is not None
    return enc


def test_load_text_encoders_absent_dirs_returns_none(tmp_path):
    assert load_text_encoders(str(tmp_path)) is None


def test_facade_contract_and_torch_parity(ckpt, encoder):
    """__call__ returns ([1,77,T5_D] embeds, [1,77] mask, [1,2*CLIP_PROJ]
    pooled), numerically equal to the torch towers fed the same tokenizer
    output — pinning tokenise+pad+EOS-pool+mask, not just the tower math."""
    root, towers = ckpt
    prompt = "Move forward. The perspective hasn't changed."
    seq, mask, pooled = encoder(prompt)
    assert seq.shape == (1, 77, T5_D)
    assert mask.shape == (1, 77)
    assert pooled.shape == (1, 2 * CLIP_PROJ)
    n_tok = len(prompt.split()) + 1          # words + </s>
    assert int(np.asarray(mask).sum()) == n_tok
    assert np.asarray(mask)[0, :n_tok].all()

    with torch.no_grad():
        ids = torch.from_numpy(np.asarray(encoder.tokenizer(
            [prompt], padding="max_length", max_length=77, truncation=True,
            return_tensors="np").input_ids))
        want_l = towers["text_encoder"](ids)[0].numpy()
        want_g = towers["text_encoder_2"](ids)[0].numpy()
        tok3 = encoder.tokenizer_3([prompt], padding="max_length",
                                   max_length=77, truncation=True,
                                   add_special_tokens=True,
                                   return_tensors="np")
        want_seq = towers["text_encoder_3"](
            torch.from_numpy(np.asarray(tok3.input_ids)),
            attention_mask=torch.from_numpy(np.asarray(tok3.attention_mask)),
        ).last_hidden_state.numpy()

    np.testing.assert_allclose(np.asarray(pooled),
                               np.concatenate([want_l, want_g], -1),
                               atol=3e-5, rtol=1e-4)
    m = np.asarray(mask[0]).astype(bool)
    np.testing.assert_allclose(np.asarray(seq)[0, m], want_seq[0, m],
                               atol=3e-5, rtol=1e-4)


def test_distinct_prompts_distinct_embeds(encoder):
    _, _, p1 = encoder("Move forward. The perspective hasn't changed.")
    _, _, p2 = encoder("Move backward. The perspective hasn't changed.")
    assert np.abs(np.asarray(p1) - np.asarray(p2)).max() > 1e-4


def test_build_action_embeds_regenerates_cache(encoder):
    """The regeneration path for the reference's missing
    assets/text_embeds_len77.pt (ref pipeline.py:199): one entry per action
    sentence, each with the pipeline cache's exact field contract."""
    cache = build_action_embeds(encoder)
    vocab = action_vocabulary()
    assert set(cache) == set(vocab)
    e = cache[vocab[0]]
    assert e["prompt_embeds"].shape == (1, 77, T5_D)
    assert e["prompt_attention_mask"].shape == (1, 77)
    assert e["pooled_prompt_embeds"].shape == (1, 2 * CLIP_PROJ)
    for f in e.values():
        assert np.isfinite(np.asarray(f, np.float32)).all()


def test_text_prompt_pipeline_rollout(encoder):
    """A live prompt_type=text generation: every embedding (prompt and the
    'empty' negative) comes from the facade, no precomputed cache."""
    vcfg = VAEConfig.tiny()
    mcfg = MMDiTConfig(
        sample_size=16, patch_size=2, in_channels=14, num_layers=2,
        attention_head_dim=8, num_attention_heads=4,
        caption_projection_dim=32, pooled_projection_dim=2 * CLIP_PROJ,
        pos_embed_max_size=32, joint_attention_dim=T5_D)
    pcfg = PipelineConfig(max_temporal_length=4, num_input_unit=2,
                          num_input_image=9)
    params = {"mmdit": init_mmdit_params(jax.random.PRNGKey(0), mcfg),
              "vae": init_vae_params(jax.random.PRNGKey(1), vcfg)}
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, text_embeds={},
                             dtype=jnp.float32, text_encoder=encoder)
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 64, 64),
                             minval=-1.0, maxval=1.0)
    prompt = "A red car drives down the road."
    out = pipe.generate({"img": img,
                         "prompt": np.array([prompt] * 4),
                         "prompt_type": "text"}, seed=3)
    assert out["pred_img"].shape[0] == 1 and out["pred_img"].shape[1] == 3
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()
    # the live-encoder memo served every repeated unit lookup
    assert prompt in pipe._embed_memo and "empty" in pipe._embed_memo
