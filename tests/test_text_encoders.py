"""Text-encoder parity vs HuggingFace torch implementations (CPU oracle).

Tiny random-config CLIP and T5 models are instantiated in transformers, their
state dicts re-keyed into our pytrees, and outputs compared — validating the
JAX towers without network access to real weights.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from deepv_tpu.models.text_encoders import clip_encode, t5_encode


def torch_state_to_tree(sd):
    from deepv_tpu.io.weights import _set
    tree = {}
    for k, v in sd.items():
        _set(tree, k, jnp.asarray(v.detach().numpy()))
    return tree


def test_clip_matches_hf():
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=77,
        projection_dim=24, eos_token_id=2, bos_token_id=0, pad_token_id=1,
        hidden_act="quick_gelu")
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(cfg).eval()

    ids = torch.randint(3, 99, (2, 13))
    ids[:, -1] = 2  # eos
    with torch.no_grad():
        ref = model(ids)[0].numpy()

    tree = torch_state_to_tree(model.state_dict())
    ours = np.asarray(clip_encode(tree, jnp.asarray(ids.numpy()),
                                  num_heads=4, act="quick_gelu", eos_token_id=2))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_clip_gelu_variant_matches_hf():
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection
    cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, max_position_embeddings=77,
        projection_dim=16, eos_token_id=2, bos_token_id=0, pad_token_id=1,
        hidden_act="gelu")
    torch.manual_seed(1)
    model = CLIPTextModelWithProjection(cfg).eval()
    ids = torch.randint(3, 64, (1, 9))
    ids[:, -1] = 2
    with torch.no_grad():
        ref = model(ids)[0].numpy()
    tree = torch_state_to_tree(model.state_dict())
    ours = np.asarray(clip_encode(tree, jnp.asarray(ids.numpy()),
                                  num_heads=2, act="gelu", eos_token_id=2))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_t5_matches_hf():
    from transformers import T5Config, T5EncoderModel
    cfg = T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dense_act_fn="gelu_new",
        is_gated_act=True, feed_forward_proj="gated-gelu")
    torch.manual_seed(0)
    model = T5EncoderModel(cfg).eval()

    ids = torch.randint(3, 120, (2, 11))
    mask = torch.ones(2, 11, dtype=torch.long)
    mask[1, 7:] = 0
    with torch.no_grad():
        ref = model(ids, attention_mask=mask).last_hidden_state.numpy()

    tree = torch_state_to_tree(model.state_dict())
    ours = np.asarray(t5_encode(tree, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                                num_heads=4, gated_act=True))
    # compare only unmasked positions (HF computes masked ones too but they
    # are meaningless downstream — the DiT masks them out)
    m = mask.numpy().astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], atol=3e-5, rtol=1e-4)
