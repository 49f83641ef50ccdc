"""Builders for synthesized HF-layout checkpoint snapshots (test helper).

Produces on disk exactly the snapshot layout a real ``SOTAMak1r/DeepVerse1.1``
download would have (ref pipeline.py:203-223, run.py:389-391):

  transformer/{config.json, diffusion_pytorch_model.safetensors}
  causal_video_vae/{config.json, diffusion_pytorch_model.safetensors}
  text_encoder{,_2,_3}/{config.json, model.safetensors}
  tokenizer{,_2,_3}/...

with diffusers/transformers key names, so the package's converters are
exercised against the real wire format. Shared by
tests/test_checkpoint_convert.py (transformer+vae round trip),
tests/test_text_e2e.py (text towers), and tests/test_full_snapshot.py
(the whole snapshot through run.load_pipeline into a rollout).
"""

import json
import string

import numpy as np
import jax.numpy as jnp

# facade contract dims for the tiny text towers:
# pooled = CLIP_PROJ_L + CLIP_PROJ_G, seq dim = T5_D
CLIP_PROJ = 8
T5_D = 24


def flatten_with_names(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_with_names(
                v, f"{prefix}{k}." if not isinstance(v, jnp.ndarray) else f"{prefix}{k}"))
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


def vae_ckpt_names(vp):
    """our VAE tree -> diffusers checkpoint names (inverse of _VAE_RULES),
    including the CausalConv3d ``<name>.conv.`` wrapper for 5-D weights and
    their sibling biases."""
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
        leafname = k2.rsplit(".", 1)[-1]
        if v.ndim == 5:
            k2 = k2[: -len("." + leafname)] + ".conv." + leafname
        vflat[k2] = np.asarray(v)
    # biases whose sibling weight moved under .conv follow it
    moved = {}
    for k, v in list(vflat.items()):
        if k.endswith(".conv.weight"):
            base = k[: -len(".conv.weight")]
            bias_key = base + ".bias"
            if bias_key in vflat:
                moved[base + ".conv.bias"] = vflat.pop(bias_key)
    vflat.update(moved)
    return vflat


def write_transformer_dir(root, mcfg, mp):
    from safetensors.numpy import save_file
    tdir = root / "transformer"
    tdir.mkdir(exist_ok=True)
    flat = {k: np.asarray(v) for k, v in flatten_with_names(mp).items()}
    save_file(mmdit_ckpt_names(flat),
              str(tdir / "diffusion_pytorch_model.safetensors"))
    with open(tdir / "config.json", "w") as f:
        json.dump({k: getattr(mcfg, k) for k in (
            "sample_size", "patch_size", "in_channels", "num_layers",
            "attention_head_dim", "num_attention_heads", "caption_projection_dim",
            "pooled_projection_dim", "pos_embed_max_size", "joint_attention_dim")}, f)
    return tdir


def write_vae_dir(root, vcfg, vp):
    from safetensors.numpy import save_file
    vdir = root / "causal_video_vae"
    vdir.mkdir(exist_ok=True)
    save_file(vae_ckpt_names(vp),
              str(vdir / "diffusion_pytorch_model.safetensors"))
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
    return vdir


def write_clip_tokenizer(d):
    """Character-level CLIP BPE: every printable char as both inner and
    word-final token, no merges; <|endoftext|> gets the largest id (the
    property HF's legacy argmax pooling relies on)."""
    d.mkdir(parents=True, exist_ok=True)
    vocab, i = {"<|startoftext|>": 0}, 1
    for c in string.printable[:95]:
        vocab[c] = i
        vocab[c + "</w>"] = i + 1
        i += 2
    vocab["<|endoftext|>"] = i
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return len(vocab)


def write_t5_tokenizer(d):
    """Word-level T5-fast tokenizer over the action vocabulary's words."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    from deepv_tpu.actions import action_vocabulary

    d.mkdir(parents=True, exist_ok=True)
    words = set()
    for s in action_vocabulary():
        words.update(s.split())
    words.update(["empty", "A", "red", "car", "drives", "down", "the", "road."])
    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    for w in sorted(words):
        vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)])
    tok.enable_padding(pad_id=0, pad_token="<pad>")
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "T5TokenizerFast", "unk_token": "<unk>",
         "eos_token": "</s>", "pad_token": "<pad>", "model_max_length": 512}))
    (d / "special_tokens_map.json").write_text(json.dumps(
        {"eos_token": "</s>", "pad_token": "<pad>", "unk_token": "<unk>"}))
    return len(vocab)


def save_tower(d, model, cfg_fields):
    from safetensors.numpy import save_file
    d.mkdir(parents=True, exist_ok=True)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save_file(state, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg_fields))


def write_text_snapshot(root):
    """Tokenizers + three tiny torch towers in the snapshot layout
    ``load_text_encoders`` expects. Returns the torch towers (for oracle
    comparisons)."""
    import torch
    from transformers import (CLIPTextConfig, CLIPTextModelWithProjection,
                              T5Config, T5EncoderModel)

    clip_vocab = write_clip_tokenizer(root / "tokenizer")
    write_clip_tokenizer(root / "tokenizer_2")
    t5_vocab = write_t5_tokenizer(root / "tokenizer_3")

    eot = clip_vocab - 1
    ccfg = CLIPTextConfig(
        vocab_size=clip_vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, projection_dim=CLIP_PROJ,
        eos_token_id=eot, bos_token_id=0, pad_token_id=eot,
        hidden_act="quick_gelu")
    towers = {}
    for i, name in enumerate(["text_encoder", "text_encoder_2"]):
        torch.manual_seed(10 + i)
        m = CLIPTextModelWithProjection(ccfg).eval()
        # the real SD3 configs carry the legacy eos_token_id=2; the tiny
        # vocab's EOT is still the largest id, so argmax pooling (the
        # eos_token_id==2 path in clip_encode) finds the same position
        save_tower(root / name, m, {
            "num_attention_heads": 4, "hidden_act": "quick_gelu",
            "eos_token_id": 2})
        towers[name] = m

    tcfg = T5Config(
        vocab_size=t5_vocab, d_model=T5_D, d_kv=8, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dense_act_fn="gelu_new",
        is_gated_act=True, feed_forward_proj="gated-gelu")
    torch.manual_seed(12)
    t5 = T5EncoderModel(tcfg).eval()
    save_tower(root / "text_encoder_3", t5, {
        "num_heads": 4, "feed_forward_proj": "gated-gelu"})
    towers["text_encoder_3"] = t5
    return towers
