"""SD3 triple text encoder in JAX: CLIP-L + CLIP-G (pooled) and T5 (sequence).

Capability parity with the reference ``SD3TextEncoderWithMask``
(ref mmdit.py:1032-1158): two CLIP text towers contribute projected pooled
embeddings (concatenated to 2048-d) and a T5 encoder contributes 77-token
sequence embeddings with an attention mask. Tokenisation reuses the HF
tokenizers (pure host-side); the towers themselves are functional JAX
consuming converted HF weights in torch layout.

Live encoding is only needed for ``prompt_type=text`` — the action vocabulary
is served by the precomputed cache (ref pipeline.py:199, 598-607).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import layer_norm, linear


# ---------------------------------------------------------------------------
# CLIP text tower (HF CLIPTextModelWithProjection semantics)
# ---------------------------------------------------------------------------

def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {"quick_gelu": _quick_gelu, "gelu": lambda x: jax.nn.gelu(x, approximate=False)}


def clip_attention(p: dict, x: jnp.ndarray, num_heads: int,
                   bias: jnp.ndarray) -> jnp.ndarray:
    b, s, d = x.shape
    hd = d // num_heads
    q = linear(x, p["q_proj"]).reshape(b, s, num_heads, hd)
    k = linear(x, p["k_proj"]).reshape(b, s, num_heads, hd)
    v = linear(x, p["v_proj"]).reshape(b, s, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    w = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return linear(out.reshape(b, s, d), p["out_proj"])


def clip_encode(params: dict, input_ids: jnp.ndarray, *, num_heads: int,
                act: str = "quick_gelu", eos_token_id: int = 2) -> jnp.ndarray:
    """input_ids [b, 77] -> projected pooled embedding [b, proj_dim].

    HF semantics: causal mask, final layer norm, pool at the first EOS token,
    then text_projection (no bias).
    """
    tm = params["text_model"]
    b, s = input_ids.shape
    x = tm["embeddings"]["token_embedding"]["weight"][input_ids]
    x = x + tm["embeddings"]["position_embedding"]["weight"][None, :s]

    causal = jnp.where(
        jnp.arange(s)[:, None] >= jnp.arange(s)[None, :], 0.0, -jnp.inf
    ).astype(jnp.float32)[None, None]

    act_fn = _ACTS[act]
    for layer in tm["encoder"]["layers"]:
        h = layer_norm(x, 1e-5, layer["layer_norm1"]["weight"], layer["layer_norm1"]["bias"])
        x = x + clip_attention(layer["self_attn"], h, num_heads, causal)
        h = layer_norm(x, 1e-5, layer["layer_norm2"]["weight"], layer["layer_norm2"]["bias"])
        h = linear(act_fn(linear(h, layer["mlp"]["fc1"])), layer["mlp"]["fc2"])
        x = x + h

    x = layer_norm(x, 1e-5, tm["final_layer_norm"]["weight"], tm["final_layer_norm"]["bias"])
    # pooling position: HF keeps a legacy path for eos_token_id == 2 (the SD3
    # CLIP configs) — argmax over raw token ids, which finds the first EOT
    # because CLIP's EOT (49407) is the largest vocab id
    if eos_token_id == 2:
        eos_pos = jnp.argmax(input_ids, axis=1)
    else:
        eos_pos = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=1)
    pooled = x[jnp.arange(b), eos_pos]
    return linear(pooled, {"weight": params["text_projection"]["weight"]})


# ---------------------------------------------------------------------------
# T5 encoder (HF T5EncoderModel semantics)
# ---------------------------------------------------------------------------

def t5_layer_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """T5 RMS layer norm (no mean subtraction, no bias)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight.astype(x.dtype)


def _t5_relative_bucket(rel: np.ndarray, num_buckets: int = 32,
                        max_distance: int = 128) -> np.ndarray:
    """Bidirectional relative position bucketing (HF T5 semantics)."""
    ret = np.zeros_like(rel)
    n = num_buckets // 2
    ret += (rel > 0).astype(np.int64) * n
    rel = np.abs(rel)
    max_exact = n // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / np.log(max_distance / max_exact) * (n - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, n - 1)
    ret += np.where(is_small, rel, large)
    return ret


def t5_position_bias(rel_emb: jnp.ndarray, q_len: int, k_len: int,
                     num_buckets: int = 32, max_distance: int = 128) -> jnp.ndarray:
    """[1, heads, q, k] additive bias from the layer-0 relative embedding."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    buckets = _t5_relative_bucket(mem - ctx, num_buckets, max_distance)
    bias = rel_emb[jnp.asarray(buckets)]            # [q, k, heads]
    return bias.transpose(2, 0, 1)[None]


def t5_attention(p: dict, x: jnp.ndarray, bias: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, d = x.shape
    inner = p["q"]["weight"].shape[0]
    hd = inner // num_heads
    q = linear(x, p["q"]).reshape(b, s, num_heads, hd)
    k = linear(x, p["k"]).reshape(b, s, num_heads, hd)
    v = linear(x, p["v"]).reshape(b, s, num_heads, hd)
    # T5 does NOT scale by sqrt(hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits + bias, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return linear(out.reshape(b, s, inner), p["o"])


def t5_encode(params: dict, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
              *, num_heads: int, gated_act: bool = True) -> jnp.ndarray:
    """input_ids [b, s] -> sequence embeddings [b, s, d] (T5EncoderModel)."""
    x = params["shared"]["weight"][input_ids]
    b, s, d = x.shape

    block0 = params["encoder"]["block"][0]
    rel_emb = block0["layer"][0]["SelfAttention"]["relative_attention_bias"]["weight"]
    nh = num_heads
    bias = t5_position_bias(rel_emb, s, s)
    pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf).astype(jnp.float32)
    bias = bias + pad

    for block in params["encoder"]["block"]:
        att = block["layer"][0]
        h = t5_layer_norm(x, att["layer_norm"]["weight"])
        x = x + t5_attention(att["SelfAttention"], h, bias, nh)
        ff = block["layer"][1]
        h = t5_layer_norm(x, ff["layer_norm"]["weight"])
        dd = ff["DenseReluDense"]
        if gated_act:
            gate = jax.nn.gelu(linear(h, dd["wi_0"]), approximate=True)
            h = linear(gate * linear(h, dd["wi_1"]), dd["wo"])
        else:
            h = linear(jax.nn.relu(linear(h, dd["wi"])), dd["wo"])
        x = x + h

    return t5_layer_norm(x, params["encoder"]["final_layer_norm"]["weight"])


# ---------------------------------------------------------------------------
# the SD3 triple-encoder facade
# ---------------------------------------------------------------------------

class SD3TextEncoder:
    """Tokenise with HF tokenizers, encode with JAX towers, return
    (prompt_embeds [b,77,4096], prompt_attention_mask [b,77],
     pooled_prompt_embeds [b,2048]) — the exact contract of
    ref mmdit.py:1122-1158."""

    def __init__(self, model_path: str, params: Dict, configs: Dict,
                 dtype=jnp.bfloat16, max_length: int = 77):
        import os
        from transformers import CLIPTokenizer, T5TokenizerFast
        self.tokenizer = CLIPTokenizer.from_pretrained(os.path.join(model_path, "tokenizer"))
        self.tokenizer_2 = CLIPTokenizer.from_pretrained(os.path.join(model_path, "tokenizer_2"))
        self.tokenizer_3 = T5TokenizerFast.from_pretrained(os.path.join(model_path, "tokenizer_3"))
        self.params = params          # {"clip_l":…, "clip_g":…, "t5":…}
        self.configs = configs        # {"clip_l": {...num_heads, act, eos}, ...}
        self.dtype = dtype
        self.max_length = max_length

    def _clip_pool(self, which: str, tokenizer, prompt: str) -> jnp.ndarray:
        ids = tokenizer([prompt], padding="max_length", max_length=self.max_length,
                        truncation=True, return_tensors="np").input_ids
        cfg = self.configs[which]
        return clip_encode(self.params[which], jnp.asarray(ids),
                           num_heads=cfg["num_heads"], act=cfg.get("act", "quick_gelu"),
                           eos_token_id=cfg.get("eos_token_id", 2))

    def __call__(self, prompt: str):
        pooled_l = self._clip_pool("clip_l", self.tokenizer, prompt)
        pooled_g = self._clip_pool("clip_g", self.tokenizer_2, prompt)
        pooled = jnp.concatenate([pooled_l, pooled_g], axis=-1)

        tok = self.tokenizer_3([prompt], padding="max_length",
                               max_length=self.max_length, truncation=True,
                               add_special_tokens=True, return_tensors="np")
        ids = jnp.asarray(tok.input_ids)
        mask = jnp.asarray(tok.attention_mask)
        cfg = self.configs["t5"]
        seq = t5_encode(self.params["t5"], ids, mask, num_heads=cfg["num_heads"],
                        gated_act=cfg.get("gated_act", True))
        return seq.astype(self.dtype), mask, pooled.astype(self.dtype)
