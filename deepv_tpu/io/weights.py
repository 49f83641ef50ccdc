"""Checkpoint I/O: HF-diffusers safetensors -> deepv_tpu parameter pytrees.

The reference loads weights with diffusers ``from_pretrained`` from a local
snapshot with subdirs ``transformer/``, ``causal_video_vae/``,
``text_encoder{,_2,_3}/`` (ref pipeline.py:203-223, run.py:389-391). Our
parameter pytrees were designed to mirror those module paths, so conversion
is a mechanical re-keying — weights keep their torch layouts ([out, in]
linears, [o, i, kt, kh, kw] convs) and the apply functions consume them via
dimension numbers (see ops/basic.py).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import MMDiTConfig, VAEConfig


def _load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load (possibly sharded) .safetensors from a model subdir."""
    from safetensors import safe_open

    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    out = {}
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="numpy") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
    return out


def _set(tree: dict, dotted: str, value) -> None:
    """Assign into a nested dict/list tree by a dotted path with int indices."""
    parts = [int(p) if p.isdigit() else p for p in dotted.split(".")]
    node = tree
    for i, p in enumerate(parts[:-1]):
        nxt_is_int = isinstance(parts[i + 1], int)
        if isinstance(p, int):
            while len(node) <= p:
                node.append([] if nxt_is_int else {})
            node = node[p]
        else:
            if p not in node:
                node[p] = [] if nxt_is_int else {}
            node = node[p]
    last = parts[-1]
    if isinstance(last, int):
        while len(node) <= last:
            node.append(None)
        node[last] = value
    else:
        node[last] = value


# --- torch checkpoint key -> our tree path rewriting -------------------------

_MMDIT_RULES = [
    (re.compile(r"\.net\.0\.proj\."), ".proj."),      # FeedForward GELU proj
    (re.compile(r"\.net\.2\."), ".out."),              # FeedForward out linear
    (re.compile(r"\.to_out\.0\."), ".to_out."),        # attention out (drop dropout idx)
]

_VAE_RULES = [
    (re.compile(r"\.conv\.(weight|bias)$"), r".\1"),               # CausalConv3d wrapper
    # re/down/up-samplers wrap their conv as an attribute named ``conv``
    (re.compile(r"\.downsamplers\.0\.conv\."), ".downsampler."),
    (re.compile(r"\.temporal_downsamplers\.0\.conv\."), ".temporal_downsampler."),
    (re.compile(r"\.upsamplers\.0\.conv\."), ".upsampler."),
    (re.compile(r"\.temporal_upsamplers\.0\.conv\."), ".temporal_upsampler."),
    (re.compile(r"\.to_out\.0\."), ".to_out."),
]


def _rewrite(key: str, rules) -> str:
    for pat, repl in rules:
        key = pat.sub(repl, key)
    return key


def convert_mmdit_state(state: Dict[str, np.ndarray], dtype=jnp.bfloat16) -> dict:
    tree: dict = {}
    for k, v in state.items():
        _set(tree, _rewrite(k, _MMDIT_RULES), jnp.asarray(v, dtype))
    # pos_embed table is a persistent buffer [1, M*M, D]; keep fp32 copy
    if "pos_embed" in tree and isinstance(tree["pos_embed"], dict) \
            and "pos_embed" in tree["pos_embed"]:
        tree["pos_embed"]["pos_embed"] = tree["pos_embed"]["pos_embed"].astype(jnp.float32)
    return tree


def convert_vae_state(state: Dict[str, np.ndarray], dtype=jnp.bfloat16) -> dict:
    tree: dict = {}
    for k, v in state.items():
        k2 = _rewrite(k, _VAE_RULES)
        # quant convs live beside encoder/decoder in the checkpoint; our tree
        # nests them (encoder.quant_conv / decoder.post_quant_conv)
        if k2.startswith("quant_conv."):
            k2 = "encoder." + k2
        elif k2.startswith("post_quant_conv."):
            k2 = "decoder." + k2
        _set(tree, k2, jnp.asarray(v, dtype))
    return tree


def load_checkpoint(model_path: str, dtype=jnp.bfloat16
                    ) -> Tuple[MMDiTConfig, VAEConfig, dict]:
    """Load a DeepVerse-format snapshot into (configs, params)."""
    tdir = os.path.join(model_path, "transformer")
    vdir = os.path.join(model_path, "causal_video_vae")
    mcfg = MMDiTConfig.from_json(os.path.join(tdir, "config.json")) \
        if os.path.exists(os.path.join(tdir, "config.json")) else MMDiTConfig()
    vcfg = VAEConfig.from_json(os.path.join(vdir, "config.json")) \
        if os.path.exists(os.path.join(vdir, "config.json")) else VAEConfig()
    params = {
        "mmdit": convert_mmdit_state(_load_safetensors_dir(tdir), dtype),
        "vae": convert_vae_state(_load_safetensors_dir(vdir), dtype),
    }
    return mcfg, vcfg, params


def random_params(mcfg: MMDiTConfig, vcfg: VAEConfig, dtype=jnp.bfloat16,
                  seed: int = 0) -> dict:
    """Full random parameter tree as ONE jitted program under the 'rbg'
    PRNG: each draw lowers to a single RngBitGenerator HLO, so the fused
    program compiles in ~2 min at deployment size — the eager per-leaf
    threefry version paid a tunnel round-trip per leaf (~hundreds), and a
    threefry-keyed fused program is compile-bound (scripts/
    probe_fastparams.py). This is the `--random_weights` cold-start path.

    Reproducibility caveat: unlike threefry, the 'rbg' generator's bit
    stream is backend- and XLA-version-dependent, so a given seed yields
    the same weights only within one platform + JAX version. Fine for the
    smoke/bench use this path serves (structure-shaped stand-ins for
    unfetchable real weights); anything needing cross-platform seed
    stability should load a real checkpoint instead."""
    import jax
    from ..models.mmdit import init_mmdit_params
    from ..models.vae import init_vae_params
    from ..utils.aot import aot_jit

    # aot_jit (== jax.jit until utils/aot.configure) lets the ~2 min init
    # compile persist across processes: with a warm executable cache the
    # whole 2.43 B-param build is a deserialize + one device dispatch
    @aot_jit
    def _random_params_build():
        k1, k2 = jax.random.split(jax.random.key(seed, impl="rbg"))
        return {
            "mmdit": init_mmdit_params(k1, mcfg, dtype=dtype),
            "vae": init_vae_params(k2, vcfg, dtype=dtype),
        }

    return _random_params_build()


def convert_text_embeds_pt(pt_path: str, npz_path: str) -> None:
    """Convert the reference's torch text-embed cache
    (assets/text_embeds_len77.pt, ref pipeline.py:199) to our npz format."""
    import torch
    from .text_embeds import save_text_embeds

    raw = torch.load(pt_path, map_location="cpu")
    cache = {
        prompt: {field: np.asarray(t.float().numpy()) for field, t in fields.items()}
        for prompt, fields in raw.items()
    }
    save_text_embeds(npz_path, cache)


# --- text encoder towers (CLIP-L / CLIP-G / T5) ------------------------------

def convert_text_tower_state(state: Dict[str, np.ndarray], dtype=jnp.bfloat16) -> dict:
    """HF CLIPTextModelWithProjection / T5EncoderModel state -> pytree.
    Keys already match our tree paths (see models/text_encoders.py)."""
    tree: dict = {}
    for k, v in state.items():
        _set(tree, k, jnp.asarray(v, dtype))
    return tree


def load_text_encoders(model_path: str, dtype=jnp.bfloat16):
    """Build an SD3TextEncoder from a checkpoint snapshot's text_encoder{,_2,_3}
    subdirs (ref mmdit.py:1036-1046). Returns None if the dirs are absent."""
    import json as _json

    from ..models.text_encoders import SD3TextEncoder

    dirs = {
        "clip_l": os.path.join(model_path, "text_encoder"),
        "clip_g": os.path.join(model_path, "text_encoder_2"),
        "t5": os.path.join(model_path, "text_encoder_3"),
    }
    if not all(os.path.isdir(d) for d in dirs.values()):
        return None

    params, configs = {}, {}
    for name, d in dirs.items():
        with open(os.path.join(d, "config.json")) as f:
            raw = _json.load(f)
        params[name] = convert_text_tower_state(_load_safetensors_dir(d), dtype)
        if name == "t5":
            configs[name] = {
                "num_heads": raw["num_heads"],
                "gated_act": "gated" in raw.get("feed_forward_proj", "gated-gelu"),
            }
        else:
            configs[name] = {
                "num_heads": raw["num_attention_heads"],
                "act": raw.get("hidden_act", "quick_gelu"),
                "eos_token_id": raw.get("eos_token_id", 2),
            }
    return SD3TextEncoder(model_path, params, configs, dtype=dtype)
