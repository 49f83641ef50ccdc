"""CLI entry point — same contract as the reference run.py.

    python -m deepv_tpu.run --input_image img.png --model_path ./ckpts \
        [--prompt_type text|action] [--prompt "..."] [--seed 666] \
        [--no_need_depth] [--add_controler] [--add_depth] [--add_ply]

(ref run.py:374-427; flags and defaults match; ``fire`` is replaced by
argparse since it is not available in this image, but invocation syntax is
identical for these flags.)

Weights come from a converted checkpoint directory (see io/weights.py). For
smoke runs without weights, pass ``--random_weights`` to initialise the full
architecture randomly.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from .actions import action_vocabulary, prepare_motion_prompts
from .config import MMDiTConfig, PipelineConfig, VAEConfig, create_model_config
from .io.text_embeds import load_text_embeds, random_text_embeds
from .io.video import save_video
from .io.ply import save_ply
from .pipeline import InferencePipeline

VIDEO_LENGTH = 57
VIDEO_HEIGHT = 384
VIDEO_WIDTH = 512


def prepare_input_image(image_path: str, height: int, width: int) -> np.ndarray:
    """Center-crop to the target aspect ratio then resize (ref run.py:247-265).
    Returns [1, 3, H, W] float32 in [-1, 1]."""
    first = Image.open(image_path).convert("RGB")
    ow, oh = first.size
    target_ratio = width / height
    if ow / oh > target_ratio:
        nw = int(oh * target_ratio)
        left, top, right, bottom = (ow - nw) // 2, 0, (ow - nw) // 2 + nw, oh
    else:
        nh = int(ow / target_ratio)
        left, top, right, bottom = 0, (oh - nh) // 2, ow, (oh - nh) // 2 + nh
    first = first.crop((left, top, right, bottom)).resize((width, height))
    arr = np.asarray(first, np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr.transpose(2, 0, 1)[None]


def _make_tp_mesh(tp_shards: int):
    """Mesh over the first tp_shards accelerator devices (TP denoise +
    spatial-CP VAE — see InferencePipeline ``mesh``). Fails loudly when the
    host has fewer chips; never clamps."""
    from .parallel.mesh import make_mesh
    devices = jax.devices()
    assert len(devices) >= tp_shards, \
        f"--tp_shards {tp_shards} needs {tp_shards} devices, have {len(devices)}"
    return make_mesh((tp_shards,), ("tp",), devices=devices[:tp_shards])


def load_pipeline(model_path: str, model_cfg: PipelineConfig,
                  random_weights: bool = False, dtype=jnp.bfloat16,
                  height: int = VIDEO_HEIGHT, width: int = VIDEO_WIDTH,
                  tp_shards: int = 1, fast: bool = False,
                  flow_cache: str = None,
                  carry_latents: bool = False,
                  device=None) -> InferencePipeline:
    """``device``: pin this pipeline's params (and hence every jitted
    program) to one jax.Device — the multi-stream serving mode (one
    independent pipeline per chip, ``deepv_tpu.serve --streams N``).
    Mutually exclusive with ``tp_shards>1`` (one pipeline sharded ACROSS
    chips)."""
    from .io import weights as weights_io

    mesh = _make_tp_mesh(tp_shards) if tp_shards > 1 else None
    if device is not None and mesh is not None:
        raise ValueError("device= (one pipeline per chip) and tp_shards>1 "
                         "(one pipeline across chips) are mutually exclusive")
    # quality-gated fast preset: flow caching + int8 top-level VAE decode +
    # int8 MMDiT linears (measured 8.40 fps vs 6.00 exact, deviations in
    # the bench JSON). Composable with everything else; off by default.
    fast_kw = dict(flow_cache="skip_odd", denoise_int8=True) if fast else {}
    if carry_latents:
        # quality-gated boundary fast mode: carry the generated rgb latents
        # across chunk boundaries instead of re-encoding the carry pixels
        fast_kw["carry_latents"] = True
    if flow_cache is not None:
        # explicit --flow_cache overrides the preset's choice: "none",
        # "skip_odd", or "adaptive[:tau]" (error-bounded adaptive caching)
        fast_kw["flow_cache"] = flow_cache

    text_encoder = None
    if random_weights or not os.path.isdir(model_path):
        if os.environ.get("DEEPV_TINY") == "1":   # smoke-run architecture
            mcfg = MMDiTConfig(num_layers=2, num_attention_heads=4,
                               attention_head_dim=64, caption_projection_dim=256,
                               joint_attention_dim=128, pooled_projection_dim=64)
            vcfg = VAEConfig(encoder_block_out_channels=(32, 32, 64, 64),
                             decoder_block_out_channels=(32, 32, 64, 64),
                             encoder_layers_per_block=(1, 1, 1, 1),
                             decoder_layers_per_block=(1, 1, 1, 1),
                             encoder_norm_num_groups=8, decoder_norm_num_groups=8)
            mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
        else:
            mcfg, vcfg = MMDiTConfig(), VAEConfig()
        params = weights_io.random_params(mcfg, vcfg, dtype=dtype)
        embeds = random_text_embeds(0, action_vocabulary(),
                                    joint_dim=mcfg.joint_attention_dim,
                                    pooled_dim=mcfg.pooled_projection_dim)
    else:
        mcfg, vcfg, params = weights_io.load_checkpoint(model_path, dtype=dtype)
        text_encoder = weights_io.load_text_encoders(model_path, dtype=dtype)
        embeds_path = model_cfg.text_embeds_path
        if embeds_path and os.path.exists(embeds_path):
            embeds = load_text_embeds(embeds_path)
        elif text_encoder is not None:
            # regenerate the closed action vocabulary from the checkpoint's
            # own encoders (the reference's .pt asset is missing upstream)
            from .io.build_embeds import build_action_embeds
            embeds = build_action_embeds(text_encoder)
        else:
            embeds = random_text_embeds(0, action_vocabulary(),
                                        joint_dim=mcfg.joint_attention_dim,
                                        pooled_dim=mcfg.pooled_projection_dim)
    if fast:
        from dataclasses import replace
        vcfg = replace(vcfg, conv_impl="int8")
    if device is not None:
        params = jax.device_put(params, device)
    return InferencePipeline(model_cfg, mcfg, vcfg, params, embeds, dtype=dtype,
                             text_encoder=text_encoder, mesh=mesh, **fast_kw)


def main(input_image: str, model_path: str, prompt_type: str = "text",
         prompt: str = "", seed: int = 666, no_need_depth: bool = False,
         add_controler: bool = False, add_depth: bool = False,
         add_ply: bool = False, random_weights: bool = False,
         output_path: str = "output/generated_video.mp4",
         height: int = VIDEO_HEIGHT, width: int = VIDEO_WIDTH,
         tp_shards: int = 1, icon_assets: str = None, fast: bool = False,
         flow_cache: str = None, carry_latents: bool = False,
         aot_cache: str = None):
    if aot_cache:
        from .utils.aot import configure as aot_configure
        aot_configure(aot_cache)
    model_cfg = create_model_config(model_path, no_need_depth=no_need_depth,
                                    use_motion_prompt=(prompt_type == "action"))

    pipeline = load_pipeline(model_path, model_cfg, random_weights=random_weights,
                             height=height, width=width, tp_shards=tp_shards,
                             fast=fast, flow_cache=flow_cache,
                             carry_latents=carry_latents)

    img = prepare_input_image(input_image, height, width)
    batch = {
        "img": jnp.asarray(img),
        "prompt": np.array(prepare_motion_prompts(prompt_type, prompt)),
        "prompt_type": prompt_type,
    }

    st = time.time()
    output = pipeline.generate(batch, seed=seed)
    n_frames = output["pred_img"].shape[2]
    elapsed = time.time() - st
    print(f"[info] generated {n_frames} frames in {elapsed:.1f}s "
          f"({n_frames / elapsed:.2f} fps)")

    written = save_video(output, output_path, fps=20,
                         add_controler=(add_controler and prompt_type == "action"),
                         add_depth=(add_depth and not no_need_depth),
                         icon_assets=icon_assets)
    if add_ply and not no_need_depth:
        save_ply(output, output_path.replace(".mp4", ".ply"))
    print(f"[info] save result at {written}")
    return written


def cli():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_image", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--prompt_type", default="text", choices=["text", "action"])
    p.add_argument("--prompt", default="")
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--no_need_depth", action="store_true")
    p.add_argument("--add_controler", action="store_true")
    p.add_argument("--add_depth", action="store_true")
    p.add_argument("--add_ply", action="store_true")
    p.add_argument("--random_weights", action="store_true",
                   help="random-initialise the full model (no checkpoint); "
                        "seeds are stable only within one platform + JAX "
                        "version (fast 'rbg' PRNG — io/weights.py)")
    p.add_argument("--output_path", default="output/generated_video.mp4")
    p.add_argument("--height", type=int, default=VIDEO_HEIGHT)
    p.add_argument("--width", type=int, default=VIDEO_WIDTH)
    p.add_argument("--tp_shards", type=int, default=1,
                   help="shard inference over this many chips (TP denoise + "
                        "spatial-CP VAE); 1 = single device")
    p.add_argument("--icon_assets", default=None,
                   help="directory with the controller icon PNGs (default: "
                        "./assets/icons when present, else procedural glyphs)")
    p.add_argument("--fast", action="store_true",
                   help="quality-gated fast preset: flow caching + int8 VAE "
                        "decode + int8 MMDiT linears (~1.4x; deviations "
                        "measured in bench.py)")
    p.add_argument("--carry_latents", action="store_true",
                   help="quality-gated boundary fast mode: carry generated "
                        "rgb latents across chunk boundaries instead of "
                        "re-encoding the carry pixels")
    p.add_argument("--flow_cache", default=None,
                   help="flow-caching mode: none | skip_odd | adaptive[:tau] "
                        "(error-bounded adaptive caching; overrides the "
                        "--fast preset's choice)")
    p.add_argument("--aot_cache", default=None, metavar="DIR",
                   help="persist compiled executables under DIR across "
                        "processes (utils/aot.py) — later runs skip the "
                        "remote compiles")
    args = p.parse_args()
    main(**vars(args))


if __name__ == "__main__":
    cli()
