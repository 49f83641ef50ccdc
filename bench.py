"""Benchmark: sustained RGB+depth generation rate on one chip.

Prints ONE JSON line:
  {"metric": "gen_fps_chip", "value": N, "unit": "frames/s", "vs_baseline": N/4.0}

Baseline: the reference generates 4 FPS (RGB+depth autoregressive rollout)
on one NVIDIA A800 (ref README.md:78; BASELINE.md). We measure the same
quantity — pixel frames per wall-clock second for a full 57-frame chunk of
``InferencePipeline.generate`` at 384x512 with the deployment architecture
(24-layer d=1536 MMDiT, full causal video VAE), CFG rows included, VAE
decode of RGB+disparity included — on the single available TPU chip.

Weights are constant-initialised (external HF weights are not fetchable in
this environment); dense compute time is weight-value independent.

Env knobs:
  BENCH_PRESET=tiny     quick smoke preset
  BENCH_CHUNKS=N        rollout chunks to time after warmup (default 1)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp


def sync(x) -> float:
    """Force completion: on-device scalar reduce + fetch. (block_until_ready
    is a no-op on the axon tunnel backend — see CLAUDE.md.)"""
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def fast_params(mcfg, vcfg, dtype):
    """Constant-initialised full parameter tree: shapes identical to real
    weights, creation cost near zero (one fused program)."""
    from deepv_tpu.models.mmdit import init_mmdit_params
    from deepv_tpu.models.vae import init_vae_params

    def constify(tree):
        return jax.tree.map(lambda x: jnp.full(x.shape, 0.02, dtype), tree)

    # build shape skeletons cheaply via eval_shape, then materialise constants
    m_shapes = jax.eval_shape(lambda k: init_mmdit_params(k, mcfg, dtype=dtype),
                              jax.random.PRNGKey(0))
    v_shapes = jax.eval_shape(lambda k: init_vae_params(k, vcfg, dtype=dtype),
                              jax.random.PRNGKey(0))
    return {"mmdit": constify(m_shapes), "vae": constify(v_shapes)}


def main():
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.pipeline import InferencePipeline

    preset = os.environ.get("BENCH_PRESET", "full")
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "1"))

    if preset == "tiny":
        mcfg = MMDiTConfig(num_layers=2, num_attention_heads=4,
                           caption_projection_dim=256, joint_attention_dim=128,
                           pooled_projection_dim=64, attention_head_dim=64)
        vcfg = VAEConfig(encoder_block_out_channels=(32, 32, 64, 64),
                         decoder_block_out_channels=(32, 32, 64, 64),
                         encoder_layers_per_block=(1, 1, 1, 1),
                         decoder_layers_per_block=(1, 1, 1, 1),
                         encoder_norm_num_groups=8, decoder_norm_num_groups=8,
                         encoder_out_channels=16, decoder_in_channels=16)
        H, W = 128, 128
    else:
        mcfg, vcfg = MMDiTConfig(), VAEConfig()
        H, W = 384, 512

    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    dtype = jnp.bfloat16

    t0 = time.time()
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"[bench] params ready ({n_params/1e9:.2f}B) in {time.time()-t0:.1f}s",
          file=sys.stderr)

    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    # throughput configuration: batch-decode at end of chunk (streaming
    # decode — the serving default — trades ~2% throughput for ~6x better
    # time-to-first-frame; set BENCH_STREAM=1 to measure that mode)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                             decode_window=int(os.environ.get("BENCH_DECODE_WINDOW", "1")),
                             decode_batched=(preset == "tiny"),
                             stream_decode=os.environ.get("BENCH_STREAM") == "1")

    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    # 8-unit action string -> exactly one 57-frame chunk per generate() call
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."] * 7)
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}

    t0 = time.time()
    out = pipe.generate(batch, seed=0)
    sync(out["pred_img"])
    sync(out["pred_disparity"])
    warm = time.time() - t0
    frames = int(out["pred_img"].shape[2])
    print(f"[bench] warmup chunk ({frames} frames): {warm:.1f}s (incl. compile)",
          file=sys.stderr)

    t0 = time.time()
    for i in range(n_chunks):
        out = pipe.generate(batch, seed=i + 1)
        sync(out["pred_img"])
        sync(out["pred_disparity"])
    dt = (time.time() - t0) / n_chunks
    fps = frames / dt
    print(f"[bench] steady chunk: {dt:.2f}s -> {fps:.2f} frames/s", file=sys.stderr)

    print(json.dumps({
        "metric": "gen_fps_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 4.0, 3),
    }))


if __name__ == "__main__":
    main()
