"""Probe: when do streaming-decode windows actually become fetchable?

Records host-side dispatch timestamps of every on_frames callback (no sync),
then separately a run that syncs only the first window, and one that syncs
every window — discriminating host-dispatch progression from device
execution order on the axon tunnel.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def main():
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.pipeline import InferencePipeline
    import numpy as np

    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    dtype = jnp.bfloat16
    H, W = 384, 512
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])
    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                             stream_decode=True)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W), minval=-1, maxval=1)
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."] * 7)
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}

    # warm everything
    out = pipe.generate(batch, seed=0)
    sync(out["pred_img"])

    for mode in ("dispatch_only", "sync_first", "sync_every"):
        marks = []
        t0 = [0.0]

        def cb(rgb, disp, mode=mode):
            if mode == "sync_every" or (mode == "sync_first" and not marks):
                sync(rgb)
            marks.append(time.time() - t0[0])

        pipe.on_frames = cb
        t0[0] = time.time()
        out = pipe.generate(batch, seed=1)
        sync(out["pred_img"])
        total = time.time() - t0[0]
        pipe.on_frames = None
        print(f"{mode:14s}: windows at {[round(m, 2) for m in marks]} total {total:.2f}s")


if __name__ == "__main__":
    main()
