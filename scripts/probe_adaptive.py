"""Probe: speed/deviation sweep of the error-bounded adaptive flow cache.

Runs one full-size steady 57-frame chunk exactly, then with
``flow_cache="adaptive:tau"`` for several error bounds — tau is a TRACED
scalar, so every tau reuses the same compiled programs. Reports chunk time
and the deviation vs the exact rollout on identical seeds (p95 / mean |d|
in 8-bit pixel units), the same gate metric bench.py records for the
static skip_odd mode (7.89 s; deviation p95 ~0.026 on sine weights).

Usage: python scripts/probe_adaptive.py [tau ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import fast_params, sync
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.pipeline import InferencePipeline

    taus = [float(a) for a in sys.argv[1:]] or [0.05, 0.12, 0.25, 0.5]

    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    dtype = jnp.bfloat16
    H, W = 384, 512

    t0 = time.time()
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])
    print(f"[adaptive] params ready in {time.time()-t0:.1f}s", file=sys.stderr)

    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."] * 7)
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}

    def chunk(pipe, seed):
        t0 = time.time()
        out = pipe.generate(batch, seed=seed)
        sync(out["pred_img"])
        sync(out["pred_disparity"])
        return time.time() - t0, out

    exact = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                              decode_window=1)
    chunk(exact, 0)                      # compile
    dt_e, out_e = chunk(exact, 1)
    ref_img = np.asarray(out_e["pred_img"], np.float32)
    print(f"[adaptive] exact chunk: {dt_e:.2f}s", file=sys.stderr)
    del out_e, exact

    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                             decode_window=1, flow_cache=f"adaptive:{taus[0]}")
    chunk(pipe, 0)                       # compile the adaptive programs once
    for tau in taus:
        pipe.adaptive_tau = jnp.float32(tau)
        dt, out = chunk(pipe, 1)         # identical seed to the exact run
        img_a = np.asarray(out["pred_img"], np.float32)
        d = np.abs(img_a - ref_img) * 127.5      # [-1,1] -> 8-bit units
        print(f"[adaptive] tau={tau:<5g} chunk {dt:5.2f}s "
              f"({57/dt:.2f} fps, exact {57/dt_e:.2f}) "
              f"dev p95 {np.percentile(d, 95):.4f} mean {d.mean():.4f} "
              f"max {d.max():.2f} (8-bit units)")
        del out, img_a, d


if __name__ == "__main__":
    main()
