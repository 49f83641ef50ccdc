"""Probe: where the chunk-BOUNDARY time goes in a sustained rollout.

Traces chunk 2 of a 2-chunk rollout and prints a timeline of every device
program >20 ms with the idle gaps between them, so the boundary extras
(3-row CFG denoise, 25-frame overlap re-decode, carry re-encode, history
encode — ref pipeline.py:316-411 semantics) can be attributed and host
stalls found.  Also times the carry re-encode variants:

  - serial rows (current): two batch-1 encodes, 8-frame windows
  - batched rows: one batch-2 encode, 8-frame windows
  - window-size sweep: 8 vs 12 vs 16 (memory permitting)

Usage: python scripts/probe_boundary.py
"""

import glob
import gzip
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def analyze_timeline(logdir: str, t_lo_ms: float = 0.0):
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    proc = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    spans = []
    for e in events:
        if e.get("ph") != "X":
            continue
        p = proc.get(e.get("pid"), "")
        if "TPU" not in p and "tpu" not in p and "XLA" not in p.upper():
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.startswith("jit__"):
            spans.append((e["ts"], e["ts"] + e.get("dur", 0), name))
    spans.sort()
    t0 = spans[0][0]
    print(f"\n=== device timeline ({len(spans)} programs; >20 ms shown) ===")
    prev_end = None
    busy = 0.0
    idle = 0.0
    for s, e, name in spans:
        dur = (e - s) / 1e3
        busy += dur
        if prev_end is not None and s > prev_end:
            gap = (s - prev_end) / 1e3
            idle += gap
            if gap > 20:
                print(f"  {'':>10} ... idle {gap:7.1f} ms ...")
        if dur > 20:
            print(f"  t={ (s - t0)/1e3:9.1f}  {dur:7.1f} ms  {name[:70]}")
        prev_end = max(prev_end or e, e)
    wall = (spans[-1][1] - t0) / 1e3
    print(f"wall {wall:.0f} ms, busy {busy:.0f} ms ({100*busy/wall:.1f}%), "
          f"idle {idle:.0f} ms")


def main():
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.models.vae import vae_encode, gaussian_sample
    from deepv_tpu.pipeline import InferencePipeline

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
                             decode_window=1)

    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    n_unit_cfg = pcfg.max_temporal_length - pcfg.num_input_unit
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."]
                       * (pcfg.max_temporal_length - 1 + n_unit_cfg))
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}

    t0 = time.time()
    out = pipe.generate(batch, seed=0)      # warmup/compile (2 chunks)
    sync(out["pred_img"]); sync(out["pred_disparity"])
    print(f"warmup 2-chunk rollout: {time.time()-t0:.1f}s (incl. compile)")
    del out

    logdir = "/tmp/deepv_trace_boundary"
    t0 = time.time()
    jax.profiler.start_trace(logdir)
    out = pipe.generate(batch, seed=1)
    sync(out["pred_img"]); sync(out["pred_disparity"])
    jax.profiler.stop_trace()
    print(f"2-chunk rollout wall: {time.time()-t0:.2f}s")
    del out
    analyze_timeline(logdir)

    # ---- carry re-encode variants ------------------------------------------
    print("\n=== carry re-encode (25 frames rgb+disp) variants ===")
    carry = jax.random.uniform(jax.random.PRNGKey(3), (2, 3, 25, H, W),
                               minval=-1.0, maxval=1.0).astype(dtype)
    key = jax.random.PRNGKey(9)

    def serial(win):
        parts = [vae_encode(vcfg, params["vae"], carry[i:i + 1],
                            temporal_chunk=True, window_size=win)
                 for i in range(2)]
        return gaussian_sample(jnp.concatenate(parts, axis=0), key)

    def batched(win):
        m = vae_encode(vcfg, params["vae"], carry,
                       temporal_chunk=True, window_size=win)
        return gaussian_sample(m, key)

    variants = [("serial w8 (current)", lambda: serial(8)),
                ("serial w16", lambda: serial(16)),
                ("batched w8", lambda: batched(8)),
                ("batched w16", lambda: batched(16))]
    ref = None
    for name, fn in variants:
        try:
            sync(fn())                       # compile
            t0 = time.time()
            for _ in range(3):
                r = fn()
                sync(r)
            dt = (time.time() - t0) / 3
            v = np.asarray(r, np.float32)
            if ref is None:
                ref = v
                dev = 0.0
            else:
                dev = float(np.max(np.abs(v - ref)))
            print(f"  {name:22s} {dt*1e3:8.1f} ms   max|Δ| vs serial w8: {dev:.2e}")
        except Exception as ex:
            print(f"  {name:22s} FAILED: {type(ex).__name__}: {str(ex)[:120]}")


if __name__ == "__main__":
    main()
