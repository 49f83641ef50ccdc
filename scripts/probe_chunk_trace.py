"""Probe: device-busy fraction across one steady-state generate() chunk.

Traces a full 57-frame chunk after warmup and reports wall time, total
device-busy time, and the largest device idle gaps — distinguishing
compute-bound from dispatch/host-bound operation on the axon tunnel.

Usage: python scripts/probe_chunk_trace.py
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def analyze(logdir: str):
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    proc = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    # top-level device program executions: take the outermost jit_* spans on
    # TPU tracks and merge into busy intervals
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
    if not spans:
        print("no jit_ spans found; falling back to all X events")
        return
    spans.sort()
    t0, t1 = spans[0][0], max(s[1] for s in spans)
    wall_ms = (t1 - t0) / 1e3
    # merge
    busy = 0.0
    gaps = []
    cur_s, cur_e = spans[0][0], spans[0][1]
    prog_time = defaultdict(float)
    prog_n = defaultdict(int)
    for s, e, name in spans:
        prog_time[name] += (e - s) / 1e3
        prog_n[name] += 1
    for s, e, _ in spans[1:]:
        if s > cur_e:
            gaps.append((cur_e, s))
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy += cur_e - cur_s
    busy_ms = busy / 1e3
    print(f"traced window: {wall_ms:.0f} ms wall, {busy_ms:.0f} ms device-busy "
          f"({100*busy_ms/wall_ms:.1f}%), {len(spans)} program executions")
    gaps.sort(key=lambda g: g[0] - g[1])
    print("largest idle gaps (ms):",
          [round((b - a) / 1e3, 1) for a, b in gaps[:15]])
    print(f"total idle {sum((b-a) for a,b in gaps)/1e3:.0f} ms "
          f"across {len(gaps)} gaps")
    print("\ndevice time by program:")
    for name, ms in sorted(prog_time.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms:9.1f} ms  n={prog_n[name]:4d}  {name[:90]}")


def main():
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
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
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype)

    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."] * 7)
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}

    out = pipe.generate(batch, seed=0)      # warmup/compile
    sync(out["pred_img"]); sync(out["pred_disparity"])

    logdir = "/tmp/deepv_trace_chunk"
    t0 = time.time()
    jax.profiler.start_trace(logdir)
    out = pipe.generate(batch, seed=1)
    sync(out["pred_img"]); sync(out["pred_disparity"])
    jax.profiler.stop_trace()
    print(f"steady chunk wall: {time.time()-t0:.2f}s")
    analyze(logdir)


if __name__ == "__main__":
    main()
