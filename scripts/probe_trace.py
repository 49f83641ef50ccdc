"""Probe: device-trace op breakdown of the stage-2 denoise scan program.

Captures a jax profiler trace of one ``_denoise_stage`` call (the 5-step
Euler scan at the largest packed shape) and prints the top ops by total
device time, to locate the gap between the scan's per-step cost and the
standalone forward's (bench_denoise.py showed ~88 vs ~67 ms at stage 2).

Usage: python scripts/probe_trace.py [stage]
"""

import functools
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def summarize(logdir: str, top: int = 30):
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        print("no trace files under", logdir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-track complete events: pid/tid naming varies; keep X events with
    # durations, group by name, and separate host threads from TPU tracks via
    # the process name metadata
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = proc_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname and "XLA" not in pname.upper():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_op[e["name"]] += dur
        total += dur
    print(f"device events total {total:.1f} ms across {len(by_op)} op names "
          f"(file {os.path.basename(files[-1])})")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:9.2f} ms  {name[:110]}")


def main():
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.pipeline import InferencePipeline, _pyramid_list, _denoise_stage

    i_stage = int(sys.argv[1]) if len(sys.argv) > 1 else 2

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

    ds = pcfg.vae_downsample
    lh, lw = H // ds, W // ds
    key = jax.random.PRNGKey(0)
    u = 4
    clean_full = jax.random.normal(key, (1, mcfg.in_channels, u, lh, lw), dtype)
    clean = _pyramid_list(clean_full, len(pcfg.stages) - 1)
    conds = pipe._padded_conditions(clean, u, True, 2)

    pe, pm, pp = pipe._embeds_for("empty")
    text = jnp.concatenate([pe, pe], 0)
    mask = jnp.concatenate([pm, pm], 0)
    pooled = jnp.concatenate([pp, pp], 0)

    ss = pipe.schedule.stage_schedule(pcfg.num_inference_steps, i_stage)
    ts = jnp.asarray(ss.timesteps)
    dsig = jnp.asarray(ss.sigmas[1:] - ss.sigmas[:-1])
    lat = jax.random.normal(key, (1, mcfg.in_channels, 1,
                                  lh // (2 ** (2 - i_stage)),
                                  lw // (2 ** (2 - i_stage))), dtype)
    conditions, times, valid = conds[i_stage]

    def run_stage():
        return _denoise_stage(
            mcfg, params["mmdit"], conditions, times, valid, lat,
            text, mask, pooled, ts, dsig,
            jnp.float32(3.5), jnp.float32(6.0), None, None,
            num_rows=2, history_downsample_ratio=2,
            zero_depth=False, attn_impl=pipe.attn_impl)

    sync(run_stage())          # compile outside the trace
    logdir = f"/tmp/deepv_trace_stage{i_stage}"
    jax.profiler.start_trace(logdir)
    sync(run_stage())
    jax.profiler.stop_trace()
    summarize(logdir)


if __name__ == "__main__":
    main()
