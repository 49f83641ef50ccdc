"""Probe: WHICH copies dominate a streaming decode window.

Re-traces one cont-mode ``_dec_window`` and prints the largest individual
copy/pad/slice events with their metadata (shape + source op), to attribute
the ~79 ms of layout copies seen in scripts/probe_dec_trace.py.

Usage: python scripts/probe_dec_copies.py
"""

import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def dump(logdir: str, top: int = 40):
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    proc = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    rows = []
    for e in events:
        if e.get("ph") != "X":
            continue
        p = proc.get(e.get("pid"), "")
        if "TPU" not in p and "tpu" not in p and "XLA" not in p.upper():
            continue
        name = e["name"]
        if not any(k in name for k in ("copy", "pad", "slice", "transpose",
                                       "bitcast", "convert")):
            continue
        rows.append((e.get("dur", 0) / 1e3, name, e.get("args", {})))
    rows.sort(reverse=True)
    tot = sum(r[0] for r in rows)
    print(f"copy/pad/slice total {tot:.1f} ms over {len(rows)} events")
    for ms, name, args in rows[:top]:
        meta = {k: v for k, v in args.items()
                if k in ("long_name", "shape", "tf_op", "source")}
        print(f"  {ms:7.3f} ms  {name}  {meta}")


def main():
    from bench import fast_params
    from deepv_tpu.config import MMDiTConfig, VAEConfig
    from deepv_tpu.models.vae import _dec_window

    vcfg = VAEConfig()
    dtype = jnp.bfloat16
    params = fast_params(MMDiTConfig(num_layers=1), vcfg, dtype)["vae"]["decoder"]
    sync(jax.tree.leaves(params)[0])

    z0 = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 1, 48, 64), dtype)
    z1 = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 1, 48, 64), dtype)

    y, cache = _dec_window(vcfg, params, z0, None, "init")
    sync(y)
    y, cache2 = _dec_window(vcfg, params, z1, cache, "cont")
    sync(y)

    logdir = "/tmp/deepv_trace_dec_copies"
    jax.profiler.start_trace(logdir)
    y, _ = _dec_window(vcfg, params, z1, cache, "cont")
    sync(y)
    jax.profiler.stop_trace()
    dump(logdir)


if __name__ == "__main__":
    main()
