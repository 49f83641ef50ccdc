"""Probe: device-trace op breakdown of one streaming decode window.

Traces a cont-mode ``_dec_window`` (1 latent frame -> 8 pixel frames at
384x512) and prints device time grouped by op family, to locate why decode
runs at ~52 TF/s when the convs alone measure 85-110 TF/s
(scripts/bench_conv.py).

Usage: python scripts/probe_dec_trace.py [batch]
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def summarize(logdir: str, top: int = 25):
    files = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    proc = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    by = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X":
            continue
        p = proc.get(e.get("pid"), "")
        if "TPU" not in p and "tpu" not in p and "XLA" not in p.upper():
            continue
        name = e["name"]
        if name.startswith(("jit_",)):
            continue
        fam = re.sub(r"[.\d]+$", "", name)
        by[fam][0] += e.get("dur", 0) / 1e3
        by[fam][1] += 1
    tot = sum(v[0] for v in by.values())
    print(f"device total (excl. jit spans) {tot:.1f} ms")
    for fam, (ms, n) in sorted(by.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {ms:9.2f} ms  n={n:5d}  {fam}")


def main():
    from bench import fast_params
    from deepv_tpu.config import MMDiTConfig, VAEConfig
    from deepv_tpu.models.vae import _dec_window

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    vcfg = VAEConfig()
    dtype = jnp.bfloat16
    params = fast_params(MMDiTConfig(num_layers=1), vcfg, dtype)["vae"]["decoder"]
    sync(jax.tree.leaves(params)[0])

    z0 = jax.random.normal(jax.random.PRNGKey(0), (b, 16, 1, 48, 64), dtype)
    z1 = jax.random.normal(jax.random.PRNGKey(1), (b, 16, 1, 48, 64), dtype)

    y, cache = _dec_window(vcfg, params, z0, None, "init")
    sync(y)
    y, cache2 = _dec_window(vcfg, params, z1, cache, "cont")
    sync(y)

    logdir = f"/tmp/deepv_trace_dec_b{b}"
    jax.profiler.start_trace(logdir)
    y, _ = _dec_window(vcfg, params, z1, cache, "cont")
    sync(y)
    jax.profiler.stop_trace()
    summarize(logdir)


if __name__ == "__main__":
    main()
