"""Probe: can AOT-serialized executables bypass the 822 s serving cold start?
(VERDICT r4 #9, timeboxed.)

The axon remote compiler does not persist big TPU executables across
processes (CLAUDE.md): every fresh full-size process re-pays ~minutes of
compiles. JAX's AOT path (``jax.jit(f).lower(args).compile()`` +
``jax.experimental.serialize_executable``) serializes the COMPILED PJRT
executable; if a fresh process can deserialize and run it, the serving
cold start becomes a file read.

Two phases in SEPARATE processes (the point is crossing the process
boundary):

  python scripts/probe_aot.py save   # compile a deployment-size denoise
                                     # stage program, serialize to /tmp
  python scripts/probe_aot.py load   # fresh process: deserialize + run,
                                     # no compile — measure end-to-end

A negative result (serialize/deserialize unsupported on the axon PJRT
client, or load still triggers a compile) is an acceptable outcome to
record. Run exclusively (shares the axon tunnel).
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

PAYLOAD = "/tmp/probe_aot_executable.pkl"


def build_args():
    """A deployment-shaped stage-2 denoise scan: the biggest single compile
    of the serving path (full 24-layer MMDiT, 5 Euler steps, CFG rows=2).
    PROBE_TINY=1 swaps in the tiny architecture — same program structure,
    ~seconds of compile — to answer the MECHANISM question (does
    serialize/deserialize work over the axon PJRT client and skip the
    remote compile?) cheaply; the full-size run then only quantifies the
    savings."""
    from deepv_tpu.config import MMDiTConfig, PipelineConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.models.mmdit import init_mmdit_params
    from deepv_tpu.models.scheduler import FlowMatchSchedule
    from deepv_tpu.pipeline import _pyramid_list, padded_conditions

    if os.environ.get("PROBE_TINY") == "1":
        mcfg = MMDiTConfig(
            sample_size=16, patch_size=2, in_channels=14, num_layers=2,
            attention_head_dim=8, num_attention_heads=4,
            caption_projection_dim=32, pooled_projection_dim=16,
            pos_embed_max_size=32, joint_attention_dim=24)
        pcfg = PipelineConfig()
        H, W = 64, 64
    else:
        mcfg = MMDiTConfig()
        mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
        pcfg = PipelineConfig()
        H, W = 384, 512
    lh, lw = H // 8, W // 8
    t0 = time.time()
    params = jax.jit(lambda: init_mmdit_params(
        jax.random.key(0, impl="rbg"), mcfg, dtype=jnp.bfloat16))()
    jax.tree.leaves(params)[0].block_until_ready()
    float(jnp.mean(jax.tree.leaves(params)[0].astype(jnp.float32)))
    print(f"[aot] mmdit params in {time.time()-t0:.0f}s", flush=True)

    clean = _pyramid_list(jax.random.normal(
        jax.random.PRNGKey(1), (1, mcfg.in_channels, 8, lh, lw), jnp.bfloat16), 2)
    conds = padded_conditions(pcfg, clean, 7, True, 2)
    conditions, times, valid = conds[2]
    embeds = random_text_embeds(0, ["empty"], joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    e = embeds["empty"]
    text = jnp.concatenate([jnp.asarray(e["prompt_embeds"], jnp.bfloat16)] * 2, 0)
    mask = jnp.concatenate([jnp.asarray(e["prompt_attention_mask"], jnp.int32)] * 2, 0)
    pooled = jnp.concatenate([jnp.asarray(e["pooled_prompt_embeds"], jnp.bfloat16)] * 2, 0)
    sched = FlowMatchSchedule(pcfg.scheduler)
    ss = sched.stage_schedule(pcfg.num_inference_steps, 2)
    ts = jnp.asarray(ss.timesteps)
    dsig = jnp.asarray(ss.sigmas[1:] - ss.sigmas[:-1])
    lat = jax.random.normal(jax.random.PRNGKey(2),
                            (1, mcfg.in_channels, 1, lh, lw), jnp.bfloat16)
    args = (mcfg, params, conditions, times, valid, lat, text, mask, pooled,
            ts, dsig, jnp.float32(3.5), jnp.float32(6.0), None, None)
    kw = dict(num_rows=2, history_downsample_ratio=2, zero_depth=False,
              attn_impl="pallas", recompute=(), adaptive_tau=None, mesh=None)
    return args, kw


def save():
    from deepv_tpu.pipeline import _stage_scan

    args, kw = build_args()
    import functools
    f = jax.jit(functools.partial(_stage_scan, args[0], **kw))
    t0 = time.time()
    lowered = f.lower(*args[1:])
    print(f"[aot] lowered in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"[aot] compiled in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = compiled(*args[1:])
    float(jnp.mean(out.astype(jnp.float32)))
    print(f"[aot] first run {time.time()-t0:.2f}s", flush=True)

    from jax.experimental.serialize_executable import serialize
    t0 = time.time()
    payload, in_tree, out_tree = serialize(compiled)
    with open(PAYLOAD, "wb") as fh:
        pickle.dump({"payload": payload, "in_tree": in_tree,
                     "out_tree": out_tree}, fh)
    print(f"[aot] serialized {os.path.getsize(PAYLOAD)/1e6:.1f} MB in "
          f"{time.time()-t0:.1f}s -> {PAYLOAD}", flush=True)


def load():
    t_proc = time.time()
    args, kw = build_args()   # inputs must exist either way; params dominate
    from jax.experimental.serialize_executable import deserialize_and_load
    t0 = time.time()
    with open(PAYLOAD, "rb") as fh:
        blob = pickle.load(fh)
    compiled = deserialize_and_load(blob["payload"], blob["in_tree"],
                                    blob["out_tree"])
    print(f"[aot] deserialized in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = compiled(*args[1:])
    print(f"[aot] run-from-deserialized: {time.time()-t0:.2f}s "
          f"(mean {float(jnp.mean(out.astype(jnp.float32))):.4f}); "
          f"process total {time.time()-t_proc:.0f}s", flush=True)


if __name__ == "__main__":
    {"save": save, "load": load}[sys.argv[1]]()
