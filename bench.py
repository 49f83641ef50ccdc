"""Benchmark: sustained RGB+depth generation rate on one chip.

Prints ONE JSON line whose primary metric is the baseline's headline number,
with the other two metrics of record (BASELINE.md:18-19) as extra fields:

  {"metric": "gen_fps_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/4.0,
   "denoise_steps_per_s": N, "ttff_p50_s": N, "attn_parity_max_err": N,
   "sustained_fps": N, "chunk2plus_new_frames_per_s": N,
   "gen_fps_fast": N, "sustained_fps_fast": N,
   "fast_deviation_p95": N, "fast_deviation_mean": N}

``sustained_fps`` is the honest steady-state autoregressive number: ONE
continuous >=3-chunk rollout (first chunk + chunk boundaries with 3-row CFG,
25-frame overlap re-decode, carry re-encode, retrieved history — ref
pipeline.py:316-411 semantics) divided by its whole wall-clock;
``chunk2plus_new_frames_per_s`` isolates the post-first-chunk regime (new
frames per second once the rollout is warm). ``gen_fps_fast`` is the same
single-chunk measurement with the quality-gated fast modes on
(flow_cache="skip_odd" + int8 top-resolution VAE convs), and
``fast_deviation_p95``/``_mean`` quantify that gate: |Δ| in 8-bit pixel units
vs the exact rollout on identical seeds over the full 57-frame chunk.

Baseline: the reference generates 4 FPS (RGB+depth autoregressive rollout)
on one NVIDIA A800 (ref README.md:78; BASELINE.md). We measure the same
quantity — pixel frames per wall-clock second for a full 57-frame chunk of
``InferencePipeline.generate`` at 384x512 with the deployment architecture
(24-layer d=1536 MMDiT, full causal video VAE), CFG rows included, VAE
decode of RGB+disparity included — on the single available TPU chip.
``denoise_steps_per_s`` is Euler steps (105/chunk = 7 units x 3 stages x 5
steps) over synced denoise wall-clock; ``ttff_p50_s`` is the p50 over 3
streaming-mode runs of time from generate() start to the first decoded
pixels. ``attn_parity_max_err`` asserts the production Pallas attention
kernel against the jnp reference ON THE REAL CHIP at the deployment packed
shape (compiled, not interpret mode).

Weights are constant-initialised (external HF weights are not fetchable in
this environment); dense compute time is weight-value independent.

Env knobs:
  BENCH_PRESET=tiny     quick smoke preset
  BENCH_CHUNKS=N        rollout chunks to time after warmup (default 1)
"""

import functools
import gc
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
    """Cheaply-initialised full parameter tree: shapes identical to real
    weights, creation cost near zero (ONE jitted program — per-leaf
    jax.random.* would round-trip the tunnel hundreds of times). Values are
    small sines of iota rather than a constant: a constant fill makes the
    decoded disparity spatially constant, which NaNs the chunk-boundary
    ``scale_factor = 1/max(disparity)`` (the reference's own formula) and
    poisons every chunk>=2 — timing is value-independent either way, but the
    deviation metrics need finite pixels."""
    from deepv_tpu.models.mmdit import init_mmdit_params
    from deepv_tpu.models.vae import init_vae_params

    # build shape skeletons cheaply via eval_shape, then materialise varied
    # values in a single fused program
    m_shapes = jax.eval_shape(lambda k: init_mmdit_params(k, mcfg, dtype=dtype),
                              jax.random.PRNGKey(0))
    v_shapes = jax.eval_shape(lambda k: init_vae_params(k, vcfg, dtype=dtype),
                              jax.random.PRNGKey(0))
    skeleton = {"mmdit": m_shapes, "vae": v_shapes}
    leaves, treedef = jax.tree.flatten(skeleton)

    @jax.jit
    def materialise():
        outs = []
        for i, leaf in enumerate(leaves):
            n = max(int(np.prod(leaf.shape)), 1)
            v = 0.02 * jnp.sin(jnp.arange(n, dtype=jnp.float32)
                               * (0.618 + 1e-4 * i))
            outs.append(v.reshape(leaf.shape).astype(dtype))
        return outs

    return jax.tree.unflatten(treedef, materialise())


def attention_parity_on_chip(mcfg, H, W, ctx_len=77) -> float:
    """Compiled Pallas kernel vs jnp reference at the deployment packed shape
    (stage-2 layout: padded old clip + mid + last + current unit). Returns the
    max abs error; asserts it is within f32 tolerance. Closes the gap that the
    kernel was otherwise only ever tested in interpret mode on CPU."""
    from deepv_tpu.ops.attention import attention_pallas, attention_reference

    p = 2
    lh, lw = H // 8, W // 8
    tok = lambda h, w: (h // p) * (w // p)
    # stage-2 packed video tokens: old 6 frames @ /4, mid @ /2, last + current @ /1
    video = 6 * tok(lh // 4, lw // 4) + tok(lh // 2, lw // 2) + 2 * tok(lh, lw)
    s = ctx_len + video
    b, nh, hd = 2, mcfg.num_attention_heads, mcfg.attention_head_dim
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, s, nh, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, nh, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, nh, hd), jnp.float32)
    # validity: one masked ctx token per row; times: ctx at 0, frames 0..8
    valid = jnp.ones((b, s), jnp.int32).at[:, 0].set(0)
    reps = [ctx_len] + [tok(lh // 4, lw // 4)] * 6 + [tok(lh // 2, lw // 2)] + [tok(lh, lw)] * 2
    times = jnp.repeat(jnp.arange(len(reps), dtype=jnp.float32) - 1.0,
                       jnp.asarray(reps), total_repeat_length=s).at[:ctx_len].set(0.0)
    # make the last clip's times strictly largest (the denoise invariant)
    # so the split path is exercised exactly as in production
    n_last = tok(lh, lw)
    out_r = jax.jit(attention_reference)(q, k, v, valid, times)
    errs = []
    for nl in (0, n_last):
        out_p = jax.jit(functools.partial(attention_pallas, n_last=nl))(
            q, k, v, valid, times)
        err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                    - out_r.astype(jnp.float32))))
        assert err < 2e-3, f"pallas attention (n_last={nl}) diverges: {err}"
        errs.append(err)
    print(f"[bench] pallas-vs-ref attention parity @ S={s}: fused {errs[0]:.2e}, "
          f"split {errs[1]:.2e}", file=sys.stderr)
    return max(errs)


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

    # -- metric of record 2: denoise steps/s (one synced-timer chunk) --------
    # (runs BEFORE the sustained/fast sections: the sync-timer methodology is
    # only clean while the exact pipe's programs are the sole device
    # residents — measured 2.6x distortion when run after them)
    from deepv_tpu.utils.profiling import PhaseTimer
    pipe.timer = PhaseTimer(sync=True)
    pipe.generate(batch, seed=99)
    d = pipe.timer.stats().get("denoise_unit", {"total_s": float("nan"), "count": 0})
    n_steps = d["count"] * len(pcfg.stages) * pcfg.num_inference_steps
    steps_per_s = n_steps / d["total_s"] if d["total_s"] else float("nan")
    print(f"[bench] denoise: {n_steps} Euler steps in {d['total_s']:.2f}s "
          f"-> {steps_per_s:.1f} steps/s", file=sys.stderr)
    print(f"[bench] phases: {json.dumps(pipe.timer.stats())}", file=sys.stderr)
    pipe.timer = PhaseTimer(sync=False)

    # -- metric of record 3: p50 time-to-first-frame (streaming mode) --------
    spipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                              stream_decode=True)
    ttffs = []
    for i in range(4):   # first run compiles the streaming decode programs
        marks = []

        def mark(rgb, disp):
            if not marks:
                sync(rgb)              # first frame counts when fetchable
                marks.append(time.time())

        spipe.on_frames = mark
        t0 = time.time()
        out_s = spipe.generate(batch, seed=200 + i)
        spipe.on_frames = None
        ttffs.append(marks[0] - t0)
        sync(out_s["pred_img"])   # drain: next run must not queue behind us
    ttffs = sorted(ttffs[1:])              # drop the compile run
    ttff_p50 = ttffs[len(ttffs) // 2]
    print(f"[bench] ttff runs: {[round(t, 3) for t in ttffs]} -> p50 {ttff_p50:.3f}s",
          file=sys.stderr)
    # HBM discipline: every section releases its pipe + device outputs
    # before the next one — holding them all OOMs the chip (params are
    # 4.9 GB; each 121-frame rollout output is ~0.3 GB on device)
    del spipe, out_s

    # -- sustained autoregressive rate: ONE continuous >=3-chunk rollout -----
    # (the regime BASELINE.md:17 actually defines — chunk boundaries carry
    # 3-row CFG, the 25-frame overlap re-decode, the carry re-encode and
    # retrieved-history encode, ref pipeline.py:316-411). The boundary's
    # overlap re-decode runs with EXACT cache priming (the default —
    # pipeline._decode_latents_primed skips only the discarded-pixel share;
    # outputs equal the full re-decode bit-for-bit,
    # tests/test_prime_decode.py). NOTE the exact STREAMING multi-chunk
    # rollout at full size exhausts HBM (scripts/probe_mem.py) — sustained
    # is measured on the end-of-chunk decode path, like the single-chunk
    # metric of record.
    sus_chunks = int(os.environ.get("BENCH_SUSTAINED_CHUNKS", "3"))
    n_unit_cfg = pcfg.max_temporal_length - pcfg.num_input_unit
    long_prompts = np.array(
        ["empty"] + ["Move forward. The perspective hasn't changed."]
        * (pcfg.max_temporal_length - 1 + (sus_chunks - 1) * n_unit_cfg))
    long_batch = {"img": img, "prompt": long_prompts, "prompt_type": "action"}
    t0 = time.time()
    out_l = pipe.generate(long_batch, seed=7)     # compile pass (boundary programs)
    sync(out_l["pred_img"]); sync(out_l["pred_disparity"])
    warm_l = time.time() - t0
    frames_l = int(out_l["pred_img"].shape[2])
    print(f"[bench] sustained warmup ({sus_chunks} chunks, {frames_l} frames): "
          f"{warm_l:.1f}s (incl. compile)", file=sys.stderr)
    del out_l; gc.collect()   # free the warmup's ~0.3 GB device output
    t0 = time.time()
    out_l = pipe.generate(long_batch, seed=8)
    sync(out_l["pred_img"]); sync(out_l["pred_disparity"])
    dt_l = time.time() - t0
    sustained_fps = frames_l / dt_l
    # isolate chunk>=2: subtract the separately-measured first-chunk time
    chunk2plus = (frames_l - frames) / max(dt_l - dt, 1e-9)
    print(f"[bench] sustained: {frames_l} frames / {dt_l:.1f}s -> "
          f"{sustained_fps:.2f} fps; chunk2+ new frames: "
          f"{chunk2plus:.2f}/s", file=sys.stderr)
    out_l_np = np.asarray(out_l["pred_img"], np.float32)   # host copy for
    del out_l                                              # the reuse diff

    # itemise where the sustained rollout's time goes (VERDICT r2 #2): one
    # more sustained rollout with per-phase device syncs. Runs immediately
    # after the exact sustained timing — the sync-timer methodology is only
    # clean while the exact pipe's programs are the sole device residents
    # (CLAUDE.md). encode = conditioning/carry re-encodes AND the
    # retrieved-history encode (both run under the "vae_encode" phase);
    # other = pose chaining, noise sampling, host bookkeeping. Guarded like
    # the sections below: the JSON line must emit even if this rollout OOMs.
    sus_denoise_s = sus_prime_s = sus_decode_s = sus_encode_s = sus_other_s = None
    try:
        pipe.timer = PhaseTimer(sync=True)
        t0 = time.time()
        out_i = pipe.generate(long_batch, seed=8)
        sync(out_i["pred_img"]); sync(out_i["pred_disparity"])
        wall_i = time.time() - t0
        ph = pipe.timer.stats()
        sus_denoise_s = ph.get("denoise_unit", {}).get("total_s", float("nan"))
        sus_prime_s = ph.get("prime", {}).get("total_s", 0.0)
        sus_decode_s = (ph.get("vae_decode", {}).get("total_s", 0.0)
                        + ph.get("stream_decode", {}).get("total_s", 0.0))
        if not pipe.stream_decode:
            # end-of-chunk mode nests "prime" inside "vae_decode" — un-double-count
            sus_decode_s -= sus_prime_s
        sus_encode_s = ph.get("vae_encode", {}).get("total_s", float("nan"))
        sus_other_s = (wall_i - sus_denoise_s - sus_decode_s - sus_prime_s
                       - sus_encode_s)
        print(f"[bench] sustained itemisation ({wall_i:.1f}s synced wall): "
              f"denoise {sus_denoise_s:.2f}s, decode {sus_decode_s:.2f}s, "
              f"prime {sus_prime_s:.2f}s, encode {sus_encode_s:.2f}s, "
              f"other {sus_other_s:.2f}s", file=sys.stderr)
        del out_i
    except Exception as e:
        print(f"[bench] itemisation section failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        out_i = None
    pipe.timer = PhaseTimer(sync=False)
    gc.collect()

    # -- quality-gated fast modes: rate AND measured deviation ---------------
    # (the full composition: flow caching + int8 top-level VAE decode + int8
    # MMDiT linears — measured individually in docs/ARCHITECTURE.md)
    from dataclasses import replace as _dc_replace
    vcfg_fast = _dc_replace(vcfg, conv_impl="int8")
    fps_fast = fast_dev_p95 = fast_dev_mean = sustained_fps_fast = None
    try:
        fpipe = InferencePipeline(pcfg, mcfg, vcfg_fast, params, embeds,
                                  dtype=dtype, flow_cache="skip_odd",
                                  denoise_int8=True,
                                  decode_window=pipe.decode_window,
                                  decode_batched=(preset == "tiny"),
                                  stream_decode=pipe.stream_decode)
        exact_ref = pipe.generate(batch, seed=42)
        sync(exact_ref["pred_img"])
        t0 = time.time()
        out_f = fpipe.generate(batch, seed=42)        # compile pass
        sync(out_f["pred_img"]); sync(out_f["pred_disparity"])
        print(f"[bench] fast warmup: {time.time()-t0:.1f}s (incl. compile)",
              file=sys.stderr)
        del out_f; gc.collect()   # free the warmup output before timing
        t0 = time.time()
        out_f = fpipe.generate(batch, seed=42)
        sync(out_f["pred_img"]); sync(out_f["pred_disparity"])
        dt_f = time.time() - t0
        fps_fast = frames / dt_f
        # deviation vs the exact rollout, identical seeds: 8-bit pixel units
        dev = np.abs(np.asarray(out_f["pred_img"], np.float32)
                     - np.asarray(exact_ref["pred_img"], np.float32)) * 127.5
        fast_dev_p95 = float(np.percentile(dev, 95))
        fast_dev_mean = float(dev.mean())
        print(f"[bench] fast modes (skip_odd + int8 vae + int8 denoise): "
              f"{dt_f:.2f}s -> {fps_fast:.2f} fps; deviation p95 "
              f"{fast_dev_p95:.2f} / mean {fast_dev_mean:.2f} (8-bit units)",
              file=sys.stderr)
        del out_f, exact_ref

        # sustained rate with the fast modes on (same continuous >=3-chunk
        # rollout; per-chunk deviation quantified above on identical seeds)
        t0 = time.time()
        out_sf = fpipe.generate(long_batch, seed=8)   # compile pass (boundaries)
        sync(out_sf["pred_img"]); sync(out_sf["pred_disparity"])
        print(f"[bench] sustained-fast warmup: {time.time()-t0:.1f}s",
              file=sys.stderr)
        del out_sf; gc.collect()
        t0 = time.time()
        out_sf = fpipe.generate(long_batch, seed=8)
        sync(out_sf["pred_img"]); sync(out_sf["pred_disparity"])
        dt_sf = time.time() - t0
        sustained_fps_fast = frames_l / dt_sf
        print(f"[bench] sustained-fast: {frames_l} frames / {dt_sf:.1f}s -> "
              f"{sustained_fps_fast:.2f} fps", file=sys.stderr)
        del fpipe, out_sf          # release the int8 weight copies + outputs
    except Exception as e:
        print(f"[bench] fast section failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        # drop whatever the section held (pipes pin int8 weight copies,
        # outputs pin HBM) so later sections don't OOM in cascade
        fpipe = exact_ref = out_f = out_sf = None
    gc.collect()

    # -- boundary optimisation: reuse_decoder_cache sustained rate + cost ----
    # (skips the overlap re-decode at every chunk boundary by carrying the
    # decoder's conv caches; deviation vs the exact sustained rollout on the
    # same seed quantifies the fidelity cost). Runs in END-OF-CHUNK decode
    # mode: the pixels equal the streaming reuse mode's, every decode
    # program is already compiled by the exact pipe, and the streaming
    # rollout's extra HBM pressure (scripts/probe_mem.py) is avoided —
    # reuse never builds a second cache generation at the boundary.
    # Guarded like every optional section below: the bench must emit its
    # JSON line even if a section exhausts HBM (metrics become null).
    sustained_fps_reuse = reuse_dev_p95 = reuse_dev_mean = None
    try:
        rpipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                                  decode_window=pipe.decode_window,
                                  decode_batched=(preset == "tiny"),
                                  stream_decode=False, reuse_decoder_cache=True)
        t0 = time.time()
        out_r = rpipe.generate(long_batch, seed=8)   # compile pass (shared shapes)
        sync(out_r["pred_img"]); sync(out_r["pred_disparity"])
        print(f"[bench] reuse warmup: {time.time()-t0:.1f}s", file=sys.stderr)
        # the reuse rollout carries ~2.8 GB of decoder caches on top of the
        # 4.9 GB params; the warmup's 121-frame output pushed the timed run
        # over HBM (measured) — free it first
        del out_r; gc.collect()
        t0 = time.time()
        out_r = rpipe.generate(long_batch, seed=8)
        sync(out_r["pred_img"]); sync(out_r["pred_disparity"])
        dt_r = time.time() - t0
        sustained_fps_reuse = frames_l / dt_r
        dev_r = np.abs(np.asarray(out_r["pred_img"], np.float32)
                       - out_l_np) * 127.5
        reuse_dev_p95 = float(np.percentile(dev_r, 95))
        reuse_dev_mean = float(dev_r.mean())
        print(f"[bench] sustained+reuse: {frames_l} frames / {dt_r:.1f}s -> "
              f"{sustained_fps_reuse:.2f} fps; deviation p95 {reuse_dev_p95:.2f} "
              f"/ mean {reuse_dev_mean:.2f} (8-bit units)", file=sys.stderr)
        del rpipe, out_r
    except Exception as e:
        print(f"[bench] reuse section failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        rpipe = out_r = None
    gc.collect()

    # composed boundary mode: reuse_decoder_cache + carry_latents (skip the
    # overlap re-decode AND the rgb carry re-encode; disparity still
    # re-encodes — pipeline.py carry_latents doc). Shares rpipe's compiled
    # programs (carry only drops one of the two serial per-row encodes)
    sustained_fps_boundary = boundary_dev_p95 = boundary_dev_mean = None
    try:
        bpipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                                  decode_window=pipe.decode_window,
                                  decode_batched=(preset == "tiny"),
                                  stream_decode=False, reuse_decoder_cache=True,
                                  carry_latents=True)
        t0 = time.time()
        out_b = bpipe.generate(long_batch, seed=8)    # warm (programs shared)
        sync(out_b["pred_img"]); sync(out_b["pred_disparity"])
        print(f"[bench] boundary warmup: {time.time()-t0:.1f}s", file=sys.stderr)
        del out_b; gc.collect()
        t0 = time.time()
        out_b = bpipe.generate(long_batch, seed=8)
        sync(out_b["pred_img"]); sync(out_b["pred_disparity"])
        dt_b = time.time() - t0
        sustained_fps_boundary = frames_l / dt_b
        dev_b = np.abs(np.asarray(out_b["pred_img"], np.float32) - out_l_np) * 127.5
        boundary_dev_p95 = float(np.percentile(dev_b, 95))
        boundary_dev_mean = float(dev_b.mean())
        print(f"[bench] sustained+reuse+carry: {frames_l} frames / {dt_b:.1f}s -> "
              f"{sustained_fps_boundary:.2f} fps; deviation p95 "
              f"{boundary_dev_p95:.2f} / mean {boundary_dev_mean:.2f} "
              f"(8-bit units)", file=sys.stderr)
        del bpipe, out_b
    except Exception as e:
        print(f"[bench] boundary section failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        bpipe = out_b = None
    gc.collect()

    # -- max-throughput composition: every quality-gated mode together -------
    # (flow caching + int8 VAE + int8 denoise + reuse_decoder_cache +
    # carry_latents — the "as fast as one chip goes" serving preset).
    # End-of-chunk decode like the reuse section: same pixels as streaming
    # reuse, lower HBM high-water mark. Guarded: this composition holds the
    # int8 weight copies AND the carried cache pytrees; if a future config
    # pushes it over HBM the bench must still emit its JSON line (metrics
    # become null).
    sustained_fps_allfast = allfast_dev_p95 = allfast_dev_mean = None
    try:
        mpipe = InferencePipeline(pcfg, mcfg, vcfg_fast, params, embeds,
                                  dtype=dtype, flow_cache="skip_odd",
                                  denoise_int8=True,
                                  decode_window=pipe.decode_window,
                                  decode_batched=(preset == "tiny"),
                                  stream_decode=False,
                                  reuse_decoder_cache=True,
                                  carry_latents=True)
        t0 = time.time()
        out_m = mpipe.generate(long_batch, seed=8)    # warm (programs shared)
        sync(out_m["pred_img"]); sync(out_m["pred_disparity"])
        print(f"[bench] allfast warmup: {time.time()-t0:.1f}s", file=sys.stderr)
        del out_m; gc.collect()
        t0 = time.time()
        out_m = mpipe.generate(long_batch, seed=8)
        sync(out_m["pred_img"]); sync(out_m["pred_disparity"])
        dt_m = time.time() - t0
        sustained_fps_allfast = frames_l / dt_m
        dev_m = np.abs(np.asarray(out_m["pred_img"], np.float32)
                       - out_l_np) * 127.5
        allfast_dev_p95 = float(np.percentile(dev_m, 95))
        allfast_dev_mean = float(dev_m.mean())
        print(f"[bench] sustained all-fast: {frames_l} frames / {dt_m:.1f}s "
              f"-> {sustained_fps_allfast:.2f} fps; deviation p95 "
              f"{allfast_dev_p95:.2f} / mean {allfast_dev_mean:.2f} "
              f"(8-bit units)", file=sys.stderr)
        del mpipe, out_m
    except Exception as e:
        print(f"[bench] all-fast composition failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        mpipe = out_m = None
    gc.collect()

    # -- on-chip kernel parity (only meaningful where pallas is the prod path)
    # Guarded like the sections above: a parity failure (or leftover HBM
    # pressure) must not stop the JSON line from emitting.
    attn_err = None
    try:
        if jax.default_backend() == "tpu" or pipe.attn_impl == "pallas":
            attn_err = attention_parity_on_chip(mcfg, H, W)
    except Exception as e:
        print(f"[bench] attention parity failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    rnd = lambda x, n=3: None if x is None else round(x, n)
    print(json.dumps({
        "metric": "gen_fps_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 4.0, 3),
        "denoise_steps_per_s": round(steps_per_s, 2),
        "ttff_p50_s": round(ttff_p50, 3),
        "attn_parity_max_err": attn_err,
        "sustained_fps": round(sustained_fps, 3),
        "chunk2plus_new_frames_per_s": round(chunk2plus, 3),
        "sustained_denoise_s": rnd(sus_denoise_s, 2),
        "sustained_decode_s": rnd(sus_decode_s, 2),
        "sustained_prime_s": rnd(sus_prime_s, 2),
        "sustained_encode_s": rnd(sus_encode_s, 2),
        "sustained_other_s": rnd(sus_other_s, 2),
        "gen_fps_fast": rnd(fps_fast),
        "sustained_fps_fast": rnd(sustained_fps_fast),
        "fast_deviation_p95": rnd(fast_dev_p95),
        "fast_deviation_mean": rnd(fast_dev_mean),
        "sustained_fps_reuse": rnd(sustained_fps_reuse),
        "reuse_deviation_p95": rnd(reuse_dev_p95),
        "reuse_deviation_mean": rnd(reuse_dev_mean),
        "sustained_fps_boundary": rnd(sustained_fps_boundary),
        "boundary_deviation_p95": rnd(boundary_dev_p95),
        "boundary_deviation_mean": rnd(boundary_dev_mean),
        "sustained_fps_allfast": rnd(sustained_fps_allfast),
        "allfast_deviation_p95": rnd(allfast_dev_p95),
        "allfast_deviation_mean": rnd(allfast_dev_mean),
    }))


if __name__ == "__main__":
    main()
