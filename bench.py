"""Benchmark: sustained RGB+depth generation rate on one chip.

Prints a JSON metrics line after EVERY completed section (the driver parses
the LAST line, so each emission is a checkpoint — a timeout or OOM can only
lose the sections that never ran, never the whole artifact). The primary
metric is the baseline's headline number; the other metrics of record
(BASELINE.md:18-19) ride along as extra fields:

  {"metric": "gen_fps_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/4.0, "init_s": N,
   "denoise_steps_per_s": N, "ttff_p50_s": N, "attn_parity_max_err": N,
   "sustained_fps": N, "sustained_runs_s": [...],
   "chunk2plus_new_frames_per_s": N,
   "sustained_denoise_s": N, ... itemisation ...,
   "sustained_fps_adaptive": N, "adaptive_deviation_p95": N, ...,
   "sustained_fps_reuse": N, "reuse_deviation_p95": N, ...,
   "gen_fps_fast": N, "sustained_fps_fast": N, ...,
   "section_s": {...}, "skipped": [...]}

Budget discipline (VERDICT r4 #1): the whole run must fit the driver's
~30-minute budget WITH margin — round 4 finished 6 s before the 1800 s
driver kill. ``BENCH_DEADLINE_S`` (default 1500 s) is a wall-clock deadline
from process start; every optional section declares a cost estimate
(scaled by the measured warmup cost, a tunnel-speed proxy) and is skipped
(metrics stay null, listed in "skipped" — including when a prerequisite
section didn't run) once the deadline would be crossed. ONE warmup — a
full sustained rollout under the sync timer — compiles the steady,
boundary, and sync-reduce program families together (round 4 paid the
chunk-1 compile debt twice); sections are ordered so the metrics of
record land first: steady chunk -> denoise itemisation -> ttff ->
sustained (+ its phase itemisation) -> the reuse/boundary/adaptive
deviation modes -> the int8 fast family last. ``sustained_fps_fast`` is
EXTENDED-ONLY (BENCH_EXTENDED=1): its extra compile debt does not fit the
driver budget and the allfast section carries the same composition's
sustained story. ``section_s`` records each section's measured wall so
the estimates stay calibrated against reality (round-5 trial:
{"init": 437, "warmup(split)": 619+1071, "steady": 64, "ttff": 121,
"reuse": 110, "boundary": 107, "adaptive": 363, "fast": 345,
"allfast": 51} at tunnel scale ~1.9).

``gen_fps_chip`` is the median of ``BENCH_CHUNKS`` (default 3) timed
chunks, with the param-init time recorded as ``init_s`` so tunnel-load
outliers are visible in the artifact.

``sustained_fps`` is the honest steady-state autoregressive number: ONE
continuous >=3-chunk rollout (first chunk + chunk boundaries with 3-row CFG,
25-frame overlap handling, carry re-encode, retrieved history — ref
pipeline.py:316-411 semantics) divided by its whole wall-clock. It is a
single plain timed rollout — no best-of-N selection (VERDICT r4 #7); the
raw wall times of every sustained rollout this process ran (including the
sync-itemised one, labelled) are in ``sustained_runs_s``.
``chunk2plus_new_frames_per_s`` isolates the post-first-chunk regime.

``sustained_fps_adaptive`` is the boundary speed/fidelity MIDDLE mode
(VERDICT r4 #2): flow_cache="adaptive:<tau>" (error-bounded denoise
caching, tau from ``BENCH_ADAPTIVE_TAU``, default 0.5) with the exact
boundary semantics kept — measured with its deviation vs the exact
sustained rollout on identical seeds, between "exact 3.5 new frames/s"
and the reuse/carry modes' p95 ~43 8-bit units.

``gen_fps_fast`` is the single-chunk measurement with the quality-gated
fast modes on (flow_cache="skip_odd" + int8 VAE convs + int8 MMDiT
linears), and ``fast_deviation_p95``/``_mean`` quantify that gate: |Δ| in
8-bit pixel units vs the exact rollout on identical seeds.

Weights are STRUCTURE-SHAPED: the package's own fan-in-scaled normal init,
jitted as ONE program under the 'rbg' PRNG so the whole 2.43 B-param tree
materialises in one fused dispatch (~125-210 s measured; threefry or
per-leaf sines are compile-bound — scripts/probe_fastparams.py). Real HF
weights are not fetchable here; fan-in-scaled randoms are the honest
stand-in for the deviation metrics.

Env knobs:
  BENCH_PRESET=tiny        quick smoke preset
  BENCH_CHUNKS=N           steady chunks to time (default 3, median)
  BENCH_DEADLINE_S=N       wall-clock budget (default 1500)
  BENCH_SUSTAINED_CHUNKS=N sustained rollout length (default 3)
  BENCH_ADAPTIVE_TAU=X     adaptive middle-mode error bound (default 0.5)
  BENCH_STREAM=1           streaming decode for the steady-chunk metric
"""

import functools
import gc
import json
import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

START = time.time()
DEADLINE = float(os.environ.get("BENCH_DEADLINE_S", "1500"))


def time_left() -> float:
    return DEADLINE - (time.time() - START)


def sync(x) -> float:
    """Force completion: on-device scalar reduce + fetch. (block_until_ready
    is a no-op on the axon tunnel backend — see CLAUDE.md.) The returned
    mean doubles as a NaN canary: callers assert math.isfinite on it."""
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def fast_params(mcfg, vcfg, dtype):
    """Full structure-shaped parameter tree: the package's own fan-in-scaled
    normal init as ONE fused rbg-PRNG program (io/weights.random_params —
    ~125-210 s at deployment size; threefry keys or per-leaf sin(iota) fills
    are compile-bound at this leaf count, scripts/probe_fastparams.py).
    These are the weights the deviation metrics are measured on: realistic
    per-layer magnitude distributions, not an artificial sine pattern."""
    from deepv_tpu.io.weights import random_params

    return random_params(mcfg, vcfg, dtype=dtype, seed=0)


def attention_parity_on_chip(mcfg, H, W, ctx_len=77) -> float:
    """Compiled Pallas kernel vs jnp reference at the deployment packed shape
    (stage-2 layout: padded old clip + mid + last + current unit). Returns the
    max abs error; asserts it is within f32 tolerance. Runs EARLY (before the
    expensive sections) so the artifact always carries it."""
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
    from deepv_tpu.utils.profiling import PhaseTimer

    preset = os.environ.get("BENCH_PRESET", "full")
    n_chunks = int(os.environ.get("BENCH_CHUNKS", "3"))

    # Cross-process AOT executable cache (utils/aot.py): with a warm cache
    # the ~200 s param-init compile and the ~700 s program warmup become
    # deserializes, which is what lets every section fit one driver-budget
    # run. Cold-cache runs pay a few extra seconds per program to
    # serialize. BENCH_AOT_CACHE=0 disables; entries are content-keyed
    # (lowered HLO), so stale caches miss cleanly after code edits.
    aot_dir = os.environ.get("BENCH_AOT_CACHE", "/tmp/deepv_aot_bench")
    if aot_dir and aot_dir != "0":
        from deepv_tpu.utils.aot import configure as aot_configure
        aot_configure(aot_dir)
        print(f"[bench] AOT executable cache: {aot_dir}", file=sys.stderr)

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

    # one mutable metrics dict; emit() prints the FULL json line after each
    # section — the driver parses the last line, so every section completion
    # checkpoints the artifact
    M = {
        "metric": "gen_fps_chip", "value": None, "unit": "frames/s",
        "vs_baseline": None, "init_s": None,
        "denoise_steps_per_s": None, "ttff_p50_s": None,
        "attn_parity_max_err": None,
        "sustained_fps": None, "sustained_runs_s": [],
        "chunk2plus_new_frames_per_s": None,
        "sustained_denoise_s": None, "sustained_decode_s": None,
        "sustained_prime_s": None, "sustained_encode_s": None,
        "sustained_other_s": None, "sustained_itemised_wall_s": None,
        "sustained_fps_adaptive": None, "adaptive_tau": None,
        "adaptive_deviation_p95": None, "adaptive_deviation_mean": None,
        "sustained_fps_reuse": None, "reuse_deviation_p95": None,
        "reuse_deviation_mean": None,
        "sustained_fps_boundary": None, "boundary_deviation_p95": None,
        "boundary_deviation_mean": None,
        "gen_fps_fast": None, "sustained_fps_fast": None,
        "fast_deviation_p95": None, "fast_deviation_mean": None,
        "sustained_fps_allfast": None, "allfast_deviation_p95": None,
        "allfast_deviation_mean": None,
        "section_s": {}, "skipped": [],
    }

    def emit():
        print(json.dumps(M), flush=True)

    # estimate scaling: the warmup chunk's measured cost vs its nominal cost
    # is the best available proxy for today's tunnel-compile speed; applied
    # to the compile-heavy section estimates so a slow tunnel day skips
    # sections instead of overrunning the driver kill (VERDICT r4 weak #1)
    est_scale = [1.0]
    WARMUP_NOMINAL = 520.0

    def have_budget(section: str, est_s: float, scaled: bool = True) -> bool:
        est = est_s * (est_scale[0] if scaled else 1.0)
        if time_left() >= est:
            return True
        print(f"[bench] SKIP {section}: est {est:.0f}s > {time_left():.0f}s "
              f"left of BENCH_DEADLINE_S={DEADLINE:.0f}", file=sys.stderr)
        M["skipped"].append(section)
        emit()
        return False

    def skip_no_prereq(section: str, why: str) -> None:
        # a section whose prerequisite (e.g. the sustained rollout) didn't
        # run is SKIPPED and says so in the artifact — silent nulls
        # contradicted the docstring in round 4 (ADVICE r4)
        print(f"[bench] SKIP {section}: {why}", file=sys.stderr)
        M["skipped"].append(f"{section}:{why}")
        emit()

    section_t0 = [START]

    def section_done(name: str):
        now = time.time()
        M["section_s"][name] = round(now - section_t0[0], 1)
        section_t0[0] = now

    rnd = lambda x, n=3: None if x is None else round(x, n)

    t0 = time.time()
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])
    init_s = time.time() - t0
    M["init_s"] = round(init_s, 1)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"[bench] params ready ({n_params/1e9:.2f}B) in {init_s:.1f}s",
          file=sys.stderr)
    section_done("init")

    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    # throughput configuration: batch-decode at end of chunk (streaming
    # decode — the serving default — trades ~2% throughput for ~6x better
    # time-to-first-frame; set BENCH_STREAM=1 to measure that mode)
    dwin = int(os.environ.get("BENCH_DECODE_WINDOW", "1"))
    stream_flag = os.environ.get("BENCH_STREAM") == "1"
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                             decode_window=dwin,
                             decode_batched=(preset == "tiny"),
                             stream_decode=stream_flag)

    # cheap kernel parity on the real chip BEFORE anything expensive
    if jax.default_backend() == "tpu" or pipe.attn_impl == "pallas":
        try:
            M["attn_parity_max_err"] = attention_parity_on_chip(mcfg, H, W)
        except Exception as e:
            print(f"[bench] attention parity failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    section_done("attn_parity")
    emit()   # checkpoint: init_s + parity land even if the warmup dies

    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    # 8-unit action string -> exactly one 57-frame chunk per generate() call
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."] * 7)
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}
    sus_chunks = int(os.environ.get("BENCH_SUSTAINED_CHUNKS", "3"))
    n_unit_cfg = pcfg.max_temporal_length - pcfg.num_input_unit
    long_prompts = np.array(
        ["empty"] + ["Move forward. The perspective hasn't changed."]
        * (pcfg.max_temporal_length - 1 + (sus_chunks - 1) * n_unit_cfg))
    long_batch = {"img": img, "prompt": long_prompts, "prompt_type": "action"}
    # the fidelity-mode sections warm on a 2-chunk rollout: chunk 2 compiles
    # every boundary program (chunk 3's boundary is program-identical), one
    # chunk of runtime cheaper than warming on the full rollout
    warm_prompts = np.array(
        ["empty"] + ["Move forward. The perspective hasn't changed."]
        * (pcfg.max_temporal_length - 1 + max(min(sus_chunks, 2) - 1, 0) * n_unit_cfg))
    warm_batch = {"img": img, "prompt": warm_prompts, "prompt_type": "action"}

    # ONE warmup for everything: a full sustained rollout with the sync
    # timer ON. This compiles the steady-chunk programs, the chunk-boundary
    # programs (3-row CFG denoise, cache prime, carry re-encode) AND the
    # per-phase force_completion reduce programs for both shape families
    # (each costs 1-2 s on first use over the tunnel — CLAUDE.md; r3's
    # "encode 13.37 s" artifact), so every later section measures warm
    # programs. Round 4 warmed the single-chunk and sustained paths
    # separately and paid the chunk-1 compile debt twice (~250 s).
    pipe.timer = PhaseTimer(sync=True)
    t0 = time.time()
    out = pipe.generate(long_batch, seed=7)
    canary = sync(out["pred_img"])
    sync(out["pred_disparity"])
    warm = time.time() - t0
    frames_l = int(out["pred_img"].shape[2])
    assert math.isfinite(canary), "NaN/inf pixels in the warmup rollout"
    print(f"[bench] warmup rollout ({sus_chunks} chunks, {frames_l} frames): "
          f"{warm:.1f}s (incl. compile)", file=sys.stderr)
    est_scale[0] = min(max(warm / WARMUP_NOMINAL, 0.7), 3.0)
    print(f"[bench] tunnel estimate scale: {est_scale[0]:.2f}", file=sys.stderr)
    pipe.timer = PhaseTimer(sync=False)
    del out
    gc.collect()
    section_done("warmup")

    chunk_times = []
    steady_ref_np = None
    frames = None
    for i in range(n_chunks):
        t0 = time.time()
        out = pipe.generate(batch, seed=i + 1)
        sync(out["pred_img"])
        sync(out["pred_disparity"])
        chunk_times.append(time.time() - t0)
        frames = int(out["pred_img"].shape[2])
        if i == n_chunks - 1:
            # host copy of the LAST steady chunk: the exact-output reference
            # for the fast section's deviation (same seed there)
            steady_ref_np = np.asarray(out["pred_img"], np.float32)
        del out
    dt = sorted(chunk_times)[len(chunk_times) // 2]   # median
    fps = frames / dt
    M["value"] = round(fps, 3)
    M["vs_baseline"] = round(fps / 4.0, 3)
    print(f"[bench] steady chunks {[round(t, 2) for t in chunk_times]}s "
          f"-> median {dt:.2f}s -> {fps:.2f} frames/s", file=sys.stderr)
    gc.collect()
    section_done("steady")
    emit()

    # -- metric of record 2: denoise steps/s (synced-timer chunk) ------------
    # one pass suffices: the warmup chunk above already ran under the sync
    # timer, so every per-phase reduce program for the steady shapes is
    # compiled. Runs BEFORE the sustained/fast sections — the sync-timer
    # methodology is only clean while the exact pipe's programs are the sole
    # device residents (measured 2.6x distortion when run after them).
    pipe.timer = PhaseTimer(sync=True)
    pipe.generate(batch, seed=99)
    d = pipe.timer.stats().get("denoise_unit", {"total_s": float("nan"), "count": 0})
    n_steps = d["count"] * len(pcfg.stages) * pcfg.num_inference_steps
    steps_per_s = n_steps / d["total_s"] if d["total_s"] else float("nan")
    M["denoise_steps_per_s"] = round(steps_per_s, 2)
    print(f"[bench] denoise: {n_steps} Euler steps in {d['total_s']:.2f}s "
          f"-> {steps_per_s:.1f} steps/s", file=sys.stderr)
    print(f"[bench] phases: {json.dumps(pipe.timer.stats())}", file=sys.stderr)
    pipe.timer = PhaseTimer(sync=False)
    gc.collect()
    section_done("denoise_sync")
    emit()

    # -- metric of record 3: p50 time-to-first-frame (streaming mode) --------
    # 1 compile run + 2 timed runs (VERDICT r4 #1b); with two samples the
    # reported p50 is the LARGER (conservative). The streaming window
    # programs are shared with the exact pipe's decode at window 1, so the
    # compile run mostly re-verifies cached programs.
    if have_budget("ttff", 55):
        spipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                                  stream_decode=True)
        ttffs = []
        for i in range(3):   # first run compiles any streaming-only programs
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
        M["ttff_p50_s"] = round(ttffs[len(ttffs) // 2], 3)
        print(f"[bench] ttff runs: {[round(t, 3) for t in ttffs]} -> "
              f"p50 {M['ttff_p50_s']:.3f}s", file=sys.stderr)
        # HBM discipline: every section releases its pipe + device outputs
        # before the next one — holding them all OOMs the chip (params are
        # 4.9 GB; each 121-frame rollout output is ~0.3 GB on device)
        del spipe, out_s
        gc.collect()
        section_done("ttff")
        emit()

    # -- sustained autoregressive rate: ONE continuous >=3-chunk rollout -----
    # (the regime BASELINE.md:17 actually defines — chunk boundaries carry
    # 3-row CFG, the 25-frame overlap, the carry re-encode and
    # retrieved-history encode, ref pipeline.py:316-411). The boundary's
    # overlap re-decode runs with EXACT cache priming (the default —
    # outputs equal the full re-decode bit-for-bit,
    # tests/test_prime_decode.py). NOTE the exact STREAMING multi-chunk
    # rollout at full size exhausts HBM (scripts/probe_mem.py) — sustained
    # is measured on the end-of-chunk decode path, like the single-chunk
    # metric of record.
    #
    # Two measurement rollouts (the warmup above was the compile pass):
    # ONE plain timed rollout (the metric of record — no best-of-N
    # selection), then ONE sync-itemised rollout (next section). All raw
    # walls land in sustained_runs_s.
    out_l_np = None
    sustained_ran = False
    if have_budget("sustained", 50):
        sustained_ran = True
        t0 = time.time()
        out_l = pipe.generate(long_batch, seed=8)
        sync(out_l["pred_img"]); sync(out_l["pred_disparity"])
        dt_l = time.time() - t0
        M["sustained_runs_s"].append(round(dt_l, 2))
        M["sustained_fps"] = round(frames_l / dt_l, 3)
        # isolate chunk>=2: subtract the separately-measured first-chunk time
        # (the steady median — both are plain timed runs of the same programs)
        M["chunk2plus_new_frames_per_s"] = round(
            (frames_l - frames) / max(dt_l - dt, 1e-9), 3)
        print(f"[bench] sustained: {frames_l} frames / {dt_l:.1f}s -> "
              f"{M['sustained_fps']:.2f} fps; chunk2+ new frames: "
              f"{M['chunk2plus_new_frames_per_s']:.2f}/s", file=sys.stderr)
        out_l_np = np.asarray(out_l["pred_img"], np.float32)   # host copy for
        del out_l                                              # the mode diffs
        gc.collect()
        section_done("sustained")
        emit()

    # itemise where the sustained rollout's time goes: one more sustained
    # rollout with per-phase device syncs. Every sync-reduce program
    # (steady AND boundary shapes) was compiled by the sync-timer warmups
    # above, so the phase buckets are clean — not first-sync-compile upper
    # bounds. encode = conditioning/carry re-encodes AND the
    # retrieved-history encode; other = pose chaining, noise sampling, host
    # bookkeeping. The synced wall is also recorded as a (labelled) raw
    # sustained sample — syncing serialises dispatch, so it reads slightly
    # high, never low.
    if not sustained_ran:
        skip_no_prereq("itemisation", "no-sustained")
    elif have_budget("itemisation", 45):
        try:
            pipe.timer = PhaseTimer(sync=True)
            t0 = time.time()
            out_i = pipe.generate(long_batch, seed=8)
            sync(out_i["pred_img"]); sync(out_i["pred_disparity"])
            wall_i = time.time() - t0
            ph = pipe.timer.stats()
            den = ph.get("denoise_unit", {}).get("total_s", float("nan"))
            prm = ph.get("prime", {}).get("total_s", 0.0)
            dec = (ph.get("vae_decode", {}).get("total_s", 0.0)
                   + ph.get("stream_decode", {}).get("total_s", 0.0))
            if not pipe.stream_decode:
                # end-of-chunk mode nests "prime" inside "vae_decode"
                dec -= prm
            enc = ph.get("vae_encode", {}).get("total_s", float("nan"))
            M["sustained_denoise_s"] = rnd(den, 2)
            M["sustained_prime_s"] = rnd(prm, 2)
            M["sustained_decode_s"] = rnd(dec, 2)
            M["sustained_encode_s"] = rnd(enc, 2)
            M["sustained_other_s"] = rnd(wall_i - den - dec - prm - enc, 2)
            M["sustained_itemised_wall_s"] = round(wall_i, 2)
            M["sustained_runs_s"].append(round(wall_i, 2))
            print(f"[bench] sustained itemisation ({wall_i:.1f}s synced wall): "
                  f"denoise {den:.2f}s, decode {dec:.2f}s, prime {prm:.2f}s, "
                  f"encode {enc:.2f}s, other {M['sustained_other_s']}s",
                  file=sys.stderr)
            del out_i
        except Exception as e:
            print(f"[bench] itemisation section failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            out_i = None
        pipe.timer = PhaseTimer(sync=False)
        gc.collect()
        section_done("itemisation")
        emit()

    # shared harness for the sustained fidelity/speed modes: warm rollout
    # (compiles the mode's programs; output freed), timed rollout, deviation
    # vs the exact sustained rollout on the identical seed, then release
    # everything before the next section (HBM discipline)
    def sustained_mode(section: str, fps_key: str, dev_prefix: str,
                       est_s: float, make_pipe, after_build=None):
        if out_l_np is None:
            skip_no_prereq(section, "no-sustained")
            return
        if not have_budget(section, est_s):
            return
        mode_pipe = out_m = None
        try:
            mode_pipe = make_pipe()
            if after_build is not None:
                after_build()
            t0 = time.time()
            try:
                out_m = mode_pipe.generate(warm_batch, seed=8)  # compile pass
                sync(out_m["pred_img"])
            except Exception as e:
                # the remote compile helper occasionally drops a response
                # mid-read ("response body closed…", seen in the r4
                # shakedown); one retry re-requests the same compiles
                print(f"[bench] {section} warmup retry after "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                out_m = mode_pipe.generate(warm_batch, seed=8)
                sync(out_m["pred_img"])
            sync(out_m["pred_disparity"])
            print(f"[bench] {section} warmup: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            del out_m; out_m = None; gc.collect()
            t0 = time.time()
            out_m = mode_pipe.generate(long_batch, seed=8)
            sync(out_m["pred_img"]); sync(out_m["pred_disparity"])
            dt_m = time.time() - t0
            M[fps_key] = rnd(frames_l / dt_m)
            if dev_prefix is not None:
                dev = np.abs(np.asarray(out_m["pred_img"], np.float32)
                             - out_l_np) * 127.5
                M[f"{dev_prefix}_deviation_p95"] = rnd(float(np.percentile(dev, 95)))
                M[f"{dev_prefix}_deviation_mean"] = rnd(float(dev.mean()))
                print(f"[bench] {section}: {frames_l} frames / {dt_m:.1f}s -> "
                      f"{M[fps_key]:.2f} fps; deviation p95 "
                      f"{M[f'{dev_prefix}_deviation_p95']:.2f} / mean "
                      f"{M[f'{dev_prefix}_deviation_mean']:.2f} (8-bit units)",
                      file=sys.stderr)
            else:
                print(f"[bench] {section}: {frames_l} frames / {dt_m:.1f}s -> "
                      f"{M[fps_key]:.2f} fps", file=sys.stderr)
        except Exception as e:
            print(f"[bench] {section} section failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        finally:
            del mode_pipe, out_m
            gc.collect()
            section_done(section)
            emit()

    # -- boundary optimisation: reuse_decoder_cache sustained rate + cost ----
    # (skips the overlap cache-prime at every chunk boundary by carrying the
    # decoder's conv caches; deviation vs the exact sustained rollout on the
    # same seed quantifies the fidelity cost). End-of-chunk decode mode:
    # pixels equal the streaming reuse mode's, the denoise programs are
    # shared with the exact pipe, and the streaming rollout's extra HBM
    # pressure (scripts/probe_mem.py) is avoided. Runs BEFORE the int8 fast
    # family: these deviations are the round's key quality numbers and the
    # section is cheaper (VERDICT r4 #1d).
    sustained_mode(
        "reuse", "sustained_fps_reuse", "reuse", 75,
        lambda: InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                                  decode_window=dwin,
                                  decode_batched=(preset == "tiny"),
                                  stream_decode=False, reuse_decoder_cache=True))

    # composed boundary mode: reuse_decoder_cache + carry_latents (skip the
    # overlap handling AND the rgb carry re-encode; disparity still
    # re-encodes — pipeline.py carry_latents doc). Shares the reuse mode's
    # decode programs (carry only drops one of the two serial per-row
    # encodes)
    sustained_mode(
        "boundary", "sustained_fps_boundary", "boundary", 70,
        lambda: InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                                  decode_window=dwin,
                                  decode_batched=(preset == "tiny"),
                                  stream_decode=False, reuse_decoder_cache=True,
                                  carry_latents=True))

    # -- the boundary-frontier MIDDLE mode (VERDICT r4 #2): error-bounded ----
    # adaptive flow caching with the exact boundary semantics kept. The
    # denoise scan recompiles (its carry grows a drift reference), the
    # decode/encode/prime programs are shared with the exact pipe.
    adaptive_tau = os.environ.get("BENCH_ADAPTIVE_TAU", "0.5")
    M["adaptive_tau"] = float(adaptive_tau)
    sustained_mode(
        "adaptive", "sustained_fps_adaptive", "adaptive", 185,
        lambda: InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                                  flow_cache=f"adaptive:{adaptive_tau}",
                                  decode_window=dwin,
                                  decode_batched=(preset == "tiny"),
                                  stream_decode=stream_flag))

    # -- quality-gated fast family: int8 + static flow caching ---------------
    # (the full composition: flow caching + int8 top-level VAE decode + int8
    # MMDiT linears — measured individually in docs/ARCHITECTURE.md).
    from dataclasses import replace as _dc_replace
    vcfg_fast = _dc_replace(vcfg, conv_impl="int8")
    fpipe = None
    if steady_ref_np is None:
        skip_no_prereq("fast", "no-steady-ref")
    elif have_budget("fast", 185):
        try:
            fpipe = InferencePipeline(pcfg, mcfg, vcfg_fast, params, embeds,
                                      dtype=dtype, flow_cache="skip_odd",
                                      denoise_int8=True,
                                      decode_window=dwin,
                                      decode_batched=(preset == "tiny"),
                                      stream_decode=stream_flag)
            t0 = time.time()
            out_f = fpipe.generate(batch, seed=n_chunks)  # compile pass
            sync(out_f["pred_img"]); sync(out_f["pred_disparity"])
            print(f"[bench] fast warmup: {time.time()-t0:.1f}s (incl. compile)",
                  file=sys.stderr)
            del out_f; gc.collect()   # free the warmup output before timing
            t0 = time.time()
            out_f = fpipe.generate(batch, seed=n_chunks)
            sync(out_f["pred_img"]); sync(out_f["pred_disparity"])
            dt_f = time.time() - t0
            M["gen_fps_fast"] = rnd(frames / dt_f)
            # deviation vs the exact rollout on the identical seed (the last
            # steady chunk's host copy): 8-bit pixel units
            dev = np.abs(np.asarray(out_f["pred_img"], np.float32)
                         - steady_ref_np) * 127.5
            M["fast_deviation_p95"] = rnd(float(np.percentile(dev, 95)))
            M["fast_deviation_mean"] = rnd(float(dev.mean()))
            print(f"[bench] fast modes (skip_odd + int8 vae + int8 denoise): "
                  f"{dt_f:.2f}s -> {M['gen_fps_fast']:.2f} fps; deviation p95 "
                  f"{M['fast_deviation_p95']:.2f} / mean "
                  f"{M['fast_deviation_mean']:.2f} (8-bit units)", file=sys.stderr)
            del out_f
            gc.collect()
            section_done("fast")
            emit()
        except Exception as e:
            print(f"[bench] fast section failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            fpipe = out_f = None
            gc.collect()

    # sustained rate with the fast modes on (same continuous >=3-chunk
    # rollout; per-chunk deviation quantified above on identical seeds).
    # EXTENDED-ONLY (BENCH_EXTENDED=1): its compile debt (the primed-
    # boundary int8 decode + CFG-3 int8 denoise variants) does not fit the
    # driver budget alongside the full default set, and the allfast section
    # below carries the same composition's sustained story with boundary
    # modes on. Reuses fpipe — per-chunk programs already compiled.
    if os.environ.get("BENCH_EXTENDED") == "1":
        if fpipe is None:
            skip_no_prereq("fast_sustained", "no-fast-pipe")
        else:
            _fpipe = fpipe
            fpipe = None   # the helper's finally deletes its own reference
            sustained_mode("fast_sustained", "sustained_fps_fast", None, 160,
                           lambda: _fpipe)
            del _fpipe
            gc.collect()
    else:
        fpipe = None
        gc.collect()

    # -- max-throughput composition: every quality-gated mode together -------
    # (flow caching + int8 VAE + int8 denoise + reuse_decoder_cache +
    # carry_latents — the "as fast as one chip goes" serving preset). Shares
    # the fast family's denoise programs; the warm pass compiles the int8
    # reuse-decode variants.
    def _free_exact_refs():
        # allfast needs every GB of HBM: once its pipe is built, the exact
        # pipe and the unquantised param tree pin ~3.8 GB of bf16 block
        # weights the int8 pipe no longer references (the int8 quantiser
        # drops them, keep_original=False). Without this the composition
        # OOMs even in an isolated fresh process — scripts/
        # probe_allfast_mem.py. allfast is the last section, nothing needs
        # them afterwards.
        nonlocal pipe, params
        pipe = None
        params = None
        gc.collect()

    sustained_mode(
        "allfast", "sustained_fps_allfast", "allfast", 220,
        lambda: InferencePipeline(pcfg, mcfg, vcfg_fast, params, embeds,
                                  dtype=dtype, flow_cache="skip_odd",
                                  denoise_int8=True,
                                  decode_window=dwin,
                                  decode_batched=(preset == "tiny"),
                                  stream_decode=False,
                                  reuse_decoder_cache=True,
                                  carry_latents=True),
        after_build=_free_exact_refs)

    print(f"[bench] done in {time.time()-START:.0f}s "
          f"(deadline {DEADLINE:.0f}s, sections {json.dumps(M['section_s'])}, "
          f"skipped: {M['skipped']})", file=sys.stderr)
    emit()


if __name__ == "__main__":
    main()
