"""Chunked autoregressive world-model inference pipeline.

Capability parity with the reference ``InferencePipeline`` (ref
pipeline.py:166-753): a single conditioning image plus per-unit motion
prompts rolls out RGB+disparity+raymap video in 57-frame chunks with a
25-frame sliding overlap, per-unit pyramid flow-matching denoising, CFG
batching (2 rows, or 3 with retrieved-history guidance), pose chaining, and
camera-nearest-neighbour history retrieval.

TPU-first structure:
  - the per-stage denoise loop is ONE jitted program per clip layout —
    ``lax.scan`` over the Euler steps with the MMDiT forward inside; the
    past-condition pyramid enters as closure constants, only the noisy unit
    is carried;
  - inter-stage upsample+renoise is jitted with the closed-form block-noise
    transform;
  - all rollout state (carry-over latents, poses, disparities) stays on
    device as jnp arrays — including the retrieved-history index
    (``dynamic_slice``): the host only sequences chunks, never waits on a
    device scalar mid-rollout;
  - RGB and disparity share one batched VAE *encode* call; *decode* stays
    two serial calls — measured (scripts/probe_decode.py): batch-2 decode is
    ~32% slower than serial on the v5e at full size.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import MMDiTConfig, PipelineConfig, VAEConfig
from .models.mmdit import mmdit_forward
from .models.scheduler import FlowMatchSchedule, euler_step
from .models.vae import (_dec_prime_warm, _dec_window, chunk_decode,
                         chunk_decode_cont, decoder_prime_need,
                         gaussian_sample, vae_decode, vae_encode)
from .ops.block_noise import sample_block_noise
from .ops.resample import down2x_bilinear, up2x_nearest
from .raymap import raymap_from_camera_batch, raymap_to_camera
from .utils.aot import aot_jit
from .utils.profiling import PhaseTimer, force_completion


# ---------------------------------------------------------------------------
# jitted cores
# ---------------------------------------------------------------------------

def _zero_depth_channels(x: jnp.ndarray) -> jnp.ndarray:
    """no_need_depth: zero disparity+raymap channels (ref pipeline.py:476-478)."""
    return x.at[:, 16:].set(0.0)


def _stage_scan(mcfg: MMDiTConfig, params, conditions, frame_times, frame_valid,
                latents, text_embeds, text_mask, pooled, timesteps, dsigmas,
                guidance, history_scale, history, history_mask,
                num_rows: int, history_downsample_ratio: int, zero_depth: bool,
                attn_impl: str, recompute: Tuple[int, ...] = (),
                adaptive_tau=None, mesh=None):
    """All Euler steps of one pyramid stage as a lax.scan
    (ref pipeline.py:467-520, one reference step == one scan iteration).

    ``recompute``: optional static 0/1 mask over the steps (flow caching,
    per PAPERS.md "Flow caching for autoregressive video generation"):
    steps marked 0 SKIP the MMDiT forward and reuse the previous step's
    guided velocity — the Euler integrator keeps stepping with a cached
    flow. Empty/all-ones = the exact reference path.

    ``adaptive_tau``: optional error bound (traced f32 scalar) for
    DATA-DEPENDENT caching (PAPERS.md "Frequency-Aware Error-Bounded
    Caching…"; TeaCache-style trigger): a step skips the MMDiT forward only
    while the latent's relative L1 drift since the velocity was last
    computed stays under tau — the staleness of the cached flow is bounded
    instead of scheduled. Steps with ``recompute``=1 always recompute, so
    the static mask is the floor (pass (1,0,0,…) to let tau govern all
    non-first steps). Decided by ``lax.cond`` on a traced scalar: both
    branches compile once, the forward's cost is paid only when taken.
    """
    conds = tuple(_zero_depth_channels(c) for c in conditions) if zero_depth else conditions
    n_steps = int(timesteps.shape[0])
    if not recompute:
        recompute = (1,) * n_steps
    assert len(recompute) == n_steps and recompute[0] == 1, \
        "flow-cache mask must cover all steps and recompute the first"
    caching = any(r == 0 for r in recompute)

    def forward(lat, t):
        model_in = jnp.concatenate([lat] * num_rows, axis=0)
        if zero_depth:
            model_in = _zero_depth_channels(model_in)
        clips = list(conds) + [model_in]
        v = mmdit_forward(mcfg, params, clips, text_embeds, text_mask, pooled,
                          jnp.full((num_rows,), t, jnp.float32),
                          history=history, history_mask=history_mask,
                          history_downsample_ratio=history_downsample_ratio,
                          frame_times=list(frame_times), frame_valid=list(frame_valid),
                          attn_impl=attn_impl, split_last_attn=True, mesh=mesh)
        if num_rows == 2:
            vu, vt = v[0:1], v[1:2]
            v = vu + guidance * (vt - vu)
        else:
            vu, vt, vh = v[0:1], v[1:2], v[2:3]
            v = vu + guidance * (vt - vu) + history_scale * (vh - vt)
        return v.astype(lat.dtype)

    def body(carry, inp):
        # adaptive mode extends the carry with lat_ref (the latent at the
        # last recompute); the exact/static programs keep their round-2 HLO
        lat, v_prev = carry[:2]
        t, dsig, recomp = inp
        if adaptive_tau is not None:
            lat_ref = carry[2]
            num = jnp.mean(jnp.abs(lat.astype(jnp.float32)
                                   - lat_ref.astype(jnp.float32)))
            den = jnp.mean(jnp.abs(lat_ref.astype(jnp.float32))) + 1e-6
            do = jnp.logical_or(recomp > 0, num / den >= adaptive_tau)
            v, lat_ref = jax.lax.cond(
                do, lambda: (forward(lat, t), lat), lambda: (v_prev, lat_ref))
            return (euler_step(lat, v, dsig), v, lat_ref), None
        if caching:
            v = jax.lax.cond(recomp > 0, lambda: forward(lat, t), lambda: v_prev)
        else:
            v = forward(lat, t)
        # guidance scalars are f32; keep the scan carry in the model dtype
        return (euler_step(lat, v, dsig), v), None

    v0 = jnp.zeros_like(latents)
    rec = jnp.asarray(recompute, jnp.int32)
    carry0 = ((latents, v0, latents) if adaptive_tau is not None
              else (latents, v0))
    (out, *_), _ = jax.lax.scan(body, carry0, (timesteps, dsigmas, rec))
    return out


@functools.partial(aot_jit, static_argnames=(
    "mcfg", "num_rows", "history_downsample_ratio", "zero_depth", "attn_impl",
    "recompute", "mesh"))
def _denoise_stage(mcfg: MMDiTConfig, params, conditions, frame_times, frame_valid,
                   latents, text_embeds, text_mask, pooled, timesteps, dsigmas,
                   guidance, history_scale, history, history_mask,
                   num_rows: int, history_downsample_ratio: int,
                   zero_depth: bool, attn_impl: str,
                   recompute: Tuple[int, ...] = (), adaptive_tau=None,
                   mesh=None):
    """One pyramid stage as its own program. A whole-unit fused variant was
    measured and reverted: identical steady-state throughput (compute-bound)
    but ~3x the compile time, hurting time-to-first-frame.

    ``mesh`` (static, hashable jax.sharding.Mesh): multi-chip inference —
    lets the forward pin its unpatchify input to replicated, preventing the
    GSPMD involuntary-full-remat (models/mmdit.py)."""
    return _stage_scan(mcfg, params, conditions, frame_times, frame_valid, latents,
                       text_embeds, text_mask, pooled, timesteps, dsigmas,
                       guidance, history_scale, history, history_mask,
                       num_rows, history_downsample_ratio, zero_depth, attn_impl,
                       recompute, adaptive_tau, mesh)


@functools.partial(aot_jit, static_argnames=("gamma",))
def _renoise(latents, key, alpha, beta, gamma: float):
    """Inter-stage nearest-2x upsample + correlated block-noise renoising
    (ref pipeline.py:452-465)."""
    up = up2x_nearest(latents)
    noise = sample_block_noise(key, up.shape, gamma, dtype=jnp.float32)
    return (alpha * up.astype(jnp.float32) + beta * noise).astype(latents.dtype)


@aot_jit
def _quantize_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 round trip the reference incurs by converting carry-over frames
    through PIL (ref pipeline.py:338-343); kept for output parity."""
    q = jnp.round(jnp.clip(x * 0.5 + 0.5, 0.0, 1.0) * 255.0) / 255.0
    return (q * 2.0 - 1.0).astype(x.dtype)


def _disparity_postmap(raw: jnp.ndarray, scale_factor) -> jnp.ndarray:
    """Decoded disparity -> displayable disparity (ref pipeline.py:311-313):
    channel-mean to [0,1], squared, un-rescaled. Shared by the rollout's
    chunk accumulation and the serving session's per-step outputs, whose
    bit-parity depends on the formulas staying identical."""
    d = jnp.clip(jnp.mean(raw, axis=1, keepdims=True) * 0.5 + 0.5, 0, 1)
    return jnp.repeat(d, 3, axis=1) ** 2 / scale_factor / 0.95


def _pyramid_list(x: jnp.ndarray, stage_num: int) -> List[jnp.ndarray]:
    """Clean-latent pyramid, low -> high resolution (ref pipeline.py:226-240)."""
    levels = [x]
    for _ in range(stage_num):
        b, c, t, h, w = x.shape
        x = down2x_bilinear(x.reshape(b, c * t, h, w)).reshape(b, c, t, h // 2, w // 2)
        levels.append(x)
    return list(reversed(levels))


def padded_conditions(cfg: PipelineConfig, clean: List[jnp.ndarray],
                      unit_index: int, firstframe_mask: bool, num_rows: int):
    """Shape-stable past-condition pyramid — shared by inference (CFG-tiled
    rows) and training (num_rows=1, natural batch).

    Reference walk (ref pipeline.py:626-658) yields, per stage s:
      s=0,1: [old@stage0 (u-1-fm frames), last@s, current]
      s=2:   [old@stage0 (u-2-fm frames), mid@stage1 (if u-fm>=2), last@s, current]
    We pad the old clip to a fixed ``max_temporal_length - 2`` frames and
    keep the mid slot always present, with per-frame times/valid masking
    the padding, so every unit index shares one compiled layout.
    """
    u, fm = unit_index, int(firstframe_mask)
    t_old = cfg.max_temporal_length - 2
    L = clean[0].shape[2]

    def tile(x):
        return jnp.concatenate([x] * num_rows, axis=0) if num_rows > 1 else x

    def pad_old(n_real: int):
        """old clip container from clean[0][:, :, fm:fm+n_real], end-aligned."""
        b, c, _, h, w = clean[0].shape
        container = jnp.zeros((b, c, t_old, h, w), clean[0].dtype)
        if n_real > 0:
            container = container.at[:, :, t_old - n_real:].set(
                clean[0][:, :, fm:fm + n_real])
        times = jnp.arange(t_old, dtype=jnp.float32) - (t_old - n_real)
        valid = (jnp.arange(t_old) >= (t_old - n_real)).astype(jnp.int32)
        return tile(container), times, valid

    out = []
    n_stages = len(cfg.stages)
    for i_s in range(n_stages):
        last = tile(clean[i_s][:, :, L - 1:L])
        if i_s < n_stages - 1:
            n_old = max(u - 1 - fm, 0)
            old, ot, ov = pad_old(n_old)
            clips = [old, last]
            times = [ot, jnp.asarray([float(n_old)])]
            valid = [ov, jnp.asarray([1], jnp.int32)]
            cur_time = float(n_old + 1)
        else:
            mid_valid = 1 if (u - fm) >= 2 else 0
            n_old = max(u - 2 - fm, 0)
            old, ot, ov = pad_old(n_old)
            if mid_valid:
                mid = tile(clean[i_s - 1][:, :, L - 2:L - 1])
            else:
                mid = tile(jnp.zeros_like(clean[i_s - 1][:, :, :1]))
            clips = [old, mid, last]
            times = [ot, jnp.asarray([float(n_old)]),
                     jnp.asarray([float(n_old + mid_valid)])]
            valid = [ov, jnp.asarray([mid_valid], jnp.int32),
                     jnp.asarray([1], jnp.int32)]
            cur_time = float(n_old + mid_valid + 1)
        times.append(jnp.asarray([cur_time]))
        valid.append(jnp.asarray([1], jnp.int32))
        out.append((tuple(clips), tuple(times), tuple(valid)))
    return out


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

class InferencePipeline:
    """DeepVerse-compatible inference pipeline over jax pytree params.

    params: {"mmdit": ..., "vae": ...}; text_embeds maps a motion sentence to
    {"prompt_embeds": [1,77,Dt], "prompt_attention_mask": [1,77],
     "pooled_prompt_embeds": [1,Dp]} (the reference precomputed cache,
    ref pipeline.py:199, 598-607). The negative prompt is ``'empty'``.
    """

    def __init__(self, cfg: PipelineConfig, mmdit_cfg: MMDiTConfig,
                 vae_cfg: VAEConfig, params: Dict, text_embeds: Dict,
                 dtype=jnp.bfloat16, use_tiling: bool = False,
                 decode_window: int = 2, decode_batched: bool = False,
                 stream_decode: bool = True, text_encoder=None,
                 flow_cache: str = "none", mesh=None, mesh_axis: str = "tp",
                 reuse_decoder_cache: bool = False,
                 denoise_int8: bool = False,
                 prime_decoder_cache: bool = True,
                 carry_latents: bool = False,
                 encode_window: int = 16):
        self.cfg = cfg
        self.mcfg = mmdit_cfg
        self.vcfg = vae_cfg
        #: multi-chip inference: a jax.sharding.Mesh with axis ``mesh_axis``.
        #: The MMDiT params are tensor-parallel sharded over the axis
        #: (parallel/tp.py Megatron splits; GSPMD inserts the ICI
        #: collectives inside the jitted ``_denoise_stage``) and every VAE
        #: encode/decode runs under spatial context parallelism over the
        #: image-height axis (parallel/cp.py ppermute halos — the deployed
        #: rebuild of the reference's dormant CP, ref vae.py:22-153).
        #: None (default) = single-device. Requires latent H % n_shards == 0
        #: and pixel H % (n_shards * 8) == 0.
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from .parallel.tp import shard_mmdit_params
            assert mesh_axis in mesh.axis_names, \
                f"mesh has axes {mesh.axis_names}, expected {mesh_axis!r}"
            assert not use_tiling, "spatial tiling and spatial CP both bound " \
                "memory by splitting H; use one or the other"
            params = {**params,
                      "mmdit": shard_mmdit_params(params["mmdit"], mesh, mesh_axis),
                      "vae": jax.device_put(params["vae"],
                                            NamedSharding(mesh, P()))}
        if vae_cfg.conv_impl == "int8":
            # precompute int8 weights once instead of re-quantising traced
            # weight arguments on every call (ops/conv_int8.py). Both halves:
            # the decoder is the decode fast path, the encoder serves the
            # chunk-boundary carry re-encode (its 384x512 level is also
            # int8-eligible)
            from .ops.conv_int8 import quantize_vae_convs
            params = {**params, "vae": {**params["vae"],
                                        "decoder": quantize_vae_convs(
                                            params["vae"]["decoder"]),
                                        "encoder": quantize_vae_convs(
                                            params["vae"]["encoder"])}}
        #: quality-gated W8A8 fast mode for the denoise stage (default off):
        #: the per-block D^2 linears run on the MXU's 2x int8 rate
        #: (ops/linear_int8.py); AdaLN/embedders/proj_out stay exact.
        #: Composes with flow_cache and the VAE int8 path; combined
        #: deviation is measured in bench.py (fast_deviation_*).
        self.denoise_int8 = denoise_int8
        if denoise_int8:
            from .ops.linear_int8 import quantize_mmdit_params
            # keep_original=False: the quantised tree drops the bf16 block
            # weights (~3.8 GB at deployment size — ops/basic.linear never
            # reads them once weight_int8 exists); they stay alive only as
            # long as the caller holds the unquantised tree
            params = {**params,
                      "mmdit": quantize_mmdit_params(params["mmdit"],
                                                     keep_original=False)}
        self.params = params
        self.text_embeds = text_embeds
        self.dtype = dtype
        self.use_tiling = use_tiling
        self.decode_window = decode_window
        #: temporal window for the chunked carry re-encodes (must be a
        #: multiple of the encoder's 8x temporal downsample; values are
        #: window-independent — chunked == full exactly). Applies to the
        #: single-device path; the spatial-CP mesh path keeps its own
        #: conservative window 8 (per-shard activations already bound memory
        #: differently there)
        self.encode_window = encode_window
        #: decode rgb+disparity as one batch-2 VAE call. Measured on the v5e
        #: (scripts/probe_decode.py): batch-2 decode is ~32% SLOWER than two
        #: serial batch-1 calls at full size, so this defaults to False; it
        #: remains a win for tiny configs where per-call overhead dominates
        self.decode_batched = decode_batched
        #: decode each unit's latent as soon as it is denoised (exact — the
        #: causal VAE's chunked decode equals the full decode bit-for-bit);
        #: first pixels appear after unit 1 instead of after the whole chunk
        self.stream_decode = stream_decode
        #: flow caching (quality-gated fast mode, default off): "none" runs
        #: every Euler step's MMDiT forward (exact); "skip_odd" reuses the
        #: cached guided velocity on odd step indices of every stage —
        #: 2 of 5 forwards skipped (~40% denoise FLOPs) at the cost of a
        #: first-order flow approximation on those steps; "adaptive[:tau]"
        #: (default tau 0.3) skips a step only while the latent's relative
        #: L1 drift since the cached velocity was computed stays under tau —
        #: error-bounded rather than scheduled (PAPERS.md "Frequency-Aware
        #: Error-Bounded Caching…"), so low-motion steps are skipped and
        #: fast-changing ones are not. tau=0 is bit-identical to "none";
        #: one Euler step drifts the latent ~0.2-0.4 relative L1 at the
        #: deployment schedule (scripts/probe_adaptive.py), so useful bounds
        #: live in ~[0.2, 0.6]. tau is a TRACED scalar: changing it (even
        #: per request, via ``pipe.adaptive_tau``) recompiles nothing.
        self.adaptive_tau = None
        if flow_cache.startswith("adaptive"):
            head, sep, tau_s = flow_cache.partition(":")
            # strict: 'adaptive' or 'adaptive:<float>' — a malformed variant
            # ('adaptive=0.5', 'adaptive:') must fail loudly, not silently
            # run the default tau. ValueError, not assert: user-input
            # validation must survive `python -O`
            if head != "adaptive" or (sep and not tau_s) or (tau_s and not sep):
                raise ValueError(
                    f"flow_cache {flow_cache!r}: expected 'adaptive' or 'adaptive:<tau>'")
            try:
                tau = float(tau_s) if sep else 0.3
            except ValueError:
                # same crafted message for a non-numeric tau ('adaptive:x') —
                # float()'s generic text names neither the flag nor the format
                raise ValueError(
                    f"flow_cache {flow_cache!r}: expected 'adaptive' or 'adaptive:<tau>'")
            self.adaptive_tau = jnp.float32(tau)
        elif flow_cache not in ("none", "skip_odd"):
            raise ValueError(
                f"flow_cache {flow_cache!r}: expected 'none', 'skip_odd', "
                f"'adaptive' or 'adaptive:<tau>'")
        self.flow_cache = flow_cache
        #: optional callback(rgb_window, disp_window) fired as each decoded
        #: pixel window becomes available (requires stream_decode) — the
        #: interactive-serving hook. Windows cover chunk-overlap re-decodes
        #: ONLY when the boundary actually re-decodes them; with the default
        #: exact priming (or cache reuse) chunks >= 2 emit NEW frames only
        #: (32 per chunk, not 57). Consumers that need the reference's
        #: full re-decode stream must pass prime_decoder_cache=False.
        self.on_frames = None
        #: carry the decoder conv caches across chunk boundaries instead of
        #: re-decoding the 25-frame overlap from its re-encoded latents
        #: (the serve.InteractiveSession option, also reachable from
        #: generate()). Works in BOTH decode modes: streaming (caches carried
        #: from the unit loop) and end-of-chunk (the final caches of the
        #: whole-chunk decode — same cache values, since streaming ==
        #: end-of-chunk decode is exact). Exact for the NEW frames' latents;
        #: the decoded overlap pixels come from the previous chunk's latents
        #: rather than the uint8-roundtripped re-encode the reference decodes
        #: (ref pipeline.py:338-343), so outputs deviate slightly —
        #: quantified in bench.py (reuse_deviation_*). The caches (~2.8 GB
        #: at full size, two streams) stay HBM-resident across the next
        #: chunk's denoise either way; unlike exact priming there is no
        #: transient second cache generation at the boundary.
        self.reuse_decoder_cache = reuse_decoder_cache
        if reuse_decoder_cache:
            assert mesh is None and not use_tiling, \
                "reuse_decoder_cache carries single-device cache pytrees"
        #: quality-gated boundary fast mode (default off): carry the chunk's
        #: own generated RGB latents into the next chunk's conditioning
        #: instead of re-encoding the uint8-roundtripped carry pixels
        #: (ref pipeline.py:338-343 re-encodes; that costs ~0.7 s of the
        #: ~1.5 s boundary encode budget at full size). The carried frames
        #: are the trailing latent units — content-equivalent to the
        #: re-encode except that (a) the reference's fresh causal stream
        #: starts at the overlap's first PIXEL frame while the carried first
        #: latent summarises its full 8-frame unit, and (b) the uint8 +
        #: decode->encode roundtrip is skipped, so outputs deviate
        #: (measured end-to-end in bench.py alongside reuse_deviation_*).
        #: Disparity is ALWAYS re-encoded: its carry passes through the
        #: per-chunk rescale + sqrt encoding in pixel space
        #: (ref pipeline.py:344-352), which has no latent-space equivalent.
        self.carry_latents = carry_latents
        #: EXACT chunk-boundary cache priming (default on): the reference
        #: decodes the whole re-encoded 25-frame overlap and discards the
        #: pixels — only the decoder conv caches carry into the new frames
        #: (ref pipeline.py:316-343). Priming rebuilds the final
        #: (full-resolution, most expensive) decoder block's caches from just
        #: the trailing ``4*n_resnets+2`` stream frames it actually needs
        #: (models/vae.py::decoder_prime_tail) — bit-identical caches, so
        #: every emitted pixel equals the full overlap re-decode. Applies to
        #: both decode modes: streaming (the warm decode) and end-of-chunk
        #: (the overlap share of the chunked decode). Auto disabled when the
        #: config/mesh/tiling doesn't support it.
        self._prime_need = None
        if (prime_decoder_cache and mesh is None and not use_tiling
                and not reuse_decoder_cache):
            need = decoder_prime_need(vae_cfg)
            co_w = params["vae"]["decoder"]["conv_out"]["weight"]
            if need is not None and co_w.shape[2] == 3:
                self._prime_need = need
        self.text_encoder = text_encoder
        self._embed_memo: Dict[str, Tuple] = {}
        self.schedule = FlowMatchSchedule(cfg.scheduler)
        # fused Pallas attention on TPU; jnp reference elsewhere. Under a
        # mesh the jnp path is used even on TPU: GSPMD partitions its
        # einsums across the tp axis, whereas the Pallas kernel is a
        # single-device program XLA would have to replicate around.
        leaf = jax.tree.leaves(params["mmdit"])[0]
        try:
            platform = next(iter(leaf.devices())).platform
        except Exception:
            platform = jax.default_backend()
        self.attn_impl = "pallas" if (platform == "tpu" and mesh is None) else "ref"
        self.timer: PhaseTimer = PhaseTimer(sync=False)  # opt-in observability
        self.raymap_mean = jnp.asarray(cfg.raymap_mean, jnp.float32).reshape(1, 6, 1, 1, 1)
        self.raymap_std = jnp.asarray(cfg.raymap_std, jnp.float32).reshape(1, 6, 1, 1, 1)

    # -- helpers ------------------------------------------------------------

    def _embeds_for(self, prompt: str):
        cached = self._embed_memo.get(prompt)
        if cached is not None:
            return cached
        if prompt in self.text_embeds:
            e = self.text_embeds[prompt]
            out = (jnp.asarray(e["prompt_embeds"], self.dtype),
                   jnp.asarray(e["prompt_attention_mask"], jnp.int32),
                   jnp.asarray(e["pooled_prompt_embeds"], self.dtype))
        elif self.text_encoder is not None:
            pe, mask, pooled = self.text_encoder(prompt)
            out = (pe.astype(self.dtype), mask.astype(jnp.int32),
                   pooled.astype(self.dtype))
        else:
            raise KeyError(
                f"prompt {prompt!r} not in the precomputed text-embedding cache and no "
                "live text encoder is configured")
        # memoise: text prompts repeat for every unit of every chunk — without
        # this the live encoder re-tokenises + re-encodes the identical string
        # up to 7x per chunk, each a host round-trip
        self._embed_memo[prompt] = out
        return out

    def _norm_image_latent(self, lat: jnp.ndarray) -> jnp.ndarray:
        """First latent frame uses image stats, the rest video stats
        (ref pipeline.py:570-571)."""
        c = self.cfg
        first = (lat[:, :, :1] - c.vae_shift_factor) * c.vae_scale_factor
        if lat.shape[2] == 1:
            return first
        rest = (lat[:, :, 1:] - c.vae_video_shift_factor) * c.vae_video_scale_factor
        return jnp.concatenate([first, rest], axis=2)

    def _encode_pixels(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        # temporal chunking bounds encoder activations for the 25-frame
        # carry-over encodes (the reference bounds memory with spatial tiling
        # instead, ref pipeline.py:215; chunked == full exactly, so the
        # window size is a pure memory/speed knob). Batch rows (rgb /
        # disparity streams) encode SERIALLY: one batch-2 call measured 0.62x
        # the serial pair at full size (scripts/probe_boundary_encode.py —
        # same finding as decode), and a batch-2 17-frame window's ~3.4 GB
        # of encoder activations exhausted HBM at the chunk-2 boundary of a
        # full-size rollout. The default window 16 ([17,8] windows per row,
        # ~1.7 GB transient) measured 0.82 s/pair vs window 8's 0.94 s;
        # window 24 (one 25-frame init window, 0.71 s) transiently holds
        # ~2.5 GB and is too close to the in-context OOM line. Moments are
        # re-concatenated before the single gaussian_sample call, so the
        # PRNG pairing (and hence every output) is unchanged.
        chunked = x.shape[2] > 17
        if self.mesh is not None:
            from .parallel.cp import cp_vae_encode, cp_vae_encode_chunked
            if chunked:
                enc = lambda row: cp_vae_encode_chunked(
                    self.vcfg, self.params["vae"], row, self.mesh,
                    axis=self.mesh_axis, window_size=8)
            else:
                enc = lambda row: cp_vae_encode(
                    self.vcfg, self.params["vae"], row, self.mesh,
                    axis=self.mesh_axis)
            parts = [enc(x[i:i + 1].astype(self.dtype)) for i in range(x.shape[0])]
            moments = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            return gaussian_sample(moments, key)
        parts = [vae_encode(self.vcfg, self.params["vae"],
                            x[i:i + 1].astype(self.dtype),
                            temporal_chunk=chunked,
                            window_size=self.encode_window,
                            use_tiling=self.use_tiling)
                 for i in range(x.shape[0])]
        moments = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return gaussian_sample(moments, key)

    def _stream_push(self, z: jnp.ndarray, cache, first: bool):
        """Decode one latent window through a carried decoder cache.

        The very first window's leading frame uses image normalisation stats,
        everything after video stats (ref pipeline.py:706-709)."""
        c = self.cfg
        if first:
            z0 = z[:, :, :1] / c.vae_scale_factor + c.vae_shift_factor
            if z.shape[2] > 1:
                rest = z[:, :, 1:] / c.vae_video_scale_factor + c.vae_video_shift_factor
                z = jnp.concatenate([z0, rest], axis=2)
            else:
                z = z0
            mode = "init"
        else:
            z = z / c.vae_video_scale_factor + c.vae_video_shift_factor
            mode = "cont"
        if self.mesh is not None:
            from .parallel.cp import cp_dec_window
            return cp_dec_window(self.vcfg, self.params["vae"]["decoder"],
                                 z.astype(self.dtype), cache, mode,
                                 self.mesh, axis=self.mesh_axis)
        return _dec_window(self.vcfg, self.params["vae"]["decoder"],
                           z.astype(self.dtype), cache, mode)

    def _carry_rgb_latent(self, lat_img: jnp.ndarray) -> jnp.ndarray:
        """carry_latents mode: the next chunk's rgb conditioning latents,
        taken from this chunk's generated (normalised) rgb latents. The
        re-encode they replace treats the overlap's first pixel frame as a
        fresh image (image normalisation stats, ref pipeline.py:570-571),
        so frame 0 is renormalised video -> image stats."""
        cfg = self.cfg
        n_lat = 1 + (cfg.num_input_image - 1) // cfg.vae_downsample
        cl = lat_img[:, :, -n_lat:]
        f0 = ((cl[:, :, :1].astype(jnp.float32) / cfg.vae_video_scale_factor
               + cfg.vae_video_shift_factor
               - cfg.vae_shift_factor) * cfg.vae_scale_factor)
        return jnp.concatenate([f0.astype(cl.dtype), cl[:, :, 1:]],
                               axis=2).astype(self.dtype)

    def _unnorm_latents(self, lat: jnp.ndarray) -> jnp.ndarray:
        """Latent un-normalisation: image stats on the first frame, video
        stats on the rest (ref pipeline.py:703-709)."""
        c = self.cfg
        if lat.shape[2] == 1:
            return lat / c.vae_scale_factor + c.vae_shift_factor
        first = lat[:, :, :1] / c.vae_scale_factor + c.vae_shift_factor
        rest = lat[:, :, 1:] / c.vae_video_scale_factor + c.vae_video_shift_factor
        return jnp.concatenate([first, rest], axis=2)

    def _prime_warm_stream(self, z: jnp.ndarray) -> dict:
        """Exact decoder caches for one carried latent stream, computing no
        overlap pixels: full per-frame windows through the decoder FRONT
        (conv_in/mid/all-but-last blocks, identical values and caches to the
        normal warm decode), then the trailing-suffix prime pass for the
        final full-resolution block (models/vae.py::decoder_prime_tail).
        One fused program — one dispatch per stream instead of per window."""
        return _dec_prime_warm(self.vcfg, self.params["vae"]["decoder"], z)

    def _prime_warm(self, lat38: jnp.ndarray):
        """Primed (rgb, disparity) decoder caches for the chunk-boundary
        carry latents; replaces the full overlap re-decode exactly. The two
        stream programs are drained one at a time: each holds a transient
        suffix buffer + a fresh ~1.5 GB cache generation, and letting them
        queue doubles the boundary's HBM high-water mark."""
        li, ld = jnp.split(lat38[:, :-self.cfg.raymap_dim], 2, axis=1)
        rgb_cache = self._prime_warm_stream(
            self._unnorm_latents(li).astype(self.dtype))
        force_completion(jax.tree.leaves(rgb_cache)[0])
        disp_cache = self._prime_warm_stream(
            self._unnorm_latents(ld).astype(self.dtype))
        force_completion(jax.tree.leaves(disp_cache)[0])
        return rgb_cache, disp_cache

    def _prime_eligible(self, lat38: jnp.ndarray) -> bool:
        """Priming needs the warm stream to cover the tail's trailing window."""
        if self._prime_need is None:
            return False
        t_up = 2 ** sum(self.vcfg.decoder_temporal_up_sample)
        stream_frames = 1 + (lat38.shape[2] - 1) * t_up
        return stream_frames >= self._prime_need

    def _decode_latents_primed(self, lat: jnp.ndarray, n_overlap: int) -> jnp.ndarray:
        """Chunk-boundary decode: prime the decoder caches on the first
        ``n_overlap`` (carried-overlap) latents WITHOUT computing their
        pixels (the reference decodes and discards them,
        ref pipeline.py:316-343), then cont-decode only the NEW latents.
        Bit-identical to ``_decode_latents``'s trailing frames (the causal
        chunked decode equals the full decode; tests/test_prime_decode.py).
        Returns only the new frames — the caller restores the previous
        chunk's raw tail for bookkeeping."""
        lat = self._unnorm_latents(lat).astype(self.dtype)
        dec = self.params["vae"]["decoder"]
        # "prime" phase nests inside the caller's "vae_decode" phase: its
        # time is counted in BOTH (subtract when itemising, see bench.py)
        with self.timer.phase("prime"):
            cache = _dec_prime_warm(self.vcfg, dec, lat[:, :, :n_overlap])
            if self.timer.sync:
                force_completion(jax.tree.leaves(cache)[0])
        return chunk_decode_cont(self.vcfg, dec, lat[:, :, n_overlap:], cache,
                                 self.decode_window)

    def _decode_latents_reuse(self, lat: jnp.ndarray, cache, n_overlap: int):
        """End-of-chunk decode for ``reuse_decoder_cache``: continue the
        previous chunk's final decoder caches past the boundary — no prime,
        no overlap re-decode; only the latents past ``n_overlap`` are
        decoded. With ``cache=None`` (first chunk, or a fresh session) the
        whole stream decodes from scratch. Returns ``(pixels, final_cache)``;
        the cache values equal the streaming mode's (streaming ==
        end-of-chunk decode is exact), so both modes emit identical pixels.
        """
        lat = self._unnorm_latents(lat).astype(self.dtype)
        dec = self.params["vae"]["decoder"]
        if cache is None:
            return chunk_decode(self.vcfg, dec, lat, self.decode_window,
                                return_cache=True)
        return chunk_decode_cont(self.vcfg, dec, lat[:, :, n_overlap:], cache,
                                 self.decode_window, return_cache=True)

    def _decode_latents(self, lat: jnp.ndarray) -> jnp.ndarray:
        """Un-normalise + chunked decode (ref pipeline.py:703-715)."""
        lat = self._unnorm_latents(lat)
        if self.mesh is not None:
            from .parallel.cp import cp_vae_decode_chunked
            return cp_vae_decode_chunked(self.vcfg, self.params["vae"],
                                         lat.astype(self.dtype), self.mesh,
                                         axis=self.mesh_axis,
                                         window_size=self.decode_window)
        return vae_decode(self.vcfg, self.params["vae"], lat.astype(self.dtype),
                          temporal_chunk=True, window_size=self.decode_window,
                          use_tiling=self.use_tiling)

    # -- per-unit sampler (ref pipeline.py:439-524) --------------------------

    def _padded_conditions(self, clean: List[jnp.ndarray], unit_index: int,
                           firstframe_mask: bool, num_rows: int):
        """Shape-stable past-condition pyramid (see ``padded_conditions``)."""
        return padded_conditions(self.cfg, clean, unit_index, firstframe_mask,
                                 num_rows)

    def _generate_one_unit(self, key, latents, input_history, past_conditions,
                           text_embeds, text_mask, pooled, num_rows,
                           guidance: float, history_scale: float):
        cfg = self.cfg
        hist = None
        hist_mask = None
        if input_history is not None:
            hist = jnp.concatenate([input_history] * 3, axis=0).astype(self.dtype)
            hlen = ((input_history.shape[-1] // cfg.history_downsample_ratio // self.mcfg.patch_size)
                    * (input_history.shape[-2] // cfg.history_downsample_ratio // self.mcfg.patch_size))
            hist_mask = jnp.concatenate([
                jnp.zeros((2, hlen), jnp.int32), jnp.ones((1, hlen), jnp.int32)], axis=0)

        scheds = []
        renoise = []
        for i_s in range(len(cfg.stages)):
            ss = self.schedule.stage_schedule(cfg.num_inference_steps, i_s)
            scheds.append((jnp.asarray(ss.timesteps),
                           jnp.asarray(ss.sigmas[1:] - ss.sigmas[:-1])))
            if i_s > 0:
                alpha, beta = self.schedule.renoise_coeffs(i_s)
                key, sub = jax.random.split(key)
                renoise.append((sub, jnp.float32(alpha), jnp.float32(beta)))

        intermed = []
        for i_s in range(len(cfg.stages)):
            if i_s > 0:
                key_, alpha, beta = renoise[i_s - 1]
                latents = _renoise(latents, key_, alpha, beta, gamma=cfg.scheduler.gamma)
            conditions, times, valid = past_conditions[i_s]
            timesteps, dsigmas = scheds[i_s]
            if self.flow_cache == "skip_odd":
                recompute = tuple(1 - (i % 2) for i in range(int(timesteps.shape[0])))
            elif self.adaptive_tau is not None:
                # tau governs every step after the forced first one
                recompute = (1,) + (0,) * (int(timesteps.shape[0]) - 1)
            else:
                recompute = ()
            latents = _denoise_stage(
                self.mcfg, self.params["mmdit"], conditions, times, valid, latents,
                text_embeds, text_mask, pooled, timesteps, dsigmas,
                jnp.float32(guidance), jnp.float32(history_scale), hist, hist_mask,
                num_rows=num_rows,
                history_downsample_ratio=cfg.history_downsample_ratio,
                zero_depth=cfg.no_need_depth, attn_impl=self.attn_impl,
                recompute=recompute, adaptive_tau=self.adaptive_tau,
                mesh=self.mesh)
            intermed.append(latents)
        return intermed

    # -- per-chunk i2v (ref pipeline.py:526-700) ------------------------------

    def generate_i2v(self, key, motion_prompt: Sequence[str], use_motion_prompt: bool,
                     input_image: jnp.ndarray, input_disparity, input_raymap,
                     input_history, guidance_scale: float = 4.0,
                     video_guidance_scale: float = 3.5,
                     use_linear_guidance: bool = False, alpha: float = 1.0,
                     min_guidance_scale: float = 1.1, dec_state=None,
                     carry_rgb_latent=None):
        cfg, mcfg = self.cfg, self.mcfg
        firstframe_mask = input_disparity is None
        num_rows = 2 if input_history is None else 3
        b, _, n_in, height, width = input_image.shape
        ds = cfg.vae_downsample

        temp = cfg.max_temporal_length + int(firstframe_mask)
        key, k_lat, k_enc = jax.random.split(key, 3)
        latents = jax.random.normal(
            k_lat, (1, mcfg.in_channels, temp, height // ds, width // ds), self.dtype)
        # downsample chain to stage-0 resolution with x2 compensation
        # (ref pipeline.py:554-559)
        lh, lw = height // ds, width // ds
        for _ in range(len(cfg.stages) - 1):
            bb, cc, tt, hh, ww = latents.shape
            latents = (down2x_bilinear(latents.reshape(bb, cc * tt, hh, ww)) * 2.0
                       ).reshape(bb, cc, tt, hh // 2, ww // 2)
            lh, lw = lh // 2, lw // 2

        # encode conditioning pixels; batch rgb+disparity when both present
        with self.timer.phase("vae_encode"):
            if carry_rgb_latent is not None:
                # carry_latents boundary fast mode: the rgb conditioning
                # latent is carried from the previous chunk's generated
                # latents (frame 0 already renormalised to image stats);
                # only disparity pays the re-encode
                assert input_disparity is not None
                img_lat = carry_rgb_latent.astype(self.dtype)
                disp_lat = self._norm_image_latent(
                    self._encode_pixels(input_disparity, k_enc))
            elif input_disparity is not None:
                stacked = jnp.concatenate([input_image, input_disparity], axis=0)
                enc = self._encode_pixels(stacked, k_enc)
                img_lat, disp_lat = enc[:1], enc[1:2]
                img_lat = self._norm_image_latent(img_lat)
                disp_lat = self._norm_image_latent(disp_lat)
            else:
                img_lat = self._norm_image_latent(self._encode_pixels(input_image, k_enc))
                disp_lat = jnp.zeros_like(img_lat)
            if self.timer.sync:
                force_completion(disp_lat)

        if input_raymap is None:
            raymap_lat = jnp.zeros(
                (img_lat.shape[0], cfg.raymap_dim, 1) + img_lat.shape[3:], img_lat.dtype)
        else:
            raymap_lat = input_raymap.astype(self.dtype)
        input_image_latent = jnp.concatenate([img_lat, disp_lat, raymap_lat], axis=1
                                             ).astype(self.dtype)

        generated = [input_image_latent]
        num_units = temp // cfg.frame_per_unit
        start_unit_index = 1 if firstframe_mask else (n_in - 1) // ds + 1

        # streaming decode state: per-stream decoder caches + frame buffers.
        # rgb and disparity are decoded as two serial window calls — measured
        # (scripts/probe_decode.py): a batch-2 window is ~32% SLOWER than two
        # batch-1 calls on this chip, so do not "optimise" this into one call
        stream = self.stream_decode
        rgb_cache = disp_cache = None
        rgb_frames, disp_frames = [], []
        stream_first = True

        def stream_push(lat38):
            nonlocal rgb_cache, disp_cache, stream_first
            li, ld = jnp.split(lat38[:, :-cfg.raymap_dim], 2, axis=1)
            yi, rgb_cache = self._stream_push(li, rgb_cache, stream_first)
            yd, disp_cache = self._stream_push(ld, disp_cache, stream_first)
            rgb_frames.append(yi)
            disp_frames.append(yd)
            stream_first = False
            if self.on_frames is not None:
                self.on_frames(yi, yd)

        # does this chunk's decode cover the WHOLE latent window? False when
        # the overlap's pixels are skipped (cache reuse / exact priming) —
        # the caller then restores the previous chunk's raw tail. Explicit
        # flag, not inferred from output shapes.
        full_window = True
        if stream and not firstframe_mask:
            if dec_state is not None:
                # reuse_decoder_cache: the previous chunk's decoder caches
                # already hold the overlap's conv state — skip the ~2.5 s
                # overlap re-decode; only the NEW units will be decoded
                rgb_cache, disp_cache = dec_state
                stream_first = False
                full_window = False
            elif self._prime_eligible(input_image_latent):
                # EXACT cache priming: rebuild the caches the overlap
                # re-decode exists to produce, skipping the discarded-pixel
                # compute of the final full-resolution block (~20% of the
                # warm cost). No overlap pixel windows are emitted; the
                # caller restores the previous chunk's tail for bookkeeping
                with self.timer.phase("prime"):
                    rgb_cache, disp_cache = self._prime_warm(input_image_latent)
                stream_first = False
                full_window = False
            else:
                # warm the decoder caches on the carried-over latent frames
                # ONE frame at a time: a single t=4 window peaks ~4x the
                # steady window's activations (25 output frames of f32
                # group-norm intermediates at 384x512) and OOMs HBM on top
                # of params + rollout state; per-frame windows are
                # bit-identical (chunked == full) and reuse the compiled
                # steady-state programs
                for fi in range(input_image_latent.shape[2]):
                    stream_push(input_image_latent[:, :, fi:fi + 1])

        if use_linear_guidance:
            # per-unit decayed guidance (ref pipeline.py:544-546, 592-594)
            guidance_list = [max(guidance_scale - alpha * t_, min_guidance_scale)
                             for t_ in range(num_units + 1)]

        for unit_index in range(start_unit_index, num_units):
            if use_linear_guidance:
                video_guidance_scale = guidance_list[unit_index]
            prompt = motion_prompt[unit_index - int(firstframe_mask)]
            pe, pm, pp = self._embeds_for(prompt if use_motion_prompt else str(prompt))
            ne, nm, npo = self._embeds_for("empty")
            reps = num_rows - 1
            text_embeds = jnp.concatenate([ne] + [pe] * reps, axis=0)
            text_mask = jnp.concatenate([nm] + [pm] * reps, axis=0)
            pooled = jnp.concatenate([npo] + [pp] * reps, axis=0)

            clean = _pyramid_list(jnp.concatenate(generated, axis=2), len(cfg.stages) - 1)
            past_conditions = self._padded_conditions(clean, unit_index,
                                                      firstframe_mask, num_rows)

            key, k_unit = jax.random.split(key)
            cur = latents[:, :, unit_index * cfg.frame_per_unit:(unit_index + 1) * cfg.frame_per_unit]
            with self.timer.phase("denoise_unit"):
                intermed = self._generate_one_unit(
                    k_unit, cur, input_history, past_conditions,
                    text_embeds, text_mask, pooled, num_rows,
                    guidance=video_guidance_scale,
                    history_scale=cfg.history_guidance_scale)
                if self.timer.sync:
                    force_completion(intermed[-1])
            generated.append(intermed[-1])
            if stream:
                with self.timer.phase("stream_decode"):
                    stream_push(intermed[-1])
                    if self.timer.sync:
                        force_completion(rgb_frames[-1])

        if firstframe_mask:
            generated = generated[1:]
        gen = jnp.concatenate(generated, axis=2)

        n_ray = cfg.raymap_dim
        lat_img, lat_disp = jnp.split(gen[:, :-n_ray], 2, axis=1)
        gen_raymap = gen[:, -n_ray:].astype(jnp.float32) * self.raymap_std + self.raymap_mean
        trans3d, trans2d = raymap_to_camera(gen_raymap[:, :, 1:],
                                            append_first_reference=True,
                                            from_relative_to_absolute=True,
                                            vae_downsample=ds)

        # decode rgb+disparity
        with self.timer.phase("vae_decode"):
            if stream:
                # frames were decoded incrementally during the unit loop
                image = jnp.concatenate(rgb_frames, axis=2)
                disparity = jnp.concatenate(disp_frames, axis=2)
            elif self.reuse_decoder_cache:
                # end-of-chunk cache reuse: continue the previous chunk's
                # final decoder caches past the boundary (no prime, no
                # overlap re-decode); on the first chunk decode everything
                # and keep the final caches. Caches and pixels equal the
                # streaming reuse mode's bit-for-bit.
                n_ov = (0 if firstframe_mask or dec_state is None
                        else input_image_latent.shape[2])
                full_window = n_ov == 0
                prev_rgb, prev_disp = dec_state or (None, None)
                # drop redundant refs as the decodes consume the previous
                # chunk's caches: each full-size cache pytree is ~1.4 GB and
                # the peak (old + new generation alive at once) is what
                # bounds this mode's HBM headroom
                dec_state = None
                if self.decode_batched:
                    both, rgb_cache = self._decode_latents_reuse(
                        jnp.concatenate([lat_img, lat_disp], axis=0),
                        prev_rgb, n_ov)
                    image, disparity = both[:1], both[1:2]
                else:
                    image, rgb_cache = self._decode_latents_reuse(
                        lat_img, prev_rgb, n_ov)
                    prev_rgb = None
                    disparity, disp_cache = self._decode_latents_reuse(
                        lat_disp, prev_disp, n_ov)
                    prev_disp = None
            elif (not firstframe_mask
                  and self._prime_eligible(input_image_latent)):
                # chunk boundary: the overlap's decoded pixels are discarded
                # by _accumulate_chunk — prime the caches on the overlap
                # latents and decode only the NEW frames (exact;
                # tests/test_prime_decode.py). The caller restores the
                # previous chunk's raw tail for bookkeeping
                n_ov = input_image_latent.shape[2]
                full_window = False
                if self.decode_batched:
                    both = self._decode_latents_primed(
                        jnp.concatenate([lat_img, lat_disp], axis=0), n_ov)
                    image, disparity = both[:1], both[1:2]
                else:
                    image = self._decode_latents_primed(lat_img, n_ov)
                    disparity = self._decode_latents_primed(lat_disp, n_ov)
            elif self.decode_batched:
                both = self._decode_latents(jnp.concatenate([lat_img, lat_disp], axis=0))
                image, disparity = both[:1], both[1:2]
            else:
                image = self._decode_latents(lat_img)
                disparity = self._decode_latents(lat_disp)
            if self.timer.sync:
                force_completion(disparity)
        if cfg.no_need_depth:
            disparity = jnp.zeros_like(disparity)
        # only the reuse mode consumes the decoder caches across chunks;
        # returning them otherwise pins ~3 GB (two full-size cache pytrees)
        # in the caller for the whole next chunk
        dec_state = ((rgb_cache, disp_cache)
                     if self.reuse_decoder_cache else None)
        carry_lat = self._carry_rgb_latent(lat_img) if self.carry_latents else None
        return (image, disparity, trans3d, trans2d, dec_state, carry_lat,
                full_window)

    # -- full rollout (ref pipeline.py:264-424) -------------------------------

    def generate(self, batch: Dict, seed: int = 666,
                 guidance_scale: float = 4.0, video_guidance_scale: float = 3.5) -> Dict:
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)

        actual_frame = cfg.actual_frame
        actual_unit = cfg.max_temporal_length
        n_img, n_unit = cfg.num_input_image, cfg.num_input_unit

        prompts = list(batch["prompt"])
        while ((len(prompts) - actual_unit) % (actual_unit - n_unit) != 0
               or len(prompts) < actual_unit):
            prompts.append(prompts[-1])
        total_iters = (len(prompts) - actual_unit) // (actual_unit - n_unit) + 1

        use_motion = batch.get("prompt_type") == "action"
        img = jnp.asarray(batch["img"])
        if img.ndim == 3:      # [3, H, W]
            img = img[None, :, None]
        elif img.ndim == 4:    # [1, 3, H, W]
            img = img[:, :, None]
        input_image = img.astype(self.dtype)   # [1, 3, t, H, W] in [-1, 1]

        images_list, disparity_list, trans3d_list, trans2d_list = [], [], [], []
        motion_prompt_list: List[np.ndarray] = []
        input_disparity = input_raymap = input_history = None
        scale_factor = jnp.float32(1.0)
        start_unit = 0
        reuse = self.reuse_decoder_cache
        keep_tail = reuse or self._prime_need is not None
        dec_state = tail_rgb = tail_disp = carry_lat = None

        for now_iter in range(total_iters):
            motion_prompt = [prompts[0]] + prompts[start_unit + 1: start_unit + actual_unit]

            if input_raymap is not None:
                input_raymap = (input_raymap - self.raymap_mean) / self.raymap_std

            key, k_chunk = jax.random.split(key)
            # hand the decoder caches over rather than sharing them: the
            # caller's binding would otherwise pin the previous generation
            # (~2.8 GB at full size) for the whole chunk
            ds_arg, dec_state = (dec_state if reuse else None), None
            (images, disparitys, trans3d, trans2d, dec_state,
             carry_lat, full_window) = self.generate_i2v(
                k_chunk, motion_prompt, use_motion,
                input_image, input_disparity, input_raymap, input_history,
                guidance_scale=guidance_scale,
                video_guidance_scale=video_guidance_scale,
                dec_state=ds_arg, carry_rgb_latent=carry_lat)
            del ds_arg

            if keep_tail:
                if now_iter > 0 and not full_window:
                    # the overlap was not re-decoded (cache reuse or exact
                    # priming — generate_i2v says so explicitly); restore the
                    # previous chunk's raw tail so the bookkeeping sees the
                    # full 57-frame layout (same recipe as
                    # serve._finish_chunk). These frames are dropped by
                    # _accumulate_chunk and never feed the carry, so the
                    # primed rollout's OUTPUT equals the full re-decode's
                    assert images.shape[2] != cfg.actual_frame
                    images = jnp.concatenate([tail_rgb, images], axis=2)
                    disparitys = jnp.concatenate([tail_disp, disparitys], axis=2)
                tail_rgb = images[:, :, -n_img:]
                tail_disp = disparitys[:, :, -n_img:]

            images, disparitys = self._accumulate_chunk(
                now_iter, images, disparitys, trans3d, trans2d, motion_prompt,
                scale_factor, images_list, disparity_list, motion_prompt_list,
                trans3d_list, trans2d_list)
            start_unit += actual_unit - n_unit

            if now_iter == total_iters - 1:
                break

            (input_image, input_disparity, input_raymap, input_history,
             scale_factor) = self._prepare_carry(
                key, images, disparitys, scale_factor,
                images_list, disparity_list, trans3d_list, trans2d_list)
            key, _ = jax.random.split(key)

        out_images = jnp.concatenate(images_list, axis=2)
        out_disp = jnp.concatenate(disparity_list, axis=2)
        return {
            "pred_img": out_images,
            "pred_disparity": out_disp,
            "motion_prompt_list": motion_prompt_list,
            "trans3d": jnp.concatenate(trans3d_list, axis=1),
            "trans2d": jnp.concatenate(trans2d_list, axis=1),
        }

    # -- chunk bookkeeping (shared by generate() and serve.InteractiveSession)

    def _accumulate_chunk(self, now_iter, images, disparitys, trans3d, trans2d,
                          motion_prompt, scale_factor, images_list,
                          disparity_list, motion_prompt_list, trans3d_list,
                          trans2d_list):
        """Post-chunk disparity map + pose chaining + rollout-list appends
        (ref pipeline.py:311-368). Mutates the lists; returns the full-chunk
        ``(images, mapped disparitys)`` used for the next-chunk carry."""
        cfg = self.cfg
        n_img, n_unit = cfg.num_input_image, cfg.num_input_unit
        disparitys = _disparity_postmap(disparitys, scale_factor)
        trans3d = trans3d.at[:, :, :3, 3].multiply(scale_factor)

        if now_iter == 0:
            images_list.append(images)
            disparity_list.append(disparitys)
            motion_prompt_list.append(np.asarray(motion_prompt))
            trans3d_list.append(trans3d)
            trans2d_list.append(trans2d)
        else:
            images_list.append(images[:, :, n_img:])
            disparity_list.append(disparitys[:, :, n_img:])
            motion_prompt_list.append(np.asarray(motion_prompt[n_unit:]))
            trans3d_pre = trans3d_list[-1][:, -n_unit]
            trans3d = jnp.einsum("bij,btjk->btik", trans3d_pre, trans3d)
            trans3d_list.append(trans3d[:, n_unit:])
            trans2d_list.append(trans2d[:, n_unit:])
        return images, disparitys

    def _prepare_carry(self, key, images, disparitys, scale_factor,
                       images_list, disparity_list, trans3d_list, trans2d_list):
        """Next-chunk conditioning from the finished chunk
        (ref pipeline.py:337-411): uint8-roundtripped overlap pixels,
        rescaled sqrt-encoded disparity, relative-pose raymap, retrieved
        history. Returns ``(input_image, input_disparity, input_raymap
        [unnormalised], input_history, scale_factor)``."""
        cfg = self.cfg
        n_img, n_unit = cfg.num_input_image, cfg.num_input_unit
        input_image = _quantize_roundtrip(images[:, :, -n_img:])

        input_disparity = disparitys[:, :, -n_img:]
        if not cfg.no_need_depth:
            scale_factor = 1.0 / jnp.max(input_disparity[:, :, 0])
            input_disparity = input_disparity * scale_factor * 0.95
            input_disparity = jnp.sqrt(input_disparity) * 2.0 - 1.0

        cur_trans3d = jnp.concatenate(trans3d_list, axis=1)[:, -n_unit:]
        ref_inv = jnp.linalg.inv(cur_trans3d[:, 0])
        cur_trans3d = jnp.einsum("bij,btjk->btik", ref_inv, cur_trans3d)
        # absolute -> consecutive relative (ref pipeline.py:357-358)
        rel = [cur_trans3d[:, 0]]
        for i in range(1, cur_trans3d.shape[1]):
            rel.append(jnp.einsum("bij,bjk->bik",
                                  jnp.linalg.inv(cur_trans3d[:, i - 1]), cur_trans3d[:, i]))
        cur_trans3d = jnp.stack(rel, axis=1)
        t3 = cur_trans3d[:, :, :3, 3] / scale_factor
        cur_trans3d = cur_trans3d.at[:, :, :3, 3].set(
            jnp.sign(t3) * jnp.sqrt(jnp.abs(t3)))

        input_raymap = raymap_from_camera_batch(
            jnp.concatenate(trans2d_list, axis=1)[:, -n_unit:],
            cur_trans3d.astype(jnp.float32),
            input_disparity.shape[-2:], vae_downsample=cfg.vae_downsample)
        input_raymap = input_raymap.transpose(0, 2, 1, 3, 4)  # b t c h w -> b c t h w

        input_history = self._retrieve_history(
            key, images_list, disparity_list, trans3d_list, trans2d_list,
            scale_factor, n_unit)
        return (input_image, input_disparity, input_raymap, input_history,
                scale_factor)

    # -- history retrieval (ref pipeline.py:370-411) --------------------------

    def _retrieve_history(self, key, images_list, disparity_list,
                          trans3d_list, trans2d_list, scale_factor, n_unit):
        cfg = self.cfg
        ds = cfg.vae_downsample
        cur_images = jnp.concatenate(images_list, axis=2)[:, :, ::ds]
        cur_disparitys = jnp.concatenate(disparity_list, axis=2)[:, :, ::ds]
        cur_trans3d = jnp.concatenate(trans3d_list, axis=1)
        cur_trans2d = jnp.concatenate(trans2d_list, axis=1)
        ref_inv = jnp.linalg.inv(cur_trans3d[:, -n_unit])
        cur_trans3d = jnp.einsum("bij,btjk->btik", ref_inv, cur_trans3d)

        c2w = cur_trans3d[0]
        last_pos = c2w[-1, :3, 3]
        last_fwd = c2w[-1, :3, 2]
        distances = jnp.linalg.norm(c2w[:-1, :3, 3] - last_pos, axis=1)
        k = min(5, distances.shape[0])
        _, closest = jax.lax.top_k(-distances, k)
        fwds = c2w[closest, :3, 2]
        dots = jnp.sum(fwds * last_fwd, axis=1)
        angles = jnp.arccos(jnp.clip(dots, -1.0, 1.0))
        # keep the retrieved index ON DEVICE (dynamic_slice): fetching it to
        # the host (`int(...)`) drains the whole device queue — the current
        # chunk's decode — before the host may dispatch the history encode
        # and the next chunk's first programs, idling the chip for the
        # host's dispatch latency at every boundary. Same math either way.
        idx = closest[jnp.argmin(angles)]

        cur_image = jax.lax.dynamic_slice_in_dim(cur_images, idx, 1, axis=2)
        cur_disparity = jax.lax.dynamic_slice_in_dim(cur_disparitys, idx, 1, axis=2)
        sel_trans3d = jax.lax.dynamic_slice_in_dim(cur_trans3d, idx, 1, axis=1)
        sel_trans2d = jax.lax.dynamic_slice_in_dim(cur_trans2d, idx, 1, axis=1)

        cur_disparity = jnp.sqrt(cur_disparity * scale_factor * 0.95)
        cur_disparity = jnp.clip(cur_disparity * 2.0 - 1.0, -1.0, 1.0)
        t3 = sel_trans3d[:, :, :3, 3] / scale_factor
        sel_trans3d = sel_trans3d.at[:, :, :3, 3].set(jnp.sign(t3) * jnp.sqrt(jnp.abs(t3)))

        cur_raymap = raymap_from_camera_batch(
            sel_trans2d, sel_trans3d.astype(jnp.float32),
            cur_disparity.shape[-2:], vae_downsample=ds)
        cur_raymap = cur_raymap.transpose(0, 2, 1, 3, 4)
        return self._history_vae_latent(key, cur_image, cur_disparity, cur_raymap)

    def _history_vae_latent(self, key, rgb, disparity, raymap):
        """(ref pipeline.py:242-262): encode rgb+disparity (batched), image
        stats on the single frame, normalise the raymap."""
        cfg = self.cfg
        k1, _ = jax.random.split(key)
        with self.timer.phase("vae_encode"):
            enc = self._encode_pixels(
                jnp.concatenate([rgb, disparity], axis=0).astype(self.dtype), k1)
            if self.timer.sync:
                force_completion(enc)
        video, disp = enc[:1], enc[1:2]
        video = (video - cfg.vae_shift_factor) * cfg.vae_scale_factor
        disp = (disp - cfg.vae_shift_factor) * cfg.vae_scale_factor
        rm = raymap.astype(jnp.float32)
        rm = rm.at[:, :3].set(rm[:, :3] / jnp.linalg.norm(rm[:, :3], axis=1, keepdims=True))
        rm = (rm - self.raymap_mean) / self.raymap_std
        return jnp.concatenate([video, disp, rm.astype(video.dtype)], axis=1)
