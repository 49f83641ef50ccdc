"""Interactive world-model serving.

The reference ships only a batch CLI (ref run.py:374-427: render the whole
action string, then write an mp4). A deployed world model wants the
opposite interaction: hold state, accept one action at a time, and return
the newly generated frames immediately. This module provides that surface:

  - ``InteractiveSession`` — the chunked autoregressive rollout of
    ``InferencePipeline.generate`` (ref pipeline.py:264-424) suspended
    between latent units: ``start(image)`` then ``step(action) -> frames``.
    Each step denoises ONE unit and streams it through the carried causal
    VAE decoder caches, so the first pixels of a step arrive in
    time-to-first-frame latency (0.83 s measured on a v5e) rather than
    whole-chunk latency. Chunk boundaries (25-frame overlap carry,
    uint8 roundtrip, pose chaining, history retrieval — ref
    pipeline.py:337-411) are handled transparently inside ``step``.
  - ``SessionServer`` — a dependency-free stdlib HTTP server exposing
    sessions over JSON for remote clients, with a /metrics endpoint.

Exactness: a session stepping through the unit sequence produces the same
frames as ``generate`` on the equivalent prompt list and seed — the session
is the same loop with the same PRNG-key splitting order, paused between
units (tests/test_serve.py pins this).
"""

from __future__ import annotations

import base64
import json
import threading
import time
import traceback
import uuid
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline import (InferencePipeline, _disparity_postmap,
                       _pyramid_list, _quantize_roundtrip)
from .raymap import raymap_to_camera
from .utils.profiling import force_completion


class InteractiveSession:
    """One world-model rollout, advanced one latent unit per ``step``.

    Prompt semantics: every ``step(action)`` drives exactly one unit with
    that action's embedding. (``generate`` instead indexes a padded prompt
    list in which chunk-boundary entries are skipped — ref
    pipeline.py:588-607; use ``actions_from_prompt_list`` to convert.)
    """

    def __init__(self, pipe: InferencePipeline, guidance_scale: float = 4.0,
                 video_guidance_scale: float = 3.5,
                 reuse_decoder_cache: bool = False,
                 history_limit_chunks: Optional[int] = None):
        self.pipe = pipe
        self.guidance_scale = guidance_scale
        self.video_guidance_scale = video_guidance_scale
        #: keep only the last N completed chunks of rollout state. The
        #: reference retains the whole rollout for camera-pose history
        #: retrieval (ref pipeline.py:370-411) — fine for a batch render,
        #: unbounded for a long-lived session (~tens of MB of frames per
        #: chunk). With a limit, retrieval searches the last N chunks and
        #: ``result()`` returns only that window; per-step outputs are
        #: unaffected. None (default) = reference semantics.
        assert history_limit_chunks is None or history_limit_chunks >= 1, \
            "history_limit_chunks must be None or >= 1"
        self.history_limit_chunks = history_limit_chunks
        #: carry the streaming VAE-decoder caches across chunk boundaries
        #: instead of re-decoding the 25 overlap frames to warm fresh caches
        #: (what generate()/the reference do, ref pipeline.py:316-317).
        #: Removes the boundary latency hitch (~2.5 s of overlap re-decode
        #: per boundary at full size). Deliberate fidelity deviation, OFF by
        #: default: chunk>=2 pixels decode through cache state from the
        #: previous chunk's original stream rather than the reference's
        #: re-decode of the re-encoded overlap, and since carried pixels
        #: feed the next chunk's conditioning, the rollout drifts from the
        #: reference walk from the second boundary onward.
        self.reuse_decoder_cache = reuse_decoder_cache
        self.started = False
        self.frames_out = 0
        self.steps_done = 0

    # -- prompt-list compatibility -------------------------------------------

    @staticmethod
    def actions_from_prompt_list(cfg, prompts: List[str]) -> List[str]:
        """The per-unit action sequence that ``generate(prompts)`` executes.

        The rollout's unit k consumes padded prompt k-1 exactly (chunk 1
        units 1..T drive prompts[0..T-1]; chunk c>=2 units n..T-1 drive the
        next T-1-n prompts — ref pipeline.py:290-302, 588-607), so this is
        just ``generate``'s padding rule applied to the list."""
        T, n = cfg.max_temporal_length, cfg.num_input_unit
        padded = list(prompts)
        while (len(padded) - T) % (T - n) != 0 or len(padded) < T:
            padded.append(padded[-1])
        return padded

    # -- lifecycle ------------------------------------------------------------

    def start(self, img, seed: int = 666, prompt_type: str = "action") -> None:
        """Begin a rollout from one conditioning image [3,H,W] or [1,3,H,W]
        in [-1, 1]. Mirrors ``generate``'s prologue (ref pipeline.py:264-302)."""
        p = self.pipe
        img = jnp.asarray(img)
        if img.ndim == 3:
            img = img[None, :, None]
        elif img.ndim == 4:
            img = img[:, :, None]
        self.input_image = img.astype(p.dtype)
        self.use_motion = prompt_type == "action"
        self.key = jax.random.PRNGKey(seed)

        self.images_list: List[jnp.ndarray] = []
        self.disparity_list: List[jnp.ndarray] = []
        self.trans3d_list: List[jnp.ndarray] = []
        self.trans2d_list: List[jnp.ndarray] = []
        self.motion_prompt_list: List[np.ndarray] = []
        self.input_disparity = None
        self.input_raymap = None
        self.input_history = None
        self.scale_factor = jnp.float32(1.0)
        self.now_iter = 0
        self.started = True
        self.frames_out = 0
        self.steps_done = 0
        self._carry_lat = None
        self._begin_chunk()

    def _begin_chunk(self) -> None:
        """Chunk prologue (ref pipeline.py:526-586): chunk noise, conditioning
        encode, streaming-decoder reset. Matches generate_i2v's PRNG order."""
        p, cfg, mcfg = self.pipe, self.pipe.cfg, self.pipe.mcfg
        if self.input_raymap is not None:
            self.input_raymap = (self.input_raymap - p.raymap_mean) / p.raymap_std

        self.key, k_chunk = jax.random.split(self.key)
        self.firstframe_mask = self.input_disparity is None
        self.num_rows = 2 if self.input_history is None else 3
        fm = self.firstframe_mask
        _, _, n_in, height, width = self.input_image.shape
        ds = cfg.vae_downsample

        temp = cfg.max_temporal_length + int(fm)
        k_chunk, k_lat, k_enc = jax.random.split(k_chunk, 3)
        latents = jax.random.normal(
            k_lat, (1, mcfg.in_channels, temp, height // ds, width // ds), p.dtype)
        for _ in range(len(cfg.stages) - 1):
            bb, cc, tt, hh, ww = latents.shape
            from .ops.resample import down2x_bilinear
            latents = (down2x_bilinear(latents.reshape(bb, cc * tt, hh, ww)) * 2.0
                       ).reshape(bb, cc, tt, hh // 2, ww // 2)
        self.chunk_latents = latents

        if self._carry_lat is not None:
            # carry_latents boundary fast mode (see InferencePipeline):
            # rgb conditioning carried from the previous chunk's latents,
            # only disparity re-encodes
            img_lat = self._carry_lat.astype(p.dtype)
            disp_lat = p._norm_image_latent(
                p._encode_pixels(self.input_disparity, k_enc))
        elif self.input_disparity is not None:
            stacked = jnp.concatenate([self.input_image, self.input_disparity], axis=0)
            enc = p._encode_pixels(stacked, k_enc)
            img_lat, disp_lat = enc[:1], enc[1:2]
            img_lat = p._norm_image_latent(img_lat)
            disp_lat = p._norm_image_latent(disp_lat)
        else:
            img_lat = p._norm_image_latent(p._encode_pixels(self.input_image, k_enc))
            disp_lat = jnp.zeros_like(img_lat)
        if self.input_raymap is None:
            raymap_lat = jnp.zeros(
                (img_lat.shape[0], cfg.raymap_dim, 1) + img_lat.shape[3:], img_lat.dtype)
        else:
            raymap_lat = self.input_raymap.astype(p.dtype)
        self.generated = [jnp.concatenate([img_lat, disp_lat, raymap_lat], axis=1
                                          ).astype(p.dtype)]

        self.num_units = temp // cfg.frame_per_unit
        self.unit_index = 1 if fm else (n_in - 1) // ds + 1
        self.chunk_key = k_chunk
        self.chunk_prompts: List[str] = []

        # streaming decoder state. _full_window: will this chunk's decoded
        # frames cover the whole latent window? False when the overlap is
        # skipped (cache reuse / exact priming) — _finish_chunk then restores
        # the previous chunk's raw tail. Explicit flag, not shape-sniffed.
        reuse = self.reuse_decoder_cache and self.now_iter > 0
        self._rgb_frames: List[jnp.ndarray] = []
        self._disp_frames: List[jnp.ndarray] = []
        self._full_window = True
        if reuse:
            self._full_window = False
        else:
            self._rgb_cache = self._disp_cache = None
            self._stream_first = True
            if not fm:
                if p._prime_eligible(self.generated[0]):
                    # exact cache priming: skip the discarded-pixel share of
                    # the overlap re-decode (pipeline._prime_warm); the
                    # emitted frames are bit-identical either way
                    self._rgb_cache, self._disp_cache = p._prime_warm(
                        self.generated[0])
                    self._stream_first = False
                    self._full_window = False
                else:
                    # per-frame windows: one t=4 window peaks ~4x the steady
                    # activations and can OOM HBM (see pipeline.generate_i2v)
                    for fi in range(self.generated[0].shape[2]):
                        self._stream_push(self.generated[0][:, :, fi:fi + 1])

    def _stream_push(self, lat38):
        p, cfg = self.pipe, self.pipe.cfg
        li, ld = jnp.split(lat38[:, :-cfg.raymap_dim], 2, axis=1)
        yi, self._rgb_cache = p._stream_push(li, self._rgb_cache, self._stream_first)
        yd, self._disp_cache = p._stream_push(ld, self._disp_cache, self._stream_first)
        self._rgb_frames.append(yi)
        self._disp_frames.append(yd)
        self._stream_first = False
        return yi, yd

    def step(self, action: str) -> Dict:
        """Denoise one unit with ``action`` and return its decoded frames.

        Returns {"rgb": [1,3,f,H,W] in [-1,1], "disparity": [1,3,f,H,W]
        post-mapped as in ref pipeline.py:311-313, "chunk_complete": bool,
        "frames_total": int}. Handles the chunk boundary internally.
        """
        assert self.started, "call start() first"
        p, cfg = self.pipe, self.pipe.cfg
        t0 = time.perf_counter()

        prompt = action if self.use_motion else str(action)
        pe, pm, pp = p._embeds_for(prompt)
        ne, nm, npo = p._embeds_for("empty")
        reps = self.num_rows - 1
        text_embeds = jnp.concatenate([ne] + [pe] * reps, axis=0)
        text_mask = jnp.concatenate([nm] + [pm] * reps, axis=0)
        pooled = jnp.concatenate([npo] + [pp] * reps, axis=0)
        self.chunk_prompts.append(prompt)

        clean = _pyramid_list(jnp.concatenate(self.generated, axis=2),
                              len(cfg.stages) - 1)
        past_conditions = p._padded_conditions(clean, self.unit_index,
                                               self.firstframe_mask, self.num_rows)
        self.chunk_key, k_unit = jax.random.split(self.chunk_key)
        fpu = cfg.frame_per_unit
        cur = self.chunk_latents[:, :, self.unit_index * fpu:(self.unit_index + 1) * fpu]
        intermed = p._generate_one_unit(
            k_unit, cur, self.input_history, past_conditions,
            text_embeds, text_mask, pooled, self.num_rows,
            guidance=self.video_guidance_scale,
            history_scale=cfg.history_guidance_scale)
        self.generated.append(intermed[-1])
        yi, yd = self._stream_push(intermed[-1])

        # per-unit disparity post-map — scale_factor is constant within a
        # chunk, so this equals the end-of-chunk map (ref pipeline.py:311-313).
        # no_need_depth zeroes the RAW frames first, exactly like the rollout
        # (zeros post-map to the 0.25/0.95 constant), keeping step-stream ==
        # result() parity for the disparity channel
        raw = jnp.zeros_like(yd) if cfg.no_need_depth else yd
        disp = _disparity_postmap(raw, self.scale_factor)

        self.unit_index += 1
        self.steps_done += 1
        chunk_complete = self.unit_index >= self.num_units
        if chunk_complete:
            self._finish_chunk()
        self.frames_out += int(yi.shape[2])
        self.last_step_s = time.perf_counter() - t0
        return {"rgb": yi, "disparity": disp,
                "chunk_complete": chunk_complete,
                "frames_total": self.frames_out}

    def _finish_chunk(self) -> None:
        """Chunk epilogue (ref pipeline.py:686-696 + 303-411): recover poses
        from the generated raymaps, post-map the chunk, prepare the overlap
        carry, and open the next chunk."""
        p, cfg = self.pipe, self.pipe.cfg
        ds = cfg.vae_downsample
        generated = self.generated[1:] if self.firstframe_mask else self.generated
        gen = jnp.concatenate(generated, axis=2)

        n_ray = cfg.raymap_dim
        if p.carry_latents:
            lat_img = jnp.split(gen[:, :-n_ray], 2, axis=1)[0]
            self._carry_lat = p._carry_rgb_latent(lat_img)
        gen_raymap = gen[:, -n_ray:].astype(jnp.float32) * p.raymap_std + p.raymap_mean
        trans3d, trans2d = raymap_to_camera(gen_raymap[:, :, 1:],
                                            append_first_reference=True,
                                            from_relative_to_absolute=True,
                                            vae_downsample=ds)
        images = jnp.concatenate(self._rgb_frames, axis=2)
        disparitys = jnp.concatenate(self._disp_frames, axis=2)
        if self.now_iter > 0 and not self._full_window:
            # the overlap was not re-decoded (cache reuse or exact priming —
            # _begin_chunk said so explicitly); restore the previous chunk's
            # tail so the bookkeeping sees the full 57-frame layout
            assert images.shape[2] != cfg.actual_frame
            images = jnp.concatenate([self._tail_rgb, images], axis=2)
            disparitys = jnp.concatenate([self._tail_disp, disparitys], axis=2)
        n_img = cfg.num_input_image
        self._tail_rgb = images[:, :, -n_img:]
        self._tail_disp = disparitys[:, :, -n_img:]
        if cfg.no_need_depth:
            disparitys = jnp.zeros_like(disparitys)

        # _accumulate_chunk slices off the overlap units' prompts for chunks
        # after the first; the session's list holds only consumed actions, so
        # pad it back to generate()'s full motion_prompt layout
        motion = list(self.chunk_prompts)
        if self.now_iter > 0:
            motion = [""] * self.pipe.cfg.num_input_unit + motion
        images, disparitys = p._accumulate_chunk(
            self.now_iter, images, disparitys, trans3d, trans2d,
            motion, self.scale_factor,
            self.images_list, self.disparity_list, self.motion_prompt_list,
            self.trans3d_list, self.trans2d_list)

        (self.input_image, self.input_disparity, self.input_raymap,
         self.input_history, self.scale_factor) = p._prepare_carry(
            self.key, images, disparitys, self.scale_factor,
            self.images_list, self.disparity_list,
            self.trans3d_list, self.trans2d_list)
        self.key, _ = jax.random.split(self.key)
        self.now_iter += 1
        if (self.history_limit_chunks is not None
                and len(self.images_list) > self.history_limit_chunks):
            # pose chaining and the overlap carry only read the LAST chunk's
            # entries; truncation narrows the retrieval window. It must also
            # preserve _retrieve_history's ::ds frame<->pose pairing: the
            # rollout's first chunk holds 57 = 1 (mod 8) frames so every
            # stride-8 pick lands on a unit's FINAL frame; after dropping
            # whole chunks (32 = 0 mod 8 each), trim the new head chunk's
            # leading ds-1 frames to restore that phase.
            keep = self.history_limit_chunks
            ds = self.pipe.cfg.vae_downsample
            for lst in (self.images_list, self.disparity_list,
                        self.motion_prompt_list, self.trans3d_list,
                        self.trans2d_list):
                del lst[:-keep]
            if self.images_list[0].shape[2] % ds != 1:
                self.images_list[0] = self.images_list[0][:, :, ds - 1:]
                self.disparity_list[0] = self.disparity_list[0][:, :, ds - 1:]
        self._begin_chunk()

    # -- whole-rollout views --------------------------------------------------

    def result(self) -> Dict:
        """Rollout-so-far in ``generate``'s output format (completed chunks)."""
        assert self.images_list, "no completed chunks yet"
        return {
            "pred_img": jnp.concatenate(self.images_list, axis=2),
            "pred_disparity": jnp.concatenate(self.disparity_list, axis=2),
            "motion_prompt_list": self.motion_prompt_list,
            "trans3d": jnp.concatenate(self.trans3d_list, axis=1),
            "trans2d": jnp.concatenate(self.trans2d_list, axis=1),
        }


# ---------------------------------------------------------------------------
# HTTP serving (stdlib only)
# ---------------------------------------------------------------------------

def _np_b64(x) -> Dict:
    a = np.asarray(x, np.float16)
    return {"shape": list(a.shape), "dtype": "float16",
            "data": base64.b64encode(a.tobytes()).decode()}


def _b64_np(d) -> np.ndarray:
    a = np.frombuffer(base64.b64decode(d["data"]), np.dtype(d["dtype"]))
    return a.reshape(d["shape"]).astype(np.float32)


class SessionServer:
    """Minimal JSON-over-HTTP server around ``InteractiveSession``s.

    Endpoints:
      POST /session {"image": npb64, "seed": int, "prompt_type": str}
                      -> {"session_id": ...} (409 when max_sessions held)
      POST /step    {"session_id": ..., "action": str}
                      -> {"rgb": npb64, "disparity": npb64,
                          "chunk_complete": bool, "frames_total": int}
      POST /close   {"session_id": ...} -> {"closed": true}
      GET  /metrics -> {"sessions": n, "frames_out": n, "steps": n,
                        "streams": n, "stream_sessions": [n, ...], ...}

    ``pipe`` may be ONE pipeline or a LIST of pipelines, one per chip
    (multi-stream serving). Batching requests onto one chip does not raise
    aggregate throughput — the MMDiT rows are MXU-saturated and batch-2 VAE
    decode is measurably slower than two serial calls (scripts/
    probe_batch.py, probe_decode.py) — so request throughput scales by
    running one independent stream per chip: build each pipeline with its
    params ``jax.device_put`` to a distinct device (``run.load_pipeline(…,
    device=…)``) and every jitted program runs on that chip. Sessions are
    assigned to the least-loaded stream at creation and pinned there.

    One device lock PER STREAM serializes that chip's compute (a chip runs
    one program at a time anyway); steps on different streams run
    concurrently (jax dispatch releases the GIL while the device executes).
    HTTP threads only queue requests. The sessions *registry* has its own
    fast lock so ``/metrics`` (and ``/close``) answer in microseconds even
    while a multi-second chunk-boundary step holds a device — metrics
    counters are monotonic ints mutated only by the single step holding
    that stream's device lock, so reading them without it is safe (worst
    case: one step stale).
    Served sessions keep a bounded rollout history (``history_limit_chunks``,
    default 4) so long-lived sessions cannot exhaust device memory; clients
    consume frames from /step responses. Sessions idle longer than
    ``session_ttl_s`` (default 15 min; None disables) are evicted lazily on
    the next request, reclaiming their device state; ``/metrics`` reports
    the eviction count.
    """

    def __init__(self, pipe: InferencePipeline, host: str = "127.0.0.1",
                 port: int = 0, max_sessions: int = 4,
                 history_limit_chunks: int = 4,
                 session_ttl_s: Optional[float] = 900.0,
                 reuse_decoder_cache: bool = False):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.pipes: List[InferencePipeline] = (
            list(pipe) if isinstance(pipe, (list, tuple)) else [pipe])
        self.pipe = self.pipes[0]               # single-stream compat
        self.max_sessions = max_sessions
        self.history_limit_chunks = history_limit_chunks
        self.session_ttl_s = session_ttl_s
        #: sessions carry decoder caches across chunk boundaries (quality-
        #: gated: skips the boundary's overlap re-decode; see
        #: InteractiveSession.reuse_decoder_cache)
        self.reuse_decoder_cache = reuse_decoder_cache
        self.sessions: Dict[str, InteractiveSession] = {}
        self._last_used: Dict[str, float] = {}
        self._stream_of: Dict[str, int] = {}    # session id -> stream index
        # one lock per stream: each serializes ITS chip's work; streams on
        # distinct chips step concurrently
        self._device_locks = [threading.Lock() for _ in self.pipes]
        self._registry_lock = threading.Lock()  # sessions dict; never held
        #                                         across device work
        self.evicted_total = 0
        outer = self

        def evict_expired() -> None:
            """Drop sessions idle past the TTL (registry lock only — device
            state is reclaimed when the arrays lose their last reference)."""
            if outer.session_ttl_s is None:
                return
            now = time.time()
            with outer._registry_lock:
                dead = [sid for sid, t in outer._last_used.items()
                        if now - t > outer.session_ttl_s]
                for sid in dead:
                    outer.sessions.pop(sid, None)
                    outer._last_used.pop(sid, None)
                    outer._stream_of.pop(sid, None)
                outer.evicted_total += len(dead)

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _json(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/metrics":
                    evict_expired()
                    # counters read WITHOUT any device lock: /metrics must
                    # answer during a running step (tests/test_serve.py pins
                    # the latency)
                    with outer._registry_lock:
                        sessions = list(outer.sessions.values())
                        per_stream = [0] * len(outer.pipes)
                        for i in outer._stream_of.values():
                            per_stream[i] += 1
                    self._json(200, {
                        "sessions": len(sessions),
                        "frames_out": sum(s.frames_out for s in sessions),
                        "steps": sum(s.steps_done for s in sessions),
                        "evicted_total": outer.evicted_total,
                        "session_ttl_s": outer.session_ttl_s,
                        "streams": len(outer.pipes),
                        "stream_sessions": per_stream,
                    })
                else:
                    self._json(404, {"error": "unknown path"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    evict_expired()
                    if self.path == "/session":
                        sid = uuid.uuid4().hex[:12]
                        with outer._registry_lock:
                            if len(outer.sessions) >= outer.max_sessions:
                                self._json(409, {
                                    "error": f"max_sessions={outer.max_sessions} "
                                             "held; POST /close one first"})
                                return
                            # pin the session to the least-loaded stream
                            per_stream = [0] * len(outer.pipes)
                            for i in outer._stream_of.values():
                                per_stream[i] += 1
                            stream = per_stream.index(min(per_stream))
                            sess = InteractiveSession(
                                outer.pipes[stream],
                                reuse_decoder_cache=outer.reuse_decoder_cache,
                                history_limit_chunks=outer.history_limit_chunks)
                            # reserve the slot before the (slow) start so a
                            # concurrent /session cannot oversubscribe
                            outer.sessions[sid] = sess
                            outer._last_used[sid] = time.time()
                            outer._stream_of[sid] = stream
                        try:
                            with outer._device_locks[stream]:
                                sess.start(_b64_np(req["image"]),
                                           seed=int(req.get("seed", 666)),
                                           prompt_type=req.get("prompt_type", "action"))
                        except Exception:
                            with outer._registry_lock:
                                outer.sessions.pop(sid, None)
                                outer._last_used.pop(sid, None)
                                outer._stream_of.pop(sid, None)
                            raise
                        self._json(200, {"session_id": sid})
                    elif self.path == "/close":
                        with outer._registry_lock:
                            sid = req.get("session_id", "")
                            closed = outer.sessions.pop(sid, None) is not None
                            outer._last_used.pop(sid, None)
                            outer._stream_of.pop(sid, None)
                        self._json(200 if closed else 404,
                                   {"closed": closed})
                    elif self.path == "/step":
                        sid = req.get("session_id", "")
                        with outer._registry_lock:
                            sess = outer.sessions.get(sid)
                            stream = outer._stream_of.get(sid, 0)
                        if sess is None:
                            self._json(404, {"error": "unknown session"})
                            return
                        with outer._device_locks[stream]:
                            # re-check: a /close racing the queue wait must
                            # not resurrect the session's device state
                            with outer._registry_lock:
                                if outer.sessions.get(sid) is not sess:
                                    self._json(404, {"error": "session closed"})
                                    return
                                outer._last_used[sid] = time.time()
                            out = sess.step(req["action"])
                            rgb = _np_b64(out["rgb"])
                            disp = _np_b64(out["disparity"])
                        with outer._registry_lock:
                            # a /close may have raced the step: only refresh
                            # bookkeeping for a session that still exists —
                            # an unconditional write would resurrect a
                            # _last_used entry with no matching session
                            if outer.sessions.get(sid) is sess:
                                outer._last_used[sid] = time.time()
                        self._json(200, {
                            "rgb": rgb, "disparity": disp,
                            "chunk_complete": bool(out["chunk_complete"]),
                            "frames_total": int(out["frames_total"])})
                    else:
                        self._json(404, {"error": "unknown path"})
                except Exception as e:   # surface errors to the client;
                    # keep the traceback server-side (the client body only
                    # carries the summary line)
                    traceback.print_exc()
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> int:
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)


def prewarm(pipe: InferencePipeline, height: int = 384, width: int = 512,
            reuse_decoder_cache: bool = False, seed: int = 0,
            log=print) -> float:
    """Compile every serving-path program by driving one throwaway session
    across a chunk boundary, BEFORE the server accepts traffic.

    The axon remote compiler does not persist the big TPU executables across
    processes (CLAUDE.md): a fresh serve process pays minutes of pipeline
    compiles on its first session. Without pre-warming, that cost lands on
    the first client request; with it, the port only opens once the chip is
    ready (orchestrator health checks see connection-refused until then).
    Steps one unit past the boundary so the chunk>=2 programs (3-row CFG
    denoise, carry re-encode, cache prime / reuse) compile too. Returns the
    warm seconds; measured end-to-end by scripts/probe_cold_start.py.
    """
    t0 = time.time()
    cfg = pipe.cfg
    sess = InteractiveSession(pipe, reuse_decoder_cache=reuse_decoder_cache)
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(seed),
                                        (1, 3, height, width),
                                        minval=-1.0, maxval=1.0))
    sess.start(img, seed=seed)
    # units 1..T-1 fill chunk 1; one more crosses into chunk 2
    n_steps = cfg.max_temporal_length
    for i in range(n_steps):
        out = sess.step("Move forward. The perspective hasn't changed.")
    force_completion(out["rgb"])
    dt = time.time() - t0
    log(f"[serve] prewarm: {n_steps} units (one chunk + boundary) "
        f"compiled+run in {dt:.1f}s")
    from .utils import aot
    if aot.cache_dir() is not None:
        s = aot.stats()
        log(f"[serve] aot cache: {s['loaded']} executables deserialized "
            f"({s['loaded_mb']} MB), {s['compiled']} compiled+serialized "
            f"({aot.cache_dir()})")
    return dt


def cli():
    """python -m deepv_tpu.serve --model_path ./ckpts [--port 8631] …"""
    import argparse

    from .config import create_model_config
    from .run import load_pipeline

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8631)
    p.add_argument("--no_need_depth", action="store_true")
    p.add_argument("--random_weights", action="store_true",
                   help="random-initialise the full model (no checkpoint); "
                        "seeds are stable only within one platform + JAX "
                        "version (fast 'rbg' PRNG — io/weights.py)")
    p.add_argument("--tp_shards", type=int, default=1,
                   help="shard inference over this many chips (TP denoise + "
                        "spatial-CP VAE); 1 = single device")
    p.add_argument("--streams", type=int, default=1,
                   help="run this many INDEPENDENT pipelines, one per chip "
                        "(multi-stream serving — request throughput scales "
                        "with chips; latency per session does not). "
                        "Mutually exclusive with --tp_shards")
    p.add_argument("--fast", action="store_true",
                   help="quality-gated fast preset: flow caching + int8 VAE "
                        "decode + int8 MMDiT linears (~1.4x; deviations "
                        "measured in bench.py)")
    p.add_argument("--carry_latents", action="store_true",
                   help="quality-gated boundary fast mode: carry generated "
                        "rgb latents across chunk boundaries instead of "
                        "re-encoding the carry pixels")
    p.add_argument("--reuse_decoder_cache", action="store_true",
                   help="quality-gated boundary fast mode: sessions carry "
                        "the streaming decoder's conv caches across chunk "
                        "boundaries, removing the boundary's overlap "
                        "re-decode hitch (deviation measured in bench.py)")
    p.add_argument("--flow_cache", default=None,
                   help="flow-caching mode: none | skip_odd | adaptive[:tau] "
                        "(error-bounded adaptive caching; overrides the "
                        "--fast preset's choice)")
    p.add_argument("--no_prewarm", action="store_true",
                   help="skip the pre-bind warmup session; the first client "
                        "request then pays the full cold compile (~minutes "
                        "on a fresh process)")
    p.add_argument("--aot_cache", default=None, metavar="DIR",
                   help="persist compiled executables under DIR "
                        "(utils/aot.py): the first launch serializes every "
                        "pipeline program as prewarm compiles it; later "
                        "launches deserialize instead of re-paying the "
                        "remote compiles (~GBs of disk at full size)")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=512)
    args = p.parse_args()
    if args.aot_cache:
        from .utils.aot import configure as aot_configure
        aot_configure(args.aot_cache)

    model_cfg = create_model_config(args.model_path,
                                    no_need_depth=args.no_need_depth,
                                    use_motion_prompt=True)
    if args.streams > 1:
        if args.tp_shards > 1:
            raise SystemExit("--streams and --tp_shards are mutually "
                             "exclusive (per-chip pipelines vs one pipeline "
                             "sharded across chips)")
        devices = jax.devices()
        if args.streams > len(devices):
            raise SystemExit(f"--streams {args.streams} > "
                             f"{len(devices)} visible devices")
        pipe = [load_pipeline(args.model_path, model_cfg,
                              random_weights=args.random_weights,
                              fast=args.fast, flow_cache=args.flow_cache,
                              carry_latents=args.carry_latents,
                              device=d)
                for d in devices[:args.streams]]
    else:
        pipe = load_pipeline(args.model_path, model_cfg,
                             random_weights=args.random_weights,
                             tp_shards=args.tp_shards, fast=args.fast,
                             flow_cache=args.flow_cache,
                             carry_latents=args.carry_latents)
    if not args.no_prewarm:
        # warm BEFORE binding the port: a fresh process owes minutes of
        # non-persistable TPU compiles (prewarm docstring) and they must not
        # land on the first client request. Streams warm serially — each
        # pipeline's programs compile through the one remote compiler, and
        # its serialisation means parallel warms would not finish sooner.
        pipes = pipe if isinstance(pipe, list) else [pipe]
        for i, pp in enumerate(pipes):
            print(f"[serve] prewarming stream {i}/{len(pipes)} …")
            prewarm(pp, height=args.height, width=args.width,
                    reuse_decoder_cache=args.reuse_decoder_cache)
    server = SessionServer(pipe, host=args.host, port=args.port,
                           reuse_decoder_cache=args.reuse_decoder_cache)
    port = server.start()
    print(f"[serve] listening on http://{args.host}:{port} "
          f"(POST /session, POST /step, GET /metrics)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    cli()
