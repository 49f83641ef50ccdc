"""MMDiT denoiser — SD3-style joint-attention DiT, TPU-native.

Capability parity with the reference ``MMDiT`` (ref model/mmdit.py:1160-1530).
At inference the reference packs, per denoise call, ONE sequence of
[text(+history) tokens ++ condition clips at mixed resolutions ++ the current
noisy unit] and runs joint attention under a combined batch-id x
temporal-causal mask (ref mmdit.py:1358-1436 ``merge_input``,
mmdit.py:122-180 ``VarlenSelfAttentionWithT5Mask``). We exploit that: the
whole forward is a single static-shape jitted program per clip-layout —

  - clip layouts (shapes, temporal RoPE ids, causal structure) are static
    metadata folded into the compiled program;
  - the per-stage Python loop of the reference's attention disappears: one
    attention call over the packed sequence;
  - AdaLN modulation is a broadcast over the sequence (the reference's
    scatter over stages, ref mmdit.py:535-559, degenerates at inference);
  - the attention mask is built once per forward from a dynamic per-token
    validity vector and static time ids.

Parameter pytrees mirror checkpoint module paths (see io/weights.py).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from ..config import MMDiTConfig
from ..ops.basic import (gelu_tanh, init_linear, init_norm, layer_norm, linear,
                         rms_norm, silu)
from ..ops.resample import down2x_bilinear, resize_bilinear
from ..ops.attention import attention_pallas
from ..ops.rope import apply_rope, rope_tables, rope_tables_jax

#: the mesh replication pins in ``mmdit_forward`` (GSPMD involuntary-full-
#: remat fix, MULTICHIP_r03 vs r04). Module-level so the regression test
#: (tests/test_mesh_remat.py) can compile the UNPINNED program and assert
#: the warning it exists to prevent actually fires — never flip in
#: production code. Not part of the jit cache key: callers toggling it must
#: jax.clear_caches() first.
MESH_PINS_ENABLED = True


# ---------------------------------------------------------------------------
# positional embeddings (host-side, static)
# ---------------------------------------------------------------------------

def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(ref mmdit.py:624-642)"""
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_size: int, base_size: int,
              interpolation_scale: float = 1.0) -> np.ndarray:
    """SD3 2D sincos table [grid*grid, D] (ref mmdit.py:590-621)."""
    grid_h = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) / interpolation_scale
    grid_w = np.arange(grid_size, dtype=np.float32) / (grid_size / base_size) / interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)  # w first
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # [g*g, D]


def timestep_embedding(t: jnp.ndarray, dim: int = 256) -> jnp.ndarray:
    """DDPM sinusoidal embedding, flip_sin_to_cos=True, shift=0
    (ref mmdit.py:645-700)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# ---------------------------------------------------------------------------
# packed layout (static per clip-shape combination)
# ---------------------------------------------------------------------------

class PackedLayout:
    """Static metadata for one packed forward: token counts and time ids.

    clip_shapes: ((t, h, w), ...) latent dims per clip, oldest -> newest; the
    LAST clip is the trainable unit whose velocity is returned
    (ref mmdit.py:1444-1450: only the last ``trainable_token_num`` tokens are
    unpatchified).
    """

    def __init__(self, cfg: MMDiTConfig, clip_shapes: Sequence[Tuple[int, int, int]],
                 ctx_len: int, build_tables: bool = True):
        self.cfg = cfg
        self.clip_shapes = tuple(tuple(s) for s in clip_shapes)
        self.ctx_len = ctx_len
        p = cfg.patch_size
        self.clip_tokens = [t * (h // p) * (w // p) for (t, h, w) in clip_shapes]
        self.video_len = sum(self.clip_tokens)
        self.seq_len = ctx_len + self.video_len
        if not build_tables:
            return

        # temporal ids: ctx tokens at time 0; clip frames consecutive across
        # clips (ref mmdit.py:1336-1356)
        times = [np.zeros(ctx_len, np.float32)]
        t0 = 0
        for (t, h, w) in clip_shapes:
            ids = np.repeat(np.arange(t0, t0 + t, dtype=np.float32), (h // p) * (w // p))
            times.append(ids)
            t0 += t
        self.time_ids = np.concatenate(times)

        head_dim = cfg.attention_head_dim
        cos, sin = rope_tables(self.time_ids, head_dim)
        self.rope_cos = jnp.asarray(cos)
        self.rope_sin = jnp.asarray(sin)

        # static part of the causal mask: t_q >= t_k (ref mmdit.py:1430-1433)
        self.causal = jnp.asarray(self.time_ids[:, None] >= self.time_ids[None, :])


def build_attention_bias(valid: jnp.ndarray, causal: jnp.ndarray) -> jnp.ndarray:
    """[b, 1, S, S] additive bias from per-token validity + causal structure.

    Reference semantics (ref mmdit.py:1413-1434): tokens with batch-id 0
    (masked text/history, padding frames) attend only to each other; everyone
    else attends within the row under temporal causality.

    valid: [b, S] 0/1; causal: [S, S] bool (t_q >= t_k).
    """
    same = valid[:, :, None] == valid[:, None, :]
    allowed = jnp.logical_and(same, causal[None])
    bias = jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)
    return bias[:, None]


# ---------------------------------------------------------------------------
# patch embedding (ref mmdit.py:768-996)
# ---------------------------------------------------------------------------

def _patchify_frames(x: jnp.ndarray, proj: dict, patch: int) -> jnp.ndarray:
    """Per-frame 2x2 conv patchify as one matmul.

    x: [b, c, t, h, w] -> tokens [b, t, h/p, w/p, D].
    weight: [D, c, p, p] consumed in (c, p1, p2) flatten order.
    """
    b, c, t, h, w = x.shape
    hp, wp = h // patch, w // patch
    xx = x.reshape(b, c, t, hp, patch, wp, patch)
    xx = xx.transpose(0, 2, 3, 5, 1, 4, 6).reshape(b, t, hp, wp, c * patch * patch)
    wmat = proj["weight"].reshape(proj["weight"].shape[0], -1)  # [D, c*p*p]
    y = jax.lax.dot_general(
        xx, wmat, dimension_numbers=(((4,), (1,)), ((), ())),
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    ).astype(x.dtype)
    return y + proj["bias"].astype(y.dtype)


def cropped_pos_embed(pos_table: jnp.ndarray, cfg: MMDiTConfig,
                      h: int, w: int, ori_h: int, ori_w: int) -> jnp.ndarray:
    """SD3 cropped positional embedding with condition interpolation
    (ref mmdit.py:841-880). All dims in latent pixels; table [1, M*M, D]."""
    p = cfg.patch_size
    h, w, ori_h, ori_w = h // p, w // p, ori_h // p, ori_w // p
    m = cfg.pos_embed_max_size
    grid = pos_table.reshape(1, m, m, -1)
    if cfg.interp_condition_pos:
        top = (m - ori_h) // 2
        left = (m - ori_w) // 2
        crop = grid[:, top:top + ori_h, left:left + ori_w]
        if (ori_h, ori_w) != (h, w):
            crop = resize_bilinear(crop.transpose(0, 3, 1, 2), (h, w)).transpose(0, 2, 3, 1)
    else:
        top = (m - h) // 2
        left = (m - w) // 2
        crop = grid[:, top:top + h, left:left + w]
    return crop.reshape(1, h * w, -1)


def embed_clips(cfg: MMDiTConfig, p: dict, clips: List[jnp.ndarray]) -> jnp.ndarray:
    """Patchify + pos-embed a clip list, concat to video tokens [b, Lv, D]
    (ref mmdit.py:944-975: ori dims come from the LAST clip)."""
    patch = cfg.patch_size
    ori_h, ori_w = clips[-1].shape[-2:]
    toks = []
    for x in clips:
        y = _patchify_frames(x, p["proj"], patch)           # [b,t,hp,wp,D]
        b, t, hp, wp, d = y.shape
        pos = cropped_pos_embed(p["pos_embed"], cfg, x.shape[-2], x.shape[-1], ori_h, ori_w)
        y = y.reshape(b, t, hp * wp, d) + pos[:, None].astype(y.dtype)
        toks.append(y.reshape(b, t * hp * wp, d))
    return jnp.concatenate(toks, axis=1)


def embed_history(cfg: MMDiTConfig, p: dict, history: jnp.ndarray,
                  downsample_ratio: int) -> jnp.ndarray:
    """History latent -> tokens via proj_history after 2x spatial downsample
    (ref mmdit.py:977-996 forward_history_v2)."""
    b, c, t, h, w = history.shape
    x = history
    if downsample_ratio == 2:
        xd = down2x_bilinear(x.reshape(b, c * t, h, w)).reshape(b, c, t, h // 2, w // 2)
    elif downsample_ratio == 1:
        xd = x
    else:
        xd = resize_bilinear(x.reshape(b, c * t, h, w),
                             (h // downsample_ratio, w // downsample_ratio)
                             ).reshape(b, c, t, h // downsample_ratio, w // downsample_ratio)
    y = _patchify_frames(xd, p["proj_history"], cfg.patch_size)
    bb, t, hp, wp, d = y.shape
    pos = cropped_pos_embed(p["pos_embed"], cfg, xd.shape[-2], xd.shape[-1],
                            xd.shape[-2], xd.shape[-1])
    y = y.reshape(bb, t, hp * wp, d) + pos[:, None].astype(y.dtype)
    return y.reshape(bb, t * hp * wp, d)


# ---------------------------------------------------------------------------
# transformer blocks (ref mmdit.py:182-433)
# ---------------------------------------------------------------------------

def _adaln_zero(p: dict, x: jnp.ndarray, emb: jnp.ndarray):
    """AdaLN-Zero (ref mmdit.py:518-578): returns modulated x + gates.

    emb: [b, D] conditioning; broadcast over the sequence (the reference's
    per-stage scatter is a broadcast at inference)."""
    mod = linear(silu(emb), p["linear"])  # [b, 6D]
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)
    xn = layer_norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return xn, gate_msa[:, None], shift_mlp[:, None], scale_mlp[:, None], gate_mlp[:, None]


def _adaln_continuous(p: dict, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
    """AdaLN-continuous (ref mmdit.py:467-515): scale/shift chunk order."""
    mod = linear(silu(emb), p["linear"])
    scale, shift = jnp.split(mod, 2, axis=-1)
    return layer_norm(x) * (1 + scale[:, None]) + shift[:, None]


def _ff(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """FeedForward gelu-approximate (ref mmdit.py:65-120)."""
    return linear(gelu_tanh(linear(x, p["proj"])), p["out"])


def joint_attention(cfg: MMDiTConfig, p: dict, hidden: jnp.ndarray,
                    ctx: jnp.ndarray, mask_ctx,
                    rope_cos: jnp.ndarray, rope_sin: jnp.ndarray,
                    context_pre_only: bool):
    """Joint text+video attention over the packed sequence
    (ref mmdit.py:259-324 + 122-180). ctx tokens lead the sequence.

    ``mask_ctx`` is either ("bias", [b,1,S,S] additive bias) — the jnp path —
    or ("pallas", valid [b,S] i32, times [S] f32, n_last) for the fused TPU
    kernel that rebuilds the mask on the fly (ops/attention.py); n_last > 0
    splits off the current-unit rows (strictly-largest time) so the
    prefix x current logits block is never computed.
    """
    b, lv, d = hidden.shape
    lc = ctx.shape[1]
    nh = cfg.num_attention_heads
    hd = cfg.attention_head_dim

    q = linear(hidden, p["to_q"]).reshape(b, lv, nh, hd)
    k = linear(hidden, p["to_k"]).reshape(b, lv, nh, hd)
    v = linear(hidden, p["to_v"]).reshape(b, lv, nh, hd)
    q = rms_norm(q, p["norm_q"]["weight"], 1e-5)
    k = rms_norm(k, p["norm_k"]["weight"], 1e-5)

    cq = linear(ctx, p["add_q_proj"]).reshape(b, lc, nh, hd)
    ck = linear(ctx, p["add_k_proj"]).reshape(b, lc, nh, hd)
    cv = linear(ctx, p["add_v_proj"]).reshape(b, lc, nh, hd)
    cq = rms_norm(cq, p["norm_add_q"]["weight"], 1e-5)
    ck = rms_norm(ck, p["norm_add_k"]["weight"], 1e-5)

    q = jnp.concatenate([cq, q], axis=1)
    k = jnp.concatenate([ck, k], axis=1)
    v = jnp.concatenate([cv, v], axis=1)

    q = apply_rope(q, rope_cos, rope_sin)
    k = apply_rope(k, rope_cos, rope_sin)

    if mask_ctx[0] == "pallas":
        _, valid, times, n_last = mask_ctx
        out = attention_pallas(q, k, v, valid, times, n_last=n_last)
        out = out.reshape(b, lc + lv, nh * hd)
    else:
        bias = mask_ctx[1]
        scale = 1.0 / math.sqrt(hd)
        acc = jnp.promote_types(q.dtype, jnp.float32)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=acc) * scale
        logits = logits + bias.astype(acc)
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                         preferred_element_type=acc).astype(v.dtype)
        out = out.reshape(b, lc + lv, nh * hd)

    ctx_out, vid_out = out[:, :lc], out[:, lc:]
    vid_out = linear(vid_out, p["to_out"])
    if not context_pre_only:
        ctx_out = linear(ctx_out, p["to_add_out"])
    return vid_out, ctx_out


def joint_block(cfg: MMDiTConfig, p: dict, hidden: jnp.ndarray, ctx: jnp.ndarray,
                temb: jnp.ndarray, mask_ctx,
                rope_cos: jnp.ndarray, rope_sin: jnp.ndarray,
                context_pre_only: bool):
    """JointTransformerBlock (ref mmdit.py:327-433)."""
    hn, gate_msa, shift_mlp, scale_mlp, gate_mlp = _adaln_zero(p["norm1"], hidden, temb)
    if context_pre_only:
        cn = _adaln_continuous(p["norm1_context"], ctx, temb)
    else:
        cn, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = _adaln_zero(
            p["norm1_context"], ctx, temb)

    attn_out, ctx_attn = joint_attention(cfg, p["attn"], hn, cn, mask_ctx,
                                         rope_cos, rope_sin, context_pre_only)
    hidden = hidden + gate_msa * attn_out
    hn2 = layer_norm(hidden) * (1 + scale_mlp) + shift_mlp
    hidden = hidden + gate_mlp * _ff(p["ff"], hn2)

    if context_pre_only:
        return hidden, ctx
    ctx = ctx + c_gate_msa * ctx_attn
    cn2 = layer_norm(ctx) * (1 + c_scale_mlp) + c_shift_mlp
    ctx = ctx + c_gate_mlp * _ff(p["ff_context"], cn2)
    return hidden, ctx


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def mmdit_forward(cfg: MMDiTConfig, params: dict,
                  clips: List[jnp.ndarray],
                  text_embeds: jnp.ndarray, text_mask: jnp.ndarray,
                  pooled: jnp.ndarray, timestep: jnp.ndarray,
                  history: Optional[jnp.ndarray] = None,
                  history_mask: Optional[jnp.ndarray] = None,
                  history_downsample_ratio: int = 2,
                  frame_times: Optional[List[jnp.ndarray]] = None,
                  frame_valid: Optional[List[jnp.ndarray]] = None,
                  attn_impl: str = "ref",
                  split_last_attn: bool = False,
                  mesh=None) -> jnp.ndarray:
    """One denoise forward over a packed clip list (ref mmdit.py:1467-1530).

    clips: oldest -> newest, each [b, c, t, h, w]; the velocity for the LAST
    clip is returned as [b, c, t, h, w].

    Shape-stable mode: when ``frame_times``/``frame_valid`` are given (one
    [t_i] array per clip), clips may contain padding frames — temporal RoPE
    ids and the causal mask are computed from the dynamic per-frame times,
    and frames with valid=0 join the reference's id-0 group (invisible to
    real tokens, ref mmdit.py:1413-1434). This lets one compiled program
    serve every unit index of the rollout.
    """
    if mesh is not None and MESH_PINS_ENABLED:
        # under a tp mesh, pin the (small, per-clip) latent inputs to
        # replicated BEFORE the 7-D patchify reshape/transpose: GSPMD
        # otherwise back-propagates a tiled sharding from the patchify
        # matmul into the transpose and resolves the mismatch with an
        # "Involuntary full rematerialization" (MULTICHIP_r03.json tail;
        # the matching output-side pin sits after proj_out below)
        _repl = NamedSharding(mesh, PartitionSpec())
        clips = [jax.lax.with_sharding_constraint(c, _repl) for c in clips]
        if history is not None:
            history = jax.lax.with_sharding_constraint(history, _repl)

    te = timestep_embedding(timestep).astype(text_embeds.dtype)
    temb = (
        linear(silu(linear(te, params["time_text_embed"]["timestep_embedder"]["linear_1"])),
               params["time_text_embed"]["timestep_embedder"]["linear_2"])
        + linear(silu(linear(pooled, params["time_text_embed"]["text_embedder"]["linear_1"])),
                 params["time_text_embed"]["text_embedder"]["linear_2"])
    )
    ctx = linear(text_embeds, params["context_embedder"])

    ctx_valid = text_mask
    if history is not None:
        hist_tokens = embed_history(cfg, params["pos_embed"], history, history_downsample_ratio)
        ctx = jnp.concatenate([hist_tokens.astype(ctx.dtype), ctx], axis=1)
        ctx_valid = jnp.concatenate([history_mask.astype(text_mask.dtype), text_mask], axis=1)

    p_ = cfg.patch_size
    if frame_times is not None:
        # dynamic layout: expand per-frame times/valid to per-token vectors
        tok_times = [jnp.zeros((ctx.shape[1],), jnp.float32)]
        vid_valid = []
        for x, ft, fv in zip(clips, frame_times, frame_valid):
            n_tok = (x.shape[-2] // p_) * (x.shape[-1] // p_)
            tok_times.append(jnp.repeat(ft.astype(jnp.float32), n_tok))
            vid_valid.append(jnp.repeat(fv, n_tok))
        times = jnp.concatenate(tok_times)
        causal = times[:, None] >= times[None, :]
        rope_cos, rope_sin = rope_tables_jax(times, cfg.attention_head_dim)
        b_rows = ctx.shape[0]
        vvalid = jnp.broadcast_to(jnp.concatenate(vid_valid)[None],
                                  (b_rows, sum(v.shape[0] for v in vid_valid)))
        valid = jnp.concatenate([ctx_valid, vvalid.astype(ctx_valid.dtype)], axis=1)
        layout = PackedLayout(cfg, [tuple(c.shape[2:]) for c in clips], ctx.shape[1],
                              build_tables=False)
    else:
        layout = PackedLayout(cfg, [tuple(c.shape[2:]) for c in clips], ctx.shape[1])
        causal = layout.causal
        times = jnp.asarray(layout.time_ids)
        rope_cos, rope_sin = layout.rope_cos, layout.rope_sin
        b_rows = ctx.shape[0]
        vvalid = jnp.ones((b_rows, layout.video_len), ctx_valid.dtype)
        valid = jnp.concatenate([ctx_valid, vvalid], axis=1)
    if attn_impl == "pallas":
        # split_last_attn: ONLY valid when the caller guarantees the last
        # clip's time ids are STRICTLY greater than every other token's
        # (true for the denoise loop's current unit; false e.g. for a lone
        # clip whose first frame shares time 0 with the text tokens)
        n_last_attn = layout.clip_tokens[-1] if split_last_attn else 0
        mask_ctx = ("pallas", valid.astype(jnp.int32),
                    times.astype(jnp.float32), n_last_attn)
    else:
        mask_ctx = ("ref", build_attention_bias(valid, causal))

    hidden = embed_clips(cfg, params["pos_embed"], clips)

    n = len(params["transformer_blocks"])
    for i, bp in enumerate(params["transformer_blocks"]):
        hidden, ctx = joint_block(cfg, bp, hidden, ctx, temb, mask_ctx,
                                  rope_cos, rope_sin,
                                  context_pre_only=(i == n - 1))

    hidden = _adaln_continuous(params["norm_out"], hidden, temb)
    hidden = linear(hidden, params["proj_out"])
    if mesh is not None and MESH_PINS_ENABLED:
        # under a tp mesh, pin the post-proj tokens to replicated HERE, on
        # the 3-D token tensor (a plain all-gather of the feature axis) —
        # otherwise GSPMD carries the block-propagated sharding into the 7-D
        # unpatchify transpose below and resolves the mismatch with an
        # "Involuntary full rematerialization" every Euler step
        # (MULTICHIP_r03.json tail)
        hidden = jax.lax.with_sharding_constraint(
            hidden, NamedSharding(mesh, PartitionSpec()))

    # unpatchify ONLY the last clip (ref mmdit.py:1444-1457)
    t, h, w = layout.clip_shapes[-1]
    p_ = cfg.patch_size
    hp, wp = h // p_, w // p_
    n_last = layout.clip_tokens[-1]
    out = hidden[:, -n_last:]
    b = out.shape[0]
    out = out.reshape(b, t, hp, wp, p_, p_, cfg.out_channels)
    out = out.transpose(0, 6, 1, 2, 4, 3, 5).reshape(b, cfg.out_channels, t, h, w)
    return out


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------

def init_mmdit_params(key: jax.Array, cfg: MMDiTConfig, dtype=jnp.float32) -> dict:
    D = cfg.inner_dim
    keys = iter(jax.random.split(key, 64 + 16 * cfg.num_layers))

    pos_table = sincos_2d(D, cfg.pos_embed_max_size,
                          base_size=cfg.sample_size // cfg.patch_size)
    pc = cfg.in_channels * cfg.patch_size * cfg.patch_size
    pos_embed = {
        "proj": {"weight": jax.random.normal(next(keys), (D, cfg.in_channels, cfg.patch_size, cfg.patch_size), dtype) * (1.0 / math.sqrt(pc)),
                 "bias": jnp.zeros((D,), dtype)},
        "proj_history": {"weight": jax.random.normal(next(keys), (D, cfg.in_channels, cfg.patch_size, cfg.patch_size), dtype) * (1.0 / math.sqrt(pc)),
                         "bias": jnp.zeros((D,), dtype)},
        "pos_embed": jnp.asarray(pos_table[None], dtype),
    }

    time_text_embed = {
        "timestep_embedder": {"linear_1": init_linear(next(keys), 256, D, dtype=dtype),
                              "linear_2": init_linear(next(keys), D, D, dtype=dtype)},
        "text_embedder": {"linear_1": init_linear(next(keys), cfg.pooled_projection_dim, D, dtype=dtype),
                          "linear_2": init_linear(next(keys), D, D, dtype=dtype)},
    }

    blocks = []
    hd = cfg.attention_head_dim
    for i in range(cfg.num_layers):
        last = i == cfg.num_layers - 1
        attn = {
            "to_q": init_linear(next(keys), D, D, dtype=dtype),
            "to_k": init_linear(next(keys), D, D, dtype=dtype),
            "to_v": init_linear(next(keys), D, D, dtype=dtype),
            "add_q_proj": init_linear(next(keys), D, D, dtype=dtype),
            "add_k_proj": init_linear(next(keys), D, D, dtype=dtype),
            "add_v_proj": init_linear(next(keys), D, D, dtype=dtype),
            "norm_q": {"weight": jnp.ones((hd,), dtype)},
            "norm_k": {"weight": jnp.ones((hd,), dtype)},
            "norm_add_q": {"weight": jnp.ones((hd,), dtype)},
            "norm_add_k": {"weight": jnp.ones((hd,), dtype)},
            "to_out": init_linear(next(keys), D, D, dtype=dtype),
        }
        if not last:
            attn["to_add_out"] = init_linear(next(keys), D, D, dtype=dtype)
        block = {
            "norm1": {"linear": init_linear(next(keys), D, 6 * D, dtype=dtype)},
            "norm1_context": {"linear": init_linear(next(keys), D, 2 * D if last else 6 * D, dtype=dtype)},
            "attn": attn,
            "ff": {"proj": init_linear(next(keys), D, 4 * D, dtype=dtype),
                   "out": init_linear(next(keys), 4 * D, D, dtype=dtype)},
        }
        if not last:
            block["ff_context"] = {"proj": init_linear(next(keys), D, 4 * D, dtype=dtype),
                                   "out": init_linear(next(keys), 4 * D, D, dtype=dtype)}
        blocks.append(block)

    return {
        "pos_embed": pos_embed,
        "time_text_embed": time_text_embed,
        "context_embedder": init_linear(next(keys), cfg.joint_attention_dim,
                                        cfg.caption_projection_dim, dtype=dtype),
        "transformer_blocks": blocks,
        "norm_out": {"linear": init_linear(next(keys), D, 2 * D, dtype=dtype)},
        "proj_out": init_linear(next(keys), D, cfg.patch_size * cfg.patch_size * cfg.out_channels, dtype=dtype),
    }
