"""Causal video VAE, functional and TPU-native.

Capability parity with the reference ``CausalVideoVAE`` (ref vae.py:753-1014):
a 3-level spatially (8x) and temporally (8x: 57 pixel frames <-> 8 latent
frames) compressing KL autoencoder built from causal 3D convolutions, with

  - temporal **chunked** encode/decode: the reference threads a mutable
    per-layer deque of trailing activations (ref vae.py:225-252); here the
    whole cache is an explicit pytree carried through pure per-window calls,
    so each window is one jitted program and chunked == full bit-for-bit
    (up to the usual float reassociation);
  - spatial **tiling** with linearly blended seams (ref vae.py:954-1014),
    kept for capability/memory parity but OFF by default on TPU — v5e HBM
    fits the full 384x512 plane, and 25% tile overlap is pure wasted FLOPs;
  - a diagonal Gaussian bottleneck (ref vae.py:602-628).

Parameter pytrees mirror the checkpoint's module paths so conversion is a
re-keying (see io/weights.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import VAEConfig
from ..ops.basic import (group_norm, init_conv3d, init_linear, init_norm,
                         linear, silu)
from ..ops.causal_conv import causal_conv3d
from ..utils.aot import aot_jit


def _get(cache, key):
    return None if cache is None else cache.get(key)


def _idx(cache, i):
    return None if cache is None else cache[i]


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def causal_group_norm(x: jnp.ndarray, num_groups: int, p: dict,
                      cp_axis=None) -> jnp.ndarray:
    """GroupNorm applied per frame (ref vae.py:161-167): statistics never
    cross the time axis, which is what keeps chunked == full exact.

    Under spatial context parallelism the per-group statistics are global
    over H, so local sums are psum'd across the cp axis."""
    b, c, t, h, w = x.shape
    if cp_axis is None:
        x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        y = group_norm(x2, num_groups, p["weight"], p["bias"])
        return y.reshape(b, t, c, h, w).transpose(0, 2, 1, 3, 4)

    g = num_groups
    ct = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ct).transpose(0, 2, 1, 3, 4).reshape(b * t, g, c // g, h * w)
    local_n = (c // g) * h * w
    s = lax.psum(jnp.sum(xf, axis=(2, 3)), cp_axis)
    ss = lax.psum(jnp.sum(jnp.square(xf), axis=(2, 3)), cp_axis)
    n = local_n * lax.axis_size(cp_axis)
    mean = (s / n)[:, :, None, None]
    var = (ss / n)[:, :, None, None] - jnp.square(mean)
    xf = (xf - mean) * lax.rsqrt(var + 1e-6)
    xf = xf.reshape(b * t, c, h, w)
    out = xf * p["weight"].astype(ct).reshape(1, c, 1, 1) \
        + p["bias"].astype(ct).reshape(1, c, 1, 1)
    return out.astype(x.dtype).reshape(b, t, c, h, w).transpose(0, 2, 1, 3, 4)


def resnet_apply(p: dict, x: jnp.ndarray, cache, mode: str, groups: int,
                 cp_axis=None, impl: str = "xla", tp_axis=None):
    """CausalResnetBlock3D (ref vae.py:254-310)."""
    h = causal_group_norm(x, groups, p["norm1"], cp_axis)
    h = silu(h)
    h, c1 = causal_conv3d(h, p["conv1"], _get(cache, "conv1"), mode=mode,
                          cp_axis=cp_axis, tp_axis=tp_axis, impl=impl)
    h = causal_group_norm(h, groups, p["norm2"], cp_axis)
    h = silu(h)
    h, c2 = causal_conv3d(h, p["conv2"], _get(cache, "conv2"), mode=mode,
                          cp_axis=cp_axis, tp_axis=tp_axis, impl=impl)
    if "conv_shortcut" in p:
        x, _ = causal_conv3d(x, p["conv_shortcut"], None, mode=mode, cp_axis=cp_axis)
    if mode == "prime":
        # each prime-mode conv consumed kt-1 leading context frames; align
        # the residual with the (4-frame-shorter) main path's trailing frames
        x = x[:, :, x.shape[2] - h.shape[2]:]
    return x + h, {"conv1": c1, "conv2": c2}


def attn2d_apply(p: dict, x: jnp.ndarray, groups: int, cp_axis=None) -> jnp.ndarray:
    """Per-frame single-head spatial self-attention with residual
    (ref vae.py:412-469 mid-block; diffusers Attention semantics:
    group-norm -> qkv -> fp32 softmax -> out proj -> +residual).

    Under spatial CP the mid block runs at the bottleneck resolution, so we
    all_gather the rows, attend globally, and keep the local slice."""
    if cp_axis is not None:
        h_local = x.shape[3]
        full = lax.all_gather(x, cp_axis, axis=3, tiled=True)
        y = attn2d_apply(p, full, groups, None)
        idx = lax.axis_index(cp_axis)
        return lax.dynamic_slice_in_dim(y, idx * h_local, h_local, axis=3)
    b, c, t, h, w = x.shape
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h * w)
    resid = x2
    xn = group_norm(x2, groups, p["group_norm"]["weight"], p["group_norm"]["bias"])
    xn = xn.transpose(0, 2, 1)  # [bt, hw, c]
    q = linear(xn, p["to_q"])
    k = linear(xn, p["to_k"])
    v = linear(xn, p["to_v"])
    ct = jnp.promote_types(x.dtype, jnp.float32)
    scale = 1.0 / jnp.sqrt(ct.type(c))
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=ct) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", weights, v,
                     preferred_element_type=ct).astype(v.dtype)
    out = linear(out, p["to_out"])
    out = out.transpose(0, 2, 1) + resid
    return out.reshape(b, t, c, h, w).transpose(0, 2, 1, 3, 4)


def midblock_apply(p: dict, x: jnp.ndarray, cache, mode: str, groups: int,
                   cp_axis=None, impl: str = "xla", tp_axis=None):
    """CausalUNetMidBlock2D: resnet, then (attn, resnet) pairs (ref vae.py:459-469)."""
    caches = []
    x, c0 = resnet_apply(p["resnets"][0], x, _idx(_get(cache, "resnets"), 0),
                         mode, groups, cp_axis, impl, tp_axis)
    caches.append(c0)
    for i, attn in enumerate(p["attentions"]):
        if attn is not None:
            x = attn2d_apply(attn, x, groups, cp_axis)
        x, ci = resnet_apply(p["resnets"][i + 1], x,
                             _idx(_get(cache, "resnets"), i + 1), mode, groups,
                             cp_axis, impl, tp_axis)
        caches.append(ci)
    return x, {"resnets": caches}


def spatial_down_apply(p: dict, x, cache, mode: str, cp_axis=None, tp_axis=None):
    """CausalDownsample2x: causal conv stride (1,2,2) (ref vae.py:312-335)."""
    return causal_conv3d(x, p, cache, mode=mode, stride=(1, 2, 2), cp_axis=cp_axis,
                         tp_axis=tp_axis)


def temporal_down_apply(p: dict, x, cache, mode: str, cp_axis=None, tp_axis=None):
    """CausalTemporalDownsample2x: causal conv stride (2,1,1) (ref vae.py:337-357)."""
    return causal_conv3d(x, p, cache, mode=mode, stride=(2, 1, 1), cp_axis=cp_axis,
                         tp_axis=tp_axis)


def spatial_up_apply(p: dict, x, cache, mode: str, cp_axis=None,
                     impl: str = "xla", tp_axis=None):
    """CausalUpsample2x: conv to 4c then 2x2 pixel shuffle (ref vae.py:359-383)."""
    y, c = causal_conv3d(x, p, cache, mode=mode, cp_axis=cp_axis,
                         tp_axis=tp_axis, impl=impl)
    b, c4, t, h, w = y.shape
    y = y.reshape(b, c4 // 4, 2, 2, t, h, w)
    y = y.transpose(0, 1, 4, 5, 2, 6, 3)  # b c t h p1 w p2
    y = y.reshape(b, c4 // 4, t, h * 2, w * 2)
    return y, c


def temporal_up_apply(p: dict, x, cache, mode: str, cp_axis=None,
                      impl: str = "xla", tp_axis=None):
    """CausalTemporalUpsample2x: conv to 2c, temporal unshuffle, drop the
    duplicated first frame on the initial chunk (ref vae.py:385-410)."""
    y, c = causal_conv3d(x, p, cache, mode=mode, cp_axis=cp_axis,
                         tp_axis=tp_axis, impl=impl)
    b, c2, t, h, w = y.shape
    y = y.reshape(b, c2 // 2, 2, t, h, w)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, c2 // 2, t * 2, h, w)
    if mode in ("full", "init"):
        y = y[:, :, 1:]
    return y, c


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def encoder_apply(cfg: VAEConfig, p: dict, x: jnp.ndarray, cache=None,
                  mode: str = "full", cp_axis=None, tp_axis=None):
    """CausalVaeEncoder + quant conv -> Gaussian moments (ref vae.py:630-689)."""
    groups = cfg.encoder_norm_num_groups
    impl = cfg.conv_impl
    caches = {}
    x, caches["conv_in"] = causal_conv3d(x, p["conv_in"], _get(cache, "conv_in"),
                                         mode=mode, cp_axis=cp_axis,
                                         tp_axis=tp_axis, impl=impl)

    block_caches = []
    for i in range(len(cfg.encoder_block_out_channels)):
        bp = p["down_blocks"][i]
        bc = _idx(_get(cache, "down_blocks"), i)
        rcaches = []
        for j in range(cfg.encoder_layers_per_block[i]):
            x, rc = resnet_apply(bp["resnets"][j], x, _idx(_get(bc, "resnets"), j),
                                 mode, groups, cp_axis, impl, tp_axis)
            rcaches.append(rc)
        out = {"resnets": rcaches}
        if cfg.encoder_spatial_down_sample[i]:
            x, out["downsampler"] = spatial_down_apply(bp["downsampler"], x,
                                                       _get(bc, "downsampler"), mode,
                                                       cp_axis, tp_axis)
        if cfg.encoder_temporal_down_sample[i]:
            x, out["temporal_downsampler"] = temporal_down_apply(
                bp["temporal_downsampler"], x, _get(bc, "temporal_downsampler"), mode,
                cp_axis, tp_axis)
        block_caches.append(out)
    caches["down_blocks"] = block_caches

    x, caches["mid_block"] = midblock_apply(p["mid_block"], x, _get(cache, "mid_block"),
                                            mode, groups, cp_axis, impl, tp_axis)
    x = causal_group_norm(x, groups, p["conv_norm_out"], cp_axis)
    x = silu(x)
    x, caches["conv_out"] = causal_conv3d(x, p["conv_out"], _get(cache, "conv_out"),
                                          mode=mode, cp_axis=cp_axis,
                                          tp_axis=tp_axis, impl=impl)
    moments, _ = causal_conv3d(x, p["quant_conv"], None, mode=mode, cp_axis=cp_axis)
    return moments, caches


def decoder_front(cfg: VAEConfig, p: dict, z: jnp.ndarray, cache=None,
                  mode: str = "full", cp_axis=None, tp_axis=None):
    """post-quant conv + conv_in + mid block + all up_blocks EXCEPT the last
    (ref vae.py:691-751 up to the final block). Returns the last block's
    input stream and the partial cache dict (``up_blocks`` of length N-1).
    ``decoder_apply`` composes this with ``decoder_tail``; the boundary
    cache priming (``decoder_prime_tail``) replaces the tail with a
    trailing-suffix pass that computes caches only."""
    groups = cfg.decoder_norm_num_groups
    impl = cfg.conv_impl
    caches = {}
    z, _ = causal_conv3d(z, p["post_quant_conv"], None, mode=mode, cp_axis=cp_axis)
    x, caches["conv_in"] = causal_conv3d(z, p["conv_in"], _get(cache, "conv_in"),
                                         mode=mode, cp_axis=cp_axis,
                                         tp_axis=tp_axis, impl=impl)
    x, caches["mid_block"] = midblock_apply(p["mid_block"], x, _get(cache, "mid_block"),
                                            mode, groups, cp_axis, impl, tp_axis)

    block_caches = []
    for i in range(len(cfg.decoder_block_out_channels) - 1):
        bp = p["up_blocks"][i]
        bc = _idx(_get(cache, "up_blocks"), i)
        rcaches = []
        for j in range(cfg.decoder_layers_per_block[i]):
            x, rc = resnet_apply(bp["resnets"][j], x, _idx(_get(bc, "resnets"), j),
                                 mode, groups, cp_axis, impl, tp_axis)
            rcaches.append(rc)
        out = {"resnets": rcaches}
        if cfg.decoder_spatial_up_sample[i]:
            x, out["upsampler"] = spatial_up_apply(bp["upsampler"], x,
                                                   _get(bc, "upsampler"), mode,
                                                   cp_axis, impl, tp_axis)
        if cfg.decoder_temporal_up_sample[i]:
            x, out["temporal_upsampler"] = temporal_up_apply(
                bp["temporal_upsampler"], x, _get(bc, "temporal_upsampler"), mode,
                cp_axis, impl, tp_axis)
        block_caches.append(out)
    caches["up_blocks"] = block_caches
    return x, caches


def decoder_tail(cfg: VAEConfig, p: dict, x: jnp.ndarray, cache=None,
                 mode: str = "full", cp_axis=None, tp_axis=None):
    """The LAST up_block + conv_norm_out + conv_out. ``cache`` is the full
    decoder cache dict (its last ``up_blocks`` entry and ``conv_out`` are
    read). Returns (pixels, partial caches)."""
    groups = cfg.decoder_norm_num_groups
    impl = cfg.conv_impl
    i = len(cfg.decoder_block_out_channels) - 1
    bp = p["up_blocks"][i]
    bc = _idx(_get(cache, "up_blocks"), i)
    rcaches = []
    for j in range(cfg.decoder_layers_per_block[i]):
        x, rc = resnet_apply(bp["resnets"][j], x, _idx(_get(bc, "resnets"), j),
                             mode, groups, cp_axis, impl, tp_axis)
        rcaches.append(rc)
    out = {"resnets": rcaches}
    if cfg.decoder_spatial_up_sample[i]:
        x, out["upsampler"] = spatial_up_apply(bp["upsampler"], x,
                                               _get(bc, "upsampler"), mode,
                                               cp_axis, impl, tp_axis)
    if cfg.decoder_temporal_up_sample[i]:
        x, out["temporal_upsampler"] = temporal_up_apply(
            bp["temporal_upsampler"], x, _get(bc, "temporal_upsampler"), mode,
            cp_axis, impl, tp_axis)

    caches = {"up_blocks_last": out}
    x = causal_group_norm(x, groups, p["conv_norm_out"], cp_axis)
    x = silu(x)
    x, caches["conv_out"] = causal_conv3d(x, p["conv_out"], _get(cache, "conv_out"),
                                          mode=mode, cp_axis=cp_axis,
                                          tp_axis=tp_axis, impl=impl)
    return x, caches


def decoder_apply(cfg: VAEConfig, p: dict, z: jnp.ndarray, cache=None,
                  mode: str = "full", cp_axis=None, tp_axis=None):
    """post-quant conv + CausalVaeDecoder -> sample (ref vae.py:691-751)."""
    x, caches = decoder_front(cfg, p, z, cache, mode, cp_axis, tp_axis)
    x, tail = decoder_tail(cfg, p, x, cache, mode, cp_axis, tp_axis)
    caches["up_blocks"] = caches["up_blocks"] + [tail["up_blocks_last"]]
    caches["conv_out"] = tail["conv_out"]
    return x, caches


def decoder_prime_need(cfg: VAEConfig) -> Optional[int]:
    """Trailing frames of the last up_block's input stream needed to rebuild
    its (and conv_out's) caches exactly: 2 frames of temporal context per
    kt=3 conv — ``4 * n_resnets + 2``. None when the last block contains an
    up/temporal sampler (priming unsupported; use the full warm decode)."""
    i = len(cfg.decoder_block_out_channels) - 1
    if cfg.decoder_spatial_up_sample[i] or cfg.decoder_temporal_up_sample[i]:
        return None
    return 4 * cfg.decoder_layers_per_block[i] + 2


def decoder_prime_tail(cfg: VAEConfig, p: dict, x: jnp.ndarray):
    """Rebuild the last up_block's + conv_out's caches from the trailing
    ``decoder_prime_need(cfg)`` frames of the block's input stream, without
    computing any pixels.

    Chunk-boundary use (pipeline.generate_i2v): the reference decodes the
    whole re-encoded 25-frame overlap and DISCARDS the pixels — only the
    decoder's conv caches carry into the new frames (ref pipeline.py:316-343
    + vae.py:225-252). Every layer's cache is the last kt-1 frames of that
    layer's input, so the final (most expensive, full-resolution) block only
    ever needs the trailing ``4*n_resnets+2`` frames of its input: each
    prime-mode conv treats its leading 2 frames as temporal context. The
    produced caches are bit-identical to the full pass (per-frame math is
    unchanged); conv_out itself never runs — its cache is just the last two
    frames of its input.
    """
    groups = cfg.decoder_norm_num_groups
    impl = cfg.conv_impl
    i = len(cfg.decoder_block_out_channels) - 1
    assert decoder_prime_need(cfg) is not None
    assert x.shape[2] >= decoder_prime_need(cfg), \
        "prime tail needs the full trailing window"
    bp = p["up_blocks"][i]
    rcaches = []
    for j in range(cfg.decoder_layers_per_block[i]):
        x, rc = resnet_apply(bp["resnets"][j], x, None, "prime", groups,
                             impl=impl)
        rcaches.append(rc)
    # conv_out's cache is the last two frames of its input; skip the conv
    xn = causal_group_norm(x[:, :, -2:], groups, p["conv_norm_out"])
    return {"up_blocks_last": {"resnets": rcaches}, "conv_out": silu(xn)}


# ---------------------------------------------------------------------------
# Gaussian bottleneck (ref vae.py:602-628)
# ---------------------------------------------------------------------------

def gaussian_sample(moments: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    mean, logvar = jnp.split(moments, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(mean.dtype)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def gaussian_mode(moments: jnp.ndarray) -> jnp.ndarray:
    mean, _ = jnp.split(moments, 2, axis=1)
    return mean


# ---------------------------------------------------------------------------
# chunked + tiled drivers
# ---------------------------------------------------------------------------

def _split_windows(t: int, window: int):
    """Temporal window split [window+1, window, window, ..., rest]
    (ref vae.py:866-876, 903-913)."""
    init = window + 1
    sizes = [min(init, t)]
    fid = init
    while fid + window <= t:
        sizes.append(window)
        fid += window
    if fid < t:
        sizes.append(t - fid)
    return sizes


@functools.partial(aot_jit, static_argnames=("cfg", "mode"))
def _enc_window(cfg, p, x, cache, mode):
    return encoder_apply(cfg, p, x, cache, mode)


@functools.partial(aot_jit, static_argnames=("cfg", "mode"))
def _dec_window(cfg, p, z, cache, mode):
    return decoder_apply(cfg, p, z, cache, mode)


@functools.partial(aot_jit, static_argnames=("cfg", "mode"))
def _dec_front_window(cfg, p, z, cache, mode):
    return decoder_front(cfg, p, z, cache, mode)


@functools.partial(aot_jit, static_argnames=("cfg",))
def _dec_prime_tail(cfg, p, x):
    return decoder_prime_tail(cfg, p, x)


@functools.partial(aot_jit, static_argnames=("cfg",))
def _dec_prime_warm(cfg, p, z):
    """The whole chunk-boundary warm as ONE program: per-frame windows
    through the decoder front, then the trailing-suffix prime tail — caches
    only, no overlap pixels. One dispatch instead of one per window: each
    window call flattens the ~200-leaf param+cache pytree through the host,
    real milliseconds on a 1-core box, and XLA frees the unneeded window
    outputs instead of Python holding them between dispatches."""
    need = decoder_prime_need(cfg)
    t_up = 2 ** sum(cfg.decoder_temporal_up_sample)
    total = 1 + (z.shape[2] - 1) * t_up
    assert need is not None and total >= need
    buf = None
    cache = None
    pos = 0
    for fi in range(z.shape[2]):
        x, cache = decoder_front(cfg, p, z[:, :, fi:fi + 1], cache,
                                 "init" if fi == 0 else "cont")
        # keep only the part of this window inside the needed trailing suffix
        end = pos + x.shape[2]
        lo = total - need
        if end > lo:
            part = x if pos >= lo else x[:, :, lo - pos:]
            buf = part if buf is None else jnp.concatenate([buf, part], axis=2)
        pos = end
    tail = decoder_prime_tail(cfg, p, buf)
    cache["up_blocks"] = cache["up_blocks"] + [tail["up_blocks_last"]]
    cache["conv_out"] = tail["conv_out"]
    return cache


def chunk_encode(cfg: VAEConfig, p: dict, x: jnp.ndarray, window_size: int = 16):
    """Temporal-chunked encode (ref vae.py:865-883); cont windows as one scan."""
    t_down = 2 ** sum(cfg.encoder_temporal_down_sample)
    assert window_size % t_down == 0, (
        f"encode window_size={window_size} must be a multiple of the "
        f"temporal downsample factor {t_down} — misaligned windows shift "
        f"the stride-2 cache phase and change the latent count")
    sizes = _split_windows(x.shape[2], window_size)
    m0, cache = _enc_window(cfg, p, x[:, :, :sizes[0]], None, "init")
    outs = [m0]
    fid = sizes[0]
    n_full = sum(1 for s in sizes[1:] if s == window_size)
    if n_full:
        stacked = jnp.stack([x[:, :, fid + i * window_size: fid + (i + 1) * window_size]
                             for i in range(n_full)])
        tail, cache = _enc_scan(cfg, p, stacked, cache)
        outs.extend(tail[i] for i in range(n_full))
        fid += n_full * window_size
    if fid < x.shape[2]:
        m, cache = _enc_window(cfg, p, x[:, :, fid:], cache, "cont")
        outs.append(m)
    return jnp.concatenate(outs, axis=2)


def chunk_decode(cfg: VAEConfig, p: dict, z: jnp.ndarray, window_size: int = 2,
                 return_cache: bool = False):
    """Temporal-chunked decode (ref vae.py:902-920).

    The init window runs as its own program; the equal-sized cont windows run
    as ONE jitted ``lax.scan`` with the conv-cache pytree as carry — a single
    dispatch and compilation for the whole tail. A ragged final window (z not
    aligned to the window size) runs as one more program.

    ``return_cache=True`` additionally returns the final conv-cache pytree
    (the jitted programs compute it either way; this only changes what the
    host keeps) — the carry for ``chunk_decode_cont`` across chunk
    boundaries (pipeline ``reuse_decoder_cache``).
    """
    sizes = _split_windows(z.shape[2], window_size)
    out0, cache = _dec_window(cfg, p, z[:, :, :sizes[0]], None, "init")
    outs = [out0]
    fid = sizes[0]
    n_full = sum(1 for s in sizes[1:] if s == window_size)
    if n_full:
        stacked = jnp.stack([z[:, :, fid + i * window_size: fid + (i + 1) * window_size]
                             for i in range(n_full)])
        tail, cache = _dec_scan(cfg, p, stacked, cache)
        outs.extend(tail[i] for i in range(n_full))
        fid += n_full * window_size
    if fid < z.shape[2]:
        d, cache = _dec_window(cfg, p, z[:, :, fid:], cache, "cont")
        outs.append(d)
    out = jnp.concatenate(outs, axis=2)
    return (out, cache) if return_cache else out


def chunk_decode_cont(cfg: VAEConfig, p: dict, z: jnp.ndarray, cache,
                      window_size: int = 2, return_cache: bool = False):
    """Chunked decode continuing from a carried conv-cache pytree: all
    windows run in ``cont`` mode (equal-sized ones as the shared
    ``_dec_scan`` program). With ``cache`` from ``_dec_prime_warm`` this
    decodes a chunk's NEW latents bit-identically to ``chunk_decode`` over
    the full (overlap + new) stream — chunked == full is exact.
    ``return_cache=True`` also returns the final cache pytree (the
    ``reuse_decoder_cache`` carry for the next chunk)."""
    outs = []
    n_full = z.shape[2] // window_size
    fid = 0
    if n_full:
        stacked = jnp.stack([z[:, :, i * window_size:(i + 1) * window_size]
                             for i in range(n_full)])
        tail, cache = _dec_scan(cfg, p, stacked, cache)
        outs.extend(tail[i] for i in range(n_full))
        fid = n_full * window_size
    if fid < z.shape[2]:
        d, cache = _dec_window(cfg, p, z[:, :, fid:], cache, "cont")
        outs.append(d)
    out = jnp.concatenate(outs, axis=2)
    return (out, cache) if return_cache else out


@functools.partial(aot_jit, static_argnames=("cfg",))
def _dec_scan(cfg, p, stacked_windows, cache):
    """lax.scan over equal-shaped cont windows; carry = conv-cache pytree."""
    def body(c, zw):
        y, c2 = decoder_apply(cfg, p, zw, c, "cont")
        return c2, y
    cache, ys = jax.lax.scan(body, cache, stacked_windows)
    return ys, cache


@functools.partial(aot_jit, static_argnames=("cfg",))
def _enc_scan(cfg, p, stacked_windows, cache):
    def body(c, xw):
        m, c2 = encoder_apply(cfg, p, xw, c, "cont")
        return c2, m
    cache, ms = jax.lax.scan(body, cache, stacked_windows)
    return ms, cache


def _blend_v(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Blend top rows of b against bottom rows of a (ref vae.py:942-946),
    vectorised over the seam."""
    extent = min(a.shape[3], b.shape[3], extent)
    w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(1, 1, 1, extent, 1)
    w = w.astype(a.dtype)
    seam = a[:, :, :, -extent:, :] * (1 - w) + b[:, :, :, :extent, :] * w
    return jnp.concatenate([seam, b[:, :, :, extent:, :]], axis=3)


def _blend_h(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    extent = min(a.shape[4], b.shape[4], extent)
    w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(1, 1, 1, 1, extent)
    w = w.astype(a.dtype)
    seam = a[:, :, :, :, -extent:] * (1 - w) + b[:, :, :, :, :extent] * w
    return jnp.concatenate([seam, b[:, :, :, :, extent:]], axis=4)


def _tiled(x, core, in_unit: int, out_unit: int, overlap_factor: float):
    """Shared tile loop (ref vae.py:954-1014): tile grid in input units,
    seam blending and row cropping in output units."""
    overlap = int(in_unit * (1 - overlap_factor))
    blend = int(out_unit * overlap_factor)
    row_limit = out_unit - blend
    rows = []
    for i in range(0, x.shape[3], overlap):
        row = []
        for j in range(0, x.shape[4], overlap):
            tile = x[:, :, :, i:i + in_unit, j:j + in_unit]
            row.append(core(tile))
        rows.append(row)
    result_rows = []
    for i, row in enumerate(rows):
        result = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend)
            result.append(tile[:, :, :, :row_limit, :row_limit])
        result_rows.append(jnp.concatenate(result, axis=4))
    return jnp.concatenate(result_rows, axis=3)


def vae_encode(cfg: VAEConfig, p: dict, x: jnp.ndarray, *,
               temporal_chunk: bool = False, window_size: int = 16,
               use_tiling: bool = False, tile_sample_min_size: int = 256) -> jnp.ndarray:
    """Encode pixels [b,3,t,H,W] -> Gaussian moments [b,2z,t',H/8,W/8]
    (ref vae.py:844-863)."""
    pe = p["encoder"] if "encoder" in p else p
    if use_tiling and (x.shape[-1] > tile_sample_min_size or x.shape[-2] > tile_sample_min_size):
        latent_unit = tile_sample_min_size // cfg.downsample_scale
        if temporal_chunk:
            core = lambda t: chunk_encode(cfg, pe, t, window_size)
        else:
            core = lambda t: _enc_window(cfg, pe, t, None, "full")[0]
        return _tiled(x, core, tile_sample_min_size, latent_unit, 0.25)
    if temporal_chunk:
        return chunk_encode(cfg, pe, x, window_size)
    return _enc_window(cfg, pe, x, None, "full")[0]


def vae_decode(cfg: VAEConfig, p: dict, z: jnp.ndarray, *,
               temporal_chunk: bool = False, window_size: int = 2,
               use_tiling: bool = False, tile_sample_min_size: int = 256) -> jnp.ndarray:
    """Decode latents [b,z,t',h,w] -> pixels [b,3,t,8h,8w] (ref vae.py:885-900)."""
    pd = p["decoder"] if "decoder" in p else p
    tile_latent_min_size = tile_sample_min_size // cfg.downsample_scale
    if use_tiling and (z.shape[-1] > tile_latent_min_size or z.shape[-2] > tile_latent_min_size):
        if temporal_chunk:
            core = lambda t: chunk_decode(cfg, pd, t, window_size)
        else:
            core = lambda t: _dec_window(cfg, pd, t, None, "full")[0]
        return _tiled(z, core, tile_latent_min_size, tile_sample_min_size, 0.25)
    if temporal_chunk:
        return chunk_decode(cfg, pd, z, window_size)
    return _dec_window(cfg, pd, z, None, "full")[0]


# ---------------------------------------------------------------------------
# parameter init (random; real use converts the reference checkpoint)
# ---------------------------------------------------------------------------

def _init_resnet(key, c_in, c_out, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": init_norm(c_in, dtype),
        "conv1": init_conv3d(ks[0], c_in, c_out, 3, dtype=dtype),
        "norm2": init_norm(c_out, dtype),
        "conv2": init_conv3d(ks[1], c_out, c_out, 3, dtype=dtype),
    }
    if c_in != c_out:
        p["conv_shortcut"] = init_conv3d(ks[2], c_in, c_out, 1, dtype=dtype)
    return p


def _init_midblock(key, ch, dtype):
    ks = jax.random.split(key, 6)
    attn = {
        "group_norm": init_norm(ch, dtype),
        "to_q": init_linear(ks[0], ch, ch, dtype=dtype),
        "to_k": init_linear(ks[1], ch, ch, dtype=dtype),
        "to_v": init_linear(ks[2], ch, ch, dtype=dtype),
        "to_out": init_linear(ks[3], ch, ch, dtype=dtype),
    }
    return {
        "resnets": [_init_resnet(ks[4], ch, ch, dtype), _init_resnet(ks[5], ch, ch, dtype)],
        "attentions": [attn],
    }


def init_vae_params(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 256))
    z = cfg.encoder_out_channels
    ech = cfg.encoder_block_out_channels
    p_enc = {"conv_in": init_conv3d(next(keys), cfg.encoder_in_channels, ech[0], 3, dtype=dtype)}
    blocks = []
    c_prev = ech[0]
    for i, c_out in enumerate(ech):
        b = {"resnets": []}
        for j in range(cfg.encoder_layers_per_block[i]):
            b["resnets"].append(_init_resnet(next(keys), c_prev if j == 0 else c_out, c_out, dtype))
        if cfg.encoder_spatial_down_sample[i]:
            b["downsampler"] = init_conv3d(next(keys), c_out, c_out, 3, dtype=dtype)
        if cfg.encoder_temporal_down_sample[i]:
            b["temporal_downsampler"] = init_conv3d(next(keys), c_out, c_out, 3, dtype=dtype)
        blocks.append(b)
        c_prev = c_out
    p_enc["down_blocks"] = blocks
    p_enc["mid_block"] = _init_midblock(next(keys), ech[-1], dtype)
    p_enc["conv_norm_out"] = init_norm(ech[-1], dtype)
    p_enc["conv_out"] = init_conv3d(next(keys), ech[-1], 2 * z, 3, dtype=dtype)
    p_enc["quant_conv"] = init_conv3d(next(keys), 2 * z, 2 * z, 1, dtype=dtype)

    dch = cfg.decoder_block_out_channels
    rev = list(reversed(dch))
    p_dec = {
        "post_quant_conv": init_conv3d(next(keys), z, cfg.decoder_in_channels, 1, dtype=dtype),
        "conv_in": init_conv3d(next(keys), cfg.decoder_in_channels, dch[-1], 3, dtype=dtype),
        "mid_block": _init_midblock(next(keys), dch[-1], dtype),
    }
    blocks = []
    c_prev = rev[0]
    for i, c_out in enumerate(rev):
        b = {"resnets": []}
        for j in range(cfg.decoder_layers_per_block[i]):
            b["resnets"].append(_init_resnet(next(keys), c_prev if j == 0 else c_out, c_out, dtype))
        if cfg.decoder_spatial_up_sample[i]:
            b["upsampler"] = init_conv3d(next(keys), c_out, 4 * c_out, 3, dtype=dtype)
        if cfg.decoder_temporal_up_sample[i]:
            b["temporal_upsampler"] = init_conv3d(next(keys), c_out, 2 * c_out, 3, dtype=dtype)
        blocks.append(b)
        c_prev = c_out
    p_dec["up_blocks"] = blocks
    p_dec["conv_norm_out"] = init_norm(dch[0], dtype)
    p_dec["conv_out"] = init_conv3d(next(keys), dch[0], cfg.decoder_out_channels, 3, dtype=dtype)

    return {"encoder": p_enc, "decoder": p_dec}
