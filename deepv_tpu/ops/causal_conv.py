"""Causal 3D convolution with functional temporal-cache state.

The reference ``CausalConv3d`` (ref vae.py:169-252) pads only the temporal
*past* (kernel-1 frames) and, in chunked mode, keeps a mutable per-layer
deque of the last two input frames so consecutive temporal chunks are
bit-identical to one full-sequence pass. Here the cache is an explicit value:
every call takes and returns it, so chunked decode becomes a pure carry that
can live inside jit without recompilation.

Modes (static):
  - ``full``: whole clip at once; temporal padding via the conv's padding
    spec (never materialised).
  - ``init``: first chunk of a chunked pass; same output as ``full`` but also
    returns the cache = last 2 frames of the front-padded input
    (ref vae.py:236-238).
  - ``cont``: later chunk; prepends cached frames instead of padding
    (ref vae.py:240-249): stride 1 / k=3 uses both cached frames, temporal
    stride 2 / k=3 uses only the last one.
  - ``prime``: cache-rebuild mode — the input's own LEADING ``kt-1`` frames
    act as the temporal context (identical to ``cont`` with
    ``cache=x[:,:,:kt-1]`` on the rest), so the output is ``kt-1`` frames
    shorter than the input. Used by the decoder's chunk-boundary cache
    priming (models/vae.py): when only the trailing caches of a stream are
    needed, each conv consumes a suffix of its input instead of the whole
    stream, and the produced caches are bit-identical to a full pass.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .basic import conv3d
from .conv_igemm import conv3d_igemm, supports_igemm
from .conv_int8 import conv3d_int8, supports_int8


def _cp_halo_h(x: jnp.ndarray, axis_name: str, kh: int, stride_h: int) -> Tuple[jnp.ndarray, int]:
    """Spatial (height) halo exchange for context-parallel convolution.

    Each rank holds a contiguous H slice. For kernel 3 / stride 1 we need one
    row from each neighbour; for stride 2 (even local H) only the top row.
    ``ppermute`` zero-fills unaddressed destinations, which is exactly the
    zero padding the edge ranks need — the idiomatic ICI equivalent of the
    reference's isend/irecv ring (ref vae.py:87-111).

    Returns the halo-extended rows and the amount of symmetric H padding the
    conv should still apply (always 0 here for kh==3).
    """
    if kh == 1:
        return x, kh // 2
    assert kh == 3, "context parallel supports the VAE's k=1/k=3 kernels"
    n = lax.axis_size(axis_name)
    top = lax.ppermute(x[:, :, :, -1:], axis_name,
                       [(i, i + 1) for i in range(n - 1)])
    if stride_h == 1:
        bot = lax.ppermute(x[:, :, :, :1], axis_name,
                           [(i + 1, i) for i in range(n - 1)])
        return jnp.concatenate([top, x, bot], axis=3), 0
    # stride 2: windows start at even global rows; top halo only
    return jnp.concatenate([top, x], axis=3), 0


def causal_conv3d(
    x: jnp.ndarray,
    params: dict,
    cache: Optional[jnp.ndarray],
    *,
    mode: str = "full",
    stride: Tuple[int, int, int] = (1, 1, 1),
    cp_axis: Optional[str] = None,
    tp_axis: Optional[str] = None,
    impl: str = "xla",
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Apply a causal conv3d. Returns ``(y, new_cache)``.

    x: [b, c, t, h, w]; params['weight']: [co, ci, kt, kh, kw].
    ``new_cache`` is None in ``full`` mode and for kt == 1 layers (their
    output never depends on previous chunks).

    ``cp_axis``: inside a shard_map over the height axis, exchange spatial
    halos with neighbours instead of zero-padding H locally.

    ``tp_axis``: inside a shard_map over the TIME axis (``mode="cont"``
    only), the temporal context comes from the previous rank instead of a
    carried cache: each rank ``ppermute``s its trailing two input frames to
    the next rank — the ICI equivalent of the reference's isend/irecv ring
    (ref vae.py:87-111, 208-223) — and rank 0 uses ``cache`` (the 1-frame
    init window's cache, replicated). Requires >= 2 local frames so the
    halo never spans more than one neighbour (the reference's small-chunk
    double-pass hack, ref vae.py:210-213, is excluded by construction).
    Composes with ``cp_axis``: spatial halos are exchanged first, so the
    temporal halo rows are already spatially extended like a cache.

    ``impl="igemm"``: route eligible 3x3x3 stride-1 layers through the Pallas
    implicit-GEMM kernel (ops/conv_igemm.py); others fall back to XLA.
    """
    kt, kh, kw = params["weight"].shape[2:]
    hp, wp = kh // 2, kw // 2
    time_pad = kt - 1
    # the cache protocol (2 trailing frames everywhere, stride-2 phase rule,
    # temporal-CP halo width) is written for the reference's kt in {1, 3};
    # any other temporal extent must fail loudly, not continue cacheless
    assert mode == "full" or kt in (1, 3), \
        f"cached conv modes support kt in (1, 3); got kt={kt}"

    if cp_axis is not None:
        x, hp = _cp_halo_h(x, cp_axis, kh, stride[1])

    if tp_axis is not None and kt > 1:
        assert mode == "cont", "temporal CP runs every shard in cont mode"
        assert cache is not None, "temporal CP needs the init window's cache"
        assert x.shape[2] >= 2, \
            "temporal CP needs >= 2 local frames at every temporal level"
        n = lax.axis_size(tp_axis)
        halo = lax.ppermute(x[:, :, -2:], tp_axis,
                            [(i, i + 1) for i in range(n - 1)])
        # ppermute zero-fills rank 0; inject the init-window cache there
        is0 = (lax.axis_index(tp_axis) == 0)
        cache = jnp.where(is0, cache.astype(x.dtype), halo)

    igemm = (impl == "igemm" and cp_axis is None
             and supports_igemm(params["weight"].shape, stride, x.dtype,
                                x.shape[3], x.shape[4]))
    int8 = (impl == "int8" and cp_axis is None
            and supports_int8(params["weight"].shape, stride, x.shape[3]))

    if mode == "full" or kt == 1:
        if igemm:
            return conv3d_igemm(x, params, time_pad=2), None
        if int8:
            return conv3d_int8(x, params,
                               padding=((time_pad, 0), (hp, hp), (wp, wp))), None
        y = conv3d(x, params, stride=stride,
                   padding=((time_pad, 0), (hp, hp), (wp, wp)))
        return y, None

    if mode == "init":
        if time_pad > 0:
            pad = jnp.zeros(x.shape[:2] + (time_pad,) + x.shape[3:], x.dtype)
            xp = jnp.concatenate([pad, x], axis=2)
        else:
            xp = x
        new_cache = xp[:, :, -2:]
        if igemm:
            return conv3d_igemm(xp, params, time_pad=0), new_cache
        if int8:
            return conv3d_int8(xp, params,
                               padding=((0, 0), (hp, hp), (wp, wp))), new_cache
        y = conv3d(xp, params, stride=stride, padding=((0, 0), (hp, hp), (wp, wp)))
        return y, new_cache

    if mode == "prime":
        # leading kt-1 frames are context: y covers frames [kt-1:], the
        # returned cache equals a full pass's (last kt-1 input frames)
        assert stride == (1, 1, 1), "prime mode supports stride-1 convs only"
        assert x.shape[2] > time_pad, "prime mode needs > kt-1 input frames"
        new_cache = x[:, :, -(kt - 1):]
        if igemm:
            return conv3d_igemm(x, params, time_pad=0), new_cache
        if int8:
            return conv3d_int8(x, params,
                               padding=((0, 0), (hp, hp), (wp, wp))), new_cache
        y = conv3d(x, params, stride=stride, padding=((0, 0), (hp, hp), (wp, wp)))
        return y, new_cache

    if mode == "cont":
        assert cache is not None, "cont mode requires the previous chunk's cache"
        if stride[0] == 1 and kt == 3:
            xp = jnp.concatenate([cache, x], axis=2)
        elif stride[0] == 2 and kt == 3:
            xp = jnp.concatenate([cache[:, :, -1:], x], axis=2)
        else:
            xp = x
        new_cache = xp[:, :, -2:]
        if igemm:
            return conv3d_igemm(xp, params, time_pad=0), new_cache
        if int8:
            return conv3d_int8(xp, params,
                               padding=((0, 0), (hp, hp), (wp, wp))), new_cache
        y = conv3d(xp, params, stride=stride, padding=((0, 0), (hp, hp), (wp, wp)))
        return y, new_cache

    raise ValueError(f"unknown causal conv mode: {mode!r}")
