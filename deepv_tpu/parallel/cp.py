"""Context parallelism for the causal video VAE — shard_map over height
(spatial CP) and over time (temporal CP, the reference's axis).

The reference ships dormant *temporal* context-parallel scaffolding built on
torch.distributed isend/irecv rings (ref vae.py:22-153, never initialised).
Two TPU-native schemes replace it, both exact (single-device output up to
float reassociation) and composable with each other:

**Spatial CP** (``cp_vae_*``) shards the VAE's dominant cost —
full-resolution spatial convolution — along the image height axis:

  - every k=3 convolution exchanges one-row halos with its neighbours via
    ``lax.ppermute`` (zero-fill at the mesh edges == the conv's zero padding);
  - per-frame group-norm statistics are psum'd across the axis;
  - the bottleneck mid-block attention all_gathers rows (cheap at 1/8 res);
  - temporal chunking composes orthogonally: each shard carries its own
    cache slice.
  Requirements: pixel H divisible by (n_shards * 8); latent H divisible by
  n_shards.

**Temporal CP** (``tcp_vae_*``) shards along time like the reference, with
the ragged first frame handled as a replicated 1-frame init window instead
of an oversized rank 0, and the isend/irecv ring as a ``ppermute`` of each
conv's trailing input frames (see the comment block above ``tcp_vae_encode``
and ops/causal_conv.py ``tp_axis``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import VAEConfig
from ..models.vae import _split_windows, decoder_apply, encoder_apply


def cp_vae_encode(cfg: VAEConfig, params: dict, x: jnp.ndarray, mesh: Mesh,
                  axis: str = "cp") -> jnp.ndarray:
    """Full (non-chunked) encode sharded over H. x: [b, 3, t, H, W]."""
    pe = params["encoder"] if "encoder" in params else params
    n = mesh.shape[axis]
    assert x.shape[3] % (n * cfg.downsample_scale) == 0, \
        f"pixel H {x.shape[3]} must divide n_shards*{cfg.downsample_scale}"

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, None, None, axis, None)),
        out_specs=P(None, None, None, axis, None),
        check_vma=False)
    def run(p, xs):
        m, _ = encoder_apply(cfg, p, xs, mode="full", cp_axis=axis)
        return m

    return run(pe, x)


def cp_vae_decode(cfg: VAEConfig, params: dict, z: jnp.ndarray, mesh: Mesh,
                  axis: str = "cp") -> jnp.ndarray:
    """Full (non-chunked) decode sharded over latent H. z: [b, zc, t, h, w]."""
    pd = params["decoder"] if "decoder" in params else params
    n = mesh.shape[axis]
    assert z.shape[3] % n == 0, f"latent H {z.shape[3]} must divide n_shards"

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, None, None, axis, None)),
        out_specs=P(None, None, None, axis, None),
        check_vma=False)
    def run(p, zs):
        y, _ = decoder_apply(cfg, p, zs, mode="full", cp_axis=axis)
        return y

    return run(pd, z)


# ---------------------------------------------------------------------------
# CP x temporal chunking
# ---------------------------------------------------------------------------
#
# The conv cache stores the *halo-extended* trailing frames (causal_conv3d
# computes new_cache after _cp_halo_h), so each shard's cache slice already
# contains its neighbours' edge rows for those frames — the init/cont carry
# composes with spatial CP without any extra communication.

def _chunk_windows(cfg, p, x, sizes, axis, apply_fn):
    out, cache = apply_fn(cfg, p, x[:, :, :sizes[0]], None, "init", axis)
    outs = [out]
    fid = sizes[0]
    for s in sizes[1:]:
        out, cache = apply_fn(cfg, p, x[:, :, fid:fid + s], cache, "cont", axis)
        outs.append(out)
        fid += s
    return jnp.concatenate(outs, axis=2)


def _enc_fn(cfg, p, x, cache, mode, axis):
    return encoder_apply(cfg, p, x, cache, mode, cp_axis=axis)


def _dec_fn(cfg, p, z, cache, mode, axis):
    return decoder_apply(cfg, p, z, cache, mode, cp_axis=axis)


# ---------------------------------------------------------------------------
# Temporal context parallelism (the reference's axis, ref vae.py:22-153)
# ---------------------------------------------------------------------------
#
# The reference rings each causal conv's trailing kernel-1 input frames to
# the next rank (isend/irecv, ref vae.py:87-111) with a ragged split whose
# first rank carries the special first frame. The SPMD equivalent: decode
# the first frame as a 1-frame "init" window (replicated, cheap — it is
# causally independent of everything after it), shard the remaining frames
# equally, and realise each conv's cont-mode cache as a ``ppermute`` of the
# neighbour's trailing input frames, with rank 0 consuming the init cache
# (ops/causal_conv.py ``tp_axis``). Exact: every rank computes the same
# windows the sequential chunked mode would.
#
# Constraints (per-rank lengths must stay >= 2 at every temporal level so a
# halo never spans two ranks — the reference's small-chunk double-pass hack,
# ref vae.py:210-213, is excluded): encoder >= 16 pixel frames per rank and
# divisible by 8; decoder >= 2 latent frames per rank.

def tcp_vae_encode(cfg: VAEConfig, params: dict, x: jnp.ndarray, mesh: Mesh,
                   axis: str = "tp") -> jnp.ndarray:
    """Encode sharded over TIME. x: [b, 3, 1 + n*k, H, W], k % 8 == 0, k >= 16."""
    from ..models.vae import _enc_window
    pe = params["encoder"] if "encoder" in params else params
    n = mesh.shape[axis]
    k = (x.shape[2] - 1) // n
    assert x.shape[2] == 1 + n * k and k >= 16 and k % 8 == 0, \
        f"temporal CP encode needs t = 1 + n*k with k>=16, k%8==0; got t={x.shape[2]}, n={n}"
    m0, cache0 = _enc_window(cfg, pe, x[:, :, :1], None, "init")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(None, None, axis, None, None)),
        out_specs=P(None, None, axis, None, None),
        check_vma=False)
    def run(p, c0, xs):
        m, _ = encoder_apply(cfg, p, xs, c0, "cont", tp_axis=axis)
        return m

    return jnp.concatenate([m0, run(pe, cache0, x[:, :, 1:])], axis=2)


def tcp_vae_decode(cfg: VAEConfig, params: dict, z: jnp.ndarray, mesh: Mesh,
                   axis: str = "tp") -> jnp.ndarray:
    """Decode sharded over TIME. z: [b, zc, 1 + n*k, h, w], k >= 2."""
    from ..models.vae import _dec_window
    pd = params["decoder"] if "decoder" in params else params
    n = mesh.shape[axis]
    k = (z.shape[2] - 1) // n
    assert z.shape[2] == 1 + n * k and k >= 2, \
        f"temporal CP decode needs t = 1 + n*k with k>=2; got t={z.shape[2]}, n={n}"
    y0, cache0 = _dec_window(cfg, pd, z[:, :, :1], None, "init")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(None, None, axis, None, None)),
        out_specs=P(None, None, axis, None, None),
        check_vma=False)
    def run(p, c0, zs):
        y, _ = decoder_apply(cfg, p, zs, c0, "cont", tp_axis=axis)
        return y

    return jnp.concatenate([y0, run(pd, cache0, z[:, :, 1:])], axis=2)


# ---------------------------------------------------------------------------
# Window-level spatial CP with an explicit cache carry — the building block
# the mesh-aware InferencePipeline's streaming decode uses (one call per
# latent window, conv caches carried between calls, H sharded throughout).
# ---------------------------------------------------------------------------

def _act_spec(axis: str):
    """Activations AND conv-cache leaves are [b, c, t, H(+halo), w] — H is
    always axis 3 (ops/causal_conv.py stores the halo-extended trailing
    frames), so one prefix spec covers the whole cache pytree."""
    return P(None, None, None, axis, None)


@functools.partial(jax.jit, static_argnames=("cfg", "mode", "mesh", "axis"))
def cp_dec_window(cfg: VAEConfig, p: dict, z: jnp.ndarray, cache, mode: str,
                  mesh: Mesh, axis: str = "tp"):
    """One decode window under spatial CP. Returns ``(pixels, new_cache)``.

    Drop-in for ``models.vae._dec_window`` with the H axis sharded: the
    cache pytree's leaves keep their per-shard halo-extended H slices, so
    successive windows compose exactly like the single-device carry."""
    act = _act_spec(axis)
    if cache is None:
        fn = shard_map(lambda p_, z_: decoder_apply(cfg, p_, z_, None, mode, cp_axis=axis),
                       mesh=mesh, in_specs=(P(), act), out_specs=(act, act),
                       check_vma=False)
        return fn(p, z)
    fn = shard_map(lambda p_, z_, c_: decoder_apply(cfg, p_, z_, c_, mode, cp_axis=axis),
                   mesh=mesh, in_specs=(P(), act, act), out_specs=(act, act),
                   check_vma=False)
    return fn(p, z, cache)


def cp_vae_encode_chunked(cfg: VAEConfig, params: dict, x: jnp.ndarray,
                          mesh: Mesh, axis: str = "cp",
                          window_size: int = 16) -> jnp.ndarray:
    """Temporal-chunked encode sharded over H: the per-layer conv cache is a
    carry whose H axis is sharded like the activations."""
    pe = params["encoder"] if "encoder" in params else params
    n = mesh.shape[axis]
    assert x.shape[3] % (n * cfg.downsample_scale) == 0, \
        f"pixel H {x.shape[3]} must divide n_shards*{cfg.downsample_scale}"
    sizes = _split_windows(x.shape[2], window_size)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, None, None, axis, None)),
        out_specs=P(None, None, None, axis, None),
        check_vma=False)
    def run(p, xs):
        return _chunk_windows(cfg, p, xs, sizes, axis, _enc_fn)

    return run(pe, x)


def cp_vae_decode_chunked(cfg: VAEConfig, params: dict, z: jnp.ndarray,
                          mesh: Mesh, axis: str = "cp",
                          window_size: int = 2) -> jnp.ndarray:
    """Temporal-chunked decode sharded over latent H with carried caches."""
    pd = params["decoder"] if "decoder" in params else params
    n = mesh.shape[axis]
    assert z.shape[3] % n == 0, f"latent H {z.shape[3]} must divide n_shards"
    sizes = _split_windows(z.shape[2], window_size)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, None, None, axis, None)),
        out_specs=P(None, None, None, axis, None),
        check_vma=False)
    def run(p, zs):
        return _chunk_windows(cfg, p, zs, sizes, axis, _dec_fn)

    return run(pd, z)
