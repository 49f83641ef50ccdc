"""Context parallelism for the causal video VAE — shard_map over height.

The reference ships dormant *temporal* context-parallel scaffolding built on
torch.distributed isend/irecv rings (ref vae.py:22-153, never initialised).
The TPU-native replacement shards the VAE's dominant cost — full-resolution
spatial convolution — across the ICI mesh along the image height axis:

  - every k=3 convolution exchanges one-row halos with its neighbours via
    ``lax.ppermute`` (zero-fill at the mesh edges == the conv's zero padding);
  - per-frame group-norm statistics are psum'd across the axis;
  - the bottleneck mid-block attention all_gathers rows (cheap at 1/8 res);
  - temporal chunking (the reference CP's axis) composes orthogonally: each
    shard carries its own cache slice.

Unlike the reference's temporal scheme (whose stride-2 ragged splits don't
fit SPMD equal shards), height sharding is exact: outputs match the
single-device VAE bit-for-bit up to float reassociation. Requirements:
pixel H divisible by (n_shards * 8); latent H divisible by n_shards.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

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
        check_rep=False)
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
        check_rep=False)
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
        check_rep=False)
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
        check_rep=False)
    def run(p, zs):
        return _chunk_windows(cfg, p, zs, sizes, axis, _dec_fn)

    return run(pd, z)
