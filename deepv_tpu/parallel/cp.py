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
from ..models.vae import decoder_apply, encoder_apply


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
