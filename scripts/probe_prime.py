"""Probe: boundary cache priming vs the full overlap re-decode, on-chip.

Measures, at deployment size, the warm-decode cost of a chunk boundary
(decode the 4 re-encoded carry latents to rebuild the decoder caches):

  - full:   per-frame windows through the whole decoder (what the exact
            path did before priming) — pixels discarded
  - primed: decoder front per-frame + trailing-suffix prime tail
            (models/vae.py::decoder_prime_tail)

and checks the two cache pytrees agree on the TPU in bf16.

Usage: python scripts/probe_prime.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def main():
    from bench import fast_params
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.models.vae import _dec_window
    from deepv_tpu.pipeline import InferencePipeline

    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    dtype = jnp.bfloat16
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])
    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype)
    assert pipe._prime_need == 14

    # carry-shaped latent block: [1, 2z+ray, 4, 48, 64]
    z38 = jax.random.normal(jax.random.PRNGKey(1),
                            (1, 2 * vcfg.encoder_out_channels + pcfg.raymap_dim,
                             4, 48, 64), dtype)
    li, _ = jnp.split(z38[:, :-pcfg.raymap_dim], 2, axis=1)
    zn = pipe._unnorm_latents(li).astype(dtype)

    def warm_full():
        cache = None
        for fi in range(zn.shape[2]):
            y, cache = _dec_window(vcfg, params["vae"]["decoder"],
                                   zn[:, :, fi:fi + 1], cache,
                                   "init" if fi == 0 else "cont")
        return cache

    def warm_primed():
        return pipe._prime_warm_stream(zn)

    for name, fn in (("full", warm_full), ("primed", warm_primed)):
        c = fn()                      # compile
        sync(jax.tree.leaves(c)[0])
        t0 = time.time()
        for _ in range(3):
            c = fn()
            for leaf in jax.tree.leaves(c):
                leaf.block_until_ready()
            sync(jax.tree.leaves(c)[-1])
        dt = (time.time() - t0) / 3
        print(f"  warm {name:7s} {dt*1e3:8.1f} ms / stream")
        if name == "full":
            ref = c
        else:
            diffs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32))))
                     for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(c))]
            print(f"  cache max|Δ| on-chip (bf16): {max(diffs):.3e}")
            assert jax.tree.structure(ref) == jax.tree.structure(c)


if __name__ == "__main__":
    main()
