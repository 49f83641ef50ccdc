"""Probe: cost of materialising the full structure-shaped parameter tree on
the real TPU as ONE jitted program.

Round-3 postmortem (VERDICT r3 weak #1): bench.py's ~700 per-leaf
``sin(arange(n)*c)`` ops made the single fused init program itself
compile-bound (736 s). Round-4 candidates, measured here:

  rbg     the package's own init_mmdit_params/init_vae_params (fan-in-scaled
          normals — the structure-shaped weights VERDICT r3 #3 asks the
          deviation metrics to use) under the 'rbg' PRNG: each draw is a
          single RngBitGenerator HLO, so the fused program stays small.
  slice   one long sine buffer (single arange+sin), per-leaf static slice +
          reshape + per-leaf scale — the VERDICT 1(a) suggestion.

Run exclusively (no concurrent pytest / probes — shared axon tunnel).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepv_tpu.config import MMDiTConfig, VAEConfig
from deepv_tpu.models.mmdit import init_mmdit_params
from deepv_tpu.models.vae import init_vae_params


def sync_tree(t):
    return float(jnp.sum(jax.tree.leaves(t)[0].astype(jnp.float32)))


def main():
    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    dtype = jnp.bfloat16

    which = sys.argv[1] if len(sys.argv) > 1 else "rbg"

    if which == "rbg":
        @jax.jit
        def build():
            k = jax.random.key(0, impl="rbg")
            k1, k2 = jax.random.split(k)
            return {"mmdit": init_mmdit_params(k1, mcfg, dtype=dtype),
                    "vae": init_vae_params(k2, vcfg, dtype=dtype)}

        t0 = time.time()
        params = build()
        sync_tree(params)
        dt = time.time() - t0
    else:
        m_shapes = jax.eval_shape(lambda k: init_mmdit_params(k, mcfg, dtype=dtype),
                                  jax.random.PRNGKey(0))
        v_shapes = jax.eval_shape(lambda k: init_vae_params(k, vcfg, dtype=dtype),
                                  jax.random.PRNGKey(0))
        leaves, treedef = jax.tree.flatten({"mmdit": m_shapes, "vae": v_shapes})
        max_n = max(int(np.prod(l.shape)) for l in leaves)
        stride = 7919
        buf_n = max_n + stride * len(leaves)

        @jax.jit
        def build():
            buf = 0.02 * jnp.sin(jnp.arange(buf_n, dtype=jnp.float32) * 0.618)
            outs = []
            for i, leaf in enumerate(leaves):
                n = max(int(np.prod(leaf.shape)), 1)
                v = jax.lax.slice(buf, (i * stride,), (i * stride + n,))
                outs.append(v.reshape(leaf.shape).astype(dtype))
            return jax.tree.unflatten(treedef, outs)

        t0 = time.time()
        params = build()
        sync_tree(params)
        dt = time.time() - t0

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"[probe] {which}: {n_params/1e9:.2f}B params in {dt:.1f}s "
          f"(compile+run, cold)")
    # second call: cached program
    t0 = time.time()
    params2 = build() if which == "rbg" else build()
    sync_tree(params2)
    print(f"[probe] {which}: warm call {time.time()-t0:.1f}s")
    # sanity: finite, non-constant
    w = np.asarray(jax.tree.leaves(params)[0], np.float32)
    print(f"[probe] leaf0 stats: mean {w.mean():.4f} std {w.std():.4f} "
          f"finite {np.isfinite(w).all()}")


if __name__ == "__main__":
    main()
