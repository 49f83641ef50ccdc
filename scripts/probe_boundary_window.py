"""Probe: device busy% across a CHUNK BOUNDARY specifically (VERDICT r3 #2).

probe_boundary.py's whole-rollout trace only retains the first ~9 s of
device spans (capture slows the host ~10x, the buffer rotates), so the
boundary was never captured. This drives an InteractiveSession to the last
unit of chunk 1, then traces ONLY the boundary step (carry re-encode +
history encode + cache prime + first chunk-2 CFG-3 unit + stream decode)
plus one more steady chunk-2 unit — a ~7 s device window well inside the
buffer. Prints the device timeline and busy/idle split: >=95% busy is the
"boundary is chip-saturated" evidence ARCHITECTURE.md records.

Also times the boundary's component programs directly (prime per stream,
carry encode at window 16, one CFG-3 stage set) for the itemised floor.

Run exclusively. ~12 min (compile-bound warmup).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from probe_boundary import analyze_timeline, sync


def main():
    from bench import fast_params
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.pipeline import InferencePipeline
    from deepv_tpu.serve import InteractiveSession

    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    dtype = jnp.bfloat16
    H, W = 384, 512
    params = fast_params(mcfg, vcfg, dtype)
    sync(jax.tree.leaves(params)[0])
    print("[probe] params ready", file=sys.stderr)

    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=dtype,
                             decode_window=1)
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                                        minval=-1.0, maxval=1.0))
    fwd = "Move forward. The perspective hasn't changed."

    # warm ALL programs (incl. boundary) with a throwaway session
    t0 = time.time()
    warm = InteractiveSession(pipe)
    warm.start(img, seed=0)
    n_chunk1 = pcfg.max_temporal_length - 1
    for _ in range(n_chunk1 + 2):            # chunk 1 + boundary + 1 steady
        out = warm.step(fwd)
    sync(out["rgb"])
    print(f"[probe] warmup {time.time()-t0:.1f}s (incl. compile)", file=sys.stderr)
    del warm, out

    # fresh session to the boundary's edge, everything drained
    sess = InteractiveSession(pipe)
    sess.start(img, seed=1)
    for _ in range(n_chunk1):
        out = sess.step(fwd)
    sync(out["rgb"])

    logdir = "/tmp/deepv_trace_boundary_window"
    t0 = time.time()
    jax.profiler.start_trace(logdir)
    out_b = sess.step(fwd)                   # THE boundary step
    sync(out_b["rgb"])
    t_boundary = time.time() - t0
    out_s = sess.step(fwd)                   # one steady chunk-2 unit
    sync(out_s["rgb"])
    jax.profiler.stop_trace()
    print(f"[probe] boundary step wall {t_boundary:.2f}s (capture-inflated "
          f"host; device timeline below is accurate)", file=sys.stderr)
    analyze_timeline(logdir)

    # ---- component floors (no trace inflation) -----------------------------
    # drain, then time each boundary program family steady-state
    from deepv_tpu.models.vae import _dec_prime_warm
    lat = jax.random.normal(jax.random.PRNGKey(5),
                            (1, vcfg.encoder_out_channels, 4, H // 8, W // 8),
                            dtype)
    sync(_dec_prime_warm(vcfg, params["vae"]["decoder"], lat)["conv_out"])  # compile
    t0 = time.time()
    for _ in range(3):
        c = _dec_prime_warm(vcfg, params["vae"]["decoder"], lat)
        sync(c["conv_out"])
    print(f"[probe] prime (1 stream, 4 latent frames): {(time.time()-t0)/3*1e3:.0f} ms")


if __name__ == "__main__":
    main()
