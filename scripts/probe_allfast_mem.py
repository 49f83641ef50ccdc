"""Probe: is the all-fast composition HBM-stable in isolation? (VERDICT r4 #3)

Round 4's extended bench hit a ResourceExhausted in the allfast section
(flow_cache=skip_odd + int8 VAE + int8 denoise + reuse_decoder_cache +
carry_latents) after ~2300 s of process residency — AFTER eight other
sections had created and released their own pipelines. This probe separates
"real lifetime leak in reuse+carry+int8 state" from "cross-section
accumulation in the bench process":

  1. fresh process, ONE allfast pipeline, nothing else ever built;
  2. a >=10-chunk END-OF-CHUNK rollout (the bench's allfast mode), twice —
     a leak that grows with chunk count dies here;
  3. a serving-style streaming session (int8 + reuse + carry — the actual
     serving preset) stepped across >=10 chunk boundaries with a
     free-memory reading after every chunk.

``device.memory_stats()`` returns None over the axon tunnel, so free HBM is
measured with an ALLOCATION CANARY: the largest of a fixed ladder of
device-zeros buffers that can be materialised right now (each freed
immediately). Coarse, but a monotonic downward trend across chunks is
exactly what a leak looks like and what stability must rule out.

Run exclusively (shares the axon tunnel). ~20-40 min on a fresh process
(full-size compiles dominate).
"""

import gc
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

GB = 1 << 30
LADDER_GB = (8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0, 1.5, 1.0, 0.5)


def sync(x) -> float:
    return float(jnp.mean(jnp.asarray(x).astype(jnp.float32)))


def free_hbm_canary() -> float:
    """Largest ladder buffer allocatable right now (GB); 0.0 if none."""
    for gb in LADDER_GB:
        n = int(gb * GB // 4)
        try:
            x = jax.jit(lambda n=n: jnp.zeros((n,), jnp.float32))()
            float(x[0])
            del x
            gc.collect()
            return gb
        except Exception:
            gc.collect()
            continue
    return 0.0


def main():
    from dataclasses import replace

    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.io.weights import random_params
    from deepv_tpu.pipeline import InferencePipeline
    from deepv_tpu.serve import InteractiveSession

    t_start = time.time()
    mcfg, vcfg = MMDiTConfig(), VAEConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    pcfg = PipelineConfig()
    H, W = 384, 512
    n_chunks = int(os.environ.get("PROBE_CHUNKS", "10"))

    t0 = time.time()
    params = random_params(mcfg, vcfg, dtype=jnp.bfloat16, seed=0)
    sync(jax.tree.leaves(params)[0])
    print(f"[probe] params in {time.time()-t0:.0f}s; free-HBM canary "
          f"{free_hbm_canary():.1f} GB", flush=True)

    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, replace(vcfg, conv_impl="int8"),
                             params, embeds, dtype=jnp.bfloat16,
                             flow_cache="skip_odd", denoise_int8=True,
                             decode_window=1, stream_decode=False,
                             reuse_decoder_cache=True, carry_latents=True)
    # release the unquantised tree: the int8 pipe dropped the bf16 block
    # weights (~3.8 GB) from its own tree (keep_original=False), so this
    # reference is what keeps them on HBM. First probe run (without this +
    # with the quantiser keeping originals) OOMed on the very first 3-chunk
    # rollout — the composition's working set NEEDS those GB.
    del params
    gc.collect()
    print(f"[probe] allfast pipe built (bf16 originals released); canary "
          f"{free_hbm_canary():.1f} GB", flush=True)

    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    n_unit_cfg = pcfg.max_temporal_length - pcfg.num_input_unit
    move = "Move forward. The perspective hasn't changed."

    def prompts_for(chunks: int):
        return np.array(["empty"] + [move] * (pcfg.max_temporal_length - 1
                                              + (chunks - 1) * n_unit_cfg))

    # -- leg 1+2: end-of-chunk allfast rollouts (the bench's mode) -----------
    for rep in range(3):
        chunks = 3 if rep == 0 else n_chunks   # rep 0 = compile pass
        batch = {"img": img, "prompt": prompts_for(chunks),
                 "prompt_type": "action"}
        t0 = time.time()
        try:
            out = pipe.generate(batch, seed=8)
            sync(out["pred_img"]); sync(out["pred_disparity"])
            frames = int(out["pred_img"].shape[2])
            print(f"[probe] rollout rep{rep} ({chunks} chunks, {frames} "
                  f"frames): {time.time()-t0:.1f}s ok; canary after free: ",
                  end="", flush=True)
            del out
            gc.collect()
            print(f"{free_hbm_canary():.1f} GB", flush=True)
        except Exception as e:
            print(f"\n[probe] rollout rep{rep} ({chunks} chunks) FAILED after "
                  f"{time.time()-t0:.1f}s: {type(e).__name__}: {e}", flush=True)
            raise

    # -- leg 3: serving-style streaming session, canary per chunk ------------
    # (the serving preset: streaming decode + reuse + carry + int8; crosses
    # n_chunks-1 boundaries, one reading after each completed chunk)
    sess = InteractiveSession(pipe, reuse_decoder_cache=True,
                              history_limit_chunks=4)
    sess.start(np.asarray(img[0]), seed=1)
    readings = []
    t0 = time.time()
    steps = 0
    while len(readings) < n_chunks:
        out = sess.step(move)
        steps += 1
        if out["chunk_complete"]:
            sync(out["rgb"])
            readings.append(free_hbm_canary())
            print(f"[probe] session chunk {len(readings)} done "
                  f"(step {steps}): canary {readings[-1]:.1f} GB", flush=True)
    print(f"[probe] session: {steps} steps / {len(readings)} chunks in "
          f"{time.time()-t0:.1f}s; canary trend {readings}", flush=True)
    lo, hi = min(readings[1:]), max(readings[1:])
    verdict = "STABLE" if lo >= hi - 0.5 else "DOWNWARD TREND (leak?)"
    print(f"[probe] verdict: {verdict}; total residency "
          f"{time.time()-t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
