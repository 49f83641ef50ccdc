"""Probe: full-size cold-start with the AOT executable cache (utils/aot.py).

Round-4 measurement: a fresh serving process pays 822 s to port-open, of
which ~650 s is remote compiles the axon stack does not persist
(scripts/probe_cold_start.py). probe_aot.py proved the mechanism: the
compiled full-size stage-2 denoise scan round-trips through a file
(271 MB, 4 s deserialize, 0.02 s first call). This probe quantifies the
end-to-end saving on the production path: a full-size pipeline + 1-chunk
generate (the prewarm program set) in two fresh processes sharing one
cache dir.

  python scripts/probe_aot_serve.py populate   # compiles + serializes
  python scripts/probe_aot_serve.py warm       # deserializes — the number

Run exclusively (shares the axon tunnel). ~GBs of disk under CACHE_DIR.
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

CACHE_DIR = os.environ.get("PROBE_AOT_DIR", "/tmp/deepv_aot_serve")


def main(phase: str):
    t_proc = time.time()
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.io.weights import random_params
    from deepv_tpu.pipeline import InferencePipeline
    from deepv_tpu.utils import aot

    aot.configure(CACHE_DIR)
    mcfg = MMDiTConfig()
    mcfg = MMDiTConfig(**{**mcfg.__dict__, "caption_projection_dim": mcfg.inner_dim})
    vcfg, pcfg = VAEConfig(), PipelineConfig()
    H, W = 384, 512

    t0 = time.time()
    params = random_params(mcfg, vcfg, dtype=jnp.bfloat16, seed=0)
    float(jnp.mean(jax.tree.leaves(params)[0].astype(jnp.float32)))
    init_s = time.time() - t0
    print(f"[aot-serve] params in {init_s:.0f}s", flush=True)

    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds,
                             dtype=jnp.bfloat16)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."] * 7)
    batch = {"img": img, "prompt": prompts, "prompt_type": "action"}

    t0 = time.time()
    out = pipe.generate(batch, seed=1)
    canary = float(jnp.mean(out["pred_img"].astype(jnp.float32)))
    chunk_s = time.time() - t0
    files = glob.glob(os.path.join(CACHE_DIR, "*.aotx"))
    total_mb = sum(os.path.getsize(f) for f in files) / 1e6
    print(f"[aot-serve] {phase}: first chunk {chunk_s:.0f}s "
          f"(params {init_s:.0f}s, process total {time.time()-t_proc:.0f}s); "
          f"cache: {len(files)} executables, {total_mb:.0f} MB "
          f"(canary {canary:.4f})", flush=True)

    # second chunk: steady-state sanity — AOT dispatch overhead vs plain jit
    t0 = time.time()
    out = pipe.generate(batch, seed=2)
    float(jnp.mean(out["pred_img"].astype(jnp.float32)))
    print(f"[aot-serve] {phase}: steady chunk {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
