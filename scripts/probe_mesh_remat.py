"""Probe: the GSPMD involuntary-full-remat fix, before vs after (VERDICT r3
#4) — per-step time of the tiny-config TP-sharded `_denoise_stage` on the
8-device virtual CPU mesh, with and without the replication pins
(`mmdit_forward(mesh=)`), and whether XLA emits the
"Involuntary full rematerialization" warning for each.

"Before" is reproduced exactly by passing mesh=None to `_denoise_stage`
while the params stay TP-sharded — that is precisely the round-3 program
(the constraint is the only difference; math is identity either way).

Caveat recorded with the numbers: host-emulated virtual devices serialise
all partitions on one core, so absolute per-step time mostly measures
emulation, not ICI traffic — the remat's real cost (a full activation
all-gather + re-partition every Euler step) only shows at scale. The
warning's disappearance is the load-bearing evidence; the timing is the
recorded artifact the verdict asked for.

Runs on CPU (safe alongside nothing — run exclusively anyway).
"""

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/deepv_jax_dryrun_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, f"need 8 virtual CPU devices, have {len(cpus)}"
    with jax.default_device(cpus[0]):
        run()


def run():
    from jax.sharding import Mesh
    from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.actions import action_vocabulary
    from deepv_tpu.models.mmdit import init_mmdit_params
    from deepv_tpu.parallel.tp import shard_mmdit_params
    from deepv_tpu.pipeline import _denoise_stage, _pyramid_list, padded_conditions

    # EXACT dryrun tiny-mesh-inference config (parallel/dryrun.py:150-161) —
    # the shapes whose stage program emitted the r3 warning
    mcfg = MMDiTConfig(
        sample_size=16, patch_size=2, in_channels=14, num_layers=2,
        attention_head_dim=8, num_attention_heads=4,
        caption_projection_dim=32, pooled_projection_dim=16,
        pos_embed_max_size=32, joint_attention_dim=24)
    pcfg = PipelineConfig(max_temporal_length=4, num_input_unit=2,
                          num_input_image=9)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("tp",))
    params = shard_mmdit_params(
        init_mmdit_params(jax.random.PRNGKey(8), mcfg), mesh, "tp")

    lh, lw = 8, 8
    clean = _pyramid_list(
        jax.random.normal(jax.random.PRNGKey(1), (1, 14, 3, lh, lw)), 2)
    conds = padded_conditions(pcfg, clean, 3, True, 2)
    embeds = random_text_embeds(0, ["empty"], joint_dim=24, pooled_dim=16)
    e = embeds["empty"]
    text = jnp.concatenate([jnp.asarray(e["prompt_embeds"])] * 2, 0)
    mask = jnp.concatenate([jnp.asarray(e["prompt_attention_mask"], jnp.int32)] * 2, 0)
    pooled = jnp.concatenate([jnp.asarray(e["pooled_prompt_embeds"])] * 2, 0)
    ts = jnp.linspace(999.0, 1.0, 5)
    dsig = jnp.full((5,), -0.2)

    for label, m in (("before (no pins)", None), ("after (pins)", mesh)):
        total = 0.0
        with mesh:
            for i_s in range(3):
                conditions, times, valid = conds[i_s]
                lat = jax.random.normal(jax.random.PRNGKey(2),
                                        (1, 14, 1, lh // (2 ** (2 - i_s)),
                                         lw // (2 ** (2 - i_s))))

                def run_stage():
                    return _denoise_stage(
                        mcfg, params, conditions, times, valid, lat,
                        text, mask, pooled, ts, dsig,
                        jnp.float32(3.5), jnp.float32(6.0), None, None,
                        num_rows=2, history_downsample_ratio=2,
                        zero_depth=False, attn_impl="ref", mesh=m)

                float(jnp.mean(run_stage().astype(jnp.float32)))   # compile
                best = float("inf")
                for _ in range(5):
                    t0 = time.time()
                    float(jnp.mean(run_stage().astype(jnp.float32)))
                    best = min(best, time.time() - t0)
                total += best
        print(f"[probe] {label:18s}: {total*1e3:7.1f} ms / 15-step unit "
              f"({total/15*1e3:5.1f} ms/step)")


if __name__ == "__main__":
    main()
