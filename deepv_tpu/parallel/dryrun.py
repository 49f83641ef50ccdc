"""Multi-chip dry run: jit the full training step under DP x TP shardings.

Executed by the driver with N virtual host devices to validate that the
multi-chip program compiles and runs without real chips; the same code path
targets a real TPU pod slice by passing its devices to ``make_mesh``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import MMDiTConfig, PipelineConfig
from ..models.mmdit import init_mmdit_params
from ..models.scheduler import FlowMatchSchedule
from ..training.flow_matching import make_pyramid_train_step
from .mesh import make_mesh
from .tp import shard_mmdit_params


def run_dryrun(n_devices: int, verbose: bool = True) -> float:
    """One DP x TP pyramid-flow training step (the production packed
    multi-clip layout, training/flow_matching.py) + a CP VAE encode.

    Parallelism inventory exercised (SURVEY.md §2 table):
      DP  — batch axis sharding of the training step
      TP  — Megatron-style column/row splits of the MMDiT (GSPMD collectives)
      CP  — spatial context parallelism of the VAE (ppermute halo exchange)
      PP  — not applicable: the 2B-param model fits one chip class; no
            pipeline stages exist in this architecture
      EP  — not applicable: no mixture-of-experts layers
      SP  — covered by TP's sequence-activation shardings under GSPMD

    Returns the (finite) training loss.

    Requires >= n_devices CPU devices — raises instead of clamping, so a
    misconfigured virtual mesh can never "validate" a smaller one. All work
    is pinned to CPU (this image's default backend is the axon TPU tunnel).
    """
    try:
        devices = jax.devices("cpu")
    except RuntimeError:
        devices = jax.devices()
    if len(devices) < n_devices:
        raise RuntimeError(
            f"dryrun needs {n_devices} devices, found {len(devices)}: inject "
            "--xla_force_host_platform_device_count before CPU-client init "
            "(see __graft_entry__.dryrun_multichip)")
    n = n_devices
    dp = 2 if n % 2 == 0 and n >= 2 else 1
    tp = n // dp
    with jax.default_device(devices[0]):
        return _run_dryrun_on(devices[:n], dp, tp, verbose)


def _run_dryrun_on(devices, dp: int, tp: int, verbose: bool) -> float:
    n = len(devices)
    mesh = make_mesh((dp, tp), ("dp", "tp"), devices=devices)

    # tiny config whose dims divide tp (heads and ff widths shard cleanly)
    cfg = MMDiTConfig(
        sample_size=16, patch_size=2, in_channels=8, num_layers=2,
        attention_head_dim=8, num_attention_heads=2 * tp,
        caption_projection_dim=16 * tp, pooled_projection_dim=16,
        pos_embed_max_size=32, joint_attention_dim=32,
    )
    # caption dim must equal inner_dim for the context stream
    cfg = MMDiTConfig(**{**cfg.__dict__, "caption_projection_dim": cfg.inner_dim})

    params = init_mmdit_params(jax.random.PRNGKey(0), cfg)
    params = shard_mmdit_params(params, mesh, "tp")

    # pyramid-flow objective: the production packed multi-clip layout
    # (past-condition pyramid + renoised stage boundary) under DP x TP
    b = 2 * dp
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (b, cfg.in_channels, 8, 8, 8)),
        "text_embeds": jax.random.normal(jax.random.PRNGKey(2), (b, 7, cfg.joint_attention_dim)),
        "text_mask": jnp.ones((b, 7), jnp.int32),
        "pooled": jax.random.normal(jax.random.PRNGKey(3), (b, cfg.pooled_projection_dim)),
    }
    dp_shard = NamedSharding(mesh, P("dp"))
    batch = {k: jax.device_put(v, dp_shard) for k, v in batch.items()}

    pcfg = PipelineConfig()
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)
    step = make_pyramid_train_step(cfg, pcfg, FlowMatchSchedule(pcfg.scheduler),
                                   optimizer)

    with mesh:
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(4), stage=1, unit_index=3)
        loss = float(loss)
    assert np.isfinite(loss), f"dryrun loss not finite: {loss}"

    # context-parallel VAE over the full device set: spatial CP encode +
    # temporal CP decode (the reference's CP axis, ref vae.py:22-153)
    from ..config import VAEConfig
    from ..models.vae import init_vae_params
    from .cp import cp_vae_encode, tcp_vae_decode
    vcfg = VAEConfig.tiny()
    vparams = init_vae_params(jax.random.PRNGKey(5), vcfg)
    cp_mesh = make_mesh((n,), ("cp",), devices=devices)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 9, n * vcfg.downsample_scale, 32))
    moments = cp_vae_encode(vcfg, vparams, x, cp_mesh)
    assert np.isfinite(np.asarray(moments, np.float32)).all()

    tcp_mesh = make_mesh((n,), ("tp",), devices=devices)
    z = jax.random.normal(jax.random.PRNGKey(7),
                          (1, vcfg.encoder_out_channels, 1 + 2 * n, 8, 4))
    pixels = tcp_vae_decode(vcfg, vparams, z, tcp_mesh)
    assert np.isfinite(np.asarray(pixels, np.float32)).all()

    # the DEPLOYMENT program: a full (tiny-shape) InferencePipeline rollout
    # with mesh= — TP-sharded _denoise_stage + spatial-CP VAE encode and
    # streaming decode execute across all n shards (the inference-side
    # counterpart of the training step above; tests/test_mesh_inference.py
    # pins its f64 equality to the single-device rollout)
    frames = _run_mesh_inference(tcp_mesh, n)

    if verbose:
        print(f"[dryrun] mesh {mesh.devices.shape} axes {mesh.axis_names} "
              f"(dp={dp} tp={tp}) loss={loss:.4f}; "
              f"cp mesh {cp_mesh.devices.shape} vae encode ok; "
              f"temporal-cp decode of {z.shape[2]} latent frames ok; "
              f"mesh inference rollout ({n}-way TP denoise + CP VAE) "
              f"generated {frames} frames ok")
    return loss


def _run_mesh_inference(mesh, n: int) -> int:
    """One tiny-config chunk through ``InferencePipeline(mesh=...)``."""
    import math

    from ..config import VAEConfig
    from ..io.text_embeds import random_text_embeds
    from ..models.mmdit import init_mmdit_params
    from ..models.vae import init_vae_params
    from ..pipeline import InferencePipeline

    # latent H must divide both the pyramid's 4x downsample * patch 2 and the
    # n CP shards; pixel H = 8 * latent H then satisfies the encoder's
    # n * downsample_scale divisibility
    lat_h = 8 * n // math.gcd(8, n)
    H = W = 8 * lat_h
    vcfg = VAEConfig.tiny()
    from ..config import MMDiTConfig, PipelineConfig
    mcfg = MMDiTConfig(
        sample_size=16, patch_size=2, in_channels=14, num_layers=2,
        attention_head_dim=8, num_attention_heads=4,
        caption_projection_dim=32, pooled_projection_dim=16,
        pos_embed_max_size=32, joint_attention_dim=24)
    # short chunk (4 latent units) keeps the dryrun compile-bound time low
    pcfg = PipelineConfig(max_temporal_length=4, num_input_unit=2,
                          num_input_image=9)
    params = {"mmdit": init_mmdit_params(jax.random.PRNGKey(8), mcfg),
              "vae": init_vae_params(jax.random.PRNGKey(9), vcfg)}
    embeds = random_text_embeds(0, ["empty", "Move forward. The perspective hasn't changed."],
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds,
                             dtype=jnp.float32, mesh=mesh)
    img = jax.random.uniform(jax.random.PRNGKey(10), (1, 3, H, W),
                             minval=-1.0, maxval=1.0)
    prompts = np.array(["empty"] + ["Move forward. The perspective hasn't changed."] * 3)
    out = pipe.generate({"img": img, "prompt": prompts, "prompt_type": "action"},
                        seed=0)
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()
    return int(out["pred_img"].shape[2])
