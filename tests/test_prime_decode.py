"""Chunk-boundary decoder-cache priming must be EXACT.

The reference decodes the whole re-encoded 25-frame overlap at each chunk
boundary and discards the pixels — only the decoder's per-conv caches carry
into the new frames (ref pipeline.py:316-343, vae.py:225-252). Priming
(models/vae.py::decoder_prime_tail) rebuilds the final block's caches from
just the trailing frames it needs; these tests pin bit-level agreement with
the full warm decode in f64, where float reassociation noise is negligible.
"""

import numpy as np
import jax
import jax.numpy as jnp

from deepv_tpu.config import VAEConfig
from deepv_tpu.models.vae import (_dec_front_window, _dec_prime_tail,
                                  _dec_window, decoder_prime_need,
                                  init_vae_params)


def _warm_full(vcfg, p_dec, z):
    cache = None
    for fi in range(z.shape[2]):
        _, cache = _dec_window(vcfg, p_dec, z[:, :, fi:fi + 1], cache,
                               "init" if fi == 0 else "cont")
    return cache


def _warm_primed(vcfg, p_dec, z, need):
    buf = None
    cache = None
    for fi in range(z.shape[2]):
        x, cache = _dec_front_window(vcfg, p_dec, z[:, :, fi:fi + 1], cache,
                                     "init" if fi == 0 else "cont")
        buf = x if buf is None else jnp.concatenate([buf, x], axis=2)[:, :, -need:]
    tail = _dec_prime_tail(vcfg, p_dec, buf)
    cache["up_blocks"] = cache["up_blocks"] + [tail["up_blocks_last"]]
    cache["conv_out"] = tail["conv_out"]
    return cache


def test_primed_caches_equal_full_warm_f64():
    with jax.enable_x64():
        vcfg = VAEConfig.tiny()
        need = decoder_prime_need(vcfg)
        assert need == 4 * vcfg.decoder_layers_per_block[-1] + 2
        p = init_vae_params(jax.random.PRNGKey(0), vcfg, dtype=jnp.float64)
        p_dec = p["decoder"]
        z = jax.random.normal(jax.random.PRNGKey(1),
                              (1, vcfg.encoder_out_channels, 4, 8, 8),
                              jnp.float64)

        full = _warm_full(vcfg, p_dec, z)
        primed = _warm_primed(vcfg, p_dec, z, need)

        # identical pytree structure and (f64) identical values
        assert (jax.tree.structure(full) == jax.tree.structure(primed))
        for a, b in zip(jax.tree.leaves(full), jax.tree.leaves(primed)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-12)

        # and decoding the NEXT latent through either cache is identical
        z2 = jax.random.normal(jax.random.PRNGKey(2), z[:, :, :1].shape,
                               jnp.float64)
        ya, _ = _dec_window(vcfg, p_dec, z2, full, "cont")
        yb, _ = _dec_window(vcfg, p_dec, z2, primed, "cont")
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=0, atol=1e-12)


def test_primed_rollout_equals_full_rollout_f64():
    """A 2-chunk rollout with priming on (default) equals the same rollout
    with the full overlap re-decode (to f64 reassociation noise) — the
    discarded overlap pixels are the ONLY thing priming skips. Covered in
    BOTH decode modes: streaming (per-unit windows through the primed
    caches) and end-of-chunk (``_decode_latents_primed``)."""
    from deepv_tpu.actions import action_vocabulary, prepare_motion_prompts
    from deepv_tpu.config import MMDiTConfig, PipelineConfig
    from deepv_tpu.io.text_embeds import random_text_embeds
    from deepv_tpu.models.mmdit import init_mmdit_params
    from deepv_tpu.pipeline import InferencePipeline

    with jax.enable_x64():
        vcfg = VAEConfig.tiny()
        mcfg = MMDiTConfig(
            sample_size=16, patch_size=2, in_channels=14, num_layers=2,
            attention_head_dim=8, num_attention_heads=4,
            caption_projection_dim=32, pooled_projection_dim=16,
            pos_embed_max_size=32, joint_attention_dim=24)
        pcfg = PipelineConfig()
        params = {
            "mmdit": init_mmdit_params(jax.random.PRNGKey(0), mcfg),
            "vae": init_vae_params(jax.random.PRNGKey(1), vcfg),
        }
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
        embeds = random_text_embeds(0, action_vocabulary(),
                                    joint_dim=mcfg.joint_attention_dim,
                                    pooled_dim=mcfg.pooled_projection_dim)
        img = jax.random.uniform(jax.random.PRNGKey(7), (1, 3, 64, 64),
                                 minval=-1, maxval=1)
        batch = {"img": img,
                 "prompt": np.array(prepare_motion_prompts(
                     "action", "(FN)" * 11)),
                 "prompt_type": "action"}

        ref_pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds,
                                     dtype=jnp.float64, stream_decode=False,
                                     prime_decoder_cache=False)
        assert ref_pipe._prime_need is None
        ref = ref_pipe.generate(batch, seed=9)
        for stream in (True, False):
            pp = InferencePipeline(pcfg, mcfg, vcfg, params, embeds,
                                   dtype=jnp.float64, stream_decode=stream,
                                   prime_decoder_cache=True)
            assert pp._prime_need is not None
            a = pp.generate(batch, seed=9)
            assert a["pred_img"].shape == ref["pred_img"].shape
            np.testing.assert_allclose(np.asarray(a["pred_img"]),
                                       np.asarray(ref["pred_img"]),
                                       rtol=0, atol=1e-9)
            np.testing.assert_allclose(np.asarray(a["pred_disparity"]),
                                       np.asarray(ref["pred_disparity"]),
                                       rtol=0, atol=1e-9)
            np.testing.assert_allclose(np.asarray(a["trans3d"]),
                                       np.asarray(ref["trans3d"]),
                                       rtol=0, atol=1e-9)
