"""End-to-end pipeline tests on tiny configs: single-chunk and multi-chunk
rollouts, CFG row counts, disparity/pose chaining, history retrieval."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.actions import action_vocabulary, prepare_motion_prompts
from deepv_tpu.config import MMDiTConfig, PipelineConfig, VAEConfig
from deepv_tpu.io.text_embeds import (load_text_embeds, random_text_embeds,
                                      save_text_embeds)
from deepv_tpu.models.mmdit import init_mmdit_params
from deepv_tpu.models.vae import init_vae_params
from deepv_tpu.pipeline import InferencePipeline, _pyramid_list


def tiny_pipeline(no_need_depth=False):
    vcfg = VAEConfig.tiny()
    # in_channels = 2*z + raymap = 2*4 + 6 = 14
    mcfg = MMDiTConfig(
        sample_size=16, patch_size=2, in_channels=14, num_layers=2,
        attention_head_dim=8, num_attention_heads=4,
        caption_projection_dim=32, pooled_projection_dim=16,
        pos_embed_max_size=32, joint_attention_dim=24,
    )
    pcfg = PipelineConfig(no_need_depth=no_need_depth)
    params = {
        "mmdit": init_mmdit_params(jax.random.PRNGKey(0), mcfg),
        "vae": init_vae_params(jax.random.PRNGKey(1), vcfg),
    }
    embeds = random_text_embeds(0, action_vocabulary(),
                                joint_dim=mcfg.joint_attention_dim,
                                pooled_dim=mcfg.pooled_projection_dim)
    pipe = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=jnp.float32)
    return pipe


# px dims such that every pyramid stage stays patch-even:
# latent = px/8 must be divisible by 4 (stages) * 2 (patch) = 8
H, W = 64, 64


@pytest.fixture(scope="module")
def pipe():
    return tiny_pipeline()


def make_batch(prompt="(FN)(FN)(SR)(SL)(FN)(FN)(FN)"):
    img = jax.random.uniform(jax.random.PRNGKey(7), (1, 3, H, W), minval=-1, maxval=1)
    return {
        "img": img,
        "prompt": np.array(prepare_motion_prompts("action", prompt)),
        "prompt_type": "action",
    }


def test_single_chunk_rollout(pipe):
    out = pipe.generate(make_batch(), seed=1)
    # 8 units -> 57 frames at H x W
    assert out["pred_img"].shape == (1, 3, 57, H, W)
    assert out["pred_disparity"].shape == (1, 3, 57, H, W)
    assert out["trans3d"].shape == (1, 8, 4, 4)
    assert out["trans2d"].shape == (1, 8, 4, 4)
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()
    assert np.isfinite(np.asarray(out["trans3d"], np.float32)).all()
    # disparity is the post-mapped square: non-negative
    assert float(out["pred_disparity"].min()) >= 0.0
    # first pose is the appended identity reference
    np.testing.assert_allclose(np.asarray(out["trans3d"][0, 0]), np.eye(4), atol=1e-5)


def test_multi_chunk_rollout_with_history(pipe):
    # 11 action units -> padded to 12 -> 2 chunks; second chunk uses
    # 3-row CFG with retrieved history (ref pipeline.py:276-279)
    out = pipe.generate(make_batch("(FN)(FN)(FN)(FN)(FN)(FN)(FN)(fRL)(SR)(BL)(FN)"), seed=2)
    # 57 + (57 - 25) = 89 frames; 8 + 4 units
    assert out["pred_img"].shape == (1, 3, 89, H, W)
    assert out["trans3d"].shape == (1, 12, 4, 4)
    assert len(out["motion_prompt_list"]) == 2
    assert len(out["motion_prompt_list"][0]) == 8
    assert len(out["motion_prompt_list"][1]) == 4
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()


def test_reuse_decoder_cache_rollout(pipe):
    """reuse_decoder_cache=True skips the overlap re-decode at chunk
    boundaries: same layout, chunk 1 bit-identical (no reuse applies yet),
    chunk>=2 deviating only through the decoder-cache provenance (previous
    chunk's latents vs the reference's uint8-roundtripped re-encode)."""
    prompt = "(FN)(FN)(FN)(FN)(FN)(FN)(FN)(fRL)(SR)(BL)(FN)"
    ref = pipe.generate(make_batch(prompt), seed=2)
    rpipe = InferencePipeline(pipe.cfg, pipe.mcfg, pipe.vcfg, pipe.params,
                              pipe.text_embeds, dtype=jnp.float32,
                              reuse_decoder_cache=True)
    out = rpipe.generate(make_batch(prompt), seed=2)
    assert out["pred_img"].shape == ref["pred_img"].shape == (1, 3, 89, H, W)
    # chunk 1 (57 frames) is decoded identically
    np.testing.assert_array_equal(np.asarray(out["pred_img"][:, :, :57]),
                                  np.asarray(ref["pred_img"][:, :, :57]))
    # the latent trajectory (poses derive from it) is identical — reuse only
    # changes pixel decode provenance, never the denoise stream
    np.testing.assert_allclose(np.asarray(out["trans3d"]),
                               np.asarray(ref["trans3d"]), atol=1e-4)
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()

    # END-OF-CHUNK reuse (the bench's sustained-reuse mode): the previous
    # chunk's final decode caches continue past the boundary. Pixels equal
    # the streaming reuse mode's up to program-level f32 reassociation
    # (per-window calls vs one chunked scan compile to different programs)
    epipe = InferencePipeline(pipe.cfg, pipe.mcfg, pipe.vcfg, pipe.params,
                              pipe.text_embeds, dtype=jnp.float32,
                              stream_decode=False, reuse_decoder_cache=True)
    out_e = epipe.generate(make_batch(prompt), seed=2)
    assert out_e["pred_img"].shape == (1, 3, 89, H, W)
    np.testing.assert_allclose(np.asarray(out_e["pred_img"], np.float32),
                               np.asarray(out["pred_img"], np.float32),
                               atol=1e-5)


def test_carry_latents_rollout(pipe):
    """carry_latents=True skips the rgb carry re-encode at chunk boundaries
    (the rgb conditioning latent comes from the chunk's own generated
    latents): same layout, chunk 1 bit-identical, chunk>=2 deviating through
    the conditioning provenance. Disparity must still re-encode (its carry
    is rescaled + sqrt-encoded in pixel space, ref pipeline.py:344-352)."""
    prompt = "(FN)(FN)(FN)(FN)(FN)(FN)(FN)(fRL)(SR)(BL)(FN)"
    ref = pipe.generate(make_batch(prompt), seed=2)
    cpipe = InferencePipeline(pipe.cfg, pipe.mcfg, pipe.vcfg, pipe.params,
                              pipe.text_embeds, dtype=jnp.float32,
                              carry_latents=True)
    enc_rows = []
    orig = cpipe._encode_pixels
    cpipe._encode_pixels = lambda x, k: enc_rows.append(x.shape[0]) or orig(x, k)
    out = cpipe.generate(make_batch(prompt), seed=2)
    assert out["pred_img"].shape == ref["pred_img"].shape == (1, 3, 89, H, W)
    # chunk 1 has no carry: bit-identical
    np.testing.assert_array_equal(np.asarray(out["pred_img"][:, :, :57]),
                                  np.asarray(ref["pred_img"][:, :, :57]))
    # chunk 2 conditions on carried latents instead of the re-encode: the
    # rollout deviates (if it didn't, the mode would be dead code)
    assert float(np.abs(np.asarray(out["pred_img"][:, :, 57:], np.float32)
                        - np.asarray(ref["pred_img"][:, :, 57:], np.float32)).max()) > 0
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()
    # encode calls: chunk-1 image (rows=1), history (rows=2), chunk-2
    # disparity ONLY (rows=1) — the exact path's chunk-2 call has rows=2
    assert enc_rows == [1, 2, 1], enc_rows


def test_load_pipeline_fast_preset(monkeypatch):
    """run.py's --fast preset wires all three quality-gated modes."""
    monkeypatch.setenv("DEEPV_TINY", "1")
    from deepv_tpu.run import create_model_config, load_pipeline
    cfg = create_model_config("none", use_motion_prompt=True)
    pipe = load_pipeline("none", cfg, random_weights=True, fast=True)
    assert pipe.flow_cache == "skip_odd"
    assert pipe.denoise_int8
    assert pipe.vcfg.conv_impl == "int8"
    assert "weight_int8" in pipe.params["mmdit"]["transformer_blocks"][0]["attn"]["to_q"]


def test_prompt_padding_rule(pipe):
    # 3 units pad up to 8 (single chunk)
    out = pipe.generate(make_batch("(FN)(FN)"), seed=3)
    assert out["pred_img"].shape[2] == 57


def test_no_need_depth(tmp_path):
    pipe = tiny_pipeline(no_need_depth=True)
    out = pipe.generate(make_batch(), seed=4)
    # the decoded disparity is zeroed (ref pipeline.py:697-698); the pipeline
    # post-map (x*0.5+0.5)^2/0.95 turns that into the constant 0.25/0.95
    disp = np.asarray(out["pred_disparity"])
    np.testing.assert_allclose(disp, 0.25 / 0.95, atol=1e-6)
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()


def test_pyramid_list_shapes():
    x = jnp.ones((1, 4, 3, 16, 16))
    levels = _pyramid_list(x, 2)
    assert [l.shape[-1] for l in levels] == [4, 8, 16]
    assert levels[2].shape == x.shape


def test_text_embeds_roundtrip(tmp_path):
    cache = random_text_embeds(0, ["a", "b c"])
    p = str(tmp_path / "embeds.npz")
    save_text_embeds(p, cache)
    loaded = load_text_embeds(p)
    assert set(loaded) == set(cache)
    for k in cache:
        for f in cache[k]:
            np.testing.assert_array_equal(loaded[k][f], cache[k][f])


def test_missing_prompt_raises(pipe):
    batch = make_batch()
    batch["prompt"] = np.array(["a prompt not in the cache"] * 8)
    batch["prompt_type"] = "text"
    with pytest.raises(KeyError):
        pipe.generate(batch, seed=5)


def test_stream_decode_matches_batch_decode():
    """Streaming (per-unit) decode must equal the end-of-chunk decode exactly
    (chunked == full causal-VAE law); compared in f64 where float reassociation
    noise is negligible."""
    import jax.numpy as jnp
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
        batch = make_batch()
        a = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=jnp.float64,
                              stream_decode=True).generate(batch, seed=9)
        b = InferencePipeline(pcfg, mcfg, vcfg, params, embeds, dtype=jnp.float64,
                              stream_decode=False).generate(batch, seed=9)
        np.testing.assert_allclose(np.asarray(a["pred_img"]),
                                   np.asarray(b["pred_img"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a["pred_disparity"]),
                                   np.asarray(b["pred_disparity"]), atol=1e-6)


def test_flow_cache_skip_odd(pipe):
    """Flow caching: the skip_odd pattern must equal a hand-stepped Euler
    chain that reuses the guided velocity on odd steps, and the all-ones
    mask must equal the default exact path bit-for-bit."""
    import jax.numpy as jnp
    from deepv_tpu.models.mmdit import mmdit_forward
    from deepv_tpu.models.scheduler import euler_step
    from deepv_tpu.pipeline import _denoise_stage

    cfg, mcfg = pipe.cfg, pipe.mcfg
    ds = cfg.vae_downsample
    lh, lw = H // ds, W // ds
    key = jax.random.PRNGKey(0)
    clean = _pyramid_list(
        jax.random.normal(key, (1, mcfg.in_channels, 3, lh, lw), jnp.float32), 2)
    conds = pipe._padded_conditions(clean, 3, True, 2)
    conditions, times, valid = conds[1]
    pe, pm, pp = pipe._embeds_for("empty")
    text = jnp.concatenate([pe, pe], 0)
    mask = jnp.concatenate([pm, pm], 0)
    pooled = jnp.concatenate([pp, pp], 0)
    ss = pipe.schedule.stage_schedule(cfg.num_inference_steps, 1)
    ts = jnp.asarray(ss.timesteps)
    dsig = jnp.asarray(ss.sigmas[1:] - ss.sigmas[:-1])
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (1, mcfg.in_channels, 1, lh // 2, lw // 2), jnp.float32)

    def run(recompute):
        return _denoise_stage(
            mcfg, pipe.params["mmdit"], conditions, times, valid, lat,
            text, mask, pooled, ts, dsig, jnp.float32(3.5), jnp.float32(6.0),
            None, None, num_rows=2, history_downsample_ratio=2,
            zero_depth=False, attn_impl="ref", recompute=recompute)

    exact = run(())
    np.testing.assert_array_equal(np.asarray(run((1,) * 5)), np.asarray(exact))

    # hand-stepped reference for the skip_odd pattern
    g = jnp.float32(3.5)
    x = lat
    v = None
    for i in range(5):
        if i % 2 == 0:
            vr = mmdit_forward(mcfg, pipe.params["mmdit"],
                               list(conditions) + [jnp.concatenate([x, x], 0)],
                               text, mask, pooled,
                               jnp.full((2,), float(ts[i]), jnp.float32),
                               frame_times=list(times), frame_valid=list(valid),
                               attn_impl="ref")
            v = (vr[0:1] + g * (vr[1:2] - vr[0:1])).astype(x.dtype)
        x = euler_step(x, v, dsig[i])
    got = run((1, 0, 1, 0, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)
    assert np.abs(np.asarray(got) - np.asarray(exact)).max() > 0   # differs


def test_flow_cache_rejects_malformed(pipe):
    """A typo'd flow_cache string must fail loudly at construction, never
    silently run the default tau (a 6x-off error bound with no warning)."""
    for bad in ("adaptive=0.5", "adaptive_0.05", "adaptive:", "skip_even"):
        with pytest.raises((AssertionError, ValueError)):
            InferencePipeline(pipe.cfg, pipe.mcfg, pipe.vcfg, pipe.params,
                              pipe.text_embeds, dtype=jnp.float32,
                              flow_cache=bad)


def test_flow_cache_pipeline_runs(pipe):
    fast = InferencePipeline(pipe.cfg, pipe.mcfg, pipe.vcfg, pipe.params,
                             pipe.text_embeds, dtype=jnp.float32,
                             flow_cache="skip_odd")
    out = fast.generate(make_batch("(FN)(FN)"), seed=7)
    assert out["pred_img"].shape == (1, 3, 57, H, W)
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()


def test_flow_cache_adaptive(pipe):
    """Error-bounded adaptive caching: tau=0 recomputes every step (the
    drift test `>= 0` is always true) and must be bit-identical to the exact
    path; tau=inf never recomputes past the forced first step and must be
    bit-identical to the static (1,0,0,0,0) mask."""
    import jax.numpy as jnp
    from deepv_tpu.pipeline import _denoise_stage, _pyramid_list

    cfg, mcfg = pipe.cfg, pipe.mcfg
    ds = cfg.vae_downsample
    lh, lw = H // ds, W // ds
    key = jax.random.PRNGKey(0)
    clean = _pyramid_list(
        jax.random.normal(key, (1, mcfg.in_channels, 3, lh, lw), jnp.float32), 2)
    conds = pipe._padded_conditions(clean, 3, True, 2)
    conditions, times, valid = conds[1]
    pe, pm, pp = pipe._embeds_for("empty")
    text = jnp.concatenate([pe, pe], 0)
    mask = jnp.concatenate([pm, pm], 0)
    pooled = jnp.concatenate([pp, pp], 0)
    ss = pipe.schedule.stage_schedule(cfg.num_inference_steps, 1)
    ts = jnp.asarray(ss.timesteps)
    dsig = jnp.asarray(ss.sigmas[1:] - ss.sigmas[:-1])
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (1, mcfg.in_channels, 1, lh // 2, lw // 2), jnp.float32)

    def run(recompute, tau=None):
        return _denoise_stage(
            mcfg, pipe.params["mmdit"], conditions, times, valid, lat,
            text, mask, pooled, ts, dsig, jnp.float32(3.5), jnp.float32(6.0),
            None, None, num_rows=2, history_downsample_ratio=2,
            zero_depth=False, attn_impl="ref", recompute=recompute,
            adaptive_tau=None if tau is None else jnp.float32(tau))

    floor = (1, 0, 0, 0, 0)
    exact = run(())
    np.testing.assert_array_equal(np.asarray(run(floor, tau=0.0)),
                                  np.asarray(exact))
    np.testing.assert_array_equal(np.asarray(run(floor, tau=1e30)),
                                  np.asarray(run(floor)))
    assert np.abs(np.asarray(run(floor)) - np.asarray(exact)).max() > 0


def test_flow_cache_adaptive_pipeline_runs(pipe):
    fast = InferencePipeline(pipe.cfg, pipe.mcfg, pipe.vcfg, pipe.params,
                             pipe.text_embeds, dtype=jnp.float32,
                             flow_cache="adaptive:0.12")
    assert float(fast.adaptive_tau) == np.float32(0.12)
    out = fast.generate(make_batch("(FN)(FN)"), seed=7)
    assert out["pred_img"].shape == (1, 3, 57, H, W)
    assert np.isfinite(np.asarray(out["pred_img"], np.float32)).all()


def test_on_frames_streaming_callback(pipe):
    """The serving hook fires once per decoded window with pixel tensors."""
    windows = []
    pipe.on_frames = lambda rgb, disp: windows.append((rgb.shape, disp.shape))
    try:
        out = pipe.generate(make_batch("(FN)(FN)"), seed=6)
    finally:
        pipe.on_frames = None
    # chunk 0: 8 unit pushes -> first 1 frame, then 7 x 8 frames = 57
    assert len(windows) == 8
    assert windows[0][0][2] == 1
    assert all(w[0][2] == 8 for w in windows[1:])
    total = sum(w[0][2] for w in windows)
    assert total == out["pred_img"].shape[2] == 57


# Quality gates for the fast modes: each asserts the mode really deviates
# (the gates are real approximations) AND stays within bounds calibrated at
# ~3x the deviation MEASURED on this exact tiny config + seed (measurement
# recorded in each test) — so a ~10x quality regression in any fast mode
# turns the suite red (VERDICT r4 #5; the previous 48/128 bounds would have
# passed a rollout that was 19% wrong on average). Bounds are config-bound:
# full-size deviations on structure-shaped weights live in bench.py's
# *_deviation_* metrics, not here.

def _deviation_vs(ref_np, out, scale=127.5):
    b = np.asarray(out["pred_img"], np.float32)
    assert ref_np.shape == b.shape
    assert np.isfinite(b).all()
    dev = np.abs(ref_np - b) * scale         # 8-bit pixel units
    assert dev.max() > 0.0                   # the mode really approximates
    return float(np.mean(dev)), float(np.percentile(dev, 95))


@pytest.fixture(scope="module")
def exact_2chunk(pipe):
    """Exact 2-chunk rollout (seed 77): the reference for the boundary-mode
    and adaptive deviation gates — multi-chunk, so the carry/boundary
    semantics the fast modes alter are actually exercised."""
    batch = make_batch("(FN)(FN)(FN)(FN)(FN)(FN)(FN)(fRL)(SR)(BL)(FN)")
    out = pipe.generate(batch, seed=77)
    return batch, np.asarray(out["pred_img"], np.float32)


def test_fast_composition_deviation_bounded(pipe):
    """flow_cache=skip_odd + int8 VAE convs + int8 MMDiT linears, single
    chunk. Measured on this config/seed: mean 3.96 / p95 12.1 8-bit units."""
    from dataclasses import replace

    vcfg_fast = replace(pipe.vcfg, conv_impl="int8")
    fpipe = InferencePipeline(pipe.cfg, pipe.mcfg, vcfg_fast, pipe.params,
                              pipe.text_embeds, dtype=jnp.float32,
                              flow_cache="skip_odd", denoise_int8=True)
    batch = make_batch()
    exact = np.asarray(pipe.generate(batch, seed=77)["pred_img"], np.float32)
    mean, p95 = _deviation_vs(exact, fpipe.generate(batch, seed=77))
    assert mean < 12.0
    assert p95 < 40.0


def test_adaptive_deviation_bounded(pipe, exact_2chunk):
    """flow_cache=adaptive:0.5 (the boundary-frontier middle mode) over a
    2-chunk rollout — boundaries included, so the adaptive-cache drift
    feeding back through the carry re-encode is covered. Measured on this
    config/seed: mean 3.07 / p95 12.0 8-bit units."""
    batch2, exact2 = exact_2chunk
    apipe = InferencePipeline(pipe.cfg, pipe.mcfg, pipe.vcfg, pipe.params,
                              pipe.text_embeds, dtype=jnp.float32,
                              flow_cache="adaptive:0.5")
    mean, p95 = _deviation_vs(exact2, apipe.generate(batch2, seed=77))
    assert mean < 10.0
    assert p95 < 36.0


def test_boundary_modes_deviation_bounded(pipe, exact_2chunk):
    """reuse_decoder_cache + carry_latents over a 2-chunk rollout — the
    boundary fast modes whose realistic-weight deviation was round 4's big
    finding (full-size p95 ~43; untested at any scale until now). Measured
    on this config/seed: mean 6.18 / p95 33.6 8-bit units."""
    batch2, exact2 = exact_2chunk
    bpipe = InferencePipeline(pipe.cfg, pipe.mcfg, pipe.vcfg, pipe.params,
                              pipe.text_embeds, dtype=jnp.float32,
                              stream_decode=False, reuse_decoder_cache=True,
                              carry_latents=True)
    mean, p95 = _deviation_vs(exact2, bpipe.generate(batch2, seed=77))
    assert mean < 19.0
    assert p95 < 100.0
