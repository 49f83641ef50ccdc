"""Multi-device tests on the 8-device virtual CPU mesh: CP VAE equivalence,
TP parameter sharding, DP x TP training dry run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import MMDiTConfig, VAEConfig
from deepv_tpu.models.vae import decoder_apply, encoder_apply, init_vae_params
from deepv_tpu.parallel.cp import (cp_vae_decode, cp_vae_decode_chunked,
                                   cp_vae_encode, cp_vae_encode_chunked,
                                   tcp_vae_decode, tcp_vae_encode)
from deepv_tpu.parallel.mesh import make_mesh
from deepv_tpu.parallel.tp import mmdit_param_spec, shard_mmdit_params

CFG = VAEConfig.tiny()


@pytest.fixture(scope="module")
def vae_params():
    return init_vae_params(jax.random.PRNGKey(0), CFG)


def test_cp_encode_matches_single_device(vae_params):
    mesh = make_mesh((4,), ("cp",))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 64, 32), jnp.float32)
    single, _ = encoder_apply(CFG, vae_params["encoder"], x, mode="full")
    sharded = cp_vae_encode(CFG, vae_params, x, mesh)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=2e-3, rtol=1e-2)


def test_cp_decode_matches_single_device(vae_params):
    mesh = make_mesh((4,), ("cp",))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, CFG.encoder_out_channels, 2, 8, 4))
    single, _ = decoder_apply(CFG, vae_params["decoder"], z, mode="full")
    sharded = cp_vae_decode(CFG, vae_params, z, mesh)
    assert sharded.shape == single.shape
    # f64 for exactness (random-weight groupnorm chains amplify f32 rounding)
    with jax.enable_x64():
        p64 = jax.tree.map(lambda a: a.astype(jnp.float64), vae_params)
        z64 = z.astype(jnp.float64)
        s64, _ = decoder_apply(CFG, p64["decoder"], z64, mode="full")
        sh64 = cp_vae_decode(CFG, p64, z64, mesh)
        np.testing.assert_allclose(np.asarray(sh64), np.asarray(s64), atol=1e-6)


def test_cp_encode_exact_in_f64(vae_params):
    mesh = make_mesh((8,), ("cp",))
    with jax.enable_x64():
        p64 = jax.tree.map(lambda a: a.astype(jnp.float64), vae_params)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 9, 64, 32), jnp.float64)
        single, _ = encoder_apply(CFG, p64["encoder"], x, mode="full")
        sharded = cp_vae_encode(CFG, p64, x, mesh)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)


def test_cp_composes_with_temporal_chunking(vae_params):
    """CP x temporal chunking: the init/cont conv-cache carry must compose
    with spatial halo exchange — chunked-under-cp == single-device chunked
    == single-device full, exactly in f64 (the composability claim of
    parallel/cp.py)."""
    from deepv_tpu.models.vae import chunk_decode, chunk_encode
    mesh = make_mesh((4,), ("cp",))
    with jax.enable_x64():
        p64 = jax.tree.map(lambda a: a.astype(jnp.float64), vae_params)
        # encode: 17 pixel frames, window 8 -> init(9) + cont(8) windows
        # (cont windows must be multiples of the 8x temporal downsample)
        x = jax.random.normal(jax.random.PRNGKey(11), (1, 3, 17, 64, 32), jnp.float64)
        single = chunk_encode(CFG, p64["encoder"], x, window_size=8)
        full, _ = encoder_apply(CFG, p64["encoder"], x, mode="full")
        sharded = cp_vae_encode_chunked(CFG, p64, x, mesh, window_size=8)
        np.testing.assert_allclose(np.asarray(single), np.asarray(full), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-6)
        # decode: 5 latent frames, window 2 -> init(3) + cont(2) windows
        z = jax.random.normal(jax.random.PRNGKey(12),
                              (1, CFG.encoder_out_channels, 5, 8, 4), jnp.float64)
        single_d = chunk_decode(CFG, p64["decoder"], z, window_size=2)
        full_d, _ = decoder_apply(CFG, p64["decoder"], z, mode="full")
        sharded_d = cp_vae_decode_chunked(CFG, p64, z, mesh, window_size=2)
        np.testing.assert_allclose(np.asarray(single_d), np.asarray(full_d), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sharded_d), np.asarray(single_d), atol=1e-6)


def test_temporal_cp_decode_matches_single_device(vae_params):
    """Temporal CP (the reference's axis, ref vae.py:22-153): decode sharded
    over TIME equals the single-device full decode exactly in f64 — the
    ppermute halo ring == the reference's isend/irecv ring."""
    mesh = make_mesh((4,), ("tp",))
    with jax.enable_x64():
        p64 = jax.tree.map(lambda a: a.astype(jnp.float64), vae_params)
        # 1 + 4 ranks * 2 latent frames
        z = jax.random.normal(jax.random.PRNGKey(21),
                              (1, CFG.encoder_out_channels, 9, 8, 4), jnp.float64)
        single, _ = decoder_apply(CFG, p64["decoder"], z, mode="full")
        sharded = tcp_vae_decode(CFG, p64, z, mesh)
        assert sharded.shape == single.shape
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                                   atol=1e-6)


def test_temporal_cp_encode_matches_single_device(vae_params):
    mesh = make_mesh((2,), ("tp",))
    with jax.enable_x64():
        p64 = jax.tree.map(lambda a: a.astype(jnp.float64), vae_params)
        # 1 + 2 ranks * 16 pixel frames
        x = jax.random.normal(jax.random.PRNGKey(22), (1, 3, 33, 32, 32),
                              jnp.float64)
        single, _ = encoder_apply(CFG, p64["encoder"], x, mode="full")
        sharded = tcp_vae_encode(CFG, p64, x, mesh)
        assert sharded.shape == single.shape
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                                   atol=1e-6)


def test_temporal_cp_rejects_bad_split(vae_params):
    mesh = make_mesh((4,), ("tp",))
    z = jnp.zeros((1, CFG.encoder_out_channels, 8, 8, 4))  # (8-1) % 4 != 0
    with pytest.raises(AssertionError):
        tcp_vae_decode(CFG, vae_params, z, mesh)


def test_tp_param_specs():
    from jax.sharding import PartitionSpec as P
    cfg = MMDiTConfig.tiny()
    from deepv_tpu.models.mmdit import init_mmdit_params
    params = init_mmdit_params(jax.random.PRNGKey(0), cfg)
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: mmdit_param_spec(p, l), params)
    b0 = specs["transformer_blocks"][0]
    assert b0["attn"]["to_q"]["weight"] == P("tp", None)
    assert b0["attn"]["to_out"]["weight"] == P(None, "tp")
    assert b0["ff"]["proj"]["weight"] == P("tp", None)
    assert b0["ff"]["out"]["weight"] == P(None, "tp")
    assert b0["norm1"]["linear"]["weight"] == P()
    assert specs["pos_embed"]["proj"]["weight"] == P()


def test_tp_sharded_forward_matches_replicated():
    from deepv_tpu.models.mmdit import init_mmdit_params, mmdit_forward
    mesh = make_mesh((4,), ("tp",))
    cfg = MMDiTConfig(
        sample_size=16, patch_size=2, in_channels=6, num_layers=2,
        attention_head_dim=8, num_attention_heads=4,
        caption_projection_dim=32, pooled_projection_dim=16,
        pos_embed_max_size=32, joint_attention_dim=24)
    params = init_mmdit_params(jax.random.PRNGKey(0), cfg)
    clips = [jax.random.normal(jax.random.PRNGKey(1), (2, 6, 1, 8, 8))]
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 24))
    mask = jnp.ones((2, 7), jnp.int32)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    t = jnp.full((2,), 500.0)

    ref = mmdit_forward(cfg, params, clips, text, mask, pooled, t)
    sharded = shard_mmdit_params(params, mesh, "tp")
    with mesh:
        out = jax.jit(lambda p: mmdit_forward(cfg, p, clips, text, mask, pooled, t))(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_dryrun_dp_tp():
    from deepv_tpu.parallel.dryrun import run_dryrun
    loss = run_dryrun(8, verbose=False)
    assert np.isfinite(loss)


def test_graft_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out, np.float32)).all()
