"""Pin models/vae.py and raymap.py to the reference's math via the torch
mirror in oracle_torch_vae.py (VERDICT r2 #4: these were the last two
fidelity-bearing subsystems validated only by self-consistency — a sign or
off-by-one that reproduces in every self-test would still diverge from the
reference; this closes that class).

All comparisons run in f64: random-weight group-norm chains amplify f32
rounding ~1e5x (CLAUDE.md), but in f64 the two implementations must agree to
~1e-10.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.config import VAEConfig
from deepv_tpu.models.vae import (chunk_decode, chunk_encode, decoder_apply,
                                  encoder_apply, init_vae_params)
from deepv_tpu.raymap import raymap_from_camera, raymap_to_camera

from oracle_torch_vae import (TorchCausalVaeDecoder, TorchCausalVaeEncoder,
                              torch_chunked, torch_raymap_from_camera,
                              torch_raymap_to_trans_matrix)

CFG = VAEConfig.tiny()


# ---------------------------------------------------------------------------
# weight transplant: jax pytree (torch layouts, io/weights.py invariant) ->
# torch oracle modules
# ---------------------------------------------------------------------------

def _t(p):
    return torch.from_numpy(np.asarray(p, np.float64))


def _set_conv(mod, p):
    mod.conv.weight.data = _t(p["weight"])
    mod.conv.bias.data = _t(p["bias"])


def _set_norm(mod, p):
    mod.weight.data = _t(p["weight"])
    mod.bias.data = _t(p["bias"])


def _set_lin(mod, p):
    mod.weight.data = _t(p["weight"])
    mod.bias.data = _t(p["bias"])


def _load_resnet(mod, p):
    _set_norm(mod.norm1, p["norm1"])
    _set_conv(mod.conv1, p["conv1"])
    _set_norm(mod.norm2, p["norm2"])
    _set_conv(mod.conv2, p["conv2"])
    if mod.conv_shortcut is not None:
        _set_conv(mod.conv_shortcut, p["conv_shortcut"])


def _load_mid(mod, p):
    for r, rp in zip(mod.resnets, p["resnets"]):
        _load_resnet(r, rp)
    attn, ap = mod.attentions[0], p["attentions"][0]
    _set_norm(attn.group_norm, ap["group_norm"])
    _set_lin(attn.to_q, ap["to_q"])
    _set_lin(attn.to_k, ap["to_k"])
    _set_lin(attn.to_v, ap["to_v"])
    _set_lin(attn.to_out, ap["to_out"])


def load_encoder(params) -> TorchCausalVaeEncoder:
    enc = TorchCausalVaeEncoder(CFG).double()
    p = params["encoder"]
    _set_conv(enc.conv_in, p["conv_in"])
    for block, bp in zip(enc.down_blocks, p["down_blocks"]):
        for r, rp in zip(block.resnets, bp["resnets"]):
            _load_resnet(r, rp)
        if block.downsampler is not None:
            _set_conv(block.downsampler, bp["downsampler"])
        if block.temporal_downsampler is not None:
            _set_conv(block.temporal_downsampler, bp["temporal_downsampler"])
    _load_mid(enc.mid_block, p["mid_block"])
    _set_norm(enc.conv_norm_out, p["conv_norm_out"])
    _set_conv(enc.conv_out, p["conv_out"])
    _set_conv(enc.quant_conv, p["quant_conv"])
    return enc


def load_decoder(params) -> TorchCausalVaeDecoder:
    dec = TorchCausalVaeDecoder(CFG).double()
    p = params["decoder"]
    _set_conv(dec.post_quant_conv, p["post_quant_conv"])
    _set_conv(dec.conv_in, p["conv_in"])
    _load_mid(dec.mid_block, p["mid_block"])
    for block, bp in zip(dec.up_blocks, p["up_blocks"]):
        for r, rp in zip(block.resnets, bp["resnets"]):
            _load_resnet(r, rp)
        if block.upsampler is not None:
            _set_conv(block.upsampler.conv, bp["upsampler"])
        if block.temporal_upsampler is not None:
            _set_conv(block.temporal_upsampler.conv, bp["temporal_upsampler"])
    _set_norm(dec.conv_norm_out, p["conv_norm_out"])
    _set_conv(dec.conv_out, p["conv_out"])
    return dec


@pytest.fixture(scope="module")
def params64():
    p = init_vae_params(jax.random.PRNGKey(0), CFG)
    with jax.enable_x64():
        return jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), p)


def test_encoder_full_matches_torch_oracle(params64):
    enc = load_encoder(params64)
    x = np.random.default_rng(1).normal(size=(1, 3, 9, 32, 32))
    with torch.no_grad():
        want = enc(torch.from_numpy(x)).numpy()
    with jax.enable_x64():
        got, _ = encoder_apply(CFG, params64["encoder"], jnp.asarray(x), mode="full")
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


def test_encoder_chunked_matches_torch_oracle(params64):
    """The explicit pytree cache carry == the reference's mutable deque walk
    (init window 9 + cont window 8, the deployment encode schedule)."""
    enc = load_encoder(params64)
    x = np.random.default_rng(2).normal(size=(1, 3, 17, 32, 32))
    with torch.no_grad():
        want = torch_chunked(enc, torch.from_numpy(x), window=8).numpy()
    with jax.enable_x64():
        got = chunk_encode(CFG, params64["encoder"], jnp.asarray(x), window_size=8)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


def test_decoder_full_matches_torch_oracle(params64):
    dec = load_decoder(params64)
    z = np.random.default_rng(3).normal(size=(1, CFG.encoder_out_channels, 3, 4, 4))
    with torch.no_grad():
        want = dec(torch.from_numpy(z)).numpy()
    with jax.enable_x64():
        got, _ = decoder_apply(CFG, params64["decoder"], jnp.asarray(z), mode="full")
    assert got.shape == want.shape          # 8x temporal + 8x spatial upsample
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


def test_decoder_chunked_matches_torch_oracle(params64):
    """Chunked decode (init 3 + cont 2 latent frames — the rollout's
    window=2 schedule) == the reference deque walk, incl. the temporal
    unshuffle's dropped-first-frame rule interacting with the cache."""
    dec = load_decoder(params64)
    z = np.random.default_rng(4).normal(size=(1, CFG.encoder_out_channels, 5, 4, 4))
    with torch.no_grad():
        want = torch_chunked(dec, torch.from_numpy(z), window=2).numpy()
    with jax.enable_x64():
        got = chunk_decode(CFG, params64["decoder"], jnp.asarray(z), window_size=2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


# ---------------------------------------------------------------------------
# raymap codec vs ref pipeline.py:29-163
# ---------------------------------------------------------------------------

def _random_cameras(t=4, H=64, W=64, seed=5):
    """Plausible random cameras: QR-orthonormalised rotations (det +1),
    small translations, realistic intrinsics."""
    rng = np.random.default_rng(seed)
    trans3d = np.zeros((t, 4, 4))
    for i in range(t):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        trans3d[i, :3, :3] = q
        trans3d[i, :3, 3] = rng.normal(scale=0.3, size=3)
        trans3d[i, 3, 3] = 1.0
    trans2d = np.zeros((t, 4, 4))
    trans2d[:, 0, 0] = rng.uniform(150, 400, t)
    trans2d[:, 1, 1] = trans2d[:, 0, 0]
    trans2d[:, 0, 2] = W / 2
    trans2d[:, 1, 2] = H / 2
    trans2d[:, 2, 2] = 1.0
    trans2d[:, 3, 3] = 1.0
    return trans2d, trans3d, (H, W)


def test_raymap_encode_matches_torch_oracle():
    trans2d, trans3d, shape = _random_cameras()
    want = torch_raymap_from_camera(torch.from_numpy(trans2d),
                                    torch.from_numpy(trans3d),
                                    shape, vae_downsample=8).numpy()
    with jax.enable_x64():
        got = raymap_from_camera(jnp.asarray(trans2d), jnp.asarray(trans3d),
                                 shape, vae_downsample=8)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_raymap_decode_matches_torch_oracle():
    """raymap_to_camera == ref raymap_to_trans_matrix on the pipeline's
    sqrt-encoded raymaps, incl. FoV estimation, axis conventions, the
    appended identity reference and relative->absolute chaining."""
    trans2d, trans3d, shape = _random_cameras(t=5, seed=6)
    rm = torch_raymap_from_camera(torch.from_numpy(trans2d),
                                  torch.from_numpy(trans3d),
                                  shape, vae_downsample=8).numpy()
    # pipeline convention: origins are sqrt-encoded before decoding
    # (ref pipeline.py:359-361; raymap.py docstring)
    rm[:, 3:] = np.sign(rm[:, 3:]) * np.sqrt(np.abs(rm[:, 3:]))
    rm = rm[None].transpose(0, 2, 1, 3, 4)       # [b, 6, t, h, w]

    for append, chain in [(False, False), (True, True)]:
        want_pose, want_intr = torch_raymap_to_trans_matrix(
            torch.from_numpy(rm), append_first_reference=append,
            from_relative_to_absolute=chain, vae_downsample=8)
        with jax.enable_x64():
            got_pose, got_intr = raymap_to_camera(
                jnp.asarray(rm), append_first_reference=append,
                from_relative_to_absolute=chain, vae_downsample=8)
        np.testing.assert_allclose(np.asarray(got_pose, np.float64),
                                   want_pose.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_intr, np.float64),
                                   want_intr.numpy(), atol=1e-3)
