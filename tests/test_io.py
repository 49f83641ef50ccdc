"""Host-side IO tests: video export, PLY export, weight converter re-keying."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from deepv_tpu.io.ply import backproject, depth_edge, interpolate_cameras, write_ply
from deepv_tpu.io.video import add_controller_on_image, colorize_depth, save_video


def fake_output(t=9, h=32, w=32):
    rng = np.random.default_rng(0)
    return {
        "pred_img": jnp.asarray(rng.uniform(-1, 1, (1, 3, t, h, w)).astype(np.float32)),
        "pred_disparity": jnp.asarray(rng.uniform(0.1, 1.0, (1, 3, t, h, w)).astype(np.float32)),
        "motion_prompt_list": [np.array(["empty", "Move forward. The perspective hasn't changed."])],
        "trans3d": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))),
        "trans2d": jnp.asarray(np.tile(np.eye(4, dtype=np.float32) * 50, (1, 2, 1, 1))),
    }


def test_save_video_mp4_or_gif(tmp_path):
    out = str(tmp_path / "v.mp4")
    written = save_video(fake_output(), out, fps=8)
    assert os.path.exists(written) and os.path.getsize(written) > 0


def test_save_video_with_depth_and_controller(tmp_path):
    out = str(tmp_path / "v2.mp4")
    written = save_video(fake_output(), out, fps=8, add_depth=True, add_controler=True)
    assert os.path.exists(written)
    import cv2
    cap = cv2.VideoCapture(written)
    ok, frame = cap.read()
    if ok:  # gif fallback not readable by cv2; skip shape check then
        assert frame.shape[1] == 64  # side-by-side depth panel doubles width


def test_colorize_depth_shape():
    d = np.linspace(0, 1, 64).reshape(8, 8)
    c = colorize_depth(d, 0, 1)
    assert c.shape == (8, 8, 3)
    assert c.min() >= 0 and c.max() <= 1


def test_controller_overlay_runs():
    from PIL import Image
    img = Image.new("RGB", (192, 128))
    out = add_controller_on_image(img, "Move forward. Rotate the perspective clockwise.")
    assert np.asarray(out).sum() > 0  # icons drawn


def test_controller_overlay_loads_icon_assets(tmp_path):
    """With an assets dir the reference's PNG glyphs are pasted at the same
    grid, active ones recolored to yellow through the alpha mask
    (ref run.py:193-212). Synthesizes a distinctive glyph set so the test
    does not depend on the reference's binary assets."""
    from PIL import Image
    names = ["forward", "backward", "left", "right", "counterclock", "clock"]
    for name in names:
        icon = np.zeros((32, 32, 4), np.uint8)
        icon[4:28, 4:28] = [10, 200, 30, 255]     # green box, opaque center
        Image.fromarray(icon).save(tmp_path / f"{name}.png")

    img = Image.new("RGB", (192 * 3, 128))
    out = np.asarray(add_controller_on_image(
        img, "Move forward.", assets_dir=str(tmp_path)))
    icon_px = out[out.sum(axis=-1) > 0]
    assert len(icon_px)                            # icons pasted
    # the active (forward) icon is recolored to the highlight yellow; the
    # idle ones keep the source green
    yellow = (np.abs(icon_px.astype(int) - [244, 234, 42]) < 30).all(axis=-1)
    green = (np.abs(icon_px.astype(int) - [10, 200, 30]) < 30).all(axis=-1)
    assert yellow.any() and green.any()
    # forward sits one icon-row above backward at the same x (ref grid)
    W, icon_size = out.shape[1] // 3, 29
    fwd = out[128 - 2 * icon_size:128 - icon_size,
              W // 2 - 2 * icon_size:W // 2 - icon_size]
    bwd = out[128 - icon_size:, W // 2 - 2 * icon_size:W // 2 - icon_size]
    assert (np.abs(fwd[12, 12].astype(int) - [244, 234, 42]) < 30).all()
    assert (np.abs(bwd[12, 12].astype(int) - [10, 200, 30]) < 30).all()


def test_icon_assets_override_fails_loudly(monkeypatch, tmp_path):
    """An explicit DEEPV_ICON_ASSETS pointing at a dir without the glyphs is
    an error, not a silent fall-back to procedural icons (a typo'd path must
    not masquerade as reference-pixel output)."""
    from PIL import Image
    monkeypatch.setenv("DEEPV_ICON_ASSETS", str(tmp_path / "nope"))
    img = Image.new("RGB", (192 * 3, 128))
    with pytest.raises(FileNotFoundError, match="DEEPV_ICON_ASSETS"):
        add_controller_on_image(img, "Move forward.")


def test_disparity_quantile_mask_excludes_zeros():
    """Exact zeros must be excluded from the colorization quantiles via the
    reference's (1/disp) < inf mask (ref run.py:324-326) — a frame that is
    half zeros would otherwise get min_d == 0 and a shifted normalisation."""
    from deepv_tpu.io.video import disparity_quantile_range
    disp = np.concatenate([np.zeros(500, np.float32),
                           np.linspace(2.0, 4.0, 500, dtype=np.float32)])
    rng = np.random.default_rng(3)
    rng.shuffle(disp)
    min_d, max_d = disparity_quantile_range(disp.reshape(25, 40))
    ref = disp[disp != 0.0]     # torch: disparity_[(1/disparity_) < inf]
    np.testing.assert_allclose(min_d, np.quantile(ref, 0.01), rtol=1e-6)
    np.testing.assert_allclose(max_d, np.quantile(ref, 0.99), rtol=1e-6)
    assert min_d >= 2.0         # the zeros did not drag the 1% quantile down
    # negative values pass the mask (1/neg is finite), matching the reference
    disp2 = np.array([-1.0, 0.0, 1.0, 2.0, 3.0], np.float32)
    lo, hi = disparity_quantile_range(disp2)
    assert lo < 0.0
    # all-zero frame: reference would crash on empty quantile; we fall back
    lo0, hi0 = disparity_quantile_range(np.zeros(8, np.float32))
    assert lo0 == hi0 == 0.0


def test_write_ply_full_f32_precision(tmp_path):
    """%.9g round-trips float32 exactly — world coordinates after pose
    chaining carry digits past 6 (the reference's plyfile stores full f4)."""
    pts = np.array([[123456.789, -0.000123456789, 1.23456789]], np.float32)
    cols = np.array([[1, 2, 3]])
    path = str(tmp_path / "p.ply")
    write_ply(path, pts, cols)
    row = open(path).read().strip().splitlines()[-1].split()
    back = np.array([float(v) for v in row[:3]], np.float32)
    np.testing.assert_array_equal(back, pts[0])


def test_depth_edge_detects_step():
    d = np.ones((16, 16), np.float32)
    d[8:, :] = 5.0
    edge = np.asarray(depth_edge(jnp.asarray(d), atol=0.5))
    assert edge[7:9].any()
    assert not edge[0:4].any()


def test_backproject_identity_camera():
    h, w = 8, 8
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 10.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    depth = jnp.full((h, w), 2.0)
    pts = np.asarray(backproject(depth, jnp.asarray(K), jnp.eye(4)))
    assert pts.shape == (h, w, 3)
    np.testing.assert_allclose(pts[..., 2], 2.0)
    # principal point maps to (0, 0, z)
    np.testing.assert_allclose(pts[h // 2, w // 2, :2], [0, 0], atol=1e-6)


def test_interpolate_cameras_counts():
    c2w = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    c2w[1, :3, 3] = [1, 0, 0]
    c2w[2, :3, 3] = [2, 0, 0]
    K = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    out_c2w, out_k = interpolate_cameras(c2w, K, k=9)
    # (3-1) pairs x 9 minus duplicated joints = 17 (ref run.py:110-141)
    assert len(out_c2w) == 17
    np.testing.assert_allclose(out_c2w[0][:3, 3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out_c2w[-1][:3, 3], [2, 0, 0], atol=1e-6)


def test_write_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).standard_normal((10, 3)).astype(np.float32)
    cols = np.random.default_rng(1).integers(0, 255, (10, 3))
    path = str(tmp_path / "x.ply")
    write_ply(path, pts, cols)
    txt = open(path).read()
    assert txt.startswith("ply")
    assert "element vertex 10" in txt
    assert len(txt.strip().splitlines()) == 10 + 10  # header + rows


def test_weight_converter_rekeying():
    from deepv_tpu.io.weights import _MMDIT_RULES, _VAE_RULES, _rewrite, _set
    assert _rewrite("transformer_blocks.0.ff.net.0.proj.weight", _MMDIT_RULES) \
        == "transformer_blocks.0.ff.proj.weight"
    assert _rewrite("transformer_blocks.3.ff.net.2.bias", _MMDIT_RULES) \
        == "transformer_blocks.3.ff.out.bias"
    assert _rewrite("transformer_blocks.1.attn.to_out.0.weight", _MMDIT_RULES) \
        == "transformer_blocks.1.attn.to_out.weight"
    assert _rewrite("encoder.down_blocks.0.resnets.0.conv1.conv.weight", _VAE_RULES) \
        == "encoder.down_blocks.0.resnets.0.conv1.weight"
    assert _rewrite("encoder.down_blocks.1.downsamplers.0.conv.conv.bias", _VAE_RULES) \
        == "encoder.down_blocks.1.downsampler.bias"
    assert _rewrite("decoder.up_blocks.2.temporal_upsamplers.0.conv.conv.weight", _VAE_RULES) \
        == "decoder.up_blocks.2.temporal_upsampler.weight"
    tree = {}
    _set(tree, "a.b.0.c", 1)
    _set(tree, "a.b.1.c", 2)
    assert tree == {"a": {"b": [{"c": 1}, {"c": 2}]}}


def test_prepare_input_image_crop_semantics(tmp_path):
    """Center-crop to aspect then resize (ref run.py:247-265)."""
    from PIL import Image
    from deepv_tpu.run import prepare_input_image
    img = np.zeros((200, 400, 3), np.uint8)
    img[:, 150:250] = 255  # white center band
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    out = prepare_input_image(p, height=64, width=64)
    assert out.shape == (1, 3, 64, 64)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # the 64x64 crop comes from the central 200x200 -> white band fills middle
    assert out[0, 0, 32, 32] > 0.9
    assert out[0, 0, 32, 2] < -0.9
