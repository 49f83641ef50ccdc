"""Raymap codec tests: encode/decode round trip and geometric invariants."""

import numpy as np
import jax.numpy as jnp

from deepv_tpu.raymap import raymap_from_camera, raymap_from_camera_batch, raymap_to_camera


def make_cameras(t=3, H=48, W=64, ds=1):
    """Simple forward-looking cameras with small rotations/translations."""
    focal = 100.0
    trans2d = np.zeros((t, 4, 4), np.float32)
    trans2d[:, 0, 0] = focal
    trans2d[:, 1, 1] = focal
    trans2d[:, 0, 2] = W * ds / 2
    trans2d[:, 1, 2] = H * ds / 2
    trans2d[:, 2, 2] = 1
    trans2d[:, 3, 3] = 1

    trans3d = np.tile(np.eye(4, dtype=np.float32), (t, 1, 1))
    for i in range(t):
        ang = 0.05 * i
        c, s = np.cos(ang), np.sin(ang)
        trans3d[i, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        trans3d[i, :3, 3] = [0.1 * i, 0.02 * i, 0.3 * i]
    return jnp.asarray(trans2d), jnp.asarray(trans3d)


def test_raymap_shape_and_unit_directions():
    trans2d, trans3d = make_cameras(t=3, H=48, W=64)
    rm = raymap_from_camera(trans2d, trans3d, (48, 64), vae_downsample=1)
    assert rm.shape == (3, 6, 48, 64)
    norms = np.linalg.norm(np.asarray(rm[:, :3]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # origin channels are the camera translation everywhere
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(rm[i, 3:]).reshape(3, -1).mean(axis=1),
            np.asarray(trans3d[i, :3, 3]), atol=1e-6)


def test_raymap_downsample_matches_pooled_fullres():
    trans2d, trans3d = make_cameras(t=2, H=48, W=64, ds=8)
    rm = raymap_from_camera(trans2d, trans3d, (384, 512), vae_downsample=8)
    assert rm.shape == (2, 6, 48, 64)
    norms = np.linalg.norm(np.asarray(rm[:, :3]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_batch_version_matches_single():
    trans2d, trans3d = make_cameras(t=2)
    single = raymap_from_camera(trans2d, trans3d, (48, 64))
    batched = raymap_from_camera_batch(trans2d[None], trans3d[None], (48, 64))
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single), atol=1e-6)


def test_roundtrip_recovers_pose_and_intrinsics():
    """Encoding cameras then decoding the raymap recovers the camera, up to
    the codec's sqrt-translation convention (ref pipeline.py:91-93: decode
    assumes origins were sqrt-encoded, so we pre-encode them)."""
    H, W, ds = 384, 512, 8
    trans2d, trans3d = make_cameras(t=4, H=H // ds, W=W // ds, ds=ds)

    # decode expects sqrt-encoded translations (ref pipeline.py:361, 404)
    enc3d = trans3d.at[:, :3, 3].set(
        jnp.sign(trans3d[:, :3, 3]) * jnp.sqrt(jnp.abs(trans3d[:, :3, 3])))
    rm = raymap_from_camera(trans2d, enc3d, (H, W), vae_downsample=ds)

    pose, intr = raymap_to_camera(rm[None].transpose(0, 2, 1, 3, 4), vae_downsample=ds)
    pose = np.asarray(pose[0])
    intr = np.asarray(intr[0])

    ref_pose = np.asarray(trans3d)
    # rotation columns and translation recovered
    np.testing.assert_allclose(pose[:, :3, 3], ref_pose[:, :3, 3], atol=2e-3)
    np.testing.assert_allclose(pose[:, :3, 2], ref_pose[:, :3, 2], atol=5e-3)  # z axis
    # focal length within ~2% (FoV estimated from pooled ray geometry)
    np.testing.assert_allclose(intr[:, 0, 0], 100.0, rtol=0.03)
    np.testing.assert_allclose(intr[:, 0, 2], W / 2, atol=1e-3)
    np.testing.assert_allclose(intr[:, 1, 2], H / 2, atol=1e-3)


def test_append_reference_and_relative_chaining():
    H, W, ds = 384, 512, 8
    trans2d, trans3d = make_cameras(t=2, H=H // ds, W=W // ds, ds=ds)
    enc3d = trans3d.at[:, :3, 3].set(
        jnp.sign(trans3d[:, :3, 3]) * jnp.sqrt(jnp.abs(trans3d[:, :3, 3])))
    rm = raymap_from_camera(trans2d, enc3d, (H, W), vae_downsample=ds)
    pose, intr = raymap_to_camera(
        rm[None].transpose(0, 2, 1, 3, 4),
        append_first_reference=True, from_relative_to_absolute=True, vae_downsample=ds)
    assert pose.shape == (1, 3, 4, 4)
    assert intr.shape == (1, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(pose[0, 0]), np.eye(4), atol=1e-6)
    # chaining: absolute pose 1 == identity @ relative pose 1 == relative pose 1
    np.testing.assert_allclose(np.asarray(pose[0, 1, :3, 3]),
                               np.asarray(trans3d[0, :3, 3]), atol=2e-3)
