"""Raymap <-> camera-matrix codec, fully on device.

Capability parity with ref pipeline.py:29-163: a camera (4x4 intrinsics
``trans2d`` + 4x4 camera-to-world pose ``trans3d``) is encoded as a 6-channel
raymap (3 ray-direction + 3 ray-origin channels) at latent resolution, and a
generated raymap is decoded back to poses + intrinsics by estimating focal
length and FoV from the ray geometry.

Design notes (TPU-first):
  - everything is batched jnp; the per-frame ``bmm`` loops of the reference
    become einsums;
  - the relative->absolute pose chain (ref pipeline.py:159-162) is a
    ``lax.associative_scan``-style sequential matmul over at most 8 frames —
    done with a tiny unrolled loop (static length).
"""

from __future__ import annotations

import jax.numpy as jnp

from .ops.resample import avg_pool2d


def raymap_from_camera(trans2d: jnp.ndarray, trans3d: jnp.ndarray,
                       depth_shape, vae_downsample: int = 1) -> jnp.ndarray:
    """Encode cameras as a raymap (ref pipeline.py:41-75).

    trans2d: [t, 4, 4] intrinsics; trans3d: [t, 4, 4] camera-to-world;
    depth_shape: (H, W) pixel resolution. Returns [t, 6, H/ds, W/ds].
    """
    H, W = depth_shape
    t = trans2d.shape[0]
    fu = trans2d[:, 0, 0][:, None, None]
    fv = trans2d[:, 1, 1][:, None, None]
    cu = trans2d[:, 0, 2][:, None, None]
    cv = trans2d[:, 1, 2][:, None, None]

    u = jnp.arange(W, dtype=trans2d.dtype)[None, None, :]  # [1,1,W]
    v = jnp.arange(H, dtype=trans2d.dtype)[None, :, None]  # [1,H,1]
    x_cam = (u - cu) / fu                                   # [t,H,W]
    y_cam = (v - cv) / fv
    ones = jnp.ones((t, H, W), trans2d.dtype)
    ray = jnp.stack([x_cam * ones, y_cam * ones, ones, ones], axis=1)  # [t,4,H,W]

    # rotate (translation zeroed) after average-pooling to latent resolution
    ray = avg_pool2d(ray, vae_downsample)                   # [t,4,h,w]
    rot = trans3d.at[:, :3, 3].set(0.0)
    th, tw = ray.shape[-2:]
    ray_world = jnp.einsum("tij,tjhw->tihw", rot, ray)[:, :3]
    ray_world = ray_world / jnp.linalg.norm(ray_world, axis=1, keepdims=True)
    ray_o = jnp.broadcast_to(trans3d[:, :3, 3][:, :, None, None], (t, 3, th, tw))
    return jnp.concatenate([ray_world, ray_o], axis=1)


def raymap_from_camera_batch(trans2d: jnp.ndarray, trans3d: jnp.ndarray,
                             depth_shape, vae_downsample: int = 1) -> jnp.ndarray:
    """Batched encode (ref pipeline.py:29-39). [b,t,4,4] -> [b,t,6,h,w]."""
    import jax
    return jax.vmap(lambda t2, t3: raymap_from_camera(t2, t3, depth_shape, vae_downsample))(
        trans2d, trans3d)


def raymap_to_camera(raymap: jnp.ndarray, trans3d_scale_factor: float = 1.0,
                     append_first_reference: bool = False,
                     from_relative_to_absolute: bool = False,
                     vae_downsample: int = 8):
    """Decode a generated raymap into (camera_pose, intrinsic), both [b,t',4,4]
    (ref pipeline.py:77-163). ``t' = t+1`` when ``append_first_reference``.
    """
    raymap = raymap.astype(jnp.float32)
    b, _, t, h, w = raymap.shape

    # Normalise ray directions by their projection onto the mean ray
    # (ref pipeline.py:86-89).
    ref_ray = raymap[:, :3].mean(axis=(-1, -2))[..., None, None]     # [b,3,t,1,1]
    ref_ray = ref_ray / jnp.linalg.norm(ref_ray, axis=1, keepdims=True)
    projection = jnp.sum(raymap[:, :3] * ref_ray, axis=1, keepdims=True)
    ray_d = raymap[:, :3] / projection

    ray_o = jnp.moveaxis(raymap[:, 3:], 1, -1) / trans3d_scale_factor  # [b,t,h,w,3]
    ray_d = jnp.moveaxis(ray_d, 1, -1)                                  # [b,t,h,w,3]
    ray_o = jnp.sign(ray_o) * jnp.square(jnp.abs(ray_o))               # undo sqrt encoding

    location = ray_o.reshape(b, t, -1, 3).mean(axis=-2)                 # [b,t,3]
    image_location = (ray_o + ray_d).reshape(b, t, -1, 3).mean(axis=-2)
    focal = jnp.linalg.norm(image_location - location, axis=-1)         # [b,t]
    z_dir = image_location - location

    # FoV from left/right and top/bottom mean rays (ref pipeline.py:102-121).
    w_left = ray_d[:, :, :, :1, :].reshape(b, t, -1, 3).mean(axis=-2)
    w_right = ray_d[:, :, :, -1:, :].reshape(b, t, -1, 3).mean(axis=-2)
    wvec = w_right - w_left
    w_real = jnp.linalg.norm(jnp.cross(wvec, z_dir), axis=-1) / (w - 1) * w

    h_up = ray_d[:, :, :1, :, :].reshape(b, t, -1, 3).mean(axis=-2)
    h_down = ray_d[:, :, -1:, :, :].reshape(b, t, -1, 3).mean(axis=-2)
    hvec = h_up - h_down
    h_real = jnp.linalg.norm(jnp.cross(hvec, z_dir), axis=-1) / (h - 1) * h

    x_dir = w_right - w_left
    y_dir = jnp.cross(z_dir, x_dir)
    x_dir = jnp.cross(y_dir, z_dir)
    x_dir = x_dir / jnp.linalg.norm(x_dir, axis=-1, keepdims=True)
    y_dir = y_dir / jnp.linalg.norm(y_dir, axis=-1, keepdims=True)
    z_dirn = z_dir / jnp.linalg.norm(z_dir, axis=-1, keepdims=True)

    camera_pose = jnp.zeros((b, t, 4, 4), jnp.float32)
    camera_pose = camera_pose.at[:, :, :3, 0].set(x_dir)
    camera_pose = camera_pose.at[:, :, :3, 1].set(y_dir)
    camera_pose = camera_pose.at[:, :, :3, 2].set(z_dirn)
    camera_pose = camera_pose.at[:, :, :3, 3].set(location)
    camera_pose = camera_pose.at[:, :, 3, 3].set(1.0)

    intri_rescale = (w / w_real + h / h_real) / 2 * vae_downsample      # [b,t]
    intrinsic = jnp.zeros((b, t, 4, 4), jnp.float32)
    intrinsic = intrinsic.at[:, :, 0, 0].set(focal * intri_rescale)
    intrinsic = intrinsic.at[:, :, 1, 1].set(focal * intri_rescale)
    intrinsic = intrinsic.at[:, :, 0, 2].set(w / 2 * vae_downsample)
    intrinsic = intrinsic.at[:, :, 1, 2].set(h / 2 * vae_downsample)
    intrinsic = intrinsic.at[:, :, 2, 2].set(1.0)
    intrinsic = intrinsic.at[:, :, 3, 3].set(1.0)

    if append_first_reference:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 1, 4, 4))
        camera_pose = jnp.concatenate([eye, camera_pose], axis=1)
        intrinsic = jnp.concatenate([intrinsic[:, :1], intrinsic], axis=1)

    if from_relative_to_absolute:
        # chain relative poses left-to-right (ref pipeline.py:159-162);
        # static length <= 8, unrolled.
        poses = [camera_pose[:, 0]]
        for i in range(1, camera_pose.shape[1]):
            poses.append(poses[-1] @ camera_pose[:, i])
        camera_pose = jnp.stack(poses, axis=1)

    return camera_pose, intrinsic
