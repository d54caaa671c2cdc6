"""Camera geometry: pinhole ray generation, pose math, world transforms, NDC.

TPU-native re-design of the reference's camera utilities
(``/root/reference/nerf/model.py``):

* ``generate_rays``              ~ reference ``model.py:242-278`` (pinhole
  grid, OpenGL convention: -y, z=-1; pixel centers at ``0.5*(n-1)``).
* ``spherical_to_cartesian``     ~ reference ``model.py:280-306``.
* ``get_rotation_matrix``        ~ reference ``model.py:308-334``
  (columns ``[right, up, -eye]``, right = cross(eye, up)).
* ``direction_to_rotation_matrix`` — reconstruction of the v1.2 API used by
  ``train_conditional_nerf.py:86-87`` (its source is gone at HEAD): build a
  camera rotation from a viewing direction alone by deriving an up vector
  from world +z.
* ``rays_to_world_coordinates``  ~ reference ``model.py:336-367``.
* ``ndc_rays``                   — NDC warp for LLFF forward-facing scenes
  (framework extra, per BASELINE.json config #5; NeRF paper appendix C).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def generate_rays(image_h: int, image_w: int, focal_length: float,
                  dtype=jnp.float32) -> Array:
    """Per-pixel ray directions in the camera frame for an H x W image.

    Mirrors reference ``model.py:242-278``: pixel ``(y, x)`` maps to
    ``[(x - 0.5(W-1))/f, -(y - 0.5(H-1))/f, -1]`` (OpenGL convention).
    Returns ``[H, W, 3]``.
    """
    y, x = jnp.meshgrid(
        jnp.arange(image_h, dtype=dtype),
        jnp.arange(image_w, dtype=dtype),
        indexing="ij",
    )
    x = (x - 0.5 * float(image_w - 1)) / focal_length
    y = (y - 0.5 * float(image_h - 1)) / focal_length
    return jnp.stack([x, -y, -jnp.ones_like(x)], axis=-1)


def spherical_to_cartesian(yaw: Array, elevation: Array) -> Array:
    """Yaw/elevation (radians) to a unit xyz vector, z-up.

    Mirrors reference ``model.py:280-306``: zero yaw and elevation point
    along +x; yaw turns counter-clockwise viewed top-down.
    """
    return jnp.stack(
        [
            jnp.cos(yaw) * jnp.cos(elevation),
            jnp.sin(yaw) * jnp.cos(elevation),
            jnp.sin(elevation),
        ],
        axis=-1,
    )


def get_rotation_matrix(eye_vector: Array, up_vector: Array) -> Array:
    """Camera-to-world rotation from viewing direction + up vector.

    Mirrors reference ``model.py:308-334``: columns are
    ``[cross(eye, up), up, -eye]`` so that camera -z maps to the viewing
    direction.  Shapes ``[..., 3] -> [..., 3, 3]``.
    """
    return jnp.stack(
        [jnp.cross(eye_vector, up_vector), up_vector, -eye_vector], axis=-1
    )


def direction_to_rotation_matrix(direction: Array, eps: float = 1e-8) -> Array:
    """Camera rotation from a viewing direction alone (v1.2 API).

    Reconstructs ``NeRF.direction_to_rotation_matrix`` called at reference
    ``train_conditional_nerf.py:86-87`` (source absent at HEAD): normalize
    the direction, derive the in-plane up vector as the projection of world
    +z orthogonal to the direction, then apply ``get_rotation_matrix``.
    Degenerate straight-up/down viewing directions fall back to +y as up.
    """
    d = direction / jnp.maximum(
        eps, jnp.linalg.norm(direction, axis=-1, keepdims=True)
    )
    world_up = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=d.dtype), d.shape
    )
    up = world_up - d * jnp.sum(d * world_up, axis=-1, keepdims=True)
    up_norm = jnp.linalg.norm(up, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], dtype=d.dtype), d.shape
    )
    up = jnp.where(up_norm > eps, up / jnp.maximum(eps, up_norm), fallback)
    return get_rotation_matrix(d, up)


def rays_to_world_coordinates(
    rays: Array, camera_o: Array, camera_r: Array
) -> Tuple[Array, Array]:
    """Transform camera-frame ray directions into world coordinates.

    Mirrors reference ``model.py:336-367``: origins pass through; directions
    are rotated, ``d_world = R @ d_cam`` expressed as the same broadcasted
    multiply-sum the reference uses.
    """
    rays_d = jnp.sum(camera_r * rays[..., None, :], axis=-1)
    return camera_o, rays_d


def pose_to_rays(
    pose_o: Array,
    pose_r: Array,
    image_h: int,
    image_w: int,
    focal_length: float,
) -> Tuple[Array, Array]:
    """Full-image world-space ray grid for a batch of camera poses.

    Mirrors the broadcast logic at reference ``model.py:727-746``:
    ``pose_o [B, 3]``, ``pose_r [B, 3, 3]`` -> ``rays_o, rays_d`` each
    ``[B, H, W, 3]``.
    """
    rays = generate_rays(image_h, image_w, focal_length, dtype=pose_o.dtype)
    batch = pose_o.shape[0]
    rays = jnp.broadcast_to(rays[None], (batch, image_h, image_w, 3))
    camera_o = jnp.broadcast_to(
        pose_o[:, None, None, :], (batch, image_h, image_w, 3)
    )
    camera_r = jnp.broadcast_to(
        pose_r[:, None, None, :, :], (batch, image_h, image_w, 3, 3)
    )
    return rays_to_world_coordinates(rays, camera_o, camera_r)


def ndc_rays(
    rays_o: Array,
    rays_d: Array,
    image_h: int,
    image_w: int,
    focal_length: float,
    near: float = 1.0,
) -> Tuple[Array, Array]:
    """Shift rays to normalized device coordinates (LLFF forward-facing).

    Framework extra (no reference counterpart; NeRF paper appendix C).
    Assumes OpenGL convention (camera looks along -z).  Rays are first
    advanced to the near plane, then warped so the frustum becomes the cube
    ``[-1, 1]^3`` with t in [0, 1] covering near..infinity.
    """
    # Shift ray origins to the near plane.
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -focal_length / (0.5 * image_w) * ox / oz
    o1 = -focal_length / (0.5 * image_h) * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = -focal_length / (0.5 * image_w) * (dx / dz - ox / oz)
    d1 = -focal_length / (0.5 * image_h) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return (
        jnp.stack([o0, o1, o2], axis=-1),
        jnp.stack([d0, d1, d2], axis=-1),
    )
