"""Datasets: tiny_nerf-format loading and an analytic synthetic scene.

The reference's canonical data is ``tiny_nerf_data.npz`` (images [B,H,W,3],
poses [B,4,4], focal) loaded in ``examples/example.ipynb`` cell 3 — but the
blob is stripped from the repo (``.MISSING_LARGE_BLOBS``) and this
environment has zero egress.  So the framework provides:

* ``load_tiny_nerf``     — the npz format loader (works if a user supplies
  the file), returning the same ``(images, pose_o, pose_r, focal)`` split
  the reference uses (``dataset.py:308``: ``pose[:3, 3]`` / ``pose[:3, :3]``).
* ``synthesize_scene``   — a procedural stand-in: an analytic
  emission-absorption volume (colored Gaussian blobs) rendered to ground
  truth by brute-force quadrature of the *same* volume-rendering equation
  the models learn.  Quadrature at high sample count converges to the true
  integral, so PSNR-vs-steps behaves like real NeRF data and end-to-end
  training is fully testable offline (SURVEY.md §4 "synthesize fixtures").
* ``spherical_poses``    — tiny_nerf-style cameras on a sphere looking at
  the origin.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from nerf_tpu.ops import cameras, compositing

Array = jax.Array


class SceneData(NamedTuple):
    images: Array  # [B, H, W, 3]
    pose_o: Array  # [B, 3]
    pose_r: Array  # [B, 3, 3]
    focal: float
    labels: Optional[Array] = None  # [B, H, W] int labels or None
    states_x: Optional[Array] = None  # [B, Kx] per-scene latents or None
    states_d: Optional[Array] = None  # [B, Kd]


def load_tiny_nerf(path: str) -> SceneData:
    """Load the tiny_nerf npz (images/poses/focal) into our pose split."""
    data = np.load(path)
    images = jnp.asarray(data["images"], jnp.float32)
    poses = np.asarray(data["poses"], np.float32)
    return SceneData(
        images=images,
        pose_o=jnp.asarray(poses[:, :3, 3]),
        pose_r=jnp.asarray(poses[:, :3, :3]),
        focal=float(data["focal"]),
    )


def spherical_poses(
    num: int,
    radius: float = 4.0,
    elevation: float = 0.5,
    seed: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Cameras on a sphere looking at the origin (tiny_nerf style).

    Deterministic equal-spaced yaws by default; jittered when ``seed`` set.
    """
    if seed is None:
        yaw = np.linspace(0.0, 2 * np.pi, num, endpoint=False)
        el = np.full(num, elevation)
    else:
        rng = np.random.default_rng(seed)
        yaw = rng.uniform(0, 2 * np.pi, num)
        el = rng.uniform(0.2, 0.9, num)
    eye = np.asarray(
        cameras.spherical_to_cartesian(jnp.asarray(yaw), jnp.asarray(el))
    )
    pose_o = jnp.asarray(eye * radius, jnp.float32)
    # Look at the origin: viewing direction is -eye.
    pose_r = cameras.direction_to_rotation_matrix(-pose_o)
    return pose_o, pose_r


# ---------------------------------------------------------------------------
# Analytic volume
# ---------------------------------------------------------------------------

# A small asymmetric arrangement of colored Gaussian blobs.  Asymmetry
# matters: every view must look different or view-consistency isn't tested.
_BLOB_CENTERS = np.asarray(
    [
        [0.0, 0.0, 0.0],
        [0.7, 0.3, 0.2],
        [-0.5, 0.6, -0.3],
        [0.2, -0.7, 0.4],
        [-0.4, -0.4, -0.5],
    ],
    np.float32,
)
_BLOB_SIGMAS = np.asarray([0.45, 0.25, 0.3, 0.2, 0.25], np.float32)
_BLOB_DENSITY = np.asarray([8.0, 20.0, 15.0, 25.0, 18.0], np.float32)
_BLOB_COLORS = np.asarray(
    [
        [0.9, 0.8, 0.2],
        [0.9, 0.2, 0.2],
        [0.2, 0.5, 0.9],
        [0.2, 0.8, 0.3],
        [0.8, 0.3, 0.8],
    ],
    np.float32,
)


def scene_density_color(
    points: Array, field_offset=None
) -> Tuple[Array, Array, Array]:
    """Analytic density, color, and dominant-blob label at 3-D ``points``.

    density(x) = sum_k a_k exp(-|x - c_k|^2 / (2 s_k^2)); color is the
    density-weighted blob color; label is the argmax blob (id 1..K, 0 for
    empty space) for segmentation testing.
    """
    centers = jnp.asarray(_BLOB_CENTERS)
    if field_offset is not None:
        centers = centers + jnp.asarray(field_offset, centers.dtype)
    sigmas = jnp.asarray(_BLOB_SIGMAS)
    amps = jnp.asarray(_BLOB_DENSITY)
    colors = jnp.asarray(_BLOB_COLORS)

    d2 = jnp.sum(
        (points[..., None, :] - centers) ** 2, axis=-1
    )  # [..., K]
    per_blob = amps * jnp.exp(-0.5 * d2 / sigmas**2)
    density = jnp.sum(per_blob, axis=-1, keepdims=True)
    weights = per_blob / jnp.maximum(density[..., 0:1], 1e-8)
    color = weights @ colors
    label = jnp.where(
        density[..., 0] > 0.05, jnp.argmax(per_blob, axis=-1) + 1, 0
    )
    return density, color, label


def render_ground_truth(
    rays_o: Array,
    rays_d: Array,
    near: float = 2.0,
    far: float = 6.0,
    num_samples: int = 512,
    field_offset=None,
) -> Tuple[Array, Array]:
    """Brute-force quadrature of the volume rendering equation.

    Uses the identical compositing math the models are trained against
    (``ops/compositing.py``) at a sample count high enough to converge —
    the data-generating process IS the rendering model, so a correct
    learner can reach high PSNR.

    Returns ``(rgb [N, 3], label [N])`` where label is the dominant blob
    along the ray (by compositing weight) for segmentation targets.
    """
    t = jnp.linspace(near, far, num_samples, dtype=rays_o.dtype)
    t = jnp.broadcast_to(t, rays_o.shape[:-1] + (num_samples,))
    points = rays_o[..., None, :] + rays_d[..., None, :] * t[..., :, None]
    density, color, label = scene_density_color(points, field_offset)
    dists = compositing.distances_from_tvals(t, rays_d)
    weights = compositing.weights_from_density(density, dists)
    rgb = jnp.sum(weights * color, axis=-2)
    # Dominant label: composite one-hot labels, argmax.
    one_hot = jax.nn.one_hot(label, _BLOB_CENTERS.shape[0] + 1)
    label_probs = jnp.sum(weights * one_hot, axis=-2)
    # Background (label 0) gets the leftover transmittance.
    leftover = 1.0 - jnp.sum(weights, axis=-2)
    label_probs = label_probs.at[..., 0].add(leftover[..., 0])
    return rgb, jnp.argmax(label_probs, axis=-1)


def forward_facing_poses(
    num: int, spread: float = 0.15
) -> Tuple[Array, Array]:
    """LLFF-style forward-facing cameras: a small grid of positions on the
    plane ``z = 0`` all looking straight down ``-z`` (the OpenGL convention
    the NDC warp assumes; lateral offsets are small relative to the scene
    distance, as in real LLFF captures).  NDC pipeline, BASELINE.json
    config #5."""
    side = int(np.ceil(np.sqrt(num)))
    xs = np.linspace(-spread, spread, side)
    ys = np.linspace(-spread, spread, side)
    offsets = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    offsets = offsets[:num]
    pose_o = jnp.asarray(
        np.stack(
            [offsets[:, 0], offsets[:, 1], np.zeros(num)], -1
        ).astype(np.float32)
    )
    fwd = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, -1.0], jnp.float32), (num, 3)
    )
    pose_r = cameras.direction_to_rotation_matrix(fwd)
    return pose_o, pose_r


def synthesize_forward_facing(
    num_views: int = 9,
    image_hw: int = 48,
    focal: float = 60.0,
    distance: float = 4.0,
    near: float = 2.0,
    far: float = 6.5,
    num_samples: int = 512,
) -> SceneData:
    """Forward-facing synthetic dataset for the NDC training path.

    Cameras sit at z=0 looking down -z; the blob field is translated to
    z = -distance so the whole scene lies beyond the NDC near plane.
    """
    pose_o, pose_r = forward_facing_poses(num_views)
    rays_o, rays_d = cameras.pose_to_rays(
        pose_o, pose_r, image_hw, image_hw, focal
    )
    offset = (0.0, 0.0, -distance)
    rgb, _ = jax.jit(
        lambda o, d: render_ground_truth(
            o, d, near, far, num_samples, field_offset=offset
        )
    )(rays_o.reshape(-1, 3), rays_d.reshape(-1, 3))
    return SceneData(
        images=rgb.reshape(num_views, image_hw, image_hw, 3),
        pose_o=pose_o,
        pose_r=pose_r,
        focal=float(focal),
    )


def synthesize_scene(
    num_views: int = 8,
    image_hw: int = 64,
    focal: float = 80.0,
    radius: float = 4.0,
    near: float = 2.0,
    far: float = 6.0,
    num_samples: int = 512,
    with_labels: bool = False,
    pose_seed: Optional[int] = None,
) -> SceneData:
    """Generate a full synthetic dataset: images + poses + focal (+ labels)."""
    pose_o, pose_r = spherical_poses(num_views, radius, seed=pose_seed)
    rays_o, rays_d = cameras.pose_to_rays(
        pose_o, pose_r, image_hw, image_hw, focal
    )
    flat_o = rays_o.reshape(-1, 3)
    flat_d = rays_d.reshape(-1, 3)
    rgb, label = jax.jit(
        lambda o, d: render_ground_truth(o, d, near, far, num_samples)
    )(flat_o, flat_d)
    images = rgb.reshape(num_views, image_hw, image_hw, 3)
    labels = (
        label.reshape(num_views, image_hw, image_hw) if with_labels else None
    )
    return SceneData(
        images=images,
        pose_o=pose_o,
        pose_r=pose_r,
        focal=float(focal),
        labels=labels,
    )
