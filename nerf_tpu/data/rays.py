"""Device-resident ray bank: the TPU-native replacement for the reference's
``torch.utils.data`` pipeline (``/root/reference/nerf/dataset.py``).

The reference materializes one Python object per pixel through
``PixelRayDataset.__getitem__`` (``dataset.py:246-316``) and pays host-side
DataLoader collation every step.  On TPU the right design is: precompute
every ray/pixel once into flat device arrays (the camera-frame ray grid is
already cached once in the reference, ``dataset.py:227-229``), then draw
training batches as jitted random gathers — zero host involvement per step.

* ``RayBank.from_images``      ~ ``PixelRayDataset.__init__`` semantics
  (world-space rays per pixel from poses + focal; per-pixel labels/states).
* ``RayBank.sample_batch``     ~ ``DataLoader(batch_size, shuffle=True)``:
  uniform-with-replacement pixel sampling, under ``jit``.
* ``RayBank.sample_block_stratified`` ~ ``ImageRayDataset.__getitem__``
  (``dataset.py:96-172``): per-image stratified sampling over an
  ``nv x nh`` block grid, K rays per block.
* ``RayBank.iter_epoch``       — host-side permutation iterator for exact
  once-per-epoch coverage (the DataLoader's other contract).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.ops import cameras

Array = jax.Array


@dataclasses.dataclass
class RayBank:
    """Flat device-resident arrays of all training rays.

    All fields have leading dim ``N = B * H * W`` except the per-image
    ``states_*`` tables (gathered through ``image_index``).
    """

    rays_o: Array  # [N, 3] world-space origins
    rays_d: Array  # [N, 3] world-space directions
    pixels: Array  # [N, 3] ground-truth colors
    labels: Optional[Array]  # [N] int segmentation labels, or None
    image_index: Array  # [N] which image each ray came from
    states_x: Optional[Array]  # [B, Kx] per-scene latents, or None
    states_d: Optional[Array]  # [B, Kd]
    image_shape: tuple  # (B, H, W)
    focal_length: float

    @property
    def num_rays(self) -> int:
        return self.rays_o.shape[0]

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_images(
        images,
        poses_o,
        poses_r,
        focal_length: float,
        labels=None,
        states_x=None,
        states_d=None,
        use_ndc: bool = False,
        ndc_near: float = 1.0,
    ) -> "RayBank":
        """Build the bank from ``[B, H, W, 3]`` images and camera poses.

        ``poses_o [B, 3]`` / ``poses_r [B, 3, 3]`` mirror the pose split at
        reference ``dataset.py:308`` (``pose[:3, 3]`` / ``pose[:3, :3]``).
        ``use_ndc`` warps rays to normalized device coordinates for
        forward-facing (LLFF-style) scenes; train such models with linear
        sampling on ``near=0, far=1``.
        """
        images = jnp.asarray(images)
        poses_o = jnp.asarray(poses_o)
        poses_r = jnp.asarray(poses_r)
        b, h, w = images.shape[:3]

        rays_o, rays_d = cameras.pose_to_rays(
            poses_o, poses_r, h, w, focal_length
        )
        if use_ndc:
            rays_o, rays_d = cameras.ndc_rays(
                rays_o, rays_d, h, w, focal_length, near=ndc_near
            )
        n = b * h * w
        return RayBank(
            rays_o=rays_o.reshape(n, 3),
            rays_d=rays_d.reshape(n, 3),
            pixels=images.reshape(n, images.shape[-1]),
            labels=(
                jnp.asarray(labels).reshape(n) if labels is not None else None
            ),
            image_index=jnp.repeat(jnp.arange(b), h * w),
            states_x=jnp.asarray(states_x) if states_x is not None else None,
            states_d=jnp.asarray(states_d) if states_d is not None else None,
            image_shape=(b, h, w),
            focal_length=float(focal_length),
        )

    # -- batch sampling (jit-safe) ----------------------------------------

    def gather(self, idx: Array) -> Dict[str, Array]:
        """Gather a batch dict by flat ray index (device-side)."""
        batch = {
            "rays_o": self.rays_o[idx],
            "rays_d": self.rays_d[idx],
            "pixels": self.pixels[idx],
        }
        if self.labels is not None:
            batch["labels"] = self.labels[idx]
        img_idx = self.image_index[idx]
        if self.states_x is not None:
            batch["states_x"] = self.states_x[img_idx]
        if self.states_d is not None:
            batch["states_d"] = self.states_d[img_idx]
        return batch

    def sample_batch(self, key: jax.Array, batch_size: int) -> Dict[str, Array]:
        """Uniform-with-replacement random batch (the shuffled-DataLoader
        analogue; jit-safe, static output shapes)."""
        idx = jax.random.randint(key, (batch_size,), 0, self.num_rays)
        return self.gather(idx)

    def sample_block_stratified(
        self,
        key: jax.Array,
        image_id: Array,
        num_vertical_blocks: int = 8,
        num_horizontal_blocks: int = 8,
        num_samples_per_block: int = 2,
    ) -> Dict[str, Array]:
        """Block-stratified sampling from one image.

        Mirrors ``ImageRayDataset.__getitem__`` (``dataset.py:96-172``):
        the image is split into an ``nv x nh`` grid; ``K`` rays are drawn
        uniformly from every block, giving ``K * nv * nh`` rays with
        guaranteed spatial coverage.  Returned flat, jit-safe.
        """
        b, h, w = self.image_shape
        vbs = h // num_vertical_blocks
        hbs = w // num_horizontal_blocks
        n_blocks = num_vertical_blocks * num_horizontal_blocks
        k = num_samples_per_block

        # Uniform position inside each block, for each (block, sample).
        block_ray_idx = jax.random.randint(
            key, (k, n_blocks), 0, vbs * hbs
        )
        block_idx = jnp.arange(n_blocks)[None, :]
        block_wx = block_ray_idx % hbs
        image_wi = block_wx + (block_idx % num_horizontal_blocks) * hbs
        block_hx = block_ray_idx // hbs
        image_hi = block_hx + (block_idx // num_horizontal_blocks) * vbs

        flat = (image_id * h + image_hi) * w + image_wi
        batch = self.gather(flat.reshape(-1))
        batch["image_hi"] = image_hi.reshape(-1)
        batch["image_wi"] = image_wi.reshape(-1)
        return batch

    # -- epoch iteration (host-side) --------------------------------------

    def iter_epoch(
        self, seed: int, batch_size: int, drop_last: bool = True
    ) -> Iterator[Dict[str, Array]]:
        """Exact-coverage epoch iterator (host permutation, device gathers).

        Matches the reference DataLoader's once-per-epoch contract; for the
        highest-throughput path prefer ``sample_batch`` inside the jitted
        train step.
        """
        perm = np.random.default_rng(seed).permutation(self.num_rays)
        stop = (
            self.num_rays - self.num_rays % batch_size
            if drop_last
            else self.num_rays
        )
        for start in range(0, stop, batch_size):
            yield self.gather(jnp.asarray(perm[start : start + batch_size]))
