"""Data layer: ray-bank parity with the reference datasets + samplers."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.data import RayBank, synthesize_scene
from nerf_tpu.data.scenes import render_ground_truth, spherical_poses


class TestRayBank:
    def _make(self, rng, b=3, h=10, w=12, with_states=False):
        images = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
        pose_o, pose_r = spherical_poses(b, radius=4.0)
        states = (
            rng.normal(size=(b, 5)).astype(np.float32) if with_states else None
        )
        bank = RayBank.from_images(
            images, pose_o, pose_r, 20.0, states_x=states
        )
        return bank, images, pose_o, pose_r

    def test_ray_parity_with_reference_dataset(self, reference_nerf, rng):
        # PixelRayDataset computes world rays per pixel (dataset.py:246-316);
        # our bank must produce identical rays_o/rays_d/pixels per index.
        import torch

        from nerf.dataset import PixelRayDataset

        bank, images, pose_o, pose_r = self._make(rng)
        b, h, w = images.shape[:3]
        poses = np.zeros((b, 3, 4), np.float32)
        poses[:, :3, :3] = np.asarray(pose_r)
        poses[:, :3, 3] = np.asarray(pose_o)
        seg = np.zeros((b, h, w), np.int64)
        ds = PixelRayDataset(
            torch.as_tensor(images), torch.as_tensor(seg),
            torch.as_tensor(poses), 20.0,
        )
        for idx in [0, 17, b * h * w - 1]:
            item = ds[idx]
            got = bank.gather(jnp.asarray([idx]))
            np.testing.assert_allclose(
                got["rays_o"][0], item["rays_o"].numpy(), rtol=1e-5, atol=1e-6
            )
            np.testing.assert_allclose(
                got["rays_d"][0], item["rays_d"].numpy(), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                got["pixels"][0], item["pixels"].numpy(), rtol=1e-6
            )

    def test_sample_batch_shapes_and_jit(self, rng):
        bank, *_ = self._make(rng, with_states=True)

        @jax.jit
        def draw(key):
            return bank.sample_batch(key, 64)

        batch = draw(jax.random.PRNGKey(0))
        assert batch["rays_o"].shape == (64, 3)
        assert batch["pixels"].shape == (64, 3)
        assert batch["states_x"].shape == (64, 5)
        batch2 = draw(jax.random.PRNGKey(1))
        assert not np.allclose(batch["rays_o"], batch2["rays_o"])

    def test_block_stratified_covers_all_blocks(self, rng):
        bank, images, *_ = self._make(rng, b=2, h=16, w=16)
        batch = bank.sample_block_stratified(
            jax.random.PRNGKey(0), jnp.asarray(1),
            num_vertical_blocks=4, num_horizontal_blocks=4,
            num_samples_per_block=3,
        )
        hi = np.asarray(batch["image_hi"])
        wi = np.asarray(batch["image_wi"])
        assert hi.shape == (48,)
        # every block of the 4x4 grid is hit exactly 3 times
        block_ids = (hi // 4) * 4 + (wi // 4)
        counts = np.bincount(block_ids, minlength=16)
        np.testing.assert_array_equal(counts, 3)
        # pixels come from image 1
        flat = (1 * 16 + hi) * 16 + wi
        np.testing.assert_allclose(
            batch["pixels"], images.reshape(-1, 3)[flat], rtol=1e-6
        )

    def test_block_stratified_matches_reference_decode(
        self, reference_nerf, rng
    ):
        """Oracle pin of the reference block-id decode semantics
        (``dataset.py:134-153``): each __getitem__ draws
        ``num_samples_per_block`` uniform in-block flat indices per block
        (the [K, nv*nh] multinomial, column b = block b) and decodes them
        row-major — ``wx = j % hbs + (b % nh) * hbs``,
        ``hx = j // hbs + (b // nh) * vbs``.  Verified by running the
        reference and inverting the decode from its outputs; then our
        ``sample_block_stratified`` is held to the identical contract AND
        the same within-block uniform distribution."""
        import torch

        from nerf.dataset import ImageRayDataset

        b, h, w = 2, 16, 16
        nv = nh = 4
        vbs, hbs = h // nv, w // nh
        k = 3
        images = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
        pose_o, pose_r = spherical_poses(b, radius=4.0)
        poses = np.zeros((b, 3, 4), np.float32)
        poses[:, :3, :3] = np.asarray(pose_r)
        poses[:, :3, 3] = np.asarray(pose_o)
        states = np.zeros((b, 1), np.float32)

        ds = ImageRayDataset(
            torch.as_tensor(images), torch.as_tensor(poses),
            torch.as_tensor(states), 20.0,
            num_vertical_blocks=nv, num_horizontal_blocks=nh,
            num_samples_per_block=k,
        )

        def ref_inblock(item):
            """Invert the reference decode: per (sample, block) the
            recovered in-block flat index must round-trip."""
            hi = item["image_hi"].numpy()  # [K, nv*nh]
            wi = item["image_wi"].numpy()
            assert hi.shape == (k, nv * nh)
            block = np.arange(nv * nh)
            bh = (block // nh) * vbs
            bw = (block % nh) * hbs
            # Every sample of column b must land inside block b.
            assert ((hi >= bh) & (hi < bh + vbs)).all()
            assert ((wi >= bw) & (wi < bw + hbs)).all()
            return (hi - bh) * hbs + (wi - bw)  # in-block flat index

        torch.manual_seed(0)
        ref_counts = np.zeros((nv * nh, vbs * hbs), np.int64)
        for _ in range(200):
            j = ref_inblock(ds[0])
            for col in range(nv * nh):
                ref_counts[col] += np.bincount(
                    j[:, col], minlength=vbs * hbs
                )

        got_counts = np.zeros_like(ref_counts)
        bank = RayBank.from_images(images, pose_o, pose_r, 20.0)
        for i in range(200):
            batch = bank.sample_block_stratified(
                jax.random.PRNGKey(i), jnp.asarray(0),
                num_vertical_blocks=nv, num_horizontal_blocks=nh,
                num_samples_per_block=k,
            )
            hi = np.asarray(batch["image_hi"]).reshape(k, nv * nh)
            wi = np.asarray(batch["image_wi"]).reshape(k, nv * nh)
            block = np.arange(nv * nh)
            bh, bw = (block // nh) * vbs, (block % nh) * hbs
            # Identical contract: column b in block b (row-major decode).
            assert ((hi >= bh) & (hi < bh + vbs)).all()
            assert ((wi >= bw) & (wi < bw + hbs)).all()
            j = (hi - bh) * hbs + (wi - bw)
            for col in range(nv * nh):
                got_counts[col] += np.bincount(
                    j[:, col], minlength=vbs * hbs
                )

        # Same distribution: uniform over the block's pixels.  600 draws
        # per block over 16 cells -> expect 37.5 per cell; compare both
        # samplers' per-cell frequencies to uniform AND to each other.
        n_draws = 200 * k
        for counts in (ref_counts, got_counts):
            freq = counts / n_draws
            assert np.abs(freq - 1.0 / (vbs * hbs)).max() < 0.04
        assert np.abs(ref_counts / n_draws - got_counts / n_draws).max() < 0.06

    def test_iter_epoch_exact_coverage(self, rng):
        bank, *_ = self._make(rng, b=1, h=8, w=8)
        seen = []
        for batch in bank.iter_epoch(seed=0, batch_size=16):
            seen.append(np.asarray(batch["pixels"]))
        assert len(seen) == 4  # 64 rays / 16
        all_px = np.concatenate(seen)
        np.testing.assert_allclose(
            np.sort(all_px.ravel()),
            np.sort(np.asarray(bank.pixels).ravel()),
            rtol=1e-6,
        )


class TestSyntheticScene:
    def test_views_differ_and_are_bounded(self):
        scene = synthesize_scene(num_views=4, image_hw=24, num_samples=128)
        imgs = np.asarray(scene.images)
        assert imgs.shape == (4, 24, 24, 3)
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0
        # asymmetric scene: distinct views must differ
        assert np.abs(imgs[0] - imgs[1]).max() > 0.05

    def test_quadrature_converges(self):
        # Ground truth must be quadrature-converged: doubling samples
        # changes pixels by < 1e-3.
        pose_o, pose_r = spherical_poses(1)
        from nerf_tpu.ops import cameras

        ro, rd = cameras.pose_to_rays(pose_o, pose_r, 16, 16, 20.0)
        ro, rd = ro.reshape(-1, 3), rd.reshape(-1, 3)
        rgb1, _ = render_ground_truth(ro, rd, num_samples=512)
        rgb2, _ = render_ground_truth(ro, rd, num_samples=1024)
        assert float(jnp.abs(rgb1 - rgb2).max()) < 1e-3

    def test_labels_present_and_valid(self):
        scene = synthesize_scene(
            num_views=2, image_hw=16, num_samples=128, with_labels=True
        )
        labels = np.asarray(scene.labels)
        assert labels.shape == (2, 16, 16)
        assert labels.min() >= 0 and labels.max() <= 5
        assert (labels > 0).any()  # some foreground
