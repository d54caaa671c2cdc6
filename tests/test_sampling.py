"""Sampler tests: reference parity for the log-bbox scheme, statistical
oracles for stratified jitter and the inverse-CDF hierarchical sampler."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.ops import sampling


class TestLogBboxSampler:
    def test_deterministic_parity_with_reference(self, reference_nerf):
        # Reference NeRF.sample_along_rays with randomly_sample=False
        # (model.py:369-435): 2^linspace(-9.436.., 0, S) * bbox diagonal.
        import torch

        model = reference_nerf.NeRF()
        rays_o = torch.zeros(5, 3)
        rays_d = torch.ones(5, 3)
        with torch.no_grad():
            ref = model.sample_along_rays(rays_o, rays_d, 64,
                                          randomly_sample=False)
        diag = np.sqrt(3 * 40.0 ** 2)
        ours = sampling.sample_log_bbox(None, (5,), 64, diag,
                                        randomly_sample=False)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5)
        # Survey-verified near/far: ~0.1 and ~69.28 world units.
        assert abs(float(ours[0, 0]) - 0.1) < 1e-3
        assert abs(float(ours[0, -1]) - 69.282) < 1e-2

    def test_jitter_stays_in_bins(self):
        key = jax.random.PRNGKey(0)
        det = sampling.sample_log_bbox(None, (256,), 64, 69.28,
                                       randomly_sample=False)
        jit = sampling.sample_log_bbox(key, (256,), 64, 69.28,
                                       randomly_sample=True)
        mids = 0.5 * (det[..., 1:] + det[..., :-1])
        lower = np.concatenate([det[..., :1], mids], -1)
        upper = np.concatenate([mids, det[..., -1:]], -1)
        assert np.all(np.asarray(jit) >= np.asarray(lower) - 1e-5)
        assert np.all(np.asarray(jit) <= np.asarray(upper) + 1e-5)


class TestLinearSampler:
    def test_deterministic_grid(self):
        t = sampling.sample_linear(None, (3,), 5, 2.0, 6.0,
                                   randomly_sample=False)
        np.testing.assert_allclose(t[0], [2.0, 3.0, 4.0, 5.0, 6.0], rtol=1e-6)

    def test_jitter_mean_is_uniform(self):
        key = jax.random.PRNGKey(1)
        t = sampling.sample_linear(key, (20000,), 8, 0.0, 1.0,
                                   randomly_sample=True)
        # Interior fenceposts jitter within +-half-bin of the linspace grid;
        # the endpoint bins are half-width so their means sit a quarter-bin
        # inward (bin i spans [mid(i-1,i), mid(i,i+1)] clamped at ends).
        grid = np.linspace(0.0, 1.0, 8)
        expect = grid.copy()
        half_bin = 0.5 / 7
        expect[0] += half_bin / 2
        expect[-1] -= half_bin / 2
        np.testing.assert_allclose(np.asarray(t).mean(0), expect, atol=5e-3)
        assert np.all(np.asarray(t) >= 0.0) and np.all(np.asarray(t) <= 1.0)


class TestSamplePDF:
    def test_uniform_weights_give_uniform_samples(self):
        key = jax.random.PRNGKey(2)
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4096, 9))
        weights = jnp.ones((4096, 8))
        s = sampling.sample_pdf(key, bins, weights, 64)
        hist, _ = np.histogram(np.asarray(s).ravel(), bins=8, range=(0, 1))
        freq = hist / hist.sum()
        np.testing.assert_allclose(freq, 1 / 8, atol=0.01)

    def test_concentrated_weights_concentrate_samples(self):
        key = jax.random.PRNGKey(3)
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (1024, 9))
        weights = jnp.zeros((1024, 8)).at[:, 3].set(100.0)
        s = np.asarray(sampling.sample_pdf(key, bins, weights, 32))
        in_bin = ((s >= 3 / 8) & (s <= 4 / 8)).mean()
        assert in_bin > 0.95

    def test_matches_empirical_histogram(self):
        # Statistical oracle from SURVEY §4: inverse-CDF sampler vs the
        # empirical histogram of a ragged target PDF.
        key = jax.random.PRNGKey(4)
        w = np.array([1.0, 4.0, 0.5, 2.0, 0.0, 3.0], dtype=np.float32)
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 7), (8192, 7))
        weights = jnp.broadcast_to(jnp.asarray(w), (8192, 6))
        s = np.asarray(sampling.sample_pdf(key, bins, weights, 16)).ravel()
        hist, _ = np.histogram(s, bins=6, range=(0, 1))
        freq = hist / hist.sum()
        expect = (w + 1e-5) / (w + 1e-5).sum()
        np.testing.assert_allclose(freq, expect, atol=0.01)

    def test_sorted_and_in_range(self):
        key = jax.random.PRNGKey(5)
        bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 64), (128, 64))
        weights = jax.random.uniform(key, (128, 63))
        s = np.asarray(sampling.sample_pdf(key, bins, weights, 128))
        assert np.all(np.diff(s, axis=-1) >= 0)
        assert s.min() >= 2.0 and s.max() <= 6.0

    def test_deterministic_mode_midpoints(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (2, 5))
        weights = jnp.ones((2, 4))
        s = np.asarray(sampling.sample_pdf(None, bins, weights, 4,
                                           randomly_sample=False))
        np.testing.assert_allclose(s[0], [0.125, 0.375, 0.625, 0.875],
                                   atol=1e-4)

    def test_u_rounding_to_one_stays_in_range(self, monkeypatch):
        # (S-1 + jitter)/S rounds to exactly 1.0 in f32 once jitter >=
        # 1 - S*2^-25 (~4e-6 per ray at S=128).  A u of 1.0 matches no
        # half-open cdf interval, and before the closed-top-edge fix the
        # mask contraction silently emitted t = 0.0 — outside [near,
        # far] — flipping merged interval lengths negative downstream
        # (the step-3350 NaN divergence; scripts/nan_hunt.py).
        orig_uniform = jax.random.uniform

        def ones_jitter(key, shape=(), dtype=float, **kw):
            return jnp.ones(shape, dtype) * (1.0 - 2.0**-26)

        monkeypatch.setattr(jax.random, "uniform", ones_jitter)
        try:
            bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 64), (32, 64))
            weights = jax.random.normal(jax.random.PRNGKey(0), (32, 63))
            weights = jnp.abs(weights) * 0.01
            s = np.asarray(
                sampling.sample_pdf(jax.random.PRNGKey(1), bins, weights, 128)
            )
        finally:
            monkeypatch.setattr(jax.random, "uniform", orig_uniform)
        # The top stratum's u rounds to 1.0 here; every sample must stay
        # inside the bin range and sorted.
        u_top = (127.0 + np.float32(1.0 - 2.0**-26)) / 128.0
        assert np.float32(u_top) == np.float32(1.0)  # the hazard is live
        assert s.min() >= 2.0 and s.max() <= 6.0
        assert np.all(np.diff(s, axis=-1) >= 0)
        assert np.all(np.isfinite(s))

    def test_jit_and_grad_safe(self):
        # Differentiable w.r.t. bins; static shapes under jit.
        key = jax.random.PRNGKey(6)
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (16, 9))
        weights = jnp.ones((16, 8))

        @jax.jit
        def f(b):
            return sampling.sample_pdf(key, b, weights, 8).sum()

        g = jax.grad(f)(bins)
        assert np.all(np.isfinite(np.asarray(g)))


class TestMergeSamples:
    def test_merge_is_sorted_union(self):
        c = jnp.asarray([[1.0, 3.0, 5.0]])
        f = jnp.asarray([[2.0, 4.0]])
        m = np.asarray(sampling.merge_samples(c, f))
        np.testing.assert_allclose(m[0], [1.0, 2.0, 3.0, 4.0, 5.0])


class TestTpuFriendlySamplers:
    """The gather/sort-free hierarchical path (see sampling.py notes)."""

    def test_sample_pdf_output_is_sorted(self):
        key = jax.random.PRNGKey(3)
        bins = jnp.sort(jax.random.uniform(key, (16, 65)), axis=-1) * 4 + 2
        w = jax.random.uniform(jax.random.fold_in(key, 1), (16, 64))
        t = sampling.sample_pdf(jax.random.fold_in(key, 2), bins, w, 128)
        assert bool(jnp.all(jnp.diff(t, axis=-1) >= 0))

    def test_merge_samples_equals_sort(self):
        key = jax.random.PRNGKey(4)
        c = jnp.sort(jax.random.uniform(key, (32, 64)), axis=-1)
        f = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1), (32, 128)),
                     axis=-1)
        merged = sampling.merge_samples(c, f)
        ref = jnp.sort(jnp.concatenate([c, f], axis=-1), axis=-1)
        np.testing.assert_allclose(merged, ref, rtol=0, atol=0)

    def test_merge_samples_with_ties(self):
        c = jnp.asarray([[1.0, 2.0, 3.0]])
        f = jnp.asarray([[2.0, 2.0, 4.0]])
        merged = sampling.merge_samples(c, f)
        np.testing.assert_allclose(merged, [[1.0, 2.0, 2.0, 2.0, 3.0, 4.0]])
