"""Encoder math: closed-form oracles + parity with the reference (torch CPU).

Test strategy per SURVEY.md §4: unit tests with closed-form/Monte-Carlo
oracles, plus golden parity against the reference executed as an oracle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_tpu.ops import encoding


def torch_t(x):
    import torch

    return torch.as_tensor(np.asarray(x))


class TestExpectedSin:
    def test_monte_carlo_oracle(self, rng):
        x = rng.normal(size=(64,)).astype(np.float32)
        var = rng.uniform(0.01, 2.0, size=(64,)).astype(np.float32)
        y, y_var = encoding.expected_sin(jnp.asarray(x), jnp.asarray(var))
        z = x[None] + rng.normal(size=(200_000, 64)) * np.sqrt(var)[None]
        mc_mean = np.sin(z).mean(0)
        mc_var = np.sin(z).var(0)
        np.testing.assert_allclose(y, mc_mean, atol=5e-3)
        np.testing.assert_allclose(y_var, mc_var, atol=5e-3)

    def test_zero_variance_is_sin(self):
        x = jnp.linspace(-3.0, 3.0, 17)
        y, y_var = encoding.expected_sin(x, jnp.zeros_like(x))
        np.testing.assert_allclose(y, np.sin(x), rtol=1e-6)
        np.testing.assert_allclose(y_var, 0.0, atol=1e-6)

    def test_parity_with_reference(self, reference_nerf, rng):
        x = rng.normal(size=(8, 5)).astype(np.float32)
        var = rng.uniform(0, 1, size=(8, 5)).astype(np.float32)
        ours = encoding.expected_sin(jnp.asarray(x), jnp.asarray(var))
        ref = reference_nerf.expected_sin(torch_t(x), torch_t(var))
        np.testing.assert_allclose(ours[0], ref[0].numpy(), rtol=1e-6)
        np.testing.assert_allclose(ours[1], ref[1].numpy(), rtol=1e-5, atol=1e-7)


class TestConeGaussians:
    def test_lift_gaussian_parity(self, reference_nerf, rng):
        d = rng.normal(size=(6, 3)).astype(np.float32)
        t_mean = rng.uniform(1, 5, size=(6, 4)).astype(np.float32)
        t_var = rng.uniform(0.01, 0.5, size=(6, 4)).astype(np.float32)
        r_var = rng.uniform(0.01, 0.5, size=(6, 4)).astype(np.float32)
        mean, cov = encoding.lift_gaussian(
            jnp.asarray(d), jnp.asarray(t_mean), jnp.asarray(t_var),
            jnp.asarray(r_var), diag=True,
        )
        rm, rc = reference_nerf.lift_gaussian(
            torch_t(d), torch_t(t_mean), torch_t(t_var), torch_t(r_var), True
        )
        np.testing.assert_allclose(mean, rm.numpy(), rtol=1e-6)
        np.testing.assert_allclose(cov, rc.numpy(), rtol=1e-5, atol=1e-7)

    def test_full_covariance_diag_consistency(self, rng):
        # The reference's diag=False branch is broken (jnp.eye NameError,
        # SURVEY §2.4.1); ours must work and its diagonal must equal the
        # diag=True path.
        d = rng.normal(size=(4, 3)).astype(np.float32)
        t_mean = rng.uniform(1, 5, size=(4, 2)).astype(np.float32)
        t_var = rng.uniform(0.01, 0.5, size=(4, 2)).astype(np.float32)
        r_var = rng.uniform(0.01, 0.5, size=(4, 2)).astype(np.float32)
        _, cov_diag = encoding.lift_gaussian(
            jnp.asarray(d), jnp.asarray(t_mean), jnp.asarray(t_var),
            jnp.asarray(r_var), diag=True,
        )
        _, cov_full = encoding.lift_gaussian(
            jnp.asarray(d), jnp.asarray(t_mean), jnp.asarray(t_var),
            jnp.asarray(r_var), diag=False,
        )
        np.testing.assert_allclose(
            np.diagonal(cov_full, axis1=-2, axis2=-1), cov_diag, rtol=1e-5,
            atol=1e-7,
        )

    def test_conical_frustum_stable_vs_unstable(self, rng):
        # The stable closed form must agree with the exact moments when
        # t0/t1 are well separated from 0 (reference model.py:74-86 provides
        # both forms — the built-in cross-check from SURVEY §4).
        d = rng.normal(size=(5, 3)).astype(np.float64)
        t0 = rng.uniform(1.0, 3.0, size=(5, 8)).astype(np.float64)
        t1 = t0 + rng.uniform(0.1, 0.5, size=(5, 8)).astype(np.float64)
        with jax.enable_x64(True):
            m_s, c_s = encoding.conical_frustum_to_gaussian(
                jnp.asarray(d), jnp.asarray(t0), jnp.asarray(t1), 0.01,
                stable=True,
            )
            m_u, c_u = encoding.conical_frustum_to_gaussian(
                jnp.asarray(d), jnp.asarray(t0), jnp.asarray(t1), 0.01,
                stable=False,
            )
        np.testing.assert_allclose(m_s, m_u, rtol=1e-6)
        np.testing.assert_allclose(c_s, c_u, rtol=1e-4, atol=1e-10)

    def test_conical_parity(self, reference_nerf, rng):
        d = rng.normal(size=(5, 3)).astype(np.float32)
        t0 = rng.uniform(1.0, 3.0, size=(5, 8)).astype(np.float32)
        t1 = t0 + rng.uniform(0.1, 0.5, size=(5, 8)).astype(np.float32)
        m, c = encoding.conical_frustum_to_gaussian(
            jnp.asarray(d), jnp.asarray(t0), jnp.asarray(t1), 0.01
        )
        rm, rc = reference_nerf.conical_frustum_to_gaussian(
            torch_t(d), torch_t(t0), torch_t(t1), 0.01, True
        )
        np.testing.assert_allclose(m, rm.numpy(), rtol=1e-5)
        np.testing.assert_allclose(c, rc.numpy(), rtol=1e-4, atol=1e-8)

    def test_cylinder_parity(self, reference_nerf, rng):
        d = rng.normal(size=(5, 3)).astype(np.float32)
        t0 = rng.uniform(1.0, 3.0, size=(5, 8)).astype(np.float32)
        t1 = t0 + rng.uniform(0.1, 0.5, size=(5, 8)).astype(np.float32)
        m, c = encoding.cylinder_to_gaussian(
            jnp.asarray(d), jnp.asarray(t0), jnp.asarray(t1), 0.01
        )
        # The reference needs a tensor radius here (a python float crashes in
        # its lift_gaussian at r_var[..., None]).
        rm, rc = reference_nerf.cylinder_to_gaussian(
            torch_t(d), torch_t(t0), torch_t(t1),
            torch_t(np.float32(0.01)), True,
        )
        np.testing.assert_allclose(m, rm.numpy(), rtol=1e-5)
        np.testing.assert_allclose(c, rc.numpy(), rtol=1e-5, atol=1e-8)

    def test_cast_rays_parity(self, reference_nerf, rng):
        t_vals = np.sort(rng.uniform(1, 6, size=(7, 9)).astype(np.float32), -1)
        o = rng.normal(size=(7, 3)).astype(np.float32)
        d = rng.normal(size=(7, 3)).astype(np.float32)
        m, c = encoding.cast_rays(
            jnp.asarray(t_vals), jnp.asarray(o), jnp.asarray(d), 0.005, "cone"
        )
        rm, rc = reference_nerf.cast_rays(
            torch_t(t_vals), torch_t(o), torch_t(d), 0.005, "cone"
        )
        assert m.shape == (7, 8, 3)
        np.testing.assert_allclose(m, rm.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(c, rc.numpy(), rtol=1e-4, atol=1e-8)


class TestIntegratedPosEnc:
    def test_parity_and_shape(self, reference_nerf, rng):
        means = rng.normal(size=(4, 8, 3)).astype(np.float32)
        covs = rng.uniform(0, 0.1, size=(4, 8, 3)).astype(np.float32)
        ours = encoding.integrated_pos_enc(
            jnp.asarray(means), jnp.asarray(covs), -4, 12
        )
        ref = reference_nerf.integrated_pos_enc(
            (torch_t(means), torch_t(covs)), -4, 12
        )
        assert ours.shape == (4, 8, 96)  # 2 * 3 * 16 per SURVEY §2.1 #16
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_zero_cov_matches_plain_sinusoids(self):
        means = jnp.asarray([[0.3, -0.2, 0.15]])
        covs = jnp.zeros((1, 3))
        out = encoding.integrated_pos_enc(means, covs, 0, 2)
        scales = np.array([1.0, 2.0])
        y = (means[..., None, :] * scales[:, None]).reshape(1, -1)
        expected = np.concatenate([np.sin(y), np.sin(y + np.pi / 2)], -1)
        np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-7)


class TestFrequencyEncoding:
    def test_bbox_scales_match_reference_formula(self):
        # reference model.py:216-224 with bbox max-abs = 6.0, size = 20.
        scales = encoding.bbox_frequency_scales(20, 6.0)
        start = -np.log2(6.0)
        expect = 2.0 ** np.linspace(start, start + 9.0, 10) * np.pi / 2
        np.testing.assert_allclose(scales, expect.astype(np.float32), rtol=1e-6)

    def test_parity_with_reference_positional_encoding(self, reference_nerf, rng):
        # The surviving HEAD NeRF.positional_encoding (model.py:197-240) is
        # the v1.2 encoder's descendant; golden-check our layout against it.
        import torch

        model = reference_nerf.NeRF(
            min_x=-6.0, max_x=6.0, min_y=-6.0, max_y=6.0, min_z=-6.0, max_z=6.0
        )
        x = rng.normal(size=(4, 7, 3)).astype(np.float32)
        cov = rng.uniform(0, 0.1, size=(4, 7, 3)).astype(np.float32)
        with torch.no_grad():
            ref = model.positional_encoding(torch_t(x), torch_t(cov), 20)
        scales = encoding.bbox_frequency_scales(20, 6.0)
        ours = encoding.frequency_encoding(jnp.asarray(x), scales)
        assert ours.shape == (4, 7, 60)
        # f32 sin() range reduction differs between XLA and libm at large
        # arguments (highest frequency * |x| ~ 120 rad), so the torch
        # comparison is loose...
        np.testing.assert_allclose(ours, ref.numpy(), atol=5e-3)
        # ...and the tight check is against an exact float64 numpy oracle
        # with the same layout: per-scalar [sin(x f0..fL), cos(x f0..fL)].
        s64 = 2.0 ** np.linspace(-np.log2(6.0), -np.log2(6.0) + 9.0, 10)
        s64 = s64 * np.pi / 2
        xf = x.astype(np.float64)[..., :, None] * s64
        expect = np.concatenate([np.sin(xf), np.cos(xf)], -1).reshape(4, 7, 60)
        np.testing.assert_allclose(ours, expect, atol=2e-4)

    def test_attenuated_encoding_damps_high_freqs(self, rng):
        x = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        var = jnp.full((5, 3), 10.0)
        scales = encoding.bbox_frequency_scales(20, 1.0)
        plain = encoding.frequency_encoding(x, scales)
        att = encoding.attenuated_frequency_encoding(x, var, scales)
        assert np.all(np.abs(att) <= np.abs(plain) + 1e-6)
        # Highest frequency should be crushed to ~0.
        assert np.abs(np.asarray(att)).reshape(5, 3, 20)[..., 9].max() < 1e-4
