"""Fused union-compositing eval kernel (fused_hier.fine_union_eval_pallas):
the deterministic hierarchical-reuse render through the fused path must
match the XLA path (weights_from_unsorted + composite_*).

Runs in Pallas interpret mode on CPU.  Tolerances: the kernel evaluates
transmittance as exp(ladder-summed logs) and runs its cross-block sums as
Dekker-split MXU matmuls — ~1e-4 relative reassociation noise vs the XLA
cumsum/cumprod formulation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig


def _rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.5)
    rays_d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    return rays_o, rays_d


def _render_pair(cfg_kwargs, render, states=None, n=64):
    rays_o, rays_d = _rays(n)
    outs = {}
    for pallas in (False, True):
        cfg = ClassicNeRFConfig(
            normalize_position=6.0, use_pallas=pallas, **cfg_kwargs
        )
        model = ClassicNeRF(cfg)
        params = model.init(jax.random.PRNGKey(0))
        if pallas:
            assert model._use_fused_union(render, rays_o)
        kw = {}
        if states is not None:
            kw = dict(states_x=states[0], states_d=states[1])
        outs[pallas] = model.render_rays(
            params, None, rays_o, rays_d, render, fused_eval=pallas, **kw
        )
    return outs


class TestFusedUnionEval:
    def test_matches_xla_reuse_path(self):
        render = RenderConfig(
            num_coarse_samples=16, num_fine_samples=24, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0,
        )
        outs = _render_pair({}, render)
        np.testing.assert_allclose(
            np.asarray(outs[True].rgb), np.asarray(outs[False].rgb),
            rtol=5e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True].depth), np.asarray(outs[False].depth),
            rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True].acc), np.asarray(outs[False].acc),
            rtol=5e-4, atol=1e-4,
        )

    def test_white_background(self):
        render = RenderConfig(
            num_coarse_samples=16, num_fine_samples=24, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0,
            white_background=True,
        )
        outs = _render_pair({}, render)
        np.testing.assert_allclose(
            np.asarray(outs[True].rgb), np.asarray(outs[False].rgb),
            rtol=5e-4, atol=1e-4,
        )

    def test_latent_conditioned(self):
        rng = np.random.default_rng(5)
        states = (
            jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(64, 1)).astype(np.float32)),
        )
        render = RenderConfig(
            num_coarse_samples=8, num_fine_samples=16, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0,
        )
        outs = _render_pair(
            dict(density_inputs=5, color_inputs=4), render, states=states
        )
        # rtol 2e-3 (was 5e-4): the round-5 numpy-constant frequency
        # scales (encoding.frequency_scales_np) shifted every encoding
        # by ~1 ulp, which moved where the kernel-vs-XLA bf16 roundings
        # land; this config sat right at the old margin (1.1e-3 max).
        np.testing.assert_allclose(
            np.asarray(outs[True].rgb), np.asarray(outs[False].rgb),
            rtol=2e-3, atol=1e-4,
        )

    def test_no_viewdirs_matches_xla_reuse_path(self):
        # The no-view-branch architecture (BASELINE config #1 wording) runs
        # the fused union eval end to end too.
        render = RenderConfig(
            num_coarse_samples=16, num_fine_samples=24, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0,
        )
        outs = _render_pair(dict(use_viewdirs=False), render)
        np.testing.assert_allclose(
            np.asarray(outs[True].rgb), np.asarray(outs[False].rgb),
            rtol=5e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True].acc), np.asarray(outs[False].acc),
            rtol=5e-4, atol=1e-4,
        )

    def test_gate_excludes_noise(self):
        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=6.0, use_pallas=True)
        )
        rays_o, _ = _rays(8)
        noisy = RenderConfig(
            num_coarse_samples=8, num_fine_samples=8, density_noise_std=1.0
        )
        assert not model._use_fused_union(noisy, rays_o)
        ok = RenderConfig(
            num_coarse_samples=8, num_fine_samples=8, density_noise_std=0.0
        )
        assert model._use_fused_union(ok, rays_o)

    def test_render_image_matches(self):
        # End-to-end through the lax.map tiler (odd tile tail exercised
        # by rays_per_tile not dividing H*W).
        from nerf_tpu.data.scenes import spherical_poses

        pose_o, pose_r = spherical_poses(1, radius=4.0)
        render = RenderConfig(
            num_coarse_samples=8, num_fine_samples=8, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0, rays_per_tile=128,
        )
        imgs = {}
        for pallas in (False, True):
            cfg = ClassicNeRFConfig(normalize_position=6.0, use_pallas=pallas)
            model = ClassicNeRF(cfg)
            params = model.init(jax.random.PRNGKey(0))
            imgs[pallas] = np.asarray(
                model.render_image(
                    params, None, pose_o, pose_r, 16, 16, 20.0, render
                )
            )
        np.testing.assert_allclose(
            imgs[True], imgs[False], rtol=5e-4, atol=1e-4
        )
