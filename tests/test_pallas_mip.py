"""Fused mip-MLP kernel: parity with the XLA path (interpret on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_tpu import MipNeRF, MipNeRFConfig, RenderConfig
from nerf_tpu.models.mlp import apply_mip_mlp
from nerf_tpu.ops.pallas import fused_mip_mlp


@pytest.fixture(scope="module")
def setup():
    cfg = MipNeRFConfig()
    model = MipNeRF(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(700, 96)).astype(np.float32))
    return cfg, model, params, feat


class TestForwardParity:
    def test_outputs_match_xla(self, setup):
        cfg, _, params, feat = setup
        ref = apply_mip_mlp(params, cfg, feat)
        pal = fused_mip_mlp.mip_mlp_pallas(
            params, feat, cfg.num_hidden_layers, cfg.color_outputs
        )
        for a, b, name in zip(ref, pal, ("density", "color", "seg")):
            np.testing.assert_allclose(
                b, a, rtol=1e-4, atol=1e-5, err_msg=name
            )
        assert pal[2].shape == (700, 50)

    def test_rank3(self, setup):
        cfg, _, params, feat = setup
        f3 = feat[:96].reshape(4, 24, 96)
        pal = fused_mip_mlp.mip_mlp_pallas(
            params, f3, cfg.num_hidden_layers, cfg.color_outputs
        )
        ref = apply_mip_mlp(params, cfg, f3)
        assert pal[0].shape == (4, 24, 1)
        np.testing.assert_allclose(pal[1], ref[1], rtol=1e-4, atol=1e-5)


class TestGradientParity:
    def test_gradients_match_xla(self, setup):
        cfg, _, params, feat = setup

        def loss_of(fn):
            def loss(p, f):
                de, co, se = fn(p, f)
                return (
                    jnp.sum(de ** 2)
                    + jnp.sum(jnp.sin(co))
                    + jnp.sum(jax.nn.log_softmax(se) * 0.01)
                )
            return loss

        g_ref = jax.grad(
            loss_of(lambda p, f: apply_mip_mlp(p, cfg, f)), argnums=(0, 1)
        )(params, feat)
        g_pal = jax.grad(
            loss_of(
                lambda p, f: fused_mip_mlp.mip_mlp_pallas(
                    p, f, cfg.num_hidden_layers, cfg.color_outputs
                )
            ),
            argnums=(0, 1),
        )(params, feat)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_pal)[0],
        ):
            scale = float(jnp.abs(a).max()) + 1e-8
            np.testing.assert_allclose(
                np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )


class TestModelIntegration:
    def test_render_rays_matches_xla_path(self):
        cfg_x = MipNeRFConfig()
        cfg_p = MipNeRFConfig(use_pallas=True)
        model_x, model_p = MipNeRF(cfg_x), MipNeRF(cfg_p)
        params = model_x.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        rays_o = jax.random.normal(key, (16, 3)) * 2
        rays_d = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
        render = RenderConfig(num_coarse_samples=32, randomly_sample=False,
                              density_noise_std=0.0)
        out_x = model_x.render_rays(params, None, rays_o, rays_d, render)
        out_p = model_p.render_rays(params, None, rays_o, rays_d, render)
        np.testing.assert_allclose(out_p.rgb, out_x.rgb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            out_p.segmentation, out_x.segmentation, rtol=1e-4, atol=1e-4
        )


class TestBfloat16Path:
    def test_forward_close_to_f32(self, setup):
        cfg, _, params, feat = setup
        r32 = fused_mip_mlp.mip_mlp_pallas(
            params, feat, cfg.num_hidden_layers, cfg.color_outputs
        )
        r16 = fused_mip_mlp.mip_mlp_pallas(
            params, feat, cfg.num_hidden_layers, cfg.color_outputs,
            compute_dtype=jnp.bfloat16,
        )
        for a, b in zip(r16, r32):
            assert a.dtype == jnp.float32
            np.testing.assert_allclose(a, b, rtol=0.1, atol=0.15)

    def test_model_config_plumbs_dtype(self):
        cfg = MipNeRFConfig(use_pallas=True, compute_dtype="bfloat16")
        model = MipNeRF(cfg)
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=17, randomly_sample=False)
        rays_o = jnp.zeros((8, 3))
        rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1))
        out = model.render_rays(params, None, rays_o, rays_d, render)
        assert np.isfinite(np.asarray(out.rgb)).all()
