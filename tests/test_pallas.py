"""Fused Pallas MLP kernel: parity with the XLA path (interpret mode on CPU).

The kernel's numerics are validated against ``apply_classic_mlp`` — which
itself is parity-tested against the torch reference — for forward outputs
AND gradients w.r.t. params, encoded positions, and encoded directions.
On the real chip the same kernel is exercised by bench.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
from nerf_tpu.models.mlp import apply_classic_mlp
from nerf_tpu.ops.pallas import fused_mlp


@pytest.fixture(scope="module")
def setup():
    cfg = ClassicNeRFConfig()
    model = ClassicNeRF(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x_enc = jnp.asarray(rng.normal(size=(700, 60)).astype(np.float32))
    d_enc = jnp.asarray(rng.normal(size=(700, 36)).astype(np.float32))
    return cfg, model, params, x_enc, d_enc


class TestForwardParity:
    def test_outputs_match_xla(self, setup):
        cfg, _, params, x_enc, d_enc = setup
        d_ref, c_ref = apply_classic_mlp(params, cfg, x_enc, d_enc)
        d_pal, c_pal = fused_mlp.classic_mlp_pallas(params, x_enc, d_enc)
        np.testing.assert_allclose(d_pal, d_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(c_pal, c_ref, rtol=1e-4, atol=1e-5)

    def test_rank3_inputs(self, setup):
        cfg, _, params, x_enc, d_enc = setup
        x3 = x_enc[:64].reshape(4, 16, 60)
        d3 = d_enc[:64].reshape(4, 16, 36)
        d_pal, c_pal = fused_mlp.classic_mlp_pallas(params, x3, d3)
        assert d_pal.shape == (4, 16, 1)
        assert c_pal.shape == (4, 16, 3)
        d_ref, c_ref = apply_classic_mlp(params, cfg, x3, d3)
        np.testing.assert_allclose(d_pal, d_ref, rtol=1e-4, atol=1e-5)

    def test_nonmultiple_point_count(self, setup):
        # 700 points isn't a tile multiple; padding must not leak.
        cfg, _, params, x_enc, d_enc = setup
        d_full, _ = fused_mlp.classic_mlp_pallas(params, x_enc, d_enc)
        d_half, _ = fused_mlp.classic_mlp_pallas(
            params, x_enc[:350], d_enc[:350]
        )
        np.testing.assert_allclose(d_half, d_full[:350], rtol=1e-5)


@pytest.fixture
def exact_ln_stats():
    """Pin the LN-statistics mode to the two-pass formula.

    The default "onepass" mode (var = E[a^2] - mu^2) is mathematically
    identical but sums in a different order; the gradient through the
    10-layer LN chain amplifies that ~1e-7 forward rounding to ~1e-3
    relative (verified: pure-jnp autodiff shows the same spread between
    the two formulas with a bit-identical forward).  Exact-parity tests
    therefore run under "twopass"; TestOnepassStats covers the default.
    """
    prev = fused_mlp._LN_STATS
    fused_mlp._LN_STATS = "twopass"
    yield
    fused_mlp._LN_STATS = prev


class TestGradientParity:
    def test_all_gradients_match_xla(self, setup, exact_ln_stats):
        cfg, _, params, x_enc, d_enc = setup

        def loss_of(fn):
            def loss(p, x, d):
                de, co = fn(p, x, d)
                return jnp.sum(de ** 2) + jnp.sum(jnp.sin(co))
            return loss

        g_ref = jax.grad(
            loss_of(lambda p, x, d: apply_classic_mlp(p, cfg, x, d)),
            argnums=(0, 1, 2),
        )(params, x_enc, d_enc)
        g_pal = jax.grad(
            loss_of(lambda p, x, d: fused_mlp.classic_mlp_pallas(p, x, d)),
            argnums=(0, 1, 2),
        )(params, x_enc, d_enc)

        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_pal)[0],
        ):
            scale = float(jnp.abs(a).max()) + 1e-8
            np.testing.assert_allclose(
                np.asarray(b) / scale,
                np.asarray(a) / scale,
                atol=2e-5,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
            )

    def test_padding_does_not_pollute_weight_grads(self, setup, exact_ln_stats):
        # Weight grads from a 300-point batch must equal the XLA grads —
        # the zero-padded tail rows must contribute nothing.
        cfg, _, params, x_enc, d_enc = setup
        x, d = x_enc[:300], d_enc[:300]

        def loss(fn):
            return lambda p: jnp.sum(fn(p)[1] ** 2)

        g_ref = jax.grad(
            loss(lambda p: apply_classic_mlp(p, cfg, x, d))
        )(params)
        g_pal = jax.grad(
            loss(lambda p: fused_mlp.classic_mlp_pallas(p, x, d))
        )(params)
        a = np.asarray(g_ref["block_0"][0]["linear"]["w"])
        b = np.asarray(g_pal["block_0"][0]["linear"]["w"])
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-5)


class TestOnepassStats:
    """The default onepass LN statistics: same math, different summation
    order — forward must match exactly, gradients in direction/magnitude."""

    def test_forward_identical(self, setup):
        cfg, _, params, x_enc, d_enc = setup
        fused_mlp._LN_STATS = "onepass"
        d1, c1 = fused_mlp.classic_mlp_pallas(params, x_enc, d_enc)
        try:
            fused_mlp._LN_STATS = "twopass"
            d2, c2 = fused_mlp.classic_mlp_pallas(params, x_enc, d_enc)
        finally:
            fused_mlp._LN_STATS = "onepass"
        np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(c1, c2, rtol=1e-5, atol=1e-5)

    def test_gradients_close_to_xla(self, setup):
        cfg, _, params, x_enc, d_enc = setup

        def loss(fn):
            return lambda p: jnp.mean(fn(p)[1] ** 2)

        g_ref = jax.grad(
            loss(lambda p: apply_classic_mlp(p, cfg, x_enc, d_enc))
        )(params)
        g_pal = jax.grad(
            loss(lambda p: fused_mlp.classic_mlp_pallas(p, x_enc, d_enc))
        )(params)
        v_ref = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_ref)])
        v_pal = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_pal)])
        cos = jnp.vdot(v_ref, v_pal) / (
            jnp.linalg.norm(v_ref) * jnp.linalg.norm(v_pal)
        )
        # The LN chain of an *untrained* net amplifies the summation-order
        # difference; 0.999 cosine is far tighter than bf16 (0.987), which
        # itself trains to PSNR identical to f32 (verified on chip).
        assert float(cos) > 0.999, float(cos)
        rel = jnp.linalg.norm(v_pal - v_ref) / jnp.linalg.norm(v_ref)
        assert float(rel) < 5e-2, float(rel)


class TestModelIntegration:
    def test_render_rays_matches_xla_path(self):
        cfg_x = ClassicNeRFConfig(normalize_position=6.0)
        cfg_p = ClassicNeRFConfig(normalize_position=6.0, use_pallas=True)
        model_x, model_p = ClassicNeRF(cfg_x), ClassicNeRF(cfg_p)
        params = model_x.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        rays_o = jax.random.normal(key, (32, 3))
        rays_d = jax.random.normal(jax.random.fold_in(key, 1), (32, 3))
        render = RenderConfig(num_coarse_samples=16, randomly_sample=False,
                              density_noise_std=0.0)
        out_x = model_x.render_rays(params, None, rays_o, rays_d, render)
        out_p = model_p.render_rays(params, None, rays_o, rays_d, render)
        # atol 5e-5: the fused path computes sin arguments as x @ S on the
        # MXU, whose f32 rounding differs slightly from the XLA multiply.
        np.testing.assert_allclose(out_p.rgb, out_x.rgb, rtol=1e-4, atol=5e-5)

    def test_unsupported_config_falls_back(self):
        cfg = ClassicNeRFConfig(trunk_blocks=(2, 2), hidden_size=32,
                                x_positional_encoding_size=12,
                                d_positional_encoding_size=8,
                                view_branch_depth=1, use_pallas=True)
        assert not fused_mlp.supports_classic_config(cfg)
        model = ClassicNeRF(cfg)
        params = model.init(jax.random.PRNGKey(0))
        out = model.render_rays(
            params, None, jnp.zeros((4, 3)), jnp.ones((4, 3)),
            RenderConfig(num_coarse_samples=8, randomly_sample=False,
                         density_noise_std=0.0),
        )
        assert np.all(np.isfinite(np.asarray(out.rgb)))

    def test_packing_round_trip(self, setup):
        _, _, params, _, _ = setup
        packed = fused_mlp.pack_classic_params(params)
        assert packed["whh"].shape == (9, 256, 256)
        assert packed["w0"].shape == (60, 256)
        assert packed["wx"].shape == (60, 256)
        assert packed["wd_in"].shape == (36, 256)
        # slab contents match the pytree
        np.testing.assert_array_equal(
            packed["whh"][3], params["block_1"][0]["linear"]["w"][:256]
        )
        np.testing.assert_array_equal(
            packed["wx"], params["block_1"][0]["linear"]["w"][256:]
        )


class TestBfloat16Path:
    """compute_dtype=bfloat16: MXU-rate matmuls, f32 accumulation.

    bf16 has ~3 decimal digits; forward outputs should track f32 to ~1e-2
    relative and gradients should keep direction (cosine similarity)."""

    def test_forward_close_to_f32(self, setup):
        _, _, params, x_enc, d_enc = setup
        d32, c32 = fused_mlp.classic_mlp_pallas(params, x_enc, d_enc)
        d16, c16 = fused_mlp.classic_mlp_pallas(
            params, x_enc, d_enc, compute_dtype=jnp.bfloat16
        )
        assert d16.dtype == jnp.float32  # accumulation stays f32
        np.testing.assert_allclose(d16, d32, rtol=0.1, atol=0.15)
        np.testing.assert_allclose(c16, c32, rtol=0.1, atol=0.15)

    def test_gradients_keep_direction(self, setup):
        cfg, _, params, x_enc, d_enc = setup

        def loss(p, dtype):
            de, co = fused_mlp.classic_mlp_pallas(
                p, x_enc, d_enc, compute_dtype=dtype
            )
            return jnp.mean(de ** 2) + jnp.mean(jnp.sin(co))

        g32 = jax.grad(lambda p: loss(p, jnp.float32))(params)
        g16 = jax.grad(lambda p: loss(p, jnp.bfloat16))(params)
        v32 = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g32)])
        v16 = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g16)])
        cos = jnp.vdot(v32, v16) / (
            jnp.linalg.norm(v32) * jnp.linalg.norm(v16)
        )
        assert float(cos) > 0.98, float(cos)

    def test_model_config_plumbs_dtype(self):
        # ClassicNeRF(compute_dtype="bfloat16") must run end to end.
        cfg = ClassicNeRFConfig(use_pallas=True, compute_dtype="bfloat16")
        model = ClassicNeRF(cfg)
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(
            num_coarse_samples=16, near=2.0, far=6.0, randomly_sample=False
        )
        rays_o = jnp.zeros((8, 3))
        rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1))
        out = model.render_rays(params, None, rays_o, rays_d, render)
        assert np.isfinite(np.asarray(out.rgb)).all()


class TestFusedEncodingKernel:
    """classic_pointmlp_pallas: encoder computed in-kernel on raw coords."""

    def test_forward_matches_encode_then_mlp(self, setup):
        cfg, model, params, _, _ = setup
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-2, 2, size=(300, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(300, 3)), jnp.float32)
        d_ref, c_ref = apply_classic_mlp(
            params, cfg, model.encode_position(pts),
            model.encode_direction(dirs),
        )
        d_pal, c_pal = fused_mlp.classic_pointmlp_pallas(
            params, pts, dirs,
            cfg.x_positional_encoding_size, cfg.normalize_position,
            cfg.d_positional_encoding_size, cfg.direction_bound,
        )
        np.testing.assert_allclose(d_pal, d_ref, rtol=1e-4, atol=2e-4)
        np.testing.assert_allclose(c_pal, c_ref, rtol=1e-4, atol=2e-4)

    def test_gradients_close(self, setup):
        cfg, model, params, _, _ = setup
        rng = np.random.default_rng(4)
        pts = jnp.asarray(rng.uniform(-2, 2, size=(300, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(300, 3)), jnp.float32)

        def loss(fn):
            return lambda p: jnp.mean(fn(p)[1] ** 2)

        g_ref = jax.grad(loss(lambda p: apply_classic_mlp(
            p, cfg, model.encode_position(pts), model.encode_direction(dirs)
        )))(params)
        g_pal = jax.grad(loss(lambda p: fused_mlp.classic_pointmlp_pallas(
            p, pts, dirs,
            cfg.x_positional_encoding_size, cfg.normalize_position,
            cfg.d_positional_encoding_size, cfg.direction_bound,
        )))(params)
        vr = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_ref)])
        vp = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_pal)])
        cos = jnp.vdot(vr, vp) / (jnp.linalg.norm(vr) * jnp.linalg.norm(vp))
        assert float(cos) > 0.999, float(cos)

    def test_enc_consts_match_frequency_encoding(self):
        from nerf_tpu.ops import encoding
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(-3, 3, size=(17, 3)), jnp.float32)
        scales = encoding.bbox_frequency_scales(20, 6.0, jnp.float32)
        ref = encoding.frequency_encoding(x, scales)
        s, ph = fused_mlp._enc_consts(20, 6.0)
        got = jnp.sin(x @ jnp.asarray(s) + jnp.asarray(ph))
        # atol 2e-4: sine args reach |x * f| ~ 700 at the top frequency,
        # where one f32 ulp of the product already moves sin by ~6e-5.
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-4)
