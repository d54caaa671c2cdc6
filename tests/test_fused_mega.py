"""Mega-fused hierarchical train step (ops/pallas/fused_mega): the whole
reuse objective in ONE Pallas call.

Validation strategy (three tiers, strongest first):

1. the in-kernel inverse-CDF resample must be BITWISE equal to
   ``sampling.sample_pdf`` given the same weights/uniforms (the kernel
   mirrors the ladder association and uses exact one-hot Dekker
   selections);
2. gradients must match an XLA oracle that consumes the kernel's OWN
   emitted t_fine as a constant (stop-gradient semantics — this isolates
   every downstream term from resample input sensitivity) to float
   reassociation;
3. loss/grads must track the production reuse path
   (``fused_hier.reuse_train_loss_and_grads``) at a looser tolerance:
   the in-kernel coarse weights reassociate (exp-of-ladder vs cumprod
   ladder), shifting t_fine by ~1 interp ulp, and the top encoding
   octave amplifies position deltas by ~f_max.

Runs in Pallas interpret mode on CPU like the other kernel tests.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.flatten_util import ravel_pytree

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
from nerf_tpu.data import RayBank, synthesize_scene
from nerf_tpu.ops import compositing, encoding, sampling
from nerf_tpu.ops.pallas import fused_hier, fused_mega


@pytest.fixture(scope="module")
def bank():
    scene = synthesize_scene(num_views=3, image_hw=16, focal=20.0,
                             num_samples=64)
    return RayBank.from_images(
        scene.images, scene.pose_o, scene.pose_r, scene.focal
    )


def full_model(viewdirs=True):
    return ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=6.0, use_pallas=False,
            use_viewdirs=viewdirs,
        )
    )


def make_render(**kw):
    base = dict(
        num_coarse_samples=8, num_fine_samples=16, near=2.0, far=6.0,
        randomly_sample=True, density_noise_std=1.0,
    )
    base.update(kw)
    return RenderConfig(**base)


class TestResampleBitwise:
    def _case(self, randomly_sample):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.uniform(0.01, 1.0, size=(4, 8)), jnp.float32)
        t_c = jnp.sort(
            jnp.asarray(rng.uniform(2.0, 6.0, size=(4, 8)), jnp.float32),
            axis=-1,
        )
        key = jax.random.PRNGKey(7) if randomly_sample else None
        u = sampling.pdf_uniforms(
            key, (4,), 16, randomly_sample=randomly_sample
        )
        t_ref = sampling.sample_pdf(
            key, 0.5 * (t_c[:, 1:] + t_c[:, :-1]), w[:, 1:-1], 16,
            randomly_sample=randomly_sample,
        )
        t_kernel = fused_mega._resample_lane(w, t_c, u, 8, 16, 4)
        assert bool(jnp.all(t_ref == t_kernel)), (
            f"max diff {float(jnp.max(jnp.abs(t_ref - t_kernel)))}"
        )

    def test_bitwise_random(self):
        self._case(True)

    def test_bitwise_deterministic(self):
        self._case(False)

    def test_degenerate_weights(self):
        # All-zero interior weights: eps-only pdf, uniform sampling.
        t_c = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (2, 8))
        w = jnp.zeros((2, 8), jnp.float32)
        u = sampling.pdf_uniforms(jax.random.PRNGKey(0), (2,), 16)
        t_ref = sampling.sample_pdf(
            jax.random.PRNGKey(0), 0.5 * (t_c[:, 1:] + t_c[:, :-1]),
            w[:, 1:-1], 16,
        )
        t_kernel = fused_mega._resample_lane(w, t_c, u, 8, 16, 2)
        assert bool(jnp.all(t_ref == t_kernel))


class TestEncodingBitwise:
    def test_exact_mode_matches_frequency_encoding(self):
        cfg = full_model().cfg
        rng = np.random.default_rng(3)
        t_f = jnp.sort(
            jnp.asarray(rng.uniform(2.0, 6.0, size=(4, 16)), jnp.float32),
            axis=-1,
        )
        o3 = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        d3 = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        enc_np, iscos_np = fused_mega._enc_placement(
            cfg.x_positional_encoding_size, cfg.normalize_position
        )
        got = fused_mega._encode_fine(
            t_f, o3, d3, jnp.asarray(enc_np), jnp.asarray(iscos_np),
            4, 16, exact_trig=True,
        )
        pts = o3[:, None, :] + d3[:, None, :] * t_f[..., None]
        scales = encoding.bbox_frequency_scales(
            cfg.x_positional_encoding_size, cfg.normalize_position,
            jnp.float32,
        )
        want = encoding.frequency_encoding(
            pts.reshape(-1, 3), scales
        )
        assert bool(jnp.all(got == want))

    def test_phase_mode_close(self):
        cfg = full_model().cfg
        rng = np.random.default_rng(4)
        t_f = jnp.sort(
            jnp.asarray(rng.uniform(2.0, 6.0, size=(4, 16)), jnp.float32),
            axis=-1,
        )
        o3 = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        d3 = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        enc_np, iscos_np = fused_mega._enc_placement(
            cfg.x_positional_encoding_size, cfg.normalize_position
        )
        exact = fused_mega._encode_fine(
            t_f, o3, d3, jnp.asarray(enc_np), jnp.asarray(iscos_np),
            4, 16, exact_trig=True,
        )
        fast = fused_mega._encode_fine(
            t_f, o3, d3, jnp.asarray(enc_np), jnp.asarray(iscos_np),
            4, 16, exact_trig=False,
        )
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(exact), atol=1e-3
        )


def _constant_tfine_oracle(model, params, render, batch, key, t_fine):
    """jax.grad-able XLA replica of the reuse objective with t_fine held
    CONSTANT (the kernel's stop-gradient semantics), same PRNG draws."""
    n_rays = batch["rays_o"].shape[0]
    sc = render.num_coarse_samples
    sf = render.num_fine_samples
    std = render.density_noise_std
    bg = 1.0 if render.white_background else None
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
    t_c = sampling.sample_linear(
        k_strat, (n_rays,), sc, render.near, render.far,
        randomly_sample=render.randomly_sample, dtype=jnp.float32,
    )
    noise_c = (
        std * jax.random.normal(k_noise_c, (n_rays, sc))
        if std > 0 else jnp.zeros((n_rays, sc))
    )
    noise_f = (
        std * jax.random.normal(k_noise_f, (n_rays, sf))
        if std > 0 else jnp.zeros((n_rays, sf))
    )
    pix = batch["pixels"]

    def loss_fn(params):
        _, dens_c, col_c = model.forward(
            params, batch["rays_o"], batch["rays_d"], t_c, None, None
        )
        dens_c = dens_c + noise_c[..., None]
        dists = compositing.distances_from_tvals(t_c, batch["rays_d"])
        w_c = compositing.weights_from_density(dens_c, dists)
        rgb_c = compositing.composite_rgb_with_background(w_c, col_c, bg)
        loss_c = 0.5 * jnp.mean((rgb_c - pix) ** 2)
        _, dens_f, col_f = model.forward(
            params, batch["rays_o"], batch["rays_d"], t_fine, None, None
        )
        dens_f = dens_f + noise_f[..., None]
        w_u = compositing.weights_from_union_sorted(
            dens_c, dens_f, t_c, t_fine, batch["rays_d"]
        )
        col_cat = jnp.concatenate([col_c, col_f], axis=-2)
        rgb_u = compositing.composite_rgb_with_background(
            w_u, col_cat, bg
        )
        loss_f = 0.5 * jnp.mean((rgb_u - pix) ** 2)
        return loss_c + loss_f

    return jax.value_and_grad(loss_fn)(params)


class TestMegaGradientExactness:
    """Tier 2: oracle with the kernel's own t_fine as a constant."""

    def _run(self, viewdirs=True, white_background=False, noise=True,
             rel_tol=5e-5):
        model = full_model(viewdirs)
        params = model.init(jax.random.PRNGKey(0))
        scene = synthesize_scene(num_views=3, image_hw=16, focal=20.0,
                                 num_samples=64)
        bank = RayBank.from_images(
            scene.images, scene.pose_o, scene.pose_r, scene.focal
        )
        batch = bank.gather(jnp.arange(8))
        render = make_render(
            white_background=white_background,
            randomly_sample=noise,
            density_noise_std=1.0 if noise else 0.0,
        )
        key = jax.random.PRNGKey(3)
        loss, grads, aux = fused_mega.mega_train_loss_and_grads(
            model, params, render, batch, key, emit_t_fine=True,
            exact_trig=True,
        )
        t_fine = jax.lax.stop_gradient(aux["t_fine"])
        loss_o, grads_o = _constant_tfine_oracle(
            model, params, render, batch, key, t_fine
        )
        assert np.isclose(float(loss), float(loss_o), rtol=1e-5)
        g1, _ = ravel_pytree(grads)
        g2, _ = ravel_pytree(grads_o)
        scale = float(jnp.max(jnp.abs(g2)))
        max_diff = float(jnp.max(jnp.abs(g1 - g2)))
        assert max_diff < rel_tol * scale, (max_diff, scale)

    def test_viewdirs_noise(self):
        self._run()

    def test_no_viewdirs(self):
        self._run(viewdirs=False)

    def test_white_background(self):
        self._run(white_background=True)

    def test_deterministic(self):
        # Noiseless at init params: alpha ~ 1 everywhere, so the union
        # weights are ~1e-3 and their 1/a_eps backward terms amplify the
        # exp-of-ladder vs cumprod transmittance reassociation ~100x
        # (measured 4.8e-4 relative, diffuse across the trunk weights,
        # vs 2.4e-6 in the noisy cases; no fine/coarse t ties).
        self._run(noise=False, rel_tol=1e-3)


class TestMegaVsReusePath:
    """Tier 3: the production fused path, tolerance per module docstring."""

    def test_loss_and_grads_track_reuse(self, bank):
        model = full_model()
        params = model.init(jax.random.PRNGKey(0))
        batch = bank.gather(jnp.arange(8))
        render = make_render()
        key = jax.random.PRNGKey(3)
        l1, g1, a1 = fused_hier.reuse_train_loss_and_grads(
            model, params, render, batch, key
        )
        l2, g2, a2 = fused_mega.mega_train_loss_and_grads(
            model, params, render, batch, key
        )
        assert np.isclose(float(l1), float(l2), rtol=1e-4)
        assert np.isclose(
            float(a1["fine_mse"]), float(a2["fine_mse"]), rtol=1e-4
        )
        f1, _ = ravel_pytree(g1)
        f2, _ = ravel_pytree(g2)
        scale = float(jnp.max(jnp.abs(f1)))
        assert float(jnp.max(jnp.abs(f1 - f2))) < 5e-3 * scale

    def test_supports_predicate(self, bank):
        model = full_model()
        render = make_render()
        batch = bank.gather(jnp.arange(4))
        assert fused_mega.supports_mega(model, render, batch)
        assert not fused_mega.supports_mega(
            model, make_render(num_fine_samples=0), batch
        )
        assert not fused_mega.supports_mega(
            model, make_render(reuse_coarse_in_fine=False), batch
        )
        latent = dict(batch)
        latent["states_x"] = jnp.zeros((4, 2))
        assert not fused_mega.supports_mega(model, render, latent)


class TestMegaTraining:
    def test_loss_decreases(self, bank):
        import optax

        from nerf_tpu.train import TrainState, create_train_state
        from nerf_tpu.train.loop import fold_key

        model = full_model()
        render = make_render(density_noise_std=0.1)
        opt = optax.adam(1e-3)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        losses = []
        for i in range(12):
            batch = bank.sample_batch(jax.random.PRNGKey(i), 16)
            key = jax.random.fold_in(jax.random.PRNGKey(99), i)
            loss, grads, aux = fused_mega.mega_train_loss_and_grads(
                model, state.params, render, batch, key
            )
            updates, opt_state = opt.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            state = TrainState(
                state.step + 1, params, opt_state, state.key
            )
            losses.append(float(loss))
        assert np.mean(losses[-3:]) < np.mean(losses[:3])
