"""Disjoint-stage hierarchical rendering (``reuse_coarse_in_fine``).

The fast path evaluates the MLP only on the new fine samples and composites
the coarse+fine union order-free; it must render identically (to float
reassociation) to the NeRF-paper re-evaluate-everything path in
deterministic mode, and train as well as it.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
from nerf_tpu.data import RayBank, synthesize_scene
from nerf_tpu.train import create_train_state, make_train_step


def tiny_model():
    return ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=6.0,
            x_positional_encoding_size=12,
            d_positional_encoding_size=8,
            hidden_size=32,
            trunk_blocks=(2, 2),
            view_branch_depth=1,
        )
    )


def _rays(n=64):
    scene = synthesize_scene(num_views=2, image_hw=16, focal=20.0,
                             num_samples=64)
    bank = RayBank.from_images(
        scene.images, scene.pose_o, scene.pose_r, scene.focal
    )
    return bank, bank.gather(jnp.arange(n))


class TestReuseEquivalence:
    def test_deterministic_render_matches_reevaluate_path(self):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        _, batch = _rays()
        base = RenderConfig(num_coarse_samples=16, num_fine_samples=24,
                            randomly_sample=False, density_noise_std=0.0)
        outs = {}
        for reuse in (False, True):
            render = dataclasses.replace(base, reuse_coarse_in_fine=reuse)
            outs[reuse] = model.render_rays(
                params, None, batch["rays_o"], batch["rays_d"], render
            )
        np.testing.assert_allclose(
            np.asarray(outs[True].rgb), np.asarray(outs[False].rgb),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True].depth), np.asarray(outs[False].depth),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True].acc), np.asarray(outs[False].acc),
            rtol=1e-5, atol=1e-6,
        )

    def test_deterministic_gradients_match_reevaluate_path(self):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        _, batch = _rays(32)
        base = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                            randomly_sample=False, density_noise_std=0.0)

        def loss(params, reuse):
            render = dataclasses.replace(base, reuse_coarse_in_fine=reuse)
            out = model.render_rays(
                params, None, batch["rays_o"], batch["rays_d"], render
            )
            return jnp.mean((out.rgb - batch["pixels"][:, None, :]) ** 2)

        g_slow = jax.grad(lambda p: loss(p, False))(params)
        g_fast = jax.grad(lambda p: loss(p, True))(params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-6
            ),
            g_fast, g_slow,
        )

    def test_training_converges_with_reuse(self):
        model = tiny_model()
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              density_noise_std=0.1)
        assert render.reuse_coarse_in_fine  # the default IS the fast path
        bank, _ = _rays()
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        step = make_train_step(model, opt, render)
        losses = []
        for i in range(30):
            batch = bank.sample_batch(jax.random.PRNGKey(i), 128)
            state, aux = step(state, batch)
            losses.append(float(jax.device_get(aux["loss"])))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
