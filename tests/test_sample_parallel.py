"""Sequence-parallel (sample-axis) sharding tests on the virtual CPU mesh.

Property (SURVEY.md §4): the (batch x sample)-sharded result equals the
single-device result to float tolerance — for rendering, hierarchical
rendering, and a full train step.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
from nerf_tpu.data import RayBank, synthesize_scene
from nerf_tpu.parallel import (
    make_mesh_2d,
    make_sample_parallel_render,
    make_sample_parallel_train_step,
    shard_batch,
)
from nerf_tpu.train import create_train_state, make_train_step


def tiny_model(use_pallas=False):
    return ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=6.0,
            x_positional_encoding_size=12,
            d_positional_encoding_size=8,
            hidden_size=32,
            trunk_blocks=(2, 2),
            view_branch_depth=1,
            use_pallas=use_pallas,
        )
    )


@pytest.fixture(scope="module")
def scene():
    return synthesize_scene(num_views=3, image_hw=16, focal=20.0,
                            num_samples=128)


def make_batch(scene, n=256):
    bank = RayBank.from_images(
        scene.images, scene.pose_o, scene.pose_r, scene.focal
    )
    return bank.gather(jnp.arange(n))


class TestSampleParallelRender:
    def test_coarse_render_matches_single_device(self, scene):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=16, randomly_sample=False,
                              density_noise_std=0.0)
        batch = make_batch(scene, 64)

        single = model.render_rays(
            params, None, batch["rays_o"], batch["rays_d"], render
        ).rgb[..., -1, :]

        mesh = make_mesh_2d(2, 4)  # 2-way ray DP x 4-way sample SP
        sp_render = make_sample_parallel_render(model, render, mesh)
        sharded = sp_render(params, batch["rays_o"], batch["rays_d"])

        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
        )

    def test_hierarchical_render_matches_single_device(self, scene):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              randomly_sample=False, density_noise_std=0.0,
                              reuse_coarse_in_fine=False)
        batch = make_batch(scene, 64)

        single = model.render_rays(
            params, None, batch["rays_o"], batch["rays_d"], render
        ).rgb[..., -1, :]

        mesh = make_mesh_2d(4, 2)
        sp_render = make_sample_parallel_render(model, render, mesh)
        sharded = sp_render(params, batch["rays_o"], batch["rays_d"])

        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
        )

    def test_hierarchical_reuse_render_matches_single_device(self, scene):
        # The DEFAULT disjoint-stage formulation: fine MLP on new samples
        # only, order-free union composite completed across sample shards.
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              randomly_sample=False, density_noise_std=0.0,
                              reuse_coarse_in_fine=True)
        batch = make_batch(scene, 64)

        single = model.render_rays(
            params, None, batch["rays_o"], batch["rays_d"], render
        ).rgb[..., -1, :]

        mesh = make_mesh_2d(4, 2)
        sp_render = make_sample_parallel_render(model, render, mesh)
        sharded = sp_render(params, batch["rays_o"], batch["rays_d"])

        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), rtol=1e-4, atol=1e-5
        )

    def test_hierarchical_reuse_white_background(self, scene):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              randomly_sample=False, density_noise_std=0.0,
                              reuse_coarse_in_fine=True,
                              white_background=True)
        batch = make_batch(scene, 32)
        single = model.render_rays(
            params, None, batch["rays_o"], batch["rays_d"], render
        ).rgb[..., -1, :]
        mesh = make_mesh_2d(2, 4)
        sharded = make_sample_parallel_render(model, render, mesh)(
            params, batch["rays_o"], batch["rays_d"]
        )
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), rtol=1e-4, atol=1e-5
        )

    def test_white_background_matches_single_device(self, scene):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=16, randomly_sample=False,
                              density_noise_std=0.0, white_background=True)
        batch = make_batch(scene, 32)
        single = model.render_rays(
            params, None, batch["rays_o"], batch["rays_d"], render
        ).rgb[..., -1, :]
        mesh = make_mesh_2d(2, 4)
        sharded = make_sample_parallel_render(model, render, mesh)(
            params, batch["rays_o"], batch["rays_d"]
        )
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
        )

    def test_indivisible_sample_count_raises(self, scene):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=10, randomly_sample=False,
                              density_noise_std=0.0)
        batch = make_batch(scene, 32)
        mesh = make_mesh_2d(2, 4)
        with pytest.raises(ValueError):
            make_sample_parallel_render(model, render, mesh)(
                params, batch["rays_o"], batch["rays_d"]
            )


class TestSampleParallelTrain:
    def test_step_matches_single_device(self, scene):
        model = tiny_model()
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=16, randomly_sample=False,
                              density_noise_std=0.0)
        batch = make_batch(scene)

        s0 = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        single = make_train_step(model, opt, render, donate=False)
        s1, aux1 = single(s0, batch)

        mesh = make_mesh_2d(4, 2)
        from nerf_tpu.parallel import prepare_parallel_state

        s0p = prepare_parallel_state(
            create_train_state(model.init(jax.random.PRNGKey(0)), opt), mesh
        )
        pstep = make_sample_parallel_train_step(model, opt, render, mesh,
                                                donate=False)
        s1p, aux1p = pstep(s0p, shard_batch(batch, mesh))

        np.testing.assert_allclose(
            float(jax.device_get(aux1p["loss"])), float(aux1["loss"]),
            rtol=1e-5,
        )
        # atol 1e-5: the cross-shard transmittance product reassociates the
        # cumprod, and Adam's rsqrt(nu) amplifies that float noise on
        # near-zero-gradient entries.
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            jax.device_get(s1p.params), s1.params,
        )

    def test_hierarchical_reuse_step_matches_single_device(self, scene):
        # Full train-step gradient parity for the DEFAULT reuse
        # formulation: coarse grads arrive through the all-gather
        # transpose, fine grads through the sharded MLP slices, and the
        # union cross terms through the psum transposes.
        model = tiny_model()
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              randomly_sample=False, density_noise_std=0.0,
                              reuse_coarse_in_fine=True)
        batch = make_batch(scene, 128)

        s0 = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        single = make_train_step(model, opt, render, donate=False)
        s1, aux1 = single(s0, batch)

        mesh = make_mesh_2d(4, 2)
        from nerf_tpu.parallel import prepare_parallel_state

        s0p = prepare_parallel_state(
            create_train_state(model.init(jax.random.PRNGKey(0)), opt), mesh
        )
        pstep = make_sample_parallel_train_step(model, opt, render, mesh,
                                                donate=False)
        s1p, aux1p = pstep(s0p, shard_batch(batch, mesh))

        np.testing.assert_allclose(
            float(jax.device_get(aux1p["loss"])), float(aux1["loss"]),
            rtol=1e-5,
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            jax.device_get(s1p.params), s1.params,
        )

    def test_hierarchical_training_converges(self, scene):
        model = tiny_model()
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              density_noise_std=0.1,
                              reuse_coarse_in_fine=False)
        mesh = make_mesh_2d(2, 4)
        from nerf_tpu.parallel import prepare_parallel_state

        state = prepare_parallel_state(
            create_train_state(model.init(jax.random.PRNGKey(0)), opt), mesh
        )
        pstep = make_sample_parallel_train_step(model, opt, render, mesh)
        bank = RayBank.from_images(
            scene.images, scene.pose_o, scene.pose_r, scene.focal
        )
        losses = []
        for i in range(20):
            batch = shard_batch(
                bank.sample_batch(jax.random.PRNGKey(i), 128), mesh
            )
            state, aux = pstep(state, batch)
            losses.append(float(jax.device_get(aux["loss"])))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
