"""Tensor-parallel (hidden-dim GSPMD sharding) tests on the virtual CPU mesh.

Property: with parameters sharded over a ``model`` mesh axis, rendering and
training produce the same numbers as the single-device run — XLA's SPMD
partitioner inserts the collectives, no model code changes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from nerf_tpu import (
    ClassicNeRF,
    ClassicNeRFConfig,
    MipNeRF,
    MipNeRFConfig,
    RenderConfig,
)
from nerf_tpu.data import RayBank, synthesize_scene
from nerf_tpu.parallel import make_mesh_2d, shard_batch
from nerf_tpu.parallel.tensor_parallel import (
    classic_param_specs,
    make_tp_render_rays,
    make_tp_train_step,
    mip_param_specs,
    param_specs_for,
    prepare_tp_state,
    shard_params,
)
from nerf_tpu.train import create_train_state, make_train_step


def tp_model(hidden=64):
    # hidden divisible by the 2-way model axis; XLA path (TP requirement).
    return ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=6.0,
            x_positional_encoding_size=12,
            d_positional_encoding_size=8,
            hidden_size=hidden,
            trunk_blocks=(2, 2),
            view_branch_depth=1,
            use_pallas=False,
        )
    )


@pytest.fixture(scope="module")
def scene():
    return synthesize_scene(num_views=3, image_hw=16, focal=20.0,
                            num_samples=128)


def make_batch(scene, n=128):
    bank = RayBank.from_images(
        scene.images, scene.pose_o, scene.pose_r, scene.focal
    )
    return bank.gather(jnp.arange(n))


class TestParamSpecs:
    def test_specs_mirror_param_tree(self):
        model = tp_model()
        params = model.init(jax.random.PRNGKey(0))
        specs = param_specs_for(model)
        assert jax.tree_util.tree_structure(
            params
        ) == jax.tree_util.tree_structure(specs, is_leaf=lambda x: isinstance(x, P))

    def test_mip_specs_mirror_param_tree(self):
        model = MipNeRF(MipNeRFConfig(use_pallas=False))
        params = model.init(jax.random.PRNGKey(0))
        specs = mip_param_specs(model.cfg)
        assert jax.tree_util.tree_structure(
            params
        ) == jax.tree_util.tree_structure(specs, is_leaf=lambda x: isinstance(x, P))

    def test_sharded_params_are_split_over_model_axis(self, scene):
        model = tp_model()
        params = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh_2d(4, 2, second_axis="model")
        sharded = shard_params(params, model, mesh)
        w = sharded["block_0"][0]["linear"]["w"]
        # column-sharded: each device holds half the output features
        shard_shapes = {s.data.shape for s in w.addressable_shards}
        assert shard_shapes == {(w.shape[0], w.shape[1] // 2)}

    def test_pallas_model_rejected(self):
        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=6.0, use_pallas=True)
        )
        mesh = make_mesh_2d(4, 2, second_axis="model")
        with pytest.raises(ValueError):
            make_tp_render_rays(model, RenderConfig(), mesh)


class TestTPEquivalence:
    def test_render_matches_single_device(self, scene):
        model = tp_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=8, randomly_sample=False,
                              density_noise_std=0.0)
        batch = make_batch(scene, 64)
        single = model.render_rays(
            params, None, batch["rays_o"], batch["rays_d"], render
        ).rgb[..., -1, :]

        mesh = make_mesh_2d(4, 2, second_axis="model")
        tp_render = make_tp_render_rays(model, render, mesh)
        sharded = tp_render(
            shard_params(params, model, mesh), batch["rays_o"], batch["rays_d"]
        )
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
        )

    def test_hierarchical_render_matches_single_device(self, scene):
        model = tp_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              randomly_sample=False, density_noise_std=0.0)
        batch = make_batch(scene, 64)
        single = model.render_rays(
            params, None, batch["rays_o"], batch["rays_d"], render
        ).rgb[..., -1, :]
        mesh = make_mesh_2d(2, 4, second_axis="model")
        sharded = make_tp_render_rays(model, render, mesh)(
            shard_params(params, model, mesh), batch["rays_o"], batch["rays_d"]
        )
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6
        )

    def test_train_step_matches_single_device(self, scene):
        model = tp_model()
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=8, randomly_sample=False,
                              density_noise_std=0.0)
        batch = make_batch(scene)

        s0 = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        single = make_train_step(model, opt, render, donate=False)
        s1, aux1 = single(s0, batch)

        mesh = make_mesh_2d(4, 2, second_axis="model")
        s0p = prepare_tp_state(
            create_train_state(model.init(jax.random.PRNGKey(0)), opt),
            model,
            mesh,
        )
        tp_step = make_tp_train_step(model, opt, render, mesh, donate=False)
        s1p, aux1p = tp_step(s0p, shard_batch(batch, mesh))

        np.testing.assert_allclose(
            float(jax.device_get(aux1p["loss"])), float(aux1["loss"]),
            rtol=1e-5,
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            ),
            jax.device_get(s1p.params), s1.params,
        )
        # Params must STAY sharded after the update (no silent re-replication).
        w = s1p.params["block_0"][0]["linear"]["w"]
        shard_shapes = {s.data.shape for s in w.addressable_shards}
        assert shard_shapes == {(w.shape[0], w.shape[1] // 2)}
