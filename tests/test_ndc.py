"""NDC (LLFF-style forward-facing) pipeline: geometry + end-to-end training."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
from nerf_tpu.data import RayBank
from nerf_tpu.data.scenes import forward_facing_poses, synthesize_forward_facing
from nerf_tpu.ops import cameras
from nerf_tpu.train import create_train_state, evaluate, make_sampling_train_step


class TestNDCGeometry:
    def test_ndc_points_stay_in_cube(self):
        # Sample along NDC rays in t=[0,1]: z spans exactly [-1, 1]; the
        # zero-offset (central) camera's frustum maps into |x|,|y| <= 1;
        # laterally-offset cameras exceed it proportionally to their offset
        # (as in real LLFF data) but stay bounded.
        pose_o, pose_r = forward_facing_poses(9, spread=0.15)
        ro, rd = cameras.pose_to_rays(pose_o, pose_r, 24, 24, 30.0)
        no, nd = cameras.ndc_rays(
            ro.reshape(9, -1, 3), rd.reshape(9, -1, 3), 24, 24, 30.0,
            near=1.0,
        )
        t = jnp.linspace(0.0, 1.0, 16)
        pts = no[:, :, None, :] + nd[:, :, None, :] * t[None, None, :, None]
        assert float(jnp.abs(pts[..., 2]).max()) <= 1.0 + 1e-4
        center = 4  # middle of the 3x3 grid has zero offset
        assert float(jnp.abs(pts[center, ..., :2]).max()) <= 1.0 + 1e-4
        assert float(jnp.abs(pts[..., :2]).max()) <= 1.5

    def test_ray_bank_ndc_flag(self):
        scene = synthesize_forward_facing(num_views=4, image_hw=16,
                                          num_samples=64)
        bank = RayBank.from_images(
            scene.images, scene.pose_o, scene.pose_r, scene.focal,
            use_ndc=True,
        )
        # NDC origins sit on the near plane z = -1.
        np.testing.assert_allclose(
            np.asarray(bank.rays_o[:, 2]), -1.0, atol=1e-4
        )


class TestNDCTraining:
    def test_ndc_model_learns_forward_facing_scene(self):
        scene = synthesize_forward_facing(num_views=9, image_hw=24,
                                          focal=30.0, num_samples=256)
        bank = RayBank.from_images(
            scene.images, scene.pose_o, scene.pose_r, scene.focal,
            use_ndc=True,
        )
        cfg = ClassicNeRFConfig(
            normalize_position=1.0,  # NDC cube
            x_positional_encoding_size=12,
            d_positional_encoding_size=8,
            hidden_size=64,
            trunk_blocks=(2, 2),
            view_branch_depth=1,
        )
        model = ClassicNeRF(cfg)
        render = RenderConfig(
            num_coarse_samples=32, near=0.0, far=1.0,
            density_noise_std=0.1, use_ndc=True, rays_per_tile=576,
        )
        opt = optax.adam(1e-3)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        step = make_sampling_train_step(model, opt, render, bank, 256)
        losses = []
        for _ in range(150):
            state, aux = step(state)
            losses.append(float(aux["loss"]))
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.5

        # Eval render goes through the NDC-aware tiled image path.
        img, value = evaluate(model, state.params, scene, render,
                              view_index=0)
        assert np.all(np.isfinite(np.asarray(img)))
        assert float(value) > 14.0
