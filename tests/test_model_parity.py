"""End-to-end model parity: the reference executed as a torch-CPU oracle.

Golden tests per SURVEY.md §4 / BASELINE.json: with identical weights, our
MipNeRF must reproduce the reference HEAD model's forward outputs, rendered
pixels, segmentation composites, AND input gradients to float32 tolerance.
The ClassicNeRF is checked against the shipped v1.2 checkpoint
(``examples/nerf.pth``): 1:1 import, shape contract, and deterministic
renders that are finite and bounded.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, MipNeRF, MipNeRFConfig, RenderConfig
from nerf_tpu.models import mlp as mlp_lib
from nerf_tpu.utils import pth_import

CHECKPOINT = "/root/reference/examples/nerf.pth"


def mip_params_from_reference(ref_model) -> dict:
    """Copy a reference HEAD NeRF's prediction_heads into our pytree.

    Sequential layout at reference model.py:525-542: Linear at 3i,
    LayerNorm at 3i+1, ReLU at 3i+2; output Linear at index 15.
    """
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    layers = []
    for i in range(5):
        layers.append(
            {
                "linear": {
                    "w": jnp.asarray(sd[f"prediction_heads.{3 * i}.weight"].T),
                    "b": jnp.asarray(sd[f"prediction_heads.{3 * i}.bias"]),
                },
                "ln": {
                    "scale": jnp.asarray(sd[f"prediction_heads.{3 * i + 1}.weight"]),
                    "bias": jnp.asarray(sd[f"prediction_heads.{3 * i + 1}.bias"]),
                },
            }
        )
    return {
        "layers": layers,
        "out": {
            "w": jnp.asarray(sd["prediction_heads.15.weight"].T),
            "b": jnp.asarray(sd["prediction_heads.15.bias"]),
        },
    }


@pytest.fixture(scope="module")
def ref_head_model():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from nerf.model import NeRF

    torch.manual_seed(0)
    return NeRF()


@pytest.fixture(scope="module")
def mip_pair(ref_head_model):
    model = MipNeRF(MipNeRFConfig())
    params = mip_params_from_reference(ref_head_model)
    return model, params


class TestMipForwardParity:
    def test_forward_allclose(self, ref_head_model, mip_pair, rng):
        import torch

        model, params = mip_pair
        rays_o = rng.normal(size=(32, 3)).astype(np.float32)
        rays_d = rng.normal(size=(32, 3)).astype(np.float32)
        t_vals = np.sort(
            rng.uniform(0.5, 40.0, size=(32, 65)).astype(np.float32), -1
        )

        means, density, color, seg = model.forward(
            params, jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(t_vals)
        )
        with torch.no_grad():
            rm, rd_, rc, rs = ref_head_model.forward(
                torch.as_tensor(rays_o),
                torch.as_tensor(rays_d),
                torch.as_tensor(t_vals),
            )
        assert density.shape == (32, 64, 1)  # fencepost: S-1 intervals
        np.testing.assert_allclose(means, rm.numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(density, rd_.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(color, rc.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(seg, rs.numpy(), rtol=1e-4, atol=1e-4)

    def test_render_rays_allclose(self, ref_head_model, mip_pair, rng):
        import torch

        model, params = mip_pair
        rays_o = (rng.normal(size=(16, 3)) * 2).astype(np.float32)
        rays_d = rng.normal(size=(16, 3)).astype(np.float32)

        out = model.render_rays(
            params, None, jnp.asarray(rays_o), jnp.asarray(rays_d),
            RenderConfig(num_coarse_samples=64, randomly_sample=False,
                         density_noise_std=0.0),
        )
        with torch.no_grad():
            ref_rgb, ref_seg = ref_head_model.render_rays(
                torch.as_tensor(rays_o), torch.as_tensor(rays_d), 64,
                randomly_sample=False, density_noise_std=0.0,
            )
        assert out.rgb.shape == (16, 1, 3)
        assert out.segmentation.shape == (16, 1, 50)
        np.testing.assert_allclose(
            out.rgb, ref_rgb.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            out.segmentation, ref_seg.numpy(), rtol=1e-4, atol=1e-4
        )

    def test_pixel_gradient_parity(self, ref_head_model, mip_pair, rng):
        # BASELINE.json requires gradient parity, not just forward parity.
        import torch

        model, params = mip_pair
        rays_o = (rng.normal(size=(8, 3)) * 2).astype(np.float32)
        rays_d = rng.normal(size=(8, 3)).astype(np.float32)
        rcfg = RenderConfig(num_coarse_samples=32, randomly_sample=False,
                            density_noise_std=0.0)

        def loss_fn(o, d):
            out = model.render_rays(params, None, o, d, rcfg)
            return jnp.sum(out.rgb ** 2)

        go, gd = jax.grad(loss_fn, argnums=(0, 1))(
            jnp.asarray(rays_o), jnp.asarray(rays_d)
        )

        to = torch.as_tensor(rays_o).requires_grad_(True)
        td = torch.as_tensor(rays_d).requires_grad_(True)
        ref_rgb, _ = ref_head_model.render_rays(
            to, td, 32, randomly_sample=False, density_noise_std=0.0
        )
        (ref_rgb ** 2).sum().backward()
        np.testing.assert_allclose(go, to.grad.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(gd, td.grad.numpy(), rtol=1e-3, atol=1e-4)

    def test_render_image_allclose(self, ref_head_model, mip_pair, rng):
        import torch

        model, params = mip_pair
        cam_o = (rng.normal(size=(1, 3)) * 3).astype(np.float32)
        z = rng.normal(size=(3,)).astype(np.float32)
        from nerf_tpu.ops import cameras

        cam_r = np.asarray(
            cameras.direction_to_rotation_matrix(jnp.asarray(z[None]))
        )
        rgb, seg = model.render_image(
            params, None, jnp.asarray(cam_o), jnp.asarray(cam_r),
            8, 9, 20.0,
            RenderConfig(num_coarse_samples=16, randomly_sample=False,
                         density_noise_std=0.0, rays_per_tile=32),
        )
        with torch.no_grad():
            ref_rgb, ref_seg = ref_head_model.render_image(
                torch.as_tensor(cam_o), torch.as_tensor(cam_r), 8, 9, 20.0, 16,
                max_chunk_size=32,
            )
        np.testing.assert_allclose(rgb, ref_rgb.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(seg, ref_seg.numpy(), rtol=1e-4, atol=1e-4)


class TestClassicCheckpoint:
    def test_import_shapes_and_count(self):
        cfg = ClassicNeRFConfig(normalize_position=6.0)
        params = pth_import.load_classic_checkpoint(CHECKPOINT, cfg)
        assert mlp_lib.count_params(params) == 638_468

    def test_round_trip_state_dict(self):
        import torch

        cfg = ClassicNeRFConfig(normalize_position=6.0)
        params = pth_import.load_classic_checkpoint(CHECKPOINT, cfg)
        sd = pth_import.classic_params_to_state_dict(params)
        orig = torch.load(CHECKPOINT, map_location="cpu")
        assert set(sd) == set(orig)
        for k in orig:
            np.testing.assert_array_equal(sd[k], orig[k].numpy())

    def test_checkpoint_renders_plausible_pixels(self):
        # No ground-truth npz survives in the repo (.MISSING_LARGE_BLOBS), so
        # assert structural properties: deterministic render of the lego
        # checkpoint is finite, in [0, 1], and non-constant.
        cfg = ClassicNeRFConfig(normalize_position=6.0)
        model = ClassicNeRF(cfg)
        params = pth_import.load_classic_checkpoint(CHECKPOINT, cfg)
        from nerf_tpu.ops import cameras

        cam_o = jnp.asarray([[0.0, -4.0, 0.5]])
        cam_r = cameras.direction_to_rotation_matrix(-cam_o)
        img = model.render_image(
            params, None, cam_o, cam_r, 20, 20, 0.5 * 20 / np.tan(0.35),
            RenderConfig(num_coarse_samples=64, near=2.0, far=6.0,
                         randomly_sample=False, density_noise_std=0.0,
                         rays_per_tile=100),
        )
        img = np.asarray(img)
        assert np.all(np.isfinite(img))
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert img.std() > 1e-3


class TestClassicModelContract:
    def test_param_count_matches_checkpoint_architecture(self):
        model = ClassicNeRF(ClassicNeRFConfig())
        params = model.init(jax.random.PRNGKey(0))
        assert mlp_lib.count_params(params) == 638_468

    def test_conditional_nerf_widens_inputs(self):
        # density_inputs = 3 + state_dim (train_conditional_nerf.py:103-104).
        cfg = ClassicNeRFConfig(density_inputs=7, color_inputs=5)
        model = ClassicNeRF(cfg)
        params = model.init(jax.random.PRNGKey(0))
        assert params["block_0"][0]["linear"]["w"].shape == (7 * 20, 256)
        assert params["block_2"][0]["linear"]["w"].shape == (256 + 5 * 12, 256)

        out = model.render_rays(
            params, jax.random.PRNGKey(1),
            jnp.zeros((4, 3)), jnp.ones((4, 3)),
            RenderConfig(num_coarse_samples=8),
            states_x=jnp.ones((4, 4)), states_d=jnp.ones((4, 2)),
        )
        assert out.rgb.shape == (4, 1, 3)
        assert np.all(np.isfinite(np.asarray(out.rgb)))

    def test_hierarchical_stages_shape(self):
        model = ClassicNeRF(ClassicNeRFConfig())
        params = model.init(jax.random.PRNGKey(0))
        out = model.render_rays(
            params, jax.random.PRNGKey(1),
            jnp.zeros((4, 3)), jnp.ones((4, 3)),
            RenderConfig(num_coarse_samples=16, num_fine_samples=32),
        )
        # Stage axis: [coarse, fine]; loss covers both, eval takes the last
        # (reference x[:, -1] at model.py:757).
        assert out.rgb.shape == (4, 2, 3)

    def test_no_viewdirs_variant(self):
        cfg = ClassicNeRFConfig(use_viewdirs=False)
        model = ClassicNeRF(cfg)
        params = model.init(jax.random.PRNGKey(0))
        assert "block_2" not in params
        out = model.render_rays(
            params, None, jnp.zeros((4, 3)), jnp.ones((4, 3)),
            RenderConfig(num_coarse_samples=8, randomly_sample=False,
                         density_noise_std=0.0),
        )
        assert out.rgb.shape == (4, 1, 3)
