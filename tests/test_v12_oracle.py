"""Classic-generation oracle parity: the reconstructed torch v1.2 model
(``tests/torch_v12.py``) vs the JAX framework.

Round 1 had no executable oracle for the v1.2 renders/gradients (the
reference lost that source — ``/root/reference/nerf/model.py:191-193``);
these tests close the loop:

* the torch module loads ``examples/nerf.pth`` 1:1 (validating BOTH the
  reconstruction and ``utils/pth_import``'s mapping);
* deterministic coarse and hierarchical renders agree across the two
  frameworks (independent implementations: torch sequential cumprod /
  searchsorted+gather/sort vs the TPU scan-free ladders, dense-mask
  inverse CDF, and order-free union compositing);
* full parameter GRADIENTS of the training MSE agree (torch autograd vs
  jax.grad) — including the latent-conditioned (conditional NeRF) widened
  architecture.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
from nerf_tpu.utils.pth_import import (
    classic_params_from_state_dict,
    classic_params_to_state_dict,
    load_classic_checkpoint,
)
from tests.torch_v12 import TorchClassicNeRF

PTH = "/root/reference/examples/nerf.pth"


def _rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    rays_d = rng.normal(size=(n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    return rays_o, rays_d


@pytest.fixture(scope="module")
def torch_lego():
    model = TorchClassicNeRF(normalize_position=6.0)
    model.load_state_dict(torch.load(PTH, map_location="cpu"))
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_lego():
    cfg = ClassicNeRFConfig(normalize_position=6.0)
    return ClassicNeRF(cfg), load_classic_checkpoint(PTH, cfg)


class TestCheckpointParity:
    def test_torch_reconstruction_loads_pth_exactly(self):
        # Every checkpoint tensor consumed, shapes as reconstructed.
        model = TorchClassicNeRF(normalize_position=6.0)
        sd = torch.load(PTH, map_location="cpu")
        missing, unexpected = model.load_state_dict(sd, strict=True), None
        assert not missing.missing_keys and not missing.unexpected_keys
        assert sum(p.numel() for p in model.parameters()) == 638_468

    def test_coarse_render_matches_jax(self, torch_lego, jax_lego):
        model, params = jax_lego
        rays_o, rays_d = _rays()
        render = RenderConfig(
            num_coarse_samples=32, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0,
        )
        with torch.no_grad():
            ref = torch_lego.render_rays(
                torch.from_numpy(rays_o), torch.from_numpy(rays_d),
                2.0, 6.0, 32,
            ).numpy()[..., 0, :]
        got = np.asarray(
            model.render_rays(
                params, None, jnp.asarray(rays_o), jnp.asarray(rays_d),
                render,
            ).rgb[..., -1, :]
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("reuse", [True, False])
    def test_hierarchical_render_matches_jax(self, torch_lego, jax_lego,
                                             reuse):
        # torch composites the SORTED merged set (gather/sort); the JAX
        # default composites the unsorted union order-free — deterministic
        # agreement validates the whole re-design chain (dense-mask
        # inverse CDF included).
        model, params = jax_lego
        rays_o, rays_d = _rays(48, seed=1)
        render = RenderConfig(
            num_coarse_samples=16, num_fine_samples=24, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0,
            reuse_coarse_in_fine=reuse,
        )
        with torch.no_grad():
            ref = torch_lego.render_rays(
                torch.from_numpy(rays_o), torch.from_numpy(rays_d),
                2.0, 6.0, 16, num_fine_samples=24,
            ).numpy()
        got = np.asarray(
            model.render_rays(
                params, None, jnp.asarray(rays_o), jnp.asarray(rays_d),
                render,
            ).rgb
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


class TestGradientOracle:
    def _grad_parity(self, cfg: ClassicNeRFConfig, render: RenderConfig,
                     states=None, atol=5e-3, loss_rtol=1e-5):
        """Random-init torch model -> export to JAX; MSE grads must agree
        under each framework's autodiff."""
        torch.manual_seed(0)
        tm = TorchClassicNeRF(
            hidden_size=cfg.hidden_size,
            normalize_position=cfg.normalize_position,
            density_inputs=cfg.density_inputs,
            color_inputs=cfg.color_inputs,
            use_viewdirs=cfg.use_viewdirs,
        )
        params = classic_params_from_state_dict(tm.state_dict(), cfg)
        model = ClassicNeRF(cfg)

        rays_o, rays_d = _rays(32, seed=2)
        rng = np.random.default_rng(3)
        pixels = rng.uniform(size=(32, 3)).astype(np.float32)
        sx = sd = None
        tsx = tsd = None
        if states is not None:
            kx, kd = states
            sx = rng.normal(size=(32, kx)).astype(np.float32)
            sd = rng.normal(size=(32, kd)).astype(np.float32)
            tsx, tsd = torch.from_numpy(sx), torch.from_numpy(sd)

        out = tm.render_rays(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d),
            render.near, render.far, render.num_coarse_samples,
            num_fine_samples=render.num_fine_samples,
            states_x=tsx, states_d=tsd,
        )
        loss_t = ((out - torch.from_numpy(pixels)[:, None, :]) ** 2).mean()
        loss_t.backward()
        torch_grads = {
            k: p.grad.numpy() for k, p in tm.named_parameters()
        }

        def loss_fn(p):
            o = model.render_rays(
                p, None, jnp.asarray(rays_o), jnp.asarray(rays_d), render,
                states_x=None if sx is None else jnp.asarray(sx),
                states_d=None if sd is None else jnp.asarray(sd),
            )
            return jnp.mean((o.rgb - jnp.asarray(pixels)[:, None, :]) ** 2)

        loss_j, jax_grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), rtol=loss_rtol
        )
        # Normalized comparison with a small outlier allowance: the two
        # frameworks reassociate sums differently (torch sequential
        # cumprod/cumsum vs the TPU ladders), and the L=10 encoding
        # amplifies f32 position-gradient noise by up to 2^9 * pi/2 — a
        # handful of near-ReLU-kink elements land ~1% of max apart while
        # 99.99% agree to 5e-3.
        got_sd = classic_params_to_state_dict(jax_grads)
        assert set(got_sd) == set(torch_grads)
        for name, ref in torch_grads.items():
            scale = np.abs(ref).max() + 1e-12
            err = np.abs(got_sd[name] / scale - ref / scale)
            n_outliers = int((err > atol).sum())
            assert err.max() < 10 * atol, (name, float(err.max()))
            assert n_outliers <= max(4, err.size // 2_000), (
                name, n_outliers, float(err.max())
            )

    def test_coarse_gradients_match(self):
        self._grad_parity(
            ClassicNeRFConfig(normalize_position=6.0),
            RenderConfig(num_coarse_samples=16, near=2.0, far=6.0,
                         randomly_sample=False, density_noise_std=0.0),
        )

    def test_hierarchical_gradients_match(self):
        # The deterministic inverse-CDF bin edges differ by ulps between
        # the frameworks' cumsum associations, shifting fine-sample
        # POSITIONS ~1e-6 — which the L=10 encoding amplifies into
        # percent-level gradient chaos that says nothing about either
        # implementation.  Both frameworks treat t_fine as a gradient-free
        # constant (stop_gradient / .detach()), so the clean oracle feeds
        # the SAME numeric fine samples to both and compares the full
        # stage-summed objective's gradients.  (The reuse formulation's
        # gradient equivalence to this re-evaluate objective is covered by
        # tests/test_hierarchical_reuse.py.)
        from nerf_tpu.ops import compositing, sampling

        cfg = ClassicNeRFConfig(normalize_position=6.0)
        torch.manual_seed(0)
        tm = TorchClassicNeRF(normalize_position=6.0)
        params = classic_params_from_state_dict(tm.state_dict(), cfg)
        model = ClassicNeRF(cfg)
        rays_o, rays_d = _rays(32, seed=2)
        pixels = np.random.default_rng(3).uniform(size=(32, 3)).astype(
            np.float32
        )

        # Fine t-values computed once (JAX path), fed to both frameworks.
        jo, jd = jnp.asarray(rays_o), jnp.asarray(rays_d)
        t_c = sampling.sample_linear(None, (32,), 8, 2.0, 6.0,
                                     randomly_sample=False)
        _, dens_c, _ = model.forward(params, jo, jd, t_c)
        w_c = compositing.weights_from_density(
            dens_c, compositing.distances_from_tvals(t_c, jd)
        )
        t_mids = 0.5 * (t_c[..., 1:] + t_c[..., :-1])
        t_fine = sampling.sample_pdf(None, t_mids, w_c[..., 1:-1, 0], 8,
                                     randomly_sample=False)
        t_all_j = sampling.merge_samples(t_c, t_fine)
        t_fine_np = np.asarray(t_fine)

        to, td = torch.from_numpy(rays_o), torch.from_numpy(rays_d)
        t_c_t = TorchClassicNeRF.sample_linear((32,), 8, 2.0, 6.0)

        def torch_stage(t_vals):
            density, color = tm(to, td, t_vals)
            w = tm.compositing_weights(density, t_vals, td)
            return (w * torch.sigmoid(color)).sum(dim=-2)

        t_all_t, _ = torch.sort(
            torch.cat([t_c_t, torch.from_numpy(t_fine_np)], dim=-1),
            dim=-1,
        )
        out_t = torch.stack(
            [torch_stage(t_c_t), torch_stage(t_all_t)], dim=-2
        )
        loss_t = ((out_t - torch.from_numpy(pixels)[:, None, :]) ** 2).mean()
        loss_t.backward()
        torch_grads = {k: p.grad.numpy() for k, p in tm.named_parameters()}

        def loss_fn(p):
            def stage(t_vals):
                _, density, color = model.forward(p, jo, jd, t_vals)
                w = compositing.weights_from_density(
                    density, compositing.distances_from_tvals(t_vals, jd)
                )
                return compositing.composite_rgb_with_background(
                    w, color, None
                )

            out = jnp.stack([stage(t_c), stage(t_all_j)], axis=-2)
            return jnp.mean((out - jnp.asarray(pixels)[:, None, :]) ** 2)

        loss_j, jax_grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), rtol=1e-5
        )
        got_sd = classic_params_to_state_dict(jax_grads)
        for name, ref in torch_grads.items():
            scale = np.abs(ref).max() + 1e-12
            err = np.abs(got_sd[name] / scale - ref / scale)
            assert err.max() < 5e-2, (name, float(err.max()))
            assert int((err > 5e-3).sum()) <= max(4, err.size // 2_000), (
                name, int((err > 5e-3).sum()), float(err.max())
            )

    def test_conditional_gradients_match(self):
        # The conditional-NeRF widened architecture
        # (train_conditional_nerf.py:103-104): latents appended to the raw
        # scalars before encoding, in both frameworks.
        self._grad_parity(
            ClassicNeRFConfig(normalize_position=6.0, density_inputs=5,
                              color_inputs=4),
            RenderConfig(num_coarse_samples=12, near=2.0, far=6.0,
                         randomly_sample=False, density_noise_std=0.0),
            states=(2, 1),
        )

    def test_no_viewdirs_gradients_match(self):
        self._grad_parity(
            ClassicNeRFConfig(normalize_position=6.0, use_viewdirs=False),
            RenderConfig(num_coarse_samples=16, near=2.0, far=6.0,
                         randomly_sample=False, density_noise_std=0.0),
        )
