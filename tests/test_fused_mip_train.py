"""Parity tests for the fully-fused mip train kernel.

``fused_mip_train.mip_train_loss_and_grads`` must reproduce the general
path — ``jax.grad`` of ``make_loss_fn(MipNeRF, ...)`` — to float
tolerance for every objective knob: segmentation CE on/off, density
noise, white background, odd interval counts.  The general path is
itself oracle-tested against the torch reference
(``tests/test_model_parity.py``), so agreement here chains to the
reference semantics (``model.py:553-668``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu import MipNeRF, MipNeRFConfig, RenderConfig
from nerf_tpu.ops.pallas import fused_mip_train
from nerf_tpu.train.loop import make_loss_fn


def _batch(n, cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "rays_o": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "rays_d": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "pixels": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(0, cfg.segmentation_outputs, size=(n,))
        ),
    }


def _max_rel_err(ref, got):
    errs = jax.tree.map(
        lambda a, b: float(
            jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-8)
        ),
        ref,
        got,
    )
    return max(jax.tree.leaves(errs))


@pytest.mark.parametrize("seg_weight", [0.0, 0.25])
@pytest.mark.parametrize("noise", [0.0, 1.0])
def test_matches_general_path(seg_weight, noise):
    cfg = MipNeRFConfig()
    model = MipNeRF(cfg)
    params = model.init(jax.random.PRNGKey(0))
    render = RenderConfig(
        num_coarse_samples=16,
        randomly_sample=noise > 0.0,
        density_noise_std=noise,
    )
    batch = _batch(8, cfg)
    key = jax.random.PRNGKey(7) if noise > 0.0 else None

    loss_fn = make_loss_fn(model, render, seg_weight)
    (ref_loss, ref_aux), ref_grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params, key, batch)
    loss, grads, aux = fused_mip_train.mip_train_loss_and_grads(
        model, params, render, batch, key, seg_weight
    )

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        float(aux["rgb_loss"]), float(ref_aux["rgb_loss"]), rtol=1e-5
    )
    if seg_weight > 0.0:
        np.testing.assert_allclose(
            float(aux["seg_loss"]), float(ref_aux["seg_loss"]), rtol=1e-5
        )
    assert _max_rel_err(ref_grads, grads) < 3e-5


def test_white_background_and_odd_rows():
    # 14 fenceposts -> 13 interval rows exercises the non-power-of-two
    # segmented-ladder guards; white background flips the dL/dw offset.
    cfg = MipNeRFConfig()
    model = MipNeRF(cfg)
    params = model.init(jax.random.PRNGKey(1))
    render = RenderConfig(
        num_coarse_samples=14,
        randomly_sample=True,
        density_noise_std=0.5,
        white_background=True,
    )
    batch = _batch(6, cfg, seed=3)
    key = jax.random.PRNGKey(11)

    loss_fn = make_loss_fn(model, render, 0.1)
    (ref_loss, _), ref_grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, key, batch
    )
    loss, grads, _ = fused_mip_train.mip_train_loss_and_grads(
        model, params, render, batch, key, 0.1
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    assert _max_rel_err(ref_grads, grads) < 3e-5


def test_multi_step_matches_general_losses():
    # The trainer-level integration: make_fused_multi_step_train_fn must
    # track make_multi_step_train_fn's loss trajectory for the mip model
    # (same fold_key/0x5A17 PRNG scheme => same batches, same noise).
    import optax

    from nerf_tpu.data import RayBank, synthesize_scene
    from nerf_tpu.train import create_train_state
    from nerf_tpu.train.loop import (
        make_fused_multi_step_train_fn,
        make_multi_step_train_fn,
        supports_fused_train,
    )

    scene = synthesize_scene(num_views=2, image_hw=8, with_labels=True)
    bank = RayBank.from_images(
        scene.images, scene.pose_o, scene.pose_r, scene.focal,
        labels=scene.labels,
    )
    cfg = MipNeRFConfig()
    model = MipNeRF(cfg)
    render = RenderConfig(
        num_coarse_samples=8, randomly_sample=True, density_noise_std=0.5
    )
    assert supports_fused_train(model, render)
    opt = optax.adam(1e-3)
    runs = {}
    for name, maker in (
        ("general", make_multi_step_train_fn),
        ("fused", make_fused_multi_step_train_fn),
    ):
        run = maker(model, opt, render, bank, 32, 4,
                    segmentation_loss_weight=0.1)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        state, aux = run(state)
        runs[name] = np.asarray(jax.device_get(aux["loss"]))
    np.testing.assert_allclose(runs["fused"][0], runs["general"][0],
                               rtol=2e-4)
    np.testing.assert_allclose(runs["fused"], runs["general"], rtol=1e-2)


class TestFusedMipEval:
    """The forward-only fused mip eval kernel must match the XLA path
    (MLP + cumprod compositing + logsumexp seg composite) on rgb, full
    seg log-probs, depth, and acc."""

    def _pair(self, render, n=64):
        rng = np.random.default_rng(2)
        rays_o = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        rays_d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        outs = {}
        for pallas in (False, True):
            cfg = MipNeRFConfig(use_pallas=pallas)
            model = MipNeRF(cfg)
            params = model.init(jax.random.PRNGKey(0))
            if pallas:
                assert model._use_fused_eval(render, rays_o)
            outs[pallas] = model.render_rays(
                params, None, rays_o, rays_d, render, fused_eval=pallas
            )
        return outs

    @pytest.mark.parametrize("white", [False, True])
    def test_matches_xla_path(self, white):
        render = RenderConfig(
            num_coarse_samples=16, randomly_sample=False,
            density_noise_std=0.0, white_background=white,
        )
        outs = self._pair(render)
        np.testing.assert_allclose(
            np.asarray(outs[True].rgb), np.asarray(outs[False].rgb),
            rtol=5e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True].segmentation),
            np.asarray(outs[False].segmentation),
            rtol=5e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True].depth), np.asarray(outs[False].depth),
            rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(outs[True].acc), np.asarray(outs[False].acc),
            rtol=5e-4, atol=1e-5,
        )

    def test_render_image_matches(self):
        from nerf_tpu.data.scenes import spherical_poses

        pose_o, pose_r = spherical_poses(1, radius=4.0)
        render = RenderConfig(
            num_coarse_samples=8, randomly_sample=False,
            density_noise_std=0.0, rays_per_tile=128,
        )
        imgs = {}
        for pallas in (False, True):
            model = MipNeRF(MipNeRFConfig(use_pallas=pallas))
            params = model.init(jax.random.PRNGKey(0))
            rgb, seg = model.render_image(
                params, None, pose_o, pose_r, 16, 16, 20.0, render
            )
            imgs[pallas] = (np.asarray(rgb), np.asarray(seg))
        np.testing.assert_allclose(
            imgs[True][0], imgs[False][0], rtol=5e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            imgs[True][1], imgs[False][1], rtol=5e-4, atol=1e-4
        )


def test_bfloat16_compute_runs():
    # bf16 compute is a throughput knob, not a parity contract: just assert
    # the kernel runs and tracks the f32 loss loosely.
    cfg = MipNeRFConfig(compute_dtype="bfloat16")
    model = MipNeRF(cfg)
    params = model.init(jax.random.PRNGKey(2))
    render = RenderConfig(num_coarse_samples=16, randomly_sample=False)
    batch = _batch(8, cfg, seed=5)
    loss, grads, _ = fused_mip_train.mip_train_loss_and_grads(
        model, params, render, batch, None, 0.0
    )
    f32 = MipNeRF(MipNeRFConfig())
    ref_loss, _, _ = fused_mip_train.mip_train_loss_and_grads(
        f32, params, render, batch, None, 0.0
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=0.05)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))
