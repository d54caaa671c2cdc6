"""Training stack: loss semantics, convergence, checkpoint/resume, interop."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from nerf_tpu import (
    ClassicNeRF,
    ClassicNeRFConfig,
    MipNeRF,
    MipNeRFConfig,
    RenderConfig,
    TrainConfig,
)
from nerf_tpu.data import RayBank, synthesize_scene
from nerf_tpu.train import (
    Trainer,
    checkpoint,
    create_train_state,
    evaluate,
    make_loss_fn,
    make_sampling_train_step,
    make_train_step,
    mse_to_psnr,
)


def tiny_model():
    cfg = ClassicNeRFConfig(
        normalize_position=6.0,
        x_positional_encoding_size=12,
        d_positional_encoding_size=8,
        hidden_size=32,
        trunk_blocks=(2, 2),
        view_branch_depth=1,
    )
    return ClassicNeRF(cfg)


@pytest.fixture(scope="module")
def small_scene():
    return synthesize_scene(num_views=4, image_hw=24, focal=30.0,
                            num_samples=192)


class TestLossSemantics:
    def test_stage_summed_mse(self):
        # Loss must average the squared error over ALL stages (reference
        # broadcast at train_conditional_nerf.py:132), not just the finest.
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              randomly_sample=False, density_noise_std=0.0)
        loss_fn = make_loss_fn(model, render)
        batch = {
            "rays_o": jnp.zeros((8, 3)),
            "rays_d": jnp.ones((8, 3)),
            "pixels": jnp.full((8, 3), 0.5),
        }
        loss, aux = loss_fn(params, None, batch)
        out = model.render_rays(params, None, batch["rays_o"],
                                batch["rays_d"], render)
        expect = jnp.mean((out.rgb - 0.5) ** 2)
        np.testing.assert_allclose(loss, expect, rtol=1e-6)
        assert out.rgb.shape[-2] == 2  # two stages present

    def test_psnr_formula_matches_reference(self):
        # -10 * ln(mse) / 2.30258509299 (train_conditional_nerf.py:152-153)
        mse = 0.01
        np.testing.assert_allclose(
            float(mse_to_psnr(mse)), -10.0 * np.log(mse) / 2.30258509299,
            rtol=1e-6,
        )


class TestTrainStep:
    def test_loss_decreases(self, small_scene):
        model = tiny_model()
        bank = RayBank.from_images(
            small_scene.images, small_scene.pose_o, small_scene.pose_r,
            small_scene.focal,
        )
        opt = optax.adam(5e-4)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        step = make_sampling_train_step(
            model, opt,
            RenderConfig(num_coarse_samples=16, density_noise_std=0.2),
            bank, batch_size=128,
        )
        losses = []
        for _ in range(60):
            state, aux = step(state)
            losses.append(float(aux["loss"]))
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.7
        assert int(state.step) == 60

    def test_step_is_deterministic_given_state(self, small_scene):
        model = tiny_model()
        bank = RayBank.from_images(
            small_scene.images, small_scene.pose_o, small_scene.pose_r,
            small_scene.focal,
        )
        opt = optax.adam(1e-4)
        render = RenderConfig(num_coarse_samples=8, density_noise_std=1.0)
        s0 = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        step = make_sampling_train_step(model, opt, render, bank, 32)
        s1a, aux_a = step(s0)
        # rebuild everything: same state must give the same result
        step2 = make_sampling_train_step(model, opt, render, bank, 32)
        s1b, aux_b = step2(s0)
        np.testing.assert_allclose(
            float(aux_a["loss"]), float(aux_b["loss"]), rtol=1e-6
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
            s1a.params, s1b.params,
        )

    def test_gradients_cover_all_parameters(self):
        # Every parameter must receive nonzero gradient from the RGB loss
        # (density head via weights, color head via composite, all layers).
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        loss_fn = make_loss_fn(
            model, RenderConfig(num_coarse_samples=8, randomly_sample=False,
                                density_noise_std=0.0)
        )
        key = jax.random.PRNGKey(1)
        batch = {
            "rays_o": jax.random.normal(key, (16, 3)),
            "rays_d": jax.random.normal(key, (16, 3)),
            "pixels": jnp.full((16, 3), 0.3),
        }
        grads = jax.grad(lambda p: loss_fn(p, None, batch)[0])(params)
        for path, g in jax.tree_util.tree_flatten_with_path(grads)[0]:
            assert float(jnp.abs(g).max()) > 0, (
                f"zero gradient at {jax.tree_util.keystr(path)}"
            )


class TestMipTraining:
    def test_segmentation_loss_trains(self):
        scene = synthesize_scene(num_views=2, image_hw=16, num_samples=128,
                                 with_labels=True)
        cfg = MipNeRFConfig(hidden_size=32, encoding_size=8,
                            num_hidden_layers=2, segmentation_outputs=6,
                            focal_length=30.0)
        model = MipNeRF(cfg)
        bank = RayBank.from_images(
            scene.images, scene.pose_o, scene.pose_r, scene.focal,
            labels=scene.labels,
        )
        opt = optax.adam(1e-3)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        step = make_sampling_train_step(
            model, opt, RenderConfig(num_coarse_samples=16),
            bank, 64, segmentation_loss_weight=0.1,
        )
        seg_losses = []
        for _ in range(40):
            state, aux = step(state)
            seg_losses.append(float(aux["seg_loss"]))
        assert seg_losses[-1] < seg_losses[0]


class TestCheckpoint:
    def test_save_restore_round_trip(self, tmp_path):
        model = tiny_model()
        opt = optax.adam(1e-4)
        state = create_train_state(model.init(jax.random.PRNGKey(3)), opt, 3)
        state = state._replace(step=jnp.asarray(42, jnp.int32))
        path = checkpoint.save_checkpoint(str(tmp_path), state)
        assert os.path.basename(path) == "checkpoint_42.npz"
        template = create_train_state(model.init(jax.random.PRNGKey(9)), opt)
        restored = checkpoint.restore_checkpoint(path, template)
        assert int(restored.step) == 42
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            state.params, restored.params,
        )

    def test_structure_mismatch_fails_loudly(self, tmp_path):
        model = tiny_model()
        opt = optax.adam(1e-4)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        path = checkpoint.save_checkpoint(str(tmp_path), state)
        other = ClassicNeRF(ClassicNeRFConfig(hidden_size=16,
                                              trunk_blocks=(1, 1)))
        bad_template = create_train_state(
            other.init(jax.random.PRNGKey(0)), opt
        )
        with pytest.raises(ValueError):
            checkpoint.restore_checkpoint(path, bad_template)

    def test_retention(self, tmp_path):
        model = tiny_model()
        opt = optax.adam(1e-4)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        for s in range(6):
            checkpoint.save_checkpoint(
                str(tmp_path), state._replace(step=jnp.asarray(s)), keep=3
            )
        names = checkpoint.all_checkpoints(str(tmp_path))
        assert names == ["checkpoint_3.npz", "checkpoint_4.npz",
                         "checkpoint_5.npz"]

    def test_resume_continues_identically(self, small_scene, tmp_path):
        # Train 10 steps straight vs train 5 + checkpoint + resume + 5:
        # identical final params (fold_in(step) keys make resume exact).
        model = tiny_model()
        bank = RayBank.from_images(
            small_scene.images, small_scene.pose_o, small_scene.pose_r,
            small_scene.focal,
        )
        opt = optax.adam(1e-4)
        render = RenderConfig(num_coarse_samples=8, density_noise_std=0.5)
        step = make_sampling_train_step(model, opt, render, bank, 32)

        s = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        for _ in range(10):
            s, _ = step(s)

        s2 = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        for _ in range(5):
            s2, _ = step(s2)
        path = checkpoint.save_checkpoint(str(tmp_path), s2)
        template = create_train_state(model.init(jax.random.PRNGKey(7)), opt)
        s2 = checkpoint.restore_checkpoint(path, template)
        for _ in range(5):
            s2, _ = step(s2)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
            s.params, s2.params,
        )

    def test_export_reference_pth_loads_in_reference(self, tmp_path,
                                                     reference_nerf):
        # Interop: a ClassicNeRF trained here must save as a .pth the
        # reference layout understands (full-size architecture).
        import torch

        model = ClassicNeRF(ClassicNeRFConfig())
        params = model.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "export.pth")
        checkpoint.export_reference_pth(path, params)
        sd = torch.load(path, map_location="cpu")
        orig = torch.load("/root/reference/examples/nerf.pth",
                          map_location="cpu")
        assert set(sd) == set(orig)
        for k in sd:
            assert sd[k].shape == orig[k].shape


class TestTrainerChunking:
    def test_chunked_fit_is_bit_identical_to_single_steps(self, small_scene):
        # Trainer.fit runs K-step lax.scan chunks; the fold_in(key, step)
        # PRNG scheme must make that bit-identical to stepping one at a
        # time (also the resume-safety property).
        from nerf_tpu.train.loop import make_sampling_train_step

        model = tiny_model()
        bank = RayBank.from_images(
            small_scene.images[:-1], small_scene.pose_o[:-1],
            small_scene.pose_r[:-1], small_scene.focal,
        )
        render = RenderConfig(num_coarse_samples=16, density_noise_std=0.2)
        opt = optax.adam(5e-4)

        trainer = Trainer(
            model, render,
            TrainConfig(batch_size=64, learning_rate=5e-4, log_interval=5,
                        eval_interval=10, checkpoint_interval=10, seed=0),
            optimizer=opt,
        )
        state = trainer.fit(bank, num_steps=10)

        single = make_sampling_train_step(model, opt, render, bank, 64)
        ref = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        for _ in range(10):
            ref, _ = single(ref)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
            ),
            state.params, ref.params,
        )

    def test_irregular_boundaries_compile_partial_chunks(self, small_scene):
        # num_steps not a multiple of the interval gcd: the tail chunk is
        # shorter, and log/checkpoint boundaries still land exactly.
        model = tiny_model()
        bank = RayBank.from_images(
            small_scene.images[:-1], small_scene.pose_o[:-1],
            small_scene.pose_r[:-1], small_scene.focal,
        )
        trainer = Trainer(
            model,
            RenderConfig(num_coarse_samples=16, density_noise_std=0.2),
            TrainConfig(batch_size=64, learning_rate=5e-4, log_interval=4,
                        eval_interval=8, checkpoint_interval=8),
        )
        state = trainer.fit(bank, num_steps=10)
        assert int(jax.device_get(state.step)) == 10
        steps = [r["step"] for r in trainer.metrics.history]
        assert 4 in steps and 8 in steps and 10 in steps


class TestTrainerEndToEnd:
    def test_fit_improves_psnr_and_logs(self, small_scene, tmp_path):
        model = tiny_model()
        bank = RayBank.from_images(
            small_scene.images[:-1], small_scene.pose_o[:-1],
            small_scene.pose_r[:-1], small_scene.focal,
        )
        trainer = Trainer(
            model,
            RenderConfig(num_coarse_samples=16, density_noise_std=0.2,
                         rays_per_tile=576),
            TrainConfig(batch_size=128, learning_rate=5e-4, log_interval=50,
                        eval_interval=100, checkpoint_interval=100),
            logging_dir=str(tmp_path),
        )
        state = trainer.fit(bank, eval_scene=small_scene, num_steps=200)
        psnrs = trainer.metrics.series("psnr")
        assert len(psnrs) >= 2
        assert psnrs[-1] > 14.0  # synthetic scene trains fast
        assert os.path.exists(tmp_path / "metrics.jsonl")
        assert os.path.exists(tmp_path / "psnrs.npy")
        assert checkpoint.latest_checkpoint(str(tmp_path)) is not None
        # Trainer.init_state resumes from the saved checkpoint.
        resumed = trainer.init_state(resume=True)
        assert int(resumed.step) == 200
