"""Fully-fused train kernel (fwd + compositing + MSE + bwd in one Pallas
call): loss and gradients must match the two-kernel / XLA path.

Runs in Pallas interpret mode on CPU (like the other kernel tests); the
full-size reference architecture is required by the kernel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
from nerf_tpu.data import RayBank, synthesize_scene
from nerf_tpu.ops import compositing, sampling
from nerf_tpu.ops.pallas import fused_train
from nerf_tpu.train import (
    create_train_state,
    make_fused_loss_and_grads,
    make_fused_multi_step_train_fn,
    make_loss_fn,
    make_multi_step_train_fn,
)


@pytest.fixture(scope="module")
def scene():
    return synthesize_scene(num_views=3, image_hw=16, focal=20.0,
                            num_samples=64)


@pytest.fixture(scope="module")
def bank(scene):
    return RayBank.from_images(
        scene.images, scene.pose_o, scene.pose_r, scene.focal
    )


def full_model(dtype="float32"):
    # The kernel covers the reference architecture family only.
    return ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=6.0, use_pallas=False, compute_dtype=dtype
        )
    )


class TestLossAndGradParity:
    def _setup(self, bank, n_rays=32, num_samples=8, noise=False):
        model = full_model()
        params = model.init(jax.random.PRNGKey(0))
        batch = bank.gather(jnp.arange(n_rays))
        render = RenderConfig(
            num_coarse_samples=num_samples, near=2.0, far=6.0,
            randomly_sample=noise, density_noise_std=1.0 if noise else 0.0,
        )
        key = jax.random.PRNGKey(3) if noise else None
        return model, params, batch, render, key

    def _fused(self, model, params, batch, render, key):
        n_rays = batch["rays_o"].shape[0]
        s = render.num_coarse_samples
        if key is not None:
            k_strat, k_noise, _, _ = jax.random.split(key, 4)
        else:
            k_strat = k_noise = None
        t_vals = sampling.sample_linear(
            k_strat, (n_rays,), s, render.near, render.far,
            randomly_sample=render.randomly_sample,
            dtype=batch["rays_o"].dtype,
        )
        dists = compositing.distances_from_tvals(t_vals, batch["rays_d"])
        points = (
            batch["rays_o"][:, None, :]
            + batch["rays_d"][:, None, :] * t_vals[..., None]
        )
        x_enc = model.encode_position(points)
        dirs = jnp.broadcast_to(batch["rays_d"][:, None, :], points.shape)
        d_enc = model.encode_direction(dirs)
        if render.density_noise_std > 0.0:
            # [B, S] draw == render_rays' [B, S, 1] values (counter-based
            # PRNG is shape-layout invariant at equal element count).
            noise = render.density_noise_std * jax.random.normal(
                k_noise, (n_rays, s)
            )
        else:
            noise = jnp.zeros((n_rays, s))
        return fused_train.classic_train_grads_pallas(
            params, x_enc, d_enc, dists, noise, batch["pixels"], s,
            white_background=render.white_background,
        )

    def test_deterministic_loss_and_grads_match_xla(self, bank):
        model, params, batch, render, key = self._setup(bank)
        loss_fn = make_loss_fn(model, render)
        (loss_ref, _), grads_ref = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, None, batch)
        loss_fused, grads_fused = self._fused(
            model, params, batch, render, None
        )
        np.testing.assert_allclose(
            float(loss_fused), float(loss_ref), rtol=1e-5
        )
        # Normalized comparison: the in-kernel exp(sum log) transmittance
        # reassociates the cumprod, and near-zero gradient entries amplify
        # that float noise.
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a) / (np.abs(np.asarray(b)).max() + 1e-12),
                np.asarray(b) / (np.abs(np.asarray(b)).max() + 1e-12),
                atol=2e-4,
            ),
            grads_fused, grads_ref,
        )

    def test_white_background_loss_and_grads_match_xla(self, bank):
        model, params, batch, render, key = self._setup(bank)
        import dataclasses

        render = dataclasses.replace(render, white_background=True)
        loss_fn = make_loss_fn(model, render)
        (loss_ref, _), grads_ref = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, None, batch)
        loss_fused, grads_fused = self._fused(
            model, params, batch, render, None
        )
        np.testing.assert_allclose(
            float(loss_fused), float(loss_ref), rtol=1e-5
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a) / (np.abs(np.asarray(b)).max() + 1e-12),
                np.asarray(b) / (np.abs(np.asarray(b)).max() + 1e-12),
                atol=2e-4,
            ),
            grads_fused, grads_ref,
        )

    def test_stochastic_loss_and_grads_match_xla(self, bank):
        # Same PRNG key => same t-jitter and density noise as render_rays.
        model, params, batch, render, key = self._setup(bank, noise=True)
        loss_fn = make_loss_fn(model, render)
        (loss_ref, _), grads_ref = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, key, batch)
        loss_fused, grads_fused = self._fused(
            model, params, batch, render, key
        )
        np.testing.assert_allclose(
            float(loss_fused), float(loss_ref), rtol=1e-5
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a) / (np.abs(np.asarray(b)).max() + 1e-12),
                np.asarray(b) / (np.abs(np.asarray(b)).max() + 1e-12),
                atol=2e-4,
            ),
            grads_fused, grads_ref,
        )

    def test_unpack_roundtrips_pack(self):
        from nerf_tpu.ops.pallas.fused_mlp import pack_classic_params

        model = full_model()
        params = model.init(jax.random.PRNGKey(1))
        packed = pack_classic_params(params)
        restored = fused_train.unpack_classic_grads(packed, params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            restored, params,
        )


class TestFusedMultiStep:
    def test_matches_general_multi_step_losses(self, bank):
        model = full_model()
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                              randomly_sample=True, density_noise_std=0.5)
        runs = {}
        for name, maker in (
            ("general", make_multi_step_train_fn),
            ("fused", make_fused_multi_step_train_fn),
        ):
            run = maker(model, opt, render, bank, 32, 5)
            state = create_train_state(model.init(jax.random.PRNGKey(0)),
                                       opt)
            state, aux = run(state)
            runs[name] = np.asarray(jax.device_get(aux["loss"]))
        # Step 1 is a pure single-step parity check; later steps compound
        # the transmittance-reassociation float noise through Adam, so the
        # trajectory tolerance widens with step count (rtol 2e-2: the
        # round-5 cached frequency-scale constants shifted where the
        # per-step ulp noise lands and step 5 moved from ~0.8% to 1.28%
        # — steps 1-4 still agree to <=1%).
        np.testing.assert_allclose(
            runs["fused"][0], runs["general"][0], rtol=2e-4
        )
        np.testing.assert_allclose(
            runs["fused"], runs["general"], rtol=2e-2
        )

    def test_hierarchical_matches_general_reevaluate_losses(self, bank):
        # The fused hierarchical trainer implements the re-evaluate
        # (reuse_coarse_in_fine=False) formulation as two fused stages.
        model = full_model()
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              near=2.0, far=6.0, randomly_sample=True,
                              density_noise_std=0.5,
                              reuse_coarse_in_fine=False)
        runs = {}
        for name, maker in (
            ("general", make_multi_step_train_fn),
            ("fused", make_fused_multi_step_train_fn),
        ):
            run = maker(model, opt, render, bank, 32, 4)
            state = create_train_state(model.init(jax.random.PRNGKey(0)),
                                       opt)
            state, aux = run(state)
            runs[name] = np.asarray(jax.device_get(aux["loss"]))
        np.testing.assert_allclose(
            runs["fused"][0], runs["general"][0], rtol=5e-4
        )
        # Later steps: float-tolerance weight differences shift the
        # inverse-CDF fine-sample POSITIONS, so trajectories decorrelate
        # faster than the coarse-only case — the strict check is step 1.
        np.testing.assert_allclose(
            runs["fused"], runs["general"], rtol=5e-2
        )


def test_reuse_path_supports_nondefault_color_outputs(bank):
    # The coarse-cotangent slab width follows cfg.color_outputs (it was
    # once hard-coded to 3 — regression for the cols=4 out-of-bounds
    # lane write).
    del bank
    cfg = ClassicNeRFConfig(
        normalize_position=6.0, color_outputs=4, use_pallas=True
    )
    model = ClassicNeRF(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "rays_o": jnp.asarray(
            rng.normal(size=(32, 3)).astype(np.float32) * 0.5
        ),
        "rays_d": jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32)),
        "pixels": jnp.asarray(rng.uniform(size=(32, 4)).astype(np.float32)),
    }
    render = RenderConfig(
        num_coarse_samples=8, num_fine_samples=8, near=2.0, far=6.0,
        randomly_sample=False, density_noise_std=0.0,
        reuse_coarse_in_fine=True,
    )
    loss_fn = make_loss_fn(model, render)
    (ref_loss, _), ref_grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, None, batch
    )
    fused = make_fused_loss_and_grads(model, render)
    loss, grads, _ = fused(params, jax.random.PRNGKey(7), batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    err = max(
        jax.tree.leaves(
            jax.tree.map(
                lambda a, b: float(
                    jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-8)
                ),
                ref_grads,
                grads,
            )
        )
    )
    assert err < 5e-3


class TestFusedHierarchicalReuse:
    """The fused disjoint-stage (reuse_coarse_in_fine=True) trainer must
    match the general trainer's objective AND full gradient — the fine
    loss backprops through the reused coarse evaluations."""

    @pytest.fixture(autouse=True)
    def exact_ln_stats(self):
        # Two stacked 10-layer LN chains amplify the onepass/twopass
        # stat-formula reassociation past the parity tolerance (see
        # test_pallas.exact_ln_stats); pin the exact formula here.
        from nerf_tpu.ops.pallas import fused_mlp

        prev = fused_mlp._LN_STATS
        fused_mlp._LN_STATS = "twopass"
        yield
        fused_mlp._LN_STATS = prev

    def _norm_assert(self, got, want, atol):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a) / (np.abs(np.asarray(b)).max() + 1e-12),
                np.asarray(b) / (np.abs(np.asarray(b)).max() + 1e-12),
                atol=atol,
            ),
            got, want,
        )

    @pytest.mark.parametrize("noise", [False, True])
    @pytest.mark.parametrize("white", [False, True])
    def test_loss_and_grads_match_general(self, bank, noise, white):
        from nerf_tpu.ops.pallas import fused_hier

        # use_pallas=True so the general reference computes the coarse
        # forward through the SAME kernel: the inverse-CDF fine-sample
        # positions inherit any ~1e-6 coarse forward difference, and the
        # L=10 encoding amplifies position shifts ~500x into the
        # gradients — with identical coarse bits the comparison isolates
        # the fused fine stage itself.
        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=6.0, use_pallas=True)
        )
        params = model.init(jax.random.PRNGKey(0))
        batch = bank.gather(jnp.arange(32))
        render = RenderConfig(
            num_coarse_samples=8, num_fine_samples=8, near=2.0, far=6.0,
            randomly_sample=noise, density_noise_std=1.0 if noise else 0.0,
            white_background=white, reuse_coarse_in_fine=True,
        )
        key = jax.random.PRNGKey(7)
        loss_fn = make_loss_fn(model, render)
        (loss_ref, aux_ref), grads_ref = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, key, batch)
        loss_fused, grads_fused, aux_fused = (
            fused_hier.reuse_train_loss_and_grads(
                model, params, render, batch, key
            )
        )
        np.testing.assert_allclose(
            float(loss_fused), float(loss_ref), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(aux_fused["fine_mse"]), float(aux_ref["fine_mse"]),
            rtol=1e-4,
        )
        self._norm_assert(grads_fused, grads_ref, atol=2e-4)

    def test_odd_sample_counts(self, bank):
        # Non-power-of-two Sc/Sf exercise the ladder reach, the tiling
        # fallback, and the mask ray-id arithmetic.
        from nerf_tpu.ops.pallas import fused_hier

        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=6.0, use_pallas=True)
        )
        params = model.init(jax.random.PRNGKey(0))
        batch = bank.gather(jnp.arange(12))
        render = RenderConfig(
            num_coarse_samples=7, num_fine_samples=11, near=2.0, far=6.0,
            randomly_sample=True, density_noise_std=0.3,
            reuse_coarse_in_fine=True,
        )
        key = jax.random.PRNGKey(5)
        loss_fn = make_loss_fn(model, render)
        (loss_ref, _), grads_ref = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, key, batch)
        loss_fused, grads_fused, _ = (
            fused_hier.reuse_train_loss_and_grads(
                model, params, render, batch, key
            )
        )
        np.testing.assert_allclose(
            float(loss_fused), float(loss_ref), rtol=1e-5
        )
        self._norm_assert(grads_fused, grads_ref, atol=2e-4)

    def test_multi_step_matches_general_losses(self, bank):
        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=6.0, use_pallas=True)
        )
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              near=2.0, far=6.0, randomly_sample=True,
                              density_noise_std=0.5,
                              reuse_coarse_in_fine=True)
        runs = {}
        for name, maker in (
            ("general", make_multi_step_train_fn),
            ("fused", make_fused_multi_step_train_fn),
        ):
            run = maker(model, opt, render, bank, 32, 4)
            state = create_train_state(model.init(jax.random.PRNGKey(0)),
                                       opt)
            state, aux = run(state)
            runs[name] = np.asarray(jax.device_get(aux["loss"]))
        np.testing.assert_allclose(
            runs["fused"][0], runs["general"][0], rtol=5e-4
        )
        # Fine-sample POSITIONS shift with float-tolerance weight
        # differences, so trajectories decorrelate; step 1 is the strict
        # check (same rationale as the re-evaluate test above).
        np.testing.assert_allclose(
            runs["fused"], runs["general"], rtol=5e-2
        )


class TestFusedConfigVariants:
    """The fused kernels cover the remaining BASELINE configs: the
    ``use_viewdirs=False`` architecture (no view branch — the color head
    reads the trunk output) and latent-conditioned ("conditional NeRF")
    models, whose per-ray states widen the encodings before the kernel
    boundary (``train_conditional_nerf.py:103-104`` semantics)."""

    def _run_pair(self, bank, model, render, steps=4, batch=32):
        opt = optax.adam(1e-3)
        runs = {}
        for name, maker in (
            ("general", make_multi_step_train_fn),
            ("fused", make_fused_multi_step_train_fn),
        ):
            run = maker(model, opt, render, bank, batch, steps)
            state = create_train_state(
                model.init(jax.random.PRNGKey(0)), opt
            )
            state, aux = run(state)
            runs[name] = np.asarray(jax.device_get(aux["loss"]))
        np.testing.assert_allclose(
            runs["fused"][0], runs["general"][0], rtol=5e-4
        )
        np.testing.assert_allclose(runs["fused"], runs["general"], rtol=5e-2)

    def _latent_bank(self, scene, kx=2, kd=1):
        rng = np.random.default_rng(7)
        b = scene.images.shape[0]
        return RayBank.from_images(
            scene.images, scene.pose_o, scene.pose_r, scene.focal,
            states_x=rng.normal(size=(b, kx)).astype(np.float32),
            states_d=rng.normal(size=(b, kd)).astype(np.float32),
        )

    def test_no_viewdirs_coarse_matches_general(self, bank):
        model = ClassicNeRF(
            ClassicNeRFConfig(
                normalize_position=6.0, use_viewdirs=False,
                use_pallas=False,
            )
        )
        render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                              randomly_sample=True, density_noise_std=0.5)
        self._run_pair(bank, model, render)

    def test_no_viewdirs_hierarchical_reevaluate(self, bank):
        model = ClassicNeRF(
            ClassicNeRFConfig(
                normalize_position=6.0, use_viewdirs=False,
                use_pallas=False,
            )
        )
        render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                              near=2.0, far=6.0, randomly_sample=True,
                              density_noise_std=0.5,
                              reuse_coarse_in_fine=False)
        self._run_pair(bank, model, render)

    def test_no_viewdirs_hier_reuse_matches_general(self, bank):
        # fused_hier covers the no-view-branch architecture too (round-3
        # extension): loss AND gradient parity against the general trainer.
        from nerf_tpu.ops.pallas import fused_hier, fused_mlp
        from nerf_tpu.train.loop import supports_fused_train

        prev = fused_mlp._LN_STATS
        fused_mlp._LN_STATS = "twopass"
        try:
            model = ClassicNeRF(
                ClassicNeRFConfig(
                    normalize_position=6.0, use_viewdirs=False,
                    use_pallas=True,
                )
            )
            render = RenderConfig(
                num_coarse_samples=8, num_fine_samples=8, near=2.0,
                far=6.0, randomly_sample=True, density_noise_std=0.5,
                reuse_coarse_in_fine=True,
            )
            assert supports_fused_train(model, render)
            params = model.init(jax.random.PRNGKey(0))
            batch = bank.gather(jnp.arange(32))
            key = jax.random.PRNGKey(7)
            loss_fn = make_loss_fn(model, render)
            (loss_ref, _), grads_ref = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, key, batch)
            loss_fused, grads_fused, _ = (
                fused_hier.reuse_train_loss_and_grads(
                    model, params, render, batch, key
                )
            )
            np.testing.assert_allclose(
                float(loss_fused), float(loss_ref), rtol=1e-5
            )
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a) / (np.abs(np.asarray(b)).max() + 1e-12),
                    np.asarray(b) / (np.abs(np.asarray(b)).max() + 1e-12),
                    atol=2e-4,
                ),
                grads_fused, grads_ref,
            )
        finally:
            fused_mlp._LN_STATS = prev

    def test_latent_conditioned_coarse_matches_general(self, scene):
        bank = self._latent_bank(scene)
        model = ClassicNeRF(
            ClassicNeRFConfig(
                normalize_position=6.0, density_inputs=5, color_inputs=4,
                use_pallas=False,
            )
        )
        render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                              randomly_sample=True, density_noise_std=0.5)
        self._run_pair(bank, model, render)

    def test_latent_conditioned_hier_reuse_matches_general(self, scene):
        # Exercises fused_hier with widened (latent) encodings.
        from nerf_tpu.ops.pallas import fused_mlp

        prev = fused_mlp._LN_STATS
        fused_mlp._LN_STATS = "twopass"
        try:
            bank = self._latent_bank(scene)
            model = ClassicNeRF(
                ClassicNeRFConfig(
                    normalize_position=6.0, density_inputs=5,
                    color_inputs=4, use_pallas=False,
                )
            )
            render = RenderConfig(num_coarse_samples=8, num_fine_samples=8,
                                  near=2.0, far=6.0, randomly_sample=True,
                                  density_noise_std=0.5,
                                  reuse_coarse_in_fine=True)
            self._run_pair(bank, model, render)
        finally:
            fused_mlp._LN_STATS = prev


class TestSegmentedLadders:
    def test_prefix_suffix_match_numpy_for_odd_sample_counts(self):
        # The Hillis-Steele doubling with pos-guards must be exact for any
        # S (not just powers of two) — the ladder reach must cover S-1.
        from nerf_tpu.ops.pallas.fused_train import (
            _seg_exclusive_prefix,
            _seg_exclusive_suffix,
        )

        rng = np.random.default_rng(0)
        for s in (2, 3, 5, 7, 12, 17, 33, 64):
            rays = 6
            v = rng.normal(size=(rays * s, 2)).astype(np.float32)
            pos = np.arange(rays * s).reshape(-1, 1) % s
            got_p = np.asarray(
                _seg_exclusive_prefix(jnp.asarray(v), jnp.asarray(pos), s)
            )
            got_s = np.asarray(
                _seg_exclusive_suffix(jnp.asarray(v), jnp.asarray(pos), s)
            )
            seg = v.reshape(rays, s, 2)
            cs = np.cumsum(seg, axis=1)
            want_p = np.concatenate(
                [np.zeros((rays, 1, 2), np.float32), cs[:, :-1]], axis=1
            ).reshape(-1, 2)
            rs = np.cumsum(seg[:, ::-1], axis=1)[:, ::-1]
            want_s = np.concatenate(
                [rs[:, 1:], np.zeros((rays, 1, 2), np.float32)], axis=1
            ).reshape(-1, 2)
            # atol 1e-5: the ladder and numpy's cumsum reassociate sums
            # of up to S f32 terms differently.
            np.testing.assert_allclose(got_p, want_p, rtol=1e-5, atol=1e-5,
                                       err_msg=f"prefix S={s}")
            np.testing.assert_allclose(got_s, want_s, rtol=1e-5, atol=1e-5,
                                       err_msg=f"suffix S={s}")


class TestFusedResumeExactness:
    def test_k_fused_steps_equal_split_runs(self, bank):
        # Per-step keys derive from fold_in(state.key, state.step), so
        # 4+4 fused steps must be bit-identical to 8 (resume safety).
        model = full_model()
        opt = optax.adam(1e-3)
        render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                              randomly_sample=True, density_noise_std=0.5)
        run8 = make_fused_multi_step_train_fn(model, opt, render, bank,
                                              32, 8)
        s = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        s, aux8 = run8(s)
        losses8 = np.asarray(jax.device_get(aux8["loss"]))

        run4 = make_fused_multi_step_train_fn(model, opt, render, bank,
                                              32, 4)
        s2 = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        s2, aux_a = run4(s2)
        s2, aux_b = run4(s2)
        losses44 = np.concatenate([
            np.asarray(jax.device_get(aux_a["loss"])),
            np.asarray(jax.device_get(aux_b["loss"])),
        ])
        np.testing.assert_array_equal(losses44, losses8)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
            ),
            s2.params, s.params,
        )
