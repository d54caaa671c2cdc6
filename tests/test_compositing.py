"""Compositing quadrature: reference parity + physical-property oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.ops import compositing


def torch_t(x):
    import torch

    return torch.as_tensor(np.asarray(x))


class TestWeights:
    def test_parity_with_reference(self, reference_nerf, rng):
        points = np.cumsum(
            rng.uniform(0.1, 0.5, size=(16, 32, 3)), axis=-2
        ).astype(np.float32)
        density = rng.normal(size=(16, 32, 1)).astype(np.float32) * 2.0
        ours = compositing.compositing_weights(
            jnp.asarray(points), jnp.asarray(density)
        )
        ref = reference_nerf.NeRF.alpha_compositing_coefficients(
            torch_t(points), torch_t(density)
        )
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-7)

    def test_gradient_parity_with_reference(self, reference_nerf, rng):
        # Gradient parity through cumprod-based transmittance — the epsilon
        # placement at reference model.py:468-469 changes gradients, so this
        # is the critical check (SURVEY §7 hard parts).
        import torch

        points = np.cumsum(
            rng.uniform(0.1, 0.5, size=(4, 16, 3)), axis=-2
        ).astype(np.float32)
        density = (rng.normal(size=(4, 16, 1)) * 2).astype(np.float32)

        g = jax.grad(
            lambda d: jnp.sum(
                compositing.compositing_weights(jnp.asarray(points), d) ** 2
            )
        )(jnp.asarray(density))

        td = torch_t(density).requires_grad_(True)
        w = reference_nerf.NeRF.alpha_compositing_coefficients(
            torch_t(points), td
        )
        (w ** 2).sum().backward()
        np.testing.assert_allclose(g, td.grad.numpy(), rtol=1e-4, atol=1e-6)

    def test_weights_sum_le_one(self, rng):
        points = np.cumsum(
            rng.uniform(0.1, 0.5, size=(64, 32, 3)), axis=-2
        ).astype(np.float32)
        density = rng.normal(size=(64, 32, 1)).astype(np.float32)
        w = np.asarray(
            compositing.compositing_weights(
                jnp.asarray(points), jnp.asarray(density)
            )
        )
        assert w.min() >= 0.0
        # Last interval is infinite (1e10 pad) so total weight ~ 1 whenever
        # any positive density exists; always <= 1 + tiny cumprod epsilon.
        assert w.sum(-2).max() <= 1.0 + 1e-4

    def test_brute_force_quadrature_oracle(self):
        # Transmittance from explicit products: w_i = (1-a_i) prod_{j<i} a_j.
        density = jnp.asarray([[[0.5], [2.0], [0.0], [1.0]]])
        t = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        dists = compositing.distances_from_tvals(t, d)
        w = np.asarray(compositing.weights_from_density(density, dists))[0, :, 0]
        a = np.exp(-np.maximum(np.asarray(density)[0, :, 0], 0)
                   * np.asarray(dists)[0, :, 0])
        expect = [(1 - a[0]),
                  (1 - a[1]) * (a[0] + 1e-10),
                  (1 - a[2]) * (a[0] + 1e-10) * (a[1] + 1e-10),
                  (1 - a[3]) * (a[0] + 1e-10) * (a[1] + 1e-10) * (a[2] + 1e-10)]
        np.testing.assert_allclose(w, expect, rtol=1e-5)

    def test_tval_distances_match_point_distances(self, rng):
        t = np.sort(rng.uniform(1, 6, size=(8, 16)), -1).astype(np.float32)
        o = rng.normal(size=(8, 3)).astype(np.float32)
        d = rng.normal(size=(8, 3)).astype(np.float32)
        points = o[:, None, :] + d[:, None, :] * t[..., None]
        d1 = compositing.distances_from_points(jnp.asarray(points))
        d2 = compositing.distances_from_tvals(jnp.asarray(t), jnp.asarray(d))
        np.testing.assert_allclose(d1, d2, rtol=1e-3, atol=1e-6)


class TestComposites:
    def test_rgb_in_unit_range(self, rng):
        w = rng.dirichlet(np.ones(16), size=(32,)).astype(np.float32)[..., None]
        logits = rng.normal(size=(32, 16, 3)).astype(np.float32) * 5
        rgb = np.asarray(
            compositing.composite_rgb(jnp.asarray(w), jnp.asarray(logits))
        )
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0

    def test_segmentation_parity_with_reference(self, rng):
        # Mirror of model.py:661-663 composite, checked against a direct
        # torch computation of the same formula.
        import torch

        w = rng.uniform(0, 0.2, size=(8, 16, 1)).astype(np.float32)
        logits = rng.normal(size=(8, 16, 50)).astype(np.float32)
        ours = compositing.composite_segmentation(
            jnp.asarray(w), jnp.asarray(logits)
        )
        tw, tl = torch_t(w), torch_t(logits)
        ref = (torch.log(tw + 1e-10)
               + torch.log_softmax(tl, dim=-1)).logsumexp(dim=-2)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_segmentation_is_expected_probability(self, rng):
        # exp(composite) == sum_i w_i softmax(seg_i) when eps is negligible.
        w = rng.dirichlet(np.ones(8), size=(4,)).astype(np.float32)[..., None]
        logits = rng.normal(size=(4, 8, 5)).astype(np.float32)
        out = np.exp(
            np.asarray(
                compositing.composite_segmentation(
                    jnp.asarray(w), jnp.asarray(logits)
                )
            )
        )
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        expect = (w * probs).sum(-2)
        np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-6)

    def test_depth_acc_background(self):
        w = jnp.asarray([[[0.25], [0.25]]])
        t = jnp.asarray([[1.0, 3.0]])
        assert abs(float(compositing.composite_depth(w, t)[0]) - 1.0) < 1e-6
        assert abs(float(compositing.composite_acc(w)[0]) - 0.5) < 1e-6
        logits = jnp.full((1, 2, 3), 100.0)  # sigmoid -> 1
        rgb = compositing.composite_rgb_with_background(
            w, logits, jnp.ones(3)
        )
        np.testing.assert_allclose(rgb, 1.0, rtol=1e-5)


class TestWhiteBackground:
    def test_render_config_white_background_is_honored(self):
        import jax
        from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig

        model = ClassicNeRF(ClassicNeRFConfig(normalize_position=6.0))
        params = model.init(jax.random.PRNGKey(0))
        # Force sigma < 0 everywhere (relu -> 0 density): fully transparent
        # rays, so acc ~ 0 and the white blend must dominate.  (With any
        # positive density the 1e10 far pad saturates opacity to ~1.)
        params["density"]["w"] = jnp.zeros_like(params["density"]["w"])
        params["density"]["b"] = params["density"]["b"] - 10.0
        rays_o = jnp.zeros((4, 3))
        rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
        base = RenderConfig(num_coarse_samples=8, near=1.0, far=2.0,
                            randomly_sample=False, density_noise_std=0.0)
        white = RenderConfig(num_coarse_samples=8, near=1.0, far=2.0,
                             randomly_sample=False, density_noise_std=0.0,
                             white_background=True)
        rgb_black = model.render_rays(params, None, rays_o, rays_d, base).rgb
        rgb_white = model.render_rays(params, None, rays_o, rays_d, white).rgb
        np.testing.assert_allclose(rgb_black, 0.0, atol=1e-6)
        np.testing.assert_allclose(rgb_white, 1.0, atol=1e-5)


class TestUnionDistsSorted:
    """The O(Sc*Sf) two-sorted-blocks specialization must equal the generic
    O(S^2) ``unsorted_dists`` on the concatenated set, including exact
    duplicate t-values (the (t, index) tie-break)."""

    def test_matches_generic(self, rng):
        n, sc, sf = 8, 6, 10
        t_c = np.sort(rng.uniform(2.0, 6.0, size=(n, sc)), -1).astype(
            np.float32
        )
        t_f = np.sort(rng.uniform(2.0, 6.0, size=(n, sf)), -1).astype(
            np.float32
        )
        # Force exact ties between (and within) the blocks, re-sorting so
        # each block stays sorted.
        t_f[:, 3] = t_c[:, 2]
        t_f[:, 4] = t_c[:, 2]
        t_f = np.sort(t_f, -1)
        rays_d = rng.normal(size=(n, 3)).astype(np.float32)
        ref = compositing.unsorted_dists(
            jnp.concatenate([jnp.asarray(t_c), jnp.asarray(t_f)], axis=-1),
            jnp.asarray(rays_d),
        )
        dist_c, dist_f = compositing.union_dists_sorted(
            jnp.asarray(t_c), jnp.asarray(t_f), jnp.asarray(rays_d)
        )
        np.testing.assert_array_equal(np.asarray(dist_c), ref[:, :sc])
        np.testing.assert_array_equal(np.asarray(dist_f), ref[:, sc:])


class TestWeightsFromUnionSorted:
    """The O(Sc*Sf) two-block weights must equal the generic order-free
    weights on the concatenated set (ties included), value and gradient."""

    def _case(self, rng, n=8, sc=6, sf=10):
        t_c = np.sort(rng.uniform(2.0, 6.0, size=(n, sc)), -1).astype(
            np.float32
        )
        t_f = np.sort(rng.uniform(2.0, 6.0, size=(n, sf)), -1).astype(
            np.float32
        )
        t_f[:, 3] = t_c[:, 2]  # exact cross-block tie
        t_f = np.sort(t_f, -1)
        d_c = rng.normal(size=(n, sc, 1)).astype(np.float32) * 2.0
        d_f = rng.normal(size=(n, sf, 1)).astype(np.float32) * 2.0
        rays_d = rng.normal(size=(n, 3)).astype(np.float32)
        return tuple(jnp.asarray(v) for v in (d_c, d_f, t_c, t_f, rays_d))

    def test_matches_generic(self, rng):
        d_c, d_f, t_c, t_f, rays_d = self._case(rng)
        ref = compositing.weights_from_unsorted(
            jnp.concatenate([d_c, d_f], axis=-2),
            jnp.concatenate([t_c, t_f], axis=-1),
            rays_d,
        )
        got = compositing.weights_from_union_sorted(d_c, d_f, t_c, t_f,
                                                    rays_d)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-7
        )

    def test_gradients_match_generic(self, rng):
        d_c, d_f, t_c, t_f, rays_d = self._case(rng, n=4)

        def loss_generic(dc, df):
            w = compositing.weights_from_unsorted(
                jnp.concatenate([dc, df], axis=-2),
                jnp.concatenate([t_c, t_f], axis=-1),
                rays_d,
            )
            return jnp.sum(jnp.sin(w * 3.0))

        def loss_block(dc, df):
            w = compositing.weights_from_union_sorted(dc, df, t_c, t_f,
                                                      rays_d)
            return jnp.sum(jnp.sin(w * 3.0))

        g_ref = jax.grad(loss_generic, argnums=(0, 1))(d_c, d_f)
        g_got = jax.grad(loss_block, argnums=(0, 1))(d_c, d_f)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )


class TestUnsortedWeights:
    """Order-free weights (the disjoint-stage hierarchical path) must equal
    the sorted-path quadrature up to product-reassociation rounding."""

    def _random_case(self, rng, n=16, s=24):
        t = np.sort(rng.uniform(2.0, 6.0, size=(n, s)), axis=-1).astype(
            np.float32
        )
        density = rng.normal(size=(n, s, 1)).astype(np.float32) * 2.0
        rays_d = rng.normal(size=(n, 3)).astype(np.float32)
        return jnp.asarray(t), jnp.asarray(density), jnp.asarray(rays_d)

    def test_matches_sorted_path_on_sorted_input(self, rng):
        t, density, rays_d = self._random_case(rng)
        sorted_w = compositing.weights_from_density(
            density, compositing.distances_from_tvals(t, rays_d)
        )
        unsorted_w = compositing.weights_from_unsorted(density, t, rays_d)
        np.testing.assert_allclose(
            np.asarray(unsorted_w), np.asarray(sorted_w), rtol=1e-5,
            atol=1e-6,
        )

    def test_permutation_equivariant(self, rng):
        t, density, rays_d = self._random_case(rng, n=8, s=16)
        perm = rng.permutation(16)
        w_ref = compositing.weights_from_unsorted(density, t, rays_d)
        w_shuf = compositing.weights_from_unsorted(
            density[:, perm], t[:, perm], rays_d
        )
        np.testing.assert_allclose(
            np.asarray(w_shuf), np.asarray(w_ref)[:, perm], rtol=1e-5,
            atol=1e-6,
        )

    def test_gradients_match_sorted_path(self, rng):
        t, density, rays_d = self._random_case(rng, n=4, s=12)

        def loss_sorted(d):
            w = compositing.weights_from_density(
                d, compositing.distances_from_tvals(t, rays_d)
            )
            return jnp.sum(w * jnp.tanh(jnp.arange(12.0))[:, None])

        def loss_unsorted(d):
            w = compositing.weights_from_unsorted(d, t, rays_d)
            return jnp.sum(w * jnp.tanh(jnp.arange(12.0))[:, None])

        g_s = jax.grad(loss_sorted)(density)
        g_u = jax.grad(loss_unsorted)(density)
        np.testing.assert_allclose(
            np.asarray(g_u), np.asarray(g_s), rtol=1e-4, atol=1e-5
        )

    def test_duplicate_t_values_match_sorted_path(self):
        # Regression: an inverse-CDF fine sample can land exactly on a
        # coarse fencepost.  With strict value comparisons both ties would
        # get the full next interval and exclude each other from
        # transmittance (weight sum > 1); the index tie-break must
        # reproduce the stable-merge semantics instead.
        t = jnp.asarray([[1.0, 2.0, 2.0, 3.0]])
        density = jnp.ones((1, 4, 1))
        rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
        w_sorted = compositing.weights_from_density(
            density, compositing.distances_from_tvals(t, rays_d)
        )
        w_unsorted = compositing.weights_from_unsorted(density, t, rays_d)
        np.testing.assert_allclose(
            np.asarray(w_unsorted), np.asarray(w_sorted), rtol=1e-6,
            atol=1e-7,
        )
        assert float(jnp.sum(w_unsorted)) <= 1.0 + 1e-6

    def test_duplicates_out_of_order_still_sum_le_one(self):
        # Ties split across an arbitrary input order (coarse ++ fine).
        t = jnp.asarray([[2.0, 1.0, 3.0, 2.0]])
        density = jnp.ones((1, 4, 1)) * 3.0
        rays_d = jnp.asarray([[0.0, 1.0, 0.0]])
        w = compositing.weights_from_unsorted(density, t, rays_d)
        assert float(jnp.sum(w)) <= 1.0 + 1e-6
