"""Scan-free cumulative ops: exact parity with jnp.cumsum/cumprod."""

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.ops import cumulative


class TestDoublingLadder:
    def test_cumsum_matches_jnp(self):
        rng = np.random.default_rng(0)
        for shape, axis in [((7, 193), -1), ((5, 64, 1), -2), ((3,), 0),
                            ((4, 1), 0), ((2, 256, 1), 1)]:
            x = jnp.asarray(rng.normal(size=shape), jnp.float32)
            np.testing.assert_allclose(
                cumulative.cumsum(x, axis), jnp.cumsum(x, axis=axis),
                rtol=1e-5, atol=1e-5,
            )

    def test_cumprod_matches_jnp(self):
        rng = np.random.default_rng(1)
        for shape, axis in [((7, 193), -1), ((5, 64, 1), -2)]:
            x = jnp.asarray(rng.uniform(0.5, 1.5, size=shape), jnp.float32)
            np.testing.assert_allclose(
                cumulative.cumprod(x, axis), jnp.cumprod(x, axis=axis),
                rtol=1e-5, atol=1e-6,
            )

    def test_cummax_matches_numpy_and_repairs_inversions(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(5, 77)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(cumulative.cummax(jnp.asarray(x))),
            np.maximum.accumulate(x, axis=-1),
        )
        # A ~1-ulp inversion (the cumsum-reassociation artifact) becomes
        # a flat (monotone) step — max is exact, no rounding.
        v = np.array(
            [[0.0, 0.5, np.nextafter(0.5, 0.0, dtype=np.float32), 0.8]],
            np.float32,
        )
        out = np.asarray(cumulative.cummax(jnp.asarray(v)))
        assert (np.diff(out, axis=-1) >= 0).all()
        assert out[0, 2] == np.float32(0.5)

    def test_gradients_match(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(0.5, 1.5, size=(6, 33)), jnp.float32)
        g1 = jax.grad(lambda a: jnp.sum(jnp.sin(cumulative.cumprod(a))))(x)
        g2 = jax.grad(lambda a: jnp.sum(jnp.sin(jnp.cumprod(a, axis=-1))))(x)
        np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)
