"""Scan-free cumulative ops (cumsum / cumprod) for TPU.

``jnp.cumsum`` / ``jnp.cumprod`` lower to a sequential ``while`` loop with a
dynamic-update-slice per step on TPU — profiled at ~500 ms of a 1.27 s
400x400 hierarchical render (plus matching DUS cost).  For the sample-axis
lengths NeRF uses (64–256), a Hillis–Steele doubling ladder is strictly
better: ceil(log2(S)) unrolled shift-and-combine steps, each a single fused
elementwise op over the whole array.  Static shapes, differentiable,
identical results up to float reassociation (the combine is applied in a
different association order; for f32 this is ~1 ulp per step).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def _doubling(x: Array, axis: int, combine, identity: float) -> Array:
    n = x.shape[axis]
    axis = axis % x.ndim
    k = 1
    while k < n:
        pad = jnp.full_like(
            jnp.take(x, jnp.arange(k), axis=axis), identity
        )
        shifted = jnp.concatenate(
            [pad, jnp.take(x, jnp.arange(n - k), axis=axis)], axis=axis
        )
        x = combine(x, shifted)
        k *= 2
    return x


def cumsum(x: Array, axis: int = -1) -> Array:
    """Inclusive cumulative sum along ``axis`` (scan-free, see module doc)."""
    return _doubling(x, axis, jnp.add, 0.0)


def cumprod(x: Array, axis: int = -1) -> Array:
    """Inclusive cumulative product along ``axis`` (scan-free)."""
    return _doubling(x, axis, jnp.multiply, 1.0)


def cummax(x: Array, axis: int = -1) -> Array:
    """Inclusive running maximum along ``axis`` (scan-free).

    Unlike the sum/product ladders this is EXACT (max is associative with
    no rounding), so it can repair ~1-ulp monotonicity inversions left by
    ``cumsum``'s reassociation — see ``sampling.sample_pdf``.
    """
    return _doubling(x, axis, jnp.maximum, -jnp.inf)
