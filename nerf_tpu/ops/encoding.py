"""Positional encoders: classic NeRF frequency encoding and mip-NeRF IPE.

TPU-native re-design of the encoder math in the reference
(``/root/reference/nerf/model.py``):

* ``expected_sin``                ~ reference ``model.py:24-30``
* ``lift_gaussian``               ~ reference ``model.py:33-53`` (the
  reference's ``diag=False`` branch is dead code — it references ``jnp.eye``
  from inside a torch module and raises ``NameError``; here the full
  covariance path actually works)
* ``conical_frustum_to_gaussian`` ~ reference ``model.py:56-87``
* ``cylinder_to_gaussian``        ~ reference ``model.py:90-109``
* ``cast_rays``                   ~ reference ``model.py:112-136``
* ``integrated_pos_enc``          ~ reference ``model.py:139-163``
* ``frequency_encoding`` /
  ``bbox_frequency_scales``       ~ reference ``model.py:197-240`` (the
  classic per-scalar sin/cos encoder of the v1.2 generation)

Everything is a pure function on ``jnp`` arrays, shaped so XLA keeps the
sample axis on-chip and the feature axis contiguous in lanes.  All functions
broadcast over arbitrary leading batch dims.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def expected_sin(x: Array, x_var: Array) -> Tuple[Array, Array]:
    """Mean and variance of ``sin(z)`` for ``z ~ N(x, x_var)``.

    Mirrors reference ``model.py:24-30``: wide variances shrink the sine
    toward zero (the mechanism behind integrated positional encoding).
    """
    y = jnp.exp(-0.5 * x_var) * jnp.sin(x)
    y_var = jnp.maximum(
        0.0, 0.5 * (1.0 - jnp.exp(-2.0 * x_var) * jnp.cos(2.0 * x)) - y ** 2
    )
    return y, y_var


def lift_gaussian(
    d: Array, t_mean: Array, t_var: Array, r_var: Array, diag: bool = True
) -> Tuple[Array, Array]:
    """Lift a 1-D Gaussian along ray direction ``d`` to 3-D mean + covariance.

    Mirrors reference ``model.py:33-53``.  ``diag=True`` returns the diagonal
    of the covariance; ``diag=False`` returns full 3x3 covariances (the
    reference's full-covariance branch is broken — fixed here).
    """
    t_mean = jnp.asarray(t_mean, dtype=d.dtype)
    t_var = jnp.asarray(t_var, dtype=d.dtype)
    r_var = jnp.asarray(r_var, dtype=d.dtype)
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d ** 2, axis=-1, keepdims=True))

    if diag:
        d_outer_diag = d ** 2
        null_outer_diag = 1.0 - d_outer_diag / d_mag_sq
        t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
        xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag

    d_outer = d[..., :, None] * d[..., None, :]
    eye = jnp.eye(d.shape[-1], dtype=d.dtype)
    null_outer = eye - d[..., :, None] * (d / d_mag_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(
    d: Array,
    t0: Array,
    t1: Array,
    base_radius: Array,
    diag: bool = True,
    stable: bool = True,
) -> Tuple[Array, Array]:
    """Moment-matched Gaussian for the cone section ``[t0, t1]``.

    Mirrors reference ``model.py:56-87``.  ``base_radius`` is the cone radius
    at distance 1.  ``stable=True`` is mip-NeRF's numerically stable closed
    form; the unstable form is kept for cross-checking in tests.
    """
    if stable:
        mu = (t0 + t1) / 2.0
        hw = (t1 - t0) / 2.0
        t_mean = mu + (2.0 * mu * hw ** 2) / (3.0 * mu ** 2 + hw ** 2)
        t_var = (hw ** 2) / 3.0 - (4.0 / 15.0) * (
            (hw ** 4 * (12.0 * mu ** 2 - hw ** 2)) / (3.0 * mu ** 2 + hw ** 2) ** 2
        )
        r_var = base_radius ** 2 * (
            (mu ** 2) / 4.0
            + (5.0 / 12.0) * hw ** 2
            - (4.0 / 15.0) * (hw ** 4) / (3.0 * mu ** 2 + hw ** 2)
        )
    else:
        t_mean = (3.0 * (t1 ** 4 - t0 ** 4)) / (4.0 * (t1 ** 3 - t0 ** 3))
        r_var = base_radius ** 2 * (
            3.0 / 20.0 * (t1 ** 5 - t0 ** 5) / (t1 ** 3 - t0 ** 3)
        )
        t_mosq = 3.0 / 5.0 * (t1 ** 5 - t0 ** 5) / (t1 ** 3 - t0 ** 3)
        t_var = t_mosq - t_mean ** 2
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cylinder_to_gaussian(
    d: Array, t0: Array, t1: Array, radius: Array, diag: bool = True
) -> Tuple[Array, Array]:
    """Moment-matched Gaussian for a cylinder section. Ref ``model.py:90-109``."""
    t_mean = (t0 + t1) / 2.0
    r_var = radius ** 2 / 4.0
    t_var = (t1 - t0) ** 2 / 12.0
    return lift_gaussian(d, t_mean, t_var, r_var, diag)


def cast_rays(
    t_vals: Array,
    origins: Array,
    directions: Array,
    radii: Array,
    ray_shape: str = "cone",
    diag: bool = True,
) -> Tuple[Array, Array]:
    """Convert N fencepost distances into N-1 interval Gaussians.

    Mirrors reference ``model.py:112-136``: picks the cone/cylinder moment
    function and offsets means by the ray origin.  ``t_vals`` has shape
    ``[..., S]``; returns means/covs of shape ``[..., S-1, 3]`` (diag).
    """
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]
    if ray_shape == "cone":
        gaussian_fn = conical_frustum_to_gaussian
    elif ray_shape == "cylinder":
        gaussian_fn = cylinder_to_gaussian
    else:
        raise ValueError(f"unknown ray_shape: {ray_shape!r}")
    means, covs = gaussian_fn(directions, t0, t1, radii, diag)
    means = means + origins[..., None, :]
    return means, covs


def integrated_pos_enc(
    means: Array, covs_diag: Array, min_deg: int, max_deg: int
) -> Array:
    """Integrated positional encoding of Gaussians (mip-NeRF).

    Mirrors reference ``model.py:139-163``: scales means/diagonal covariances
    by ``2^[min_deg, max_deg)``, evaluates ``expected_sin`` at ``y`` and
    ``y + pi/2`` (sin and cos), returns the mean only.  Output feature dim is
    ``2 * D * (max_deg - min_deg)``.

    Feature layout matches the reference exactly:
    ``[sin(x0*s0), sin(x1*s0), sin(x2*s0), sin(x0*s1), ...]`` — i.e. the
    scale axis is outer, the coordinate axis inner, sin block then cos block.
    """
    scales = jnp.asarray(
        [2.0 ** i for i in range(min_deg, max_deg)], dtype=means.dtype
    )
    shape = means.shape[:-1] + (-1,)
    y = (means[..., None, :] * scales[:, None]).reshape(shape)
    y_var = (covs_diag[..., None, :] * scales[:, None] ** 2).reshape(shape)
    return expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var, y_var], axis=-1),
    )[0]


def bbox_frequency_scales(
    size: int, bbox_max_abs: float, dtype=jnp.float32
) -> Array:
    """Frequency scales of the classic (v1.2-generation) encoder.

    Mirrors reference ``model.py:216-224``: the lowest frequency is
    ``pi / (2 * bbox_max_abs)`` so that the coarsest sinusoid spans the scene
    bounding box; frequencies are octaves above it.  ``size`` counts
    sin+cos features per scalar, so there are ``size // 2`` frequencies.
    """
    if dtype != jnp.float32:
        return _compute_scales(size, bbox_max_abs, dtype)
    return jnp.asarray(frequency_scales_np(size, bbox_max_abs))


def _compute_scales(size: int, bbox_max_abs: float, dtype) -> Array:
    starting_frequency = -math.log2(bbox_max_abs)
    exponents = jnp.linspace(
        starting_frequency,
        starting_frequency + size / 2.0 - 1.0,
        size // 2,
        dtype=dtype,
    )
    return jnp.power(2.0, exponents) * (jnp.pi / 2.0)


# One CONSTANT per (size, bound), computed EAGERLY once and baked into
# every consumer: under jit, jnp.power constant-folds with different
# last-ulp rounding than eager dispatch, and the fused kernels that
# build frequency placements from these values (ops/pallas/fused_mega)
# must match the XLA encode path bitwise — a per-context computation
# cannot.  The cache is filled outside any trace (model construction
# prefills it; direct eager calls fill it too) and never from a traced
# value.  NOTE: the entries carry the computing backend's pow rounding
# (CPU under the test config, TPU on chip) — consistent within a
# process, which is the requirement.
_SCALES_CACHE: dict = {}


def frequency_scales_np(size: int, bbox_max_abs: float):
    """The cached eager f32 scale constant as a NUMPY array."""
    import numpy as np

    key = (int(size), float(bbox_max_abs))
    if key not in _SCALES_CACHE:
        value = _compute_scales(size, bbox_max_abs, jnp.float32)
        if isinstance(value, jax.core.Tracer):
            raise RuntimeError(
                "frequency scale constants must first be computed outside "
                "a trace (model construction prefills them)"
            )
        _SCALES_CACHE[key] = np.asarray(value)
    return _SCALES_CACHE[key]


def frequency_placement(size: int, bbox_max_abs: float, dims: int = 3):
    """Lane-placement constants for the FLAT frequency encoder: numpy
    ``(S [dims, dims*size], is_cos [1, dims*size])`` where row ``c``
    carries the ``size//2`` cached scales duplicated into scalar ``c``'s
    sin and cos lane blocks (``frequency_encoding``'s [sin(L), cos(L)]
    per-scalar layout).  Consumed by the fused kernels' in-kernel
    encoders (``ops/pallas/fused_mega``).  An XLA-side flat encoder
    built from these placements was tried for the eval path and
    REJECTED on measurement: the lane-select form evaluates both
    transcendentals full-width (479 ms/frame) and the per-scalar
    lane-concat form runs the sines at 10/128 lane utilization
    (745 ms/frame) — both worse than frequency_encoding's sample-axis
    vectorization plus the {0,1}->{1,0} transpose copies it forces at
    Pallas operand boundaries (425 ms/frame; ROOFLINE.md section 2)."""
    import numpy as np

    key = (int(size), float(bbox_max_abs), int(dims))
    if key not in _PLACEMENT_CACHE:
        L = size // 2
        f = frequency_scales_np(size, bbox_max_abs)
        S = np.zeros((dims, dims * size), np.float32)
        is_cos = np.zeros((1, dims * size), np.float32)
        for c in range(dims):
            S[c, c * size : c * size + L] = f
            S[c, c * size + L : c * size + 2 * L] = f
            is_cos[0, c * size + L : c * size + 2 * L] = 1.0
        _PLACEMENT_CACHE[key] = (S, is_cos)
    return _PLACEMENT_CACHE[key]


_PLACEMENT_CACHE: dict = {}


def frequency_encoding(x: Array, frequency_scales: Array) -> Array:
    """Classic per-scalar sin/cos frequency encoding.

    Mirrors reference ``model.py:226-240`` (minus the dead ``amplitude``
    term, which the reference computes but never applies).  Each scalar of
    the last axis is expanded to ``[sin(x*f_0..f_{L-1}), cos(x*f_0..f_{L-1})]``
    and the per-scalar blocks are concatenated:
    output dim = ``x.shape[-1] * 2 * L``.
    """
    xf = x[..., :, None] * frequency_scales  # [..., D, L]
    emb = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # [..., D, 2L]
    return emb.reshape(emb.shape[:-2] + (-1,))


def attenuated_frequency_encoding(
    x: Array, diag_covariance: Array, frequency_scales: Array
) -> Array:
    """Frequency encoding with IPE-style variance attenuation.

    The reference computes this amplitude at ``model.py:231-232`` but never
    multiplies it in (defect §2.4.3 of SURVEY.md).  This variant applies it,
    giving the classic encoder an anti-aliased mode:
    ``amplitude = exp(-0.5 * f^2 * var)`` per scalar and frequency.
    """
    xf = x[..., :, None] * frequency_scales
    amplitude = jnp.exp(
        -0.5 * (frequency_scales ** 2) * diag_covariance[..., :, None]
    )
    emb = jnp.concatenate(
        [amplitude * jnp.sin(xf), amplitude * jnp.cos(xf)], axis=-1
    )
    return emb.reshape(emb.shape[:-2] + (-1,))
