"""Ray samplers: stratified coarse sampling and inverse-CDF fine sampling.

TPU-native re-design of the sampling logic in the reference
(``/root/reference/nerf/model.py``):

* ``sample_log_bbox``   ~ reference ``NeRF.sample_along_rays``
  (``model.py:369-435``): log-spaced fenceposts between ``2^-9.436...`` and
  ``1`` scaled by the bbox diagonal, with optional midpoint-bounded jitter.
* ``sample_linear``     ~ the v1.2-generation semantics (notebook cell 8,
  ``train_conditional_nerf.py:120-128``): linear stratified samples between
  explicit near/far planes, same midpoint-bounded jitter.
* ``sample_pdf``        ~ the hierarchical inverse-CDF sampler promised by the
  reference docstrings (``model.py:191-193, 503-505`` — "later stages sample
  along rays using an empirical cdf"); its v1.2 source is gone, so this
  follows the NeRF paper's spec: piecewise-constant PDF from coarse weights →
  CDF → inverse-transform sampling.  Static shapes, ``jit``/``vmap`` safe.

All randomness is explicit through JAX PRNG keys (replacing ``torch.rand`` at
reference ``model.py:432``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nerf_tpu.ops import cumulative

Array = jax.Array

# Reference constant at model.py:414: 2^-9.43633744014 * bbox_diagonal ~= 0.1
# world units of near plane for the default +-20 bbox.
LOG_SAMPLING_MIN_EXPONENT = -9.43633744014


def _stratified_jitter(key: jax.Array, samples: Array) -> Array:
    """Jitter fencepost samples uniformly within midpoint-bounded bins.

    Mirrors reference ``model.py:422-433``: bin ``i`` spans
    ``[mid(i-1,i), mid(i,i+1)]`` with the first/last bins clamped at the
    endpoints.
    """
    midpoints = 0.5 * (samples[..., 1:] + samples[..., :-1])
    lower = jnp.concatenate([samples[..., :1], midpoints], axis=-1)
    upper = jnp.concatenate([midpoints, samples[..., -1:]], axis=-1)
    u = jax.random.uniform(key, samples.shape, dtype=samples.dtype)
    return lower + (upper - lower) * u


def sample_log_bbox(
    key: Optional[jax.Array],
    batch_shape: Sequence[int],
    num_samples: int,
    bbox_diagonal: Array,
    randomly_sample: bool = True,
    dtype=jnp.float32,
) -> Array:
    """HEAD-generation sampler: log-spaced t-values scaled by the bbox diagonal.

    ``t = 2^linspace(-9.436..., 0, S) * ||rays_max - rays_min||`` — for the
    default +-20 box this is near ~= 0.1, far ~= 69.28 world units (verified
    against the reference in SURVEY.md §2.1 #13).
    """
    samples = jnp.power(
        2.0,
        jnp.linspace(LOG_SAMPLING_MIN_EXPONENT, 0.0, num_samples, dtype=dtype),
    )
    samples = jnp.broadcast_to(samples, tuple(batch_shape) + (num_samples,))
    if randomly_sample:
        if key is None:
            raise ValueError("randomly_sample=True requires a PRNG key")
        samples = _stratified_jitter(key, samples)
    return samples * jnp.asarray(bbox_diagonal, dtype=dtype)


def sample_linear(
    key: Optional[jax.Array],
    batch_shape: Sequence[int],
    num_samples: int,
    near: float,
    far: float,
    randomly_sample: bool = True,
    dtype=jnp.float32,
) -> Array:
    """v1.2-generation sampler: linear stratified t-values between near/far.

    This is the classic-NeRF scheme the shipped notebook trains with
    (``render_rays(rays_o, rays_d, 2.0, 6.0, 64, randomly_sample=True)``).
    """
    samples = jnp.linspace(near, far, num_samples, dtype=dtype)
    samples = jnp.broadcast_to(samples, tuple(batch_shape) + (num_samples,))
    if randomly_sample:
        if key is None:
            raise ValueError("randomly_sample=True requires a PRNG key")
        samples = _stratified_jitter(key, samples)
    return samples


def pdf_uniforms(
    key: Optional[jax.Array],
    batch_shape: Sequence[int],
    num_samples: int,
    randomly_sample: bool = True,
    dtype=jnp.float32,
) -> Array:
    """The stratified uniforms ``sample_pdf`` inverts — factored out so
    fused kernels that resample IN-KERNEL (``ops/pallas/fused_mega``) can
    pre-draw bitwise-identical values with the same key."""
    grid = jnp.arange(num_samples, dtype=dtype)
    shape = tuple(batch_shape) + (num_samples,)
    if randomly_sample:
        if key is None:
            raise ValueError("randomly_sample=True requires a PRNG key")
        jitter = jax.random.uniform(key, shape, dtype=dtype)
        return (grid + jitter) / num_samples
    return jnp.broadcast_to((grid + 0.5) / num_samples, shape)


def sample_pdf(
    key: Optional[jax.Array],
    bins: Array,
    weights: Array,
    num_samples: int,
    randomly_sample: bool = True,
    eps: float = 1e-5,
) -> Array:
    """Inverse-CDF sampling from a piecewise-constant PDF (hierarchical NeRF).

    Args:
        key: PRNG key (required when ``randomly_sample``).
        bins: ``[..., B+1]`` fencepost positions of the histogram bins
            (typically the coarse t-values).
        weights: ``[..., B]`` unnormalized per-bin weights (coarse
            compositing weights; caller should ``stop_gradient`` them).
        num_samples: number of fine samples S to draw per ray.
        randomly_sample: jittered uniforms when True, midpoints of a uniform
            grid over [0, 1) when False (deterministic eval).
        eps: additive mass so fully-empty rays still sample uniformly.

    Returns:
        ``[..., S]`` sorted fine t-values.

    Implementation notes (TPU): ``searchsorted``, ``take_along_axis`` and
    ``sort`` all lower to serialized loops / long bitonic passes on TPU
    (profiled at ~12 ms/step combined at the reference hierarchical
    workload), so this does none of them.  The uniforms are STRATIFIED
    (one per equal-mass stratum, jittered) — sorted by construction, so the
    monotone CDF inversion emits sorted samples with no final sort — and
    the inversion selects its bin with a dense one-hot mask contracted on
    the vector units instead of gathers.  Everything is static-shape and
    differentiable w.r.t. ``bins``.
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = cumulative.cumsum(pdf, axis=-1)  # scan-free (see ops/cumulative)
    # The doubling-ladder cumsum builds adjacent prefixes with different
    # association trees, so neighbouring cdf entries can invert by ~1 ulp;
    # a u landing in an inverted gap would then match TWO half-open
    # intervals below and the mask-contractions would SUM two bins.  A
    # running max (exact — max has no rounding) restores monotone,
    # disjoint intervals.
    cdf = cumulative.cummax(cdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    # Clamp the top to exactly 1 so u=1-eps never falls off the table.
    cdf = jnp.concatenate([cdf[..., :-1], jnp.ones_like(cdf[..., :1])], axis=-1)

    u = pdf_uniforms(
        key, bins.shape[:-1], num_samples,
        randomly_sample=randomly_sample, dtype=bins.dtype,
    )

    # Dense branchless bin selection: sel[..., s, b] is 1 for the unique bin
    # with cdf[b] <= u[s] < cdf[b+1] (cdf is monotone after the cummax
    # repair above, and u < 1 = cdf[-1]; duplicate cdf values only create
    # empty intervals, never double matches).  The four interpolation
    # operands are then mask-contractions — multiply + reduce, no gather.
    lo = cdf[..., None, :-1]  # [..., 1, B]
    hi = cdf[..., None, 1:]
    # Close the TOP interval.  Float rounding can land a jittered u
    # exactly on 1.0 ((S-1 + jitter)/S rounds up once jitter >= 1 -
    # S*2^-25, ~4e-6 per ray), and a u matching NO half-open interval
    # would make every mask-contraction sum zero — silently emitting
    # t = 0.0, OUTSIDE [near, far], which flips merged interval lengths
    # negative downstream and detonates exp(-sigma * dist) (the
    # step-3350 NaN divergence; scripts/nan_hunt.py).  The reference's
    # ``torch.searchsorted`` + index clamp is immune
    # (/root/reference/nerf/model.py sample_pdf); closing the last
    # SELECTION edge is the dense-mask equivalent (the interpolation
    # operands below keep the true cdf edge).
    sel_hi = jnp.concatenate(
        [hi[..., :-1], jnp.full_like(hi[..., :1], jnp.inf)], axis=-1
    )
    sel = ((u[..., :, None] >= lo) & (u[..., :, None] < sel_hi)).astype(
        bins.dtype
    )
    cdf_below = jnp.sum(sel * lo, axis=-1)
    cdf_above = jnp.sum(sel * hi, axis=-1)
    bins_below = jnp.sum(sel * bins[..., None, :-1], axis=-1)
    bins_above = jnp.sum(sel * bins[..., None, 1:], axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def merge_samples(coarse: Array, fine: Array) -> Array:
    """Union of two SORTED t-value sets, sorted along the sample axis.

    The hierarchical pipeline evaluates the fine MLP on the combined,
    sorted sample set (NeRF paper §5.2).  Static shape: ``[..., Sc + Sf]``.

    Both inputs must already be sorted along the last axis (the stratified
    coarse sampler and ``sample_pdf`` both emit sorted values).  That makes
    the merge a rank computation — each element's merged position is its own
    index plus a cross-count against the other list — followed by a one-hot
    scatter done as multiply+reduce.  ``jnp.sort`` of the concatenation
    lowers to a ~6.5 ms bitonic while-loop per hierarchical train step on
    TPU; this formulation is pure vector math.  Ties rank coarse first, a
    consistent total order, so the result is always a permutation.
    """
    nc, nf = coarse.shape[-1], fine.shape[-1]
    pos_c = jnp.arange(nc) + jnp.sum(
        fine[..., None, :] < coarse[..., :, None], axis=-1
    )  # [..., Sc] in [0, Sc+Sf)
    pos_f = jnp.arange(nf) + jnp.sum(
        coarse[..., None, :] <= fine[..., :, None], axis=-1
    )  # [..., Sf]
    out = jnp.arange(nc + nf)  # [N]
    merged_c = jnp.sum(
        jnp.where(pos_c[..., :, None] == out, coarse[..., :, None], 0.0),
        axis=-2,
    )
    merged_f = jnp.sum(
        jnp.where(pos_f[..., :, None] == out, fine[..., :, None], 0.0),
        axis=-2,
    )
    return merged_c + merged_f
