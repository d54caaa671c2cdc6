"""Fully-fused training kernel: forward + compositing + MSE + backward in
ONE Pallas call.

The two-kernel custom-VJP path (``fused_mlp``) pays a full forward
rematerialization inside its backward kernel (flash-attention-style), plus
kernel-boundary HBM round-trips for the per-point density/color and their
cotangents, because the volume-rendering compositing and the loss live
between the two kernels at the XLA level.  This kernel moves the whole
train-step math for the classic coarse-only config in-kernel:

    encodings -> 10-layer MLP (activations kept in VMEM)
              -> density noise add -> alpha compositing -> RGB -> MSE
              -> compositing backward -> MLP backward (NO recompute)
              -> weight-gradient accumulation across the grid

eliminating ~1/3 of the backward matmul FLOPs (the recompute) and the
intermediate HBM traffic.  Gradients flow ONLY to parameters — the sample
positions/encodings carry no parameter dependence in training — so there is
no custom VJP at all: the kernel *returns* the gradients, and the step
builder feeds them straight to the optimizer.

TPU-shape design notes (both measured on a v5e chip):

* Per-ray reductions (transmittance prefix, pixel sums) run as SEGMENTED
  SHIFT LADDERS along the sublane (row) axis — Hillis-Steele doubling with
  a within-ray position guard.  The first version used [rows, rows]
  iota-mask matmuls instead; with N=1 the MXU pads the result dimension to
  128 lanes and those "tiny" matmuls cost ~1 ms/step.
* The per-row scalars (interval lengths, density noise, target pixel
  broadcast) arrive PACKED in one ``[points, 5]`` array: every ``[N, k]``
  HBM array with k <= 128 is lane-padded to 128, so three separate scalar
  inputs would each pay the full 134 MB padded footprint; packed, they
  share one.  The density noise is drawn as a dense ``[rays, S]`` matrix —
  JAX's counter-based PRNG makes the values identical to the reference
  ``[rays, S, 1]`` draw, but the [N, 1]-shaped draw runs every threefry op
  in 128x lane-padded registers (~1 ms/step measured).
* The scalar loss accumulates into a [1, 1] ref across grid steps (a
  ``[points, 1]`` per-row loss output would be another padded 134 MB
  write).

Semantics match ``ClassicNeRF.render_rays`` (coarse-only) term for term:
stratified t-values, density-logit noise, the 1e-10 epsilon inside the
transmittance product, ``sigmoid`` color, stage-broadcast MSE — with the
transmittance product evaluated as ``exp(segmented-sum of logs)``
(reassociation-level difference from the XLA ``cumprod`` ladder;
parity-tested).

Reference behavior covered: ``/root/reference/nerf/model.py:437-469``
(compositing), ``:652-654`` (noise), ``:660`` (RGB), notebook cell 8 (MSE).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops.pallas.fused_mlp import (
    _VMEM_LIMIT,
    _bwd_slice,
    _forward_chain,
    _full_spec,
    _interpret_default,
    _pack_order,
    _tile_spec,
    pack_classic_params,
)

Array = jax.Array

# Same tile/slice geometry rationale as fused_mlp (swept there): 1024-row
# tiles, two independent 512-row slices so the scheduler overlaps one
# slice's MXU matmuls with the other's VPU LayerNorm/compositing work.
TILE = 1024
_SPLITS = 2


def _shift_down(v: Array, m: int) -> Array:
    """Rows shifted toward higher indices by m (zeros shifted in).

    Narrow (sub-lane-width) arrays use rotate+mask: Mosaic's concatenate
    lowering rejects a narrow sliced operand whose sublane offset differs
    from the result's ("result/input offset mismatch on non-concat
    dimension"), which the [rows, 3] rgb ladders in the mip kernel hit.
    Full-width arrays keep the concat form the classic kernel was tuned on.
    ``pltpu.roll`` has no eager evaluation rule, so concrete (non-traced)
    narrow inputs — only unit tests call these helpers outside a kernel —
    take the concat form, which is numerically identical.
    """
    if v.shape[1] < 128 and isinstance(v, jax.core.Tracer):
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        return jnp.where(row >= m, pltpu.roll(v, shift=m, axis=0), 0.0)
    return jnp.concatenate(
        [jnp.zeros((m, v.shape[1]), v.dtype), v[:-m, :]], axis=0
    )


def _shift_up(v: Array, m: int) -> Array:
    if v.shape[1] < 128 and isinstance(v, jax.core.Tracer):
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        return jnp.where(
            row < v.shape[0] - m,
            pltpu.roll(v, shift=v.shape[0] - m, axis=0),
            0.0,
        )
    return jnp.concatenate(
        [v[m:, :], jnp.zeros((m, v.shape[1]), v.dtype)], axis=0
    )


def _seg_exclusive_prefix(v: Array, pos: Array, num_samples: int) -> Array:
    """Exclusive within-ray prefix sum along rows (rows are ray-major).

    Hillis-Steele doubling with a segment guard: the shift-by-m term is
    valid for row i iff i-m is in the same ray, i.e. ``pos_i >= m``.
    """
    out = jnp.where(pos >= 1, _shift_down(v, 1), 0.0)
    m = 1
    while m < num_samples - 1:
        out = out + jnp.where(pos >= m + 1, _shift_down(out, m), 0.0)
        m *= 2
    return out


def _seg_exclusive_suffix(v: Array, pos: Array, num_samples: int) -> Array:
    """Exclusive within-ray suffix sum (the transpose of the prefix)."""
    last = num_samples - 1
    out = jnp.where(pos <= last - 1, _shift_up(v, 1), 0.0)
    m = 1
    while m < num_samples - 1:
        out = out + jnp.where(pos <= last - (m + 1), _shift_up(out, m), 0.0)
        m *= 2
    return out


def _seg_total(v, pos, num_samples):
    """Within-ray total, broadcast back to every row of the ray."""
    return (
        _seg_exclusive_prefix(v, pos, num_samples)
        + v
        + _seg_exclusive_suffix(v, pos, num_samples)
    )


# ---- lane-layout helpers (shared with the hier kernels) -----------------
# One ray per sublane row, samples along lanes: elementwise ops run
# lane-dense instead of 128x-padded [rows, 1] columns, per-ray reductions
# are lane reductions, and the prefix/suffix sums ride the MXU (see
# _lane_exclusive_prefix).  ROOFLINE.md carries the measurements.


def rays2rows(v: Array, rays_sl: int, s: int) -> Array:
    """Per-ray rows ``[rays_sl, C]`` -> row layout ``[rays_sl*s, C]`` by
    broadcasting each ray's row over its s sample rows (sublane concat)."""
    return jnp.concatenate(
        [
            jnp.broadcast_to(v[ri : ri + 1, :], (s, v.shape[1]))
            for ri in range(rays_sl)
        ],
        axis=0,
    )


def _lane2rows(v: Array) -> Array:
    """Lane layout ``[rays, S]`` -> column ``[rays*S, 1]``.  Mosaic's
    infer-vector-layout rejects the multi-row shape cast ("unsupported
    shape cast" on (4,128)->(512,1), reproduced on v5e), but the
    single-row ``[1, S] -> [S, 1]`` transpose lowers — so go per ray and
    sublane-concat (the row->lane DIRECTION is supported whole)."""
    s = v.shape[1]
    return jnp.concatenate(
        [v[ri : ri + 1, :].reshape(s, 1) for ri in range(v.shape[0])],
        axis=0,
    )


def _lane_shift_down(v: Array, m: int) -> Array:
    """Lanes shifted toward higher indices by m (zeros shifted in)."""
    if isinstance(v, jax.core.Tracer):
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.where(lane >= m, pltpu.roll(v, shift=m, axis=1), 0.0)
    return jnp.concatenate(
        [jnp.zeros((v.shape[0], m), v.dtype), v[:, :-m]], axis=1
    )


def _lane_shift_up(v: Array, m: int) -> Array:
    if isinstance(v, jax.core.Tracer):
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.where(
            lane < v.shape[1] - m,
            pltpu.roll(v, shift=v.shape[1] - m, axis=1),
            0.0,
        )
    return jnp.concatenate(
        [v[:, m:], jnp.zeros((v.shape[0], m), v.dtype)], axis=1
    )


def _lane_exclusive_prefix(v: Array) -> Array:
    """Exclusive prefix sum along lanes (one ray per sublane row).

    In-kernel this is a strict-lower-triangular Dekker mask matmul, not a
    Hillis-Steele shift ladder: the round-4 chip ablations priced the four
    hier ladders at ~1.2 ms/step (fine kernel 8.58 -> 7.39 ms with them
    ablated) while the kernel's MXU sits at ~56% of peak with tiny dots
    measuring ~free — so the O(log S) VPU roll chain loses to one [rays,
    S] @ [S, S] matmul that hides behind the MLP's pipeline.  Outside a
    kernel (plain jnp arrays) the zero-filled shift ladder is kept: XLA
    fuses it and there is no MXU to hide a mask matmul behind."""
    if isinstance(v, jax.core.Tracer):
        s = v.shape[1]
        k = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        return _dot_exact_row(v, (k < c).astype(jnp.float32))
    out = _lane_shift_down(v, 1)
    m = 1
    while m < v.shape[1] - 1:
        out = out + _lane_shift_down(out, m)
        m *= 2
    return out


def _lane_exclusive_suffix(v: Array) -> Array:
    """Exclusive suffix sum along lanes (the transpose of the prefix)."""
    if isinstance(v, jax.core.Tracer):
        s = v.shape[1]
        k = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        return _dot_exact_row(v, (k > c).astype(jnp.float32))
    out = _lane_shift_up(v, 1)
    m = 1
    while m < v.shape[1] - 1:
        out = out + _lane_shift_up(out, m)
        m *= 2
    return out


def _dot_exact_row(values: Array, mat: Array) -> Array:
    """``values @ mat`` with the LEFT (value) operand Dekker split — the
    row-layout half of the Dekker-split pair (``mat`` must be exact in
    bf16, e.g. a 0/1 mask): the MXU's DEFAULT precision truncates f32
    operands to bf16 — a ~2^-9 relative error that is benign for
    value-dominated matmuls but NOT for sums of log-transmittance terms
    reaching ``log(1e-10) ~ -23``; the one-step split bounds it ~2^-18."""
    hi = values.astype(jnp.bfloat16).astype(jnp.float32)
    lo = values - hi
    return jnp.dot(hi, mat, preferred_element_type=jnp.float32) + jnp.dot(
        lo, mat, preferred_element_type=jnp.float32
    )


def _dot_exact2(a: Array, b: Array) -> Array:
    """``a @ b`` with BOTH f32 operands one-step Dekker split (~2^-18
    relative): for sums where neither side is an exact 0/1 mask (the
    weight x sigmoid rgb reductions)."""
    ahi = a.astype(jnp.bfloat16).astype(jnp.float32)
    alo = a - ahi
    bhi = b.astype(jnp.bfloat16).astype(jnp.float32)
    blo = b - bhi
    return (
        jnp.dot(ahi, bhi, preferred_element_type=jnp.float32)
        + jnp.dot(ahi, blo, preferred_element_type=jnp.float32)
        + jnp.dot(alo, bhi, preferred_element_type=jnp.float32)
    )


def _compositing_fwd_bwd(density, color, dists, pix, pos, g_scale,
                         num_samples, white_background):
    """In-kernel compositing + MSE forward AND backward for one slice.

    All inputs row-major ``[rows, .]``; ``pix`` is the target pixel
    broadcast to every row of its ray.  Returns ``(loss_sum, g_dens
    [rows, 1], g_col [rows, C])`` where ``loss_sum`` sums
    ``mean_c(err^2) / S`` over rows (summing over all rays' rows and
    dividing by the ray count outside reproduces the batch-mean MSE).

    Layout note (round-5 measurement of record): this COLUMN layout —
    the whole scalar chain on ``[rows, 1]``, per-ray sums as
    ``_seg_total`` shift-ladder broadcasts — is the FASTEST of the
    three formulations tried for the coarse kernel, despite the 128x
    lane padding: 8.20 ms +/- 0.11 vs 8.49 (round-4 lane-dense with
    per-ray Dekker-dot rgb, b92c07b) vs 9.03 (per-channel lane
    reductions, 3b24b18), N=5 each in ONE chip session
    (``scripts/coarse_variance.py``, BASELINE.md).  Unlike the hier fine
    kernel — where the lane layout wins and its ladders priced ~1.2
    ms/step — the coarse kernel's compositing is a small fraction of the
    step, and the lane versions' per-ray ``_lane2rows``/``rays2rows``
    sublane-concat relayouts cost more than the column ladders they
    removed.  The lane machinery stays in this module for the hier/mip
    kernels; do not "modernize" this epilogue onto it without a paired
    same-session measurement beating 499k rays/s.

    ``white_background`` adds the standard solid-white blend
    ``rgb + (1 - sum_i w_i)`` (``compositing.
    composite_rgb_with_background``) with its gradient.
    """
    alpha = jnp.exp(-jnp.maximum(density, 0.0) * dists)
    a_eps = alpha + 1e-10
    log_a = jnp.log(a_eps)
    log_t = _seg_exclusive_prefix(log_a, pos, num_samples)
    trans = jnp.exp(log_t)
    weights = (1.0 - alpha) * trans  # [rows, 1]

    sig = jax.nn.sigmoid(color)  # [rows, C]
    ws = weights * sig
    rgb = _seg_total(ws, pos, num_samples)
    if white_background:
        acc = _seg_total(weights, pos, num_samples)  # [rows, 1]
        rgb = rgb + (1.0 - acc)
    err = rgb - pix  # [rows, C], constant within each ray
    # Kept 2-D end-to-end ([1, 1] result): Mosaic rejects the relayouts a
    # 1-D intermediate would need.
    loss_sum = (
        jnp.sum(
            jnp.mean(err * err, axis=-1, keepdims=True), keepdims=True
        )
        / num_samples
    )

    # ---- backward ----
    g_rgb = err * g_scale  # dL/drgb, already per-row (err is broadcast)
    g_col = ws * (1.0 - sig) * g_rgb
    if white_background:
        # rgb_c = sum_i w_i sig_ic + (1 - sum_i w_i)
        # => dL/dw_i = sum_c (sig_ic - 1) g_rgb_c
        g_w = jnp.sum((sig - 1.0) * g_rgb, axis=-1, keepdims=True)
    else:
        g_w = jnp.sum(sig * g_rgb, axis=-1, keepdims=True)  # [rows, 1]

    g_alpha = -trans * g_w
    g_logt = (1.0 - alpha) * trans * g_w
    g_loga = _seg_exclusive_suffix(g_logt, pos, num_samples)
    g_alpha = g_alpha + g_loga / a_eps
    # alpha = exp(-relu(density) * dist); relu' is 0 at density <= 0.
    g_dens = g_alpha * (-dists * alpha) * (density > 0.0).astype(
        jnp.float32
    )
    return loss_sum, g_dens, g_col, weights


# Packed per-row scalar lanes: [dist, noise, pixel_r, pixel_g, pixel_b].
_AUX_WIDTH_BASE = 2  # dist + noise; pixels follow


def _train_kernel(*refs, compute_dtype, num_samples, g_scale,
                  white_background, emit_weights, has_view=True):
    x_ref = refs[0]
    d_ref = refs[1] if has_view else None
    k = 2 if has_view else 1
    aux_ref = refs[k]
    order = _pack_order(has_view)
    w = dict(zip(order, refs[k + 1 : k + 1 + len(order)]))
    outs = list(refs[k + 1 + len(order) :])
    loss_ref = outs.pop(0)
    grad_refs = dict(zip(order, outs))
    w_out_ref = outs[len(order)] if emit_weights else None
    (dwhh_ref, db_ref, dg_ref, dbeta_ref) = (
        grad_refs.pop("whh"), grad_refs.pop("b"), grad_refs.pop("g"),
        grad_refs.pop("beta"),
    )
    flat_refs = grad_refs  # the non-stacked weight-grad refs, by name
    w = {k2: v[:] for k2, v in w.items()}
    dt = compute_dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[...] = jnp.zeros_like(loss_ref)
        for ref in (*flat_refs.values(), dwhh_ref, db_ref, dg_ref,
                    dbeta_ref):
            ref[...] = jnp.zeros_like(ref)

    tile = x_ref.shape[0]
    rows = tile // _SPLITS
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % num_samples
    acc = None
    loss_sum = jnp.zeros((1, 1), jnp.float32)
    for s in range(_SPLITS):
        sl = slice(s * rows, (s + 1) * rows)
        x = x_ref[sl, :]
        d = d_ref[sl, :] if has_view else None
        aux = aux_ref[sl, :]

        # Forward with the activation chain kept VMEM-resident ...
        chain, density, color = _forward_chain(x, d, w, dt, keep=True)
        density = density + aux[:, 1:2]

        sl_loss, g_dens, g_col, cweights = _compositing_fwd_bwd(
            density, color, aux[:, 0:1], aux[:, _AUX_WIDTH_BASE:],
            pos, g_scale, num_samples, white_background,
        )
        if emit_weights:
            w_out_ref[sl, :] = cweights
        loss_sum = loss_sum + sl_loss

        # ... so the backward sweep runs with NO forward recompute.
        # input_grads=False: nothing upstream consumes dx/dd (grads flow
        # only to params), so skip their three N-padded matmuls.
        _, _, grads = _bwd_slice(
            x, d, g_dens, g_col, w, dt, chain=chain, input_grads=False
        )
        if acc is None:
            acc = grads
        else:
            acc = jax.tree.map(jnp.add, acc, grads)

    loss_ref[...] += loss_sum
    for name, ref in flat_refs.items():
        ref[...] += acc[name]
    for i in range(w["b"].shape[0]):
        db_ref[i, :] += acc["b"][i]
        dg_ref[i, :] += acc["g"][i]
        dbeta_ref[i, :] += acc["beta"][i]
    for j in range(w["whh"].shape[0]):
        dwhh_ref[j, :, :] += acc["whh"][j]


def _pick_tile(total_points: int, num_samples: int) -> int:
    """Largest tile <= TILE that divides the workload into whole rays per
    slice: tile % (SPLITS * num_samples) == 0 and total % tile == 0."""
    quantum = _SPLITS * num_samples
    tile = min(TILE, total_points)
    tile -= tile % quantum
    while tile >= quantum and total_points % tile:
        tile -= quantum
    if tile < quantum:
        raise ValueError(
            f"cannot tile {total_points} points into whole-ray slices of "
            f"{quantum}; pad the ray batch"
        )
    return tile


def classic_train_grads_pallas(
    params: Dict[str, Any],
    x_enc: Array,
    d_enc: Optional[Array],
    dists: Array,
    noise: Array,
    pixels: Array,
    num_samples: int,
    compute_dtype=jnp.float32,
    white_background: bool = False,
    loss_weight: float = 1.0,
    return_weights: bool = False,
    interpret: bool | None = None,
) -> Tuple[Array, ...]:
    """One fused evaluation of the coarse-only classic train objective.

    Args:
        params: ClassicNeRF pytree (``models/mlp.py`` layout).
        x_enc: ``[rays, S, XE]`` encoded positions.
        d_enc: ``[rays, S, DE]`` encoded directions, or ``None`` for the
            ``use_viewdirs=False`` architecture.
        dists: ``[rays, S, 1]`` compositing interval lengths
            (``compositing.distances_from_tvals``).
        noise: ``[rays, S]`` pre-drawn density-logit noise (zeros when
            noiseless) — dense 2-D shape, see the module docstring.
        pixels: ``[rays, C]`` target pixels.
        num_samples: S (static).
        compute_dtype: matmul input dtype (bf16 halves encoding HBM
            traffic; see fused_mlp).

    ``loss_weight`` scales the objective (hierarchical training weights
    each stage by 1/num_stages, matching the stage-mean MSE).
    ``return_weights=True`` additionally returns the per-sample compositing
    weights ``[rays, S]`` (the hierarchical resampler's input).

    Returns:
        ``(loss, grads)`` — the scalar stage-broadcast MSE (identical
        normalization to ``train.loop.make_loss_fn`` for a single stage)
        and a gradient pytree matching ``params`` — plus ``weights`` when
        ``return_weights``.
    """
    if interpret is None:
        interpret = _interpret_default()
    has_view = d_enc is not None
    order = _pack_order(has_view)
    n_rays = x_enc.shape[0]
    cols = pixels.shape[-1]
    xe = x_enc.shape[-1]
    total = n_rays * num_samples
    tile = _pick_tile(total, num_samples)
    grid = total // tile

    x2 = x_enc.reshape(total, xe).astype(compute_dtype)
    d_ops, d_specs = (), ()
    if has_view:
        de = d_enc.shape[-1]
        d_ops = (d_enc.reshape(total, de).astype(compute_dtype),)
        d_specs = (_tile_spec(tile, de),)
    # Pack the per-row SCALARS into one lane-padded array (module
    # docstring): [dist, noise, pixel broadcast over the ray's rows].
    # (Packing the encodings in too was measured SLOWER — the pre-cast
    # bf16 encoding inputs beat one wide f32 input + in-kernel casts.)
    pix_rows = jnp.broadcast_to(
        pixels[:, None, :], (n_rays, num_samples, cols)
    )
    aux = jnp.concatenate(
        [dists, noise[..., None], pix_rows], axis=-1
    ).reshape(total, _AUX_WIDTH_BASE + cols)

    packed = pack_classic_params(params)
    weights = [packed[k] for k in order]

    out_shapes = [
        jax.ShapeDtypeStruct((1, 1), jnp.float32),  # loss accumulator
    ] + [jax.ShapeDtypeStruct(packed[k].shape, jnp.float32) for k in order]
    n_grad_outs = len(out_shapes)
    if return_weights:
        # [total, 1] is the 128x lane-padded shape this module's docstring
        # warns about (~67 MB padded write at 2048x64) — one of the reasons
        # the two-stage hierarchical trainer measures slower than the
        # general reuse path; acceptable for the coarse stage only.
        out_shapes.append(jax.ShapeDtypeStruct((total, 1), jnp.float32))
    out_specs = [_full_spec(s.shape) for s in out_shapes[:n_grad_outs]]
    if return_weights:
        out_specs.append(_tile_spec(tile, 1))

    outs = pl.pallas_call(
        functools.partial(
            _train_kernel,
            compute_dtype=compute_dtype,
            num_samples=num_samples,
            g_scale=loss_weight * 2.0 / (cols * n_rays),
            white_background=white_background,
            emit_weights=return_weights,
            has_view=has_view,
        ),
        out_shape=out_shapes,
        grid=(grid,),
        in_specs=[
            _tile_spec(tile, xe),
            *d_specs,
            _tile_spec(tile, _AUX_WIDTH_BASE + cols),
            *[_full_spec(w.shape) for w in weights],
        ],
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(x2, *d_ops, aux, *weights)

    loss = loss_weight * outs[0][0, 0] / n_rays
    packed_grads = dict(zip(order, outs[1:n_grad_outs]))
    grads = unpack_classic_grads(packed_grads, params)
    if return_weights:
        return loss, grads, outs[n_grad_outs].reshape(n_rays, num_samples)
    return loss, grads


def unpack_classic_grads(
    g: Dict[str, Array], params: Dict[str, Any]
) -> Dict[str, Any]:
    """Inverse of ``pack_classic_params`` for gradient slabs -> pytree."""
    del params  # structure is fixed by the supported architecture family

    def layer(li: int, w: Array) -> Dict[str, Any]:
        return {
            "linear": {"w": w, "b": g["b"][li]},
            "ln": {"scale": g["g"][li], "bias": g["beta"][li]},
        }

    block_0 = [layer(0, g["w0"])] + [
        layer(i, g["whh"][i - 1]) for i in (1, 2, 3)
    ]
    block_1 = [
        layer(4, jnp.concatenate([g["whh"][3], g["wx"]], axis=0))
    ] + [layer(i, g["whh"][i - 1]) for i in (5, 6, 7)]
    out = {
        "block_0": block_0,
        "block_1": block_1,
        "density": {"w": g["w_dens"], "b": g["b_dens"].reshape(-1)},
        "color": {"w": g["w_col"], "b": g["b_col"].reshape(-1)},
    }
    if "wd_in" in g:  # view-conditioned architecture
        out["block_2"] = [
            layer(8, jnp.concatenate([g["whh"][7], g["wd_in"]], axis=0)),
            layer(9, g["whh"][8]),
        ]
    return out
