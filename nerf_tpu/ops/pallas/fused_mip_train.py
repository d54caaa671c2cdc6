"""Fully-fused training kernel for the HEAD (mip) model: forward +
compositing + MSE + segmentation CE + backward in ONE Pallas call.

The mip train path previously ran the two-kernel custom-VJP MLP
(``fused_mip_mlp``) with the compositing, the log-space segmentation CE
and the loss in XLA between the kernels — paying a full forward
rematerialization in the backward kernel plus kernel-boundary HBM round
trips for the ``[points, 54]`` logits and their cotangents.  This module
ports the ``fused_train`` design to the HEAD architecture: gradients flow
only to parameters (IPE features carry no parameter dependence in
training), so the kernel *returns* the gradient slabs directly — no
custom VJP, no recompute.

Objective semantics mirror ``MipNeRF.render_rays`` + ``make_loss_fn``
term for term (reference ``model.py:596-668`` + notebook cell 8 /
``train_conditional_nerf.py:132``):

* S fencepost t-values -> S-1 interval rows per ray; interval lengths
  from the 3-D Gaussian means (``distances_from_points``, 1e10 far pad)
  are precomputed in XLA and fed per-row;
* ``alpha = exp(-relu(sigma + noise) * dist)``, shifted
  ``cumprod(alpha + 1e-10)`` transmittance as a segmented shift ladder,
  ``rgb = sum w * sigmoid(color)`` and the stage-broadcast MSE;
* segmentation composited in LOG space (reference ``model.py:661-663``):
  ``logsumexp_i(log(w_i + 1e-10) + log_softmax(seg_i)[label])`` via a
  segmented MAX ladder + exp-sum ladder, with the cross-entropy
  ``-mean_ray seg_out[label]``;
* backward: the CE's weight cotangent ``-p_i / (w_i + 1e-10)`` joins the
  MSE's before the shared compositing backward, and the label-channel
  softmax Jacobian produces the segmentation-logit cotangents — all
  consumed by the MLP backward sweep with the VMEM-resident chain.

Mosaic-proven constructs only: [N,1] iota ``%``, paired broadcast ``<``
masks from data-carried lane indices (no f32 ``==``, no 2-D iota ``//``),
width-1/elementwise lane slices, separate per-head matmul operands
instead of lane concats (``w_dens``/``w_col``/``w_seg`` are passed as
separate slabs; the forward still runs ONE fused [H, O] head matmul).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from nerf_tpu.ops.pallas.fused_mip_mlp import (
    _PACK_ORDER,
    _forward_chain,
    _ln_relu_bwd,
    pack_mip_params,
)
from nerf_tpu.ops.pallas.fused_mlp import (
    _VMEM_LIMIT,
    _dot_t,
    _dot_tn,
    _full_spec,
    _interpret_default,
    _tile_spec,
)
from nerf_tpu.ops.pallas.fused_train import (
    _pick_tile,
    _seg_exclusive_prefix,
    _seg_exclusive_suffix,
    _seg_total,
    _shift_down,
    _shift_up,
)

Array = jax.Array

TILE = 1024
_SPLITS = 2

_NEG = -1e30


def _seg_total_max(v: Array, pos: Array, num_samples: int) -> Array:
    """Within-ray max, broadcast back to every row (Hillis-Steele doubling
    in both directions with a segment guard; ``_NEG`` is the identity)."""
    last = num_samples - 1
    down = v
    up = v
    m = 1
    while m < num_samples:
        down = jnp.maximum(
            down, jnp.where(pos >= m, _shift_down(down, m), _NEG)
        )
        up = jnp.maximum(
            up, jnp.where(pos <= last - m, _shift_up(up, m), _NEG)
        )
        m *= 2
    return jnp.maximum(down, up)


def _mip_bwd_slice(feat, g_dens, g_col, g_seg, heads, w, num_layers, dt,
                   chain):
    """MLP backward for one slice with the chain already VMEM-resident
    (no recompute) and the output-head cotangent composed from the three
    per-head pieces (separate matmuls — no lane concat).

    ``g_seg=None`` (segmentation loss disabled, a STATIC property of the
    objective) statically elides the seg-head matmuls and gradient slabs —
    their output refs stay at the zeros they were initialized to.

    Returns grads keyed like ``fused_mip_mlp._bwd_slice`` but with
    ``w_out``/``b_out`` replaced by per-head entries.
    """
    w_dens, w_col, w_seg = heads
    grads = {
        "b_dens": jnp.sum(g_dens, axis=0, keepdims=True),
        "b_col": jnp.sum(g_col, axis=0, keepdims=True),
        "b": [None] * num_layers,
        "g": [None] * num_layers,
        "beta": [None] * num_layers,
        "whh": [None] * (num_layers - 1),
    }
    g_h = _dot_t(g_dens, w_dens, dt) + _dot_t(g_col, w_col, dt)
    if g_seg is not None:
        grads["b_seg"] = jnp.sum(g_seg, axis=0, keepdims=True)
        g_h = g_h + _dot_t(g_seg, w_seg, dt)

    dz_next = None
    for i in range(num_layers - 1, -1, -1):
        if dz_next is not None:
            g_h = _dot_t(dz_next, w["whh"][i], dt)
        dz, dg_i, dbeta_i, h_i = _ln_relu_bwd(
            g_h, chain[i], w["g"][i], w["beta"][i], dt
        )
        grads["g"][i] = dg_i
        grads["beta"][i] = dbeta_i
        grads["b"][i] = jnp.sum(dz, axis=0)
        if i == num_layers - 1:
            grads["w_dens"] = _dot_tn(h_i, g_dens, dt)
            grads["w_col"] = _dot_tn(h_i, g_col, dt)
            if g_seg is not None:
                grads["w_seg"] = _dot_tn(h_i, g_seg, dt)
        else:
            grads["whh"][i] = _dot_tn(h_i, dz_next, dt)
        dz_next = dz
    grads["w_in"] = _dot_tn(feat, dz_next, dt)
    return grads


_GRAD_ORDER = (
    "w_in", "whh", "b", "g", "beta",
    "w_dens", "w_col", "w_seg", "b_dens", "b_col", "b_seg",
)


def _mip_train_kernel(*refs, num_layers, compute_dtype, num_rows, cols,
                      n_seg, g_scale, gs_seg, white_background):
    """``num_rows`` = S-1 interval rows per ray."""
    feat_ref, aux_ref, lane_ref = refs[0:3]
    w = dict(zip(_PACK_ORDER, refs[3 : 3 + len(_PACK_ORDER)]))
    heads = refs[3 + len(_PACK_ORDER) : 6 + len(_PACK_ORDER)]
    outs = refs[6 + len(_PACK_ORDER) :]
    loss_ref = outs[0]
    grad_refs = dict(zip(_GRAD_ORDER, outs[1:]))
    w = {k: v[:] for k, v in w.items()}
    heads = tuple(h[:] for h in heads)
    dt = compute_dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[...] = jnp.zeros_like(loss_ref)
        for ref in grad_refs.values():
            ref[...] = jnp.zeros_like(ref)

    tile = feat_ref.shape[0]
    rows = tile // _SPLITS
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % num_rows
    lane = lane_ref[:]  # [1, n_seg] data-carried lane indices
    acc = None
    # Separate [1,1] accumulators per loss term: a lane-axis concat of two
    # narrow arrays is one of the constructs the deployed Mosaic compiler
    # cannot lower ("result/input offset mismatch on non-concat dimension",
    # reproduced on v5e for the hierarchical kernel — fused_hier.py); the
    # two terms are instead written with width-1 sliced stores, which are
    # offset-safe.
    sse_sum = jnp.zeros((1, 1), jnp.float32)  # rgb sse
    ce_sum = jnp.zeros((1, 1), jnp.float32)  # seg ce
    for s in range(_SPLITS):
        sl = slice(s * rows, (s + 1) * rows)
        feat = feat_ref[sl, :]
        aux = aux_ref[sl, :]
        dist = aux[:, 0:1]
        noise = aux[:, 1:2]
        label = aux[:, 2:3]  # integer-valued f32
        pix = aux[:, 3 : 3 + cols]

        chain, out = _forward_chain(feat, w, num_layers, dt, keep=True)
        dens = out[:, 0:1] + noise
        col = out[:, 1 : 1 + cols]
        seg = out[:, 1 + cols :]

        # ---- alpha compositing (reference model.py:437-469) ----
        alpha = jnp.exp(-jnp.maximum(dens, 0.0) * dist)
        a_eps = alpha + 1e-10
        log_a = jnp.log(a_eps)
        log_t = _seg_exclusive_prefix(log_a, pos, num_rows)
        trans = jnp.exp(log_t)
        w_i = (1.0 - alpha) * trans

        sig = jax.nn.sigmoid(col)
        rgb = _seg_total(w_i * sig, pos, num_rows)
        if white_background:
            acc_w = _seg_total(w_i, pos, num_rows)
            rgb = rgb + (1.0 - acc_w)
        err = rgb - pix
        sse = (
            jnp.sum(
                jnp.mean(err * err, axis=-1, keepdims=True), keepdims=True
            )
            / num_rows
        )

        # ---- log-space segmentation CE (reference model.py:661-663) ----
        # gs_seg is STATIC (baked via functools.partial): with the seg loss
        # disabled the whole CE forward (one-hot masks, lse, two extra
        # ladders) and its backward are elided at trace time — measured
        # VPU work the rgb-only objective should not pay.
        sse_sum = sse_sum + sse
        if gs_seg != 0.0:
            # Label one-hot from paired broadcast compares (no f32 ==).
            onehot = (lane < label + 0.5).astype(jnp.float32) * (
                (label - 0.5) < lane
            ).astype(jnp.float32)  # [rows, n_seg]
            lane_max = jnp.max(seg, axis=-1, keepdims=True)
            lse = lane_max + jnp.log(
                jnp.sum(jnp.exp(seg - lane_max), axis=-1, keepdims=True)
            )
            s_label = (
                jnp.sum(seg * onehot, axis=-1, keepdims=True) - lse
            )  # log_softmax at the label channel
            lw = jnp.log(w_i + 1e-10)
            z = lw + s_label
            m_tot = _seg_total_max(z, pos, num_rows)
            se = _seg_total(jnp.exp(z - m_tot), pos, num_rows)
            seg_out = m_tot + jnp.log(se)  # per-ray, broadcast to rows
            ce = jnp.sum(-seg_out, keepdims=True) / num_rows
            ce_sum = ce_sum + ce

        # ---- backward ----
        g_rgb = err * g_scale
        g_col = w_i * sig * (1.0 - sig) * g_rgb
        off = 1.0 if white_background else 0.0
        g_w = jnp.sum((sig - off) * g_rgb, axis=-1, keepdims=True)
        g_seg = None
        if gs_seg != 0.0:
            p = jnp.exp(z - seg_out)  # sample-softmax at the label channel
            g_z = -gs_seg * p  # dCE/dz_i
            g_w = g_w + g_z / (w_i + 1e-10)
            # d z/d seg via the label-channel log_softmax Jacobian.
            g_seg = g_z * (
                onehot - jnp.exp(seg - lse)
            )
        g_alpha = -trans * g_w
        g_logt = (1.0 - alpha) * trans * g_w
        g_loga = _seg_exclusive_suffix(g_logt, pos, num_rows)
        g_alpha = g_alpha + g_loga / a_eps
        g_dens = g_alpha * (-dist * alpha) * (dens > 0.0).astype(
            jnp.float32
        )

        grads = _mip_bwd_slice(
            feat, g_dens, g_col, g_seg, heads, w, num_layers, dt, chain
        )
        acc = grads if acc is None else jax.tree.map(jnp.add, acc, grads)

    loss_ref[:, 0:1] += sse_sum
    if gs_seg != 0.0:
        loss_ref[:, 1:2] += ce_sum
    seg_names = ("w_seg", "b_seg") if gs_seg != 0.0 else ()
    for name in ("w_in", "w_dens", "w_col", "b_dens", "b_col", *seg_names):
        grad_refs[name][...] += acc[name]
    for i in range(num_layers):
        grad_refs["b"][i, :] += acc["b"][i]
        grad_refs["g"][i, :] += acc["g"][i]
        grad_refs["beta"][i, :] += acc["beta"][i]
    for j in range(num_layers - 1):
        grad_refs["whh"][j, :, :] += acc["whh"][j]


def mip_train_grads_pallas(
    params: Dict[str, Any],
    features: Array,
    dists: Array,
    noise: Array,
    pixels: Array,
    labels: Optional[Array],
    num_hidden_layers: int,
    color_outputs: int = 3,
    seg_weight: float = 0.0,
    white_background: bool = False,
    compute_dtype=jnp.float32,
    interpret: bool | None = None,
) -> Tuple[Array, Array, Dict[str, Any]]:
    """One fused evaluation of the full mip train objective.

    Args:
        params: MipNeRF pytree (``models/mlp.py`` layout).
        features: ``[rays, R, F]`` IPE features (R = S-1 interval rows).
        dists: ``[rays, R, 1]`` interval lengths from the Gaussian means
            (``compositing.distances_from_points``).
        noise: ``[rays, R]`` pre-drawn density noise (zeros if noiseless).
        pixels: ``[rays, C]`` targets.
        labels: ``[rays]`` int class labels (required when
            ``seg_weight > 0``).
        seg_weight: segmentation CE weight (0 disables the seg path).

    Returns ``(rgb_loss, seg_loss, grads)`` — the batch-mean MSE, the CE
    (0 when disabled), and the parameter-gradient pytree of
    ``rgb_loss + seg_weight * seg_loss``.
    """
    if interpret is None:
        interpret = _interpret_default()
    n_rays, num_rows = features.shape[0], features.shape[1]
    cols = pixels.shape[-1]
    f = features.shape[-1]
    total = n_rays * num_rows
    tile = _pick_tile(total, num_rows)
    grid = total // tile

    packed = pack_mip_params(params)
    n_seg = packed["w_out"].shape[1] - 1 - cols
    feat2 = features.reshape(total, f).astype(compute_dtype)
    if labels is None:
        labels = jnp.zeros((n_rays,), jnp.int32)
    lab_rows = jnp.broadcast_to(
        labels.astype(jnp.float32)[:, None], (n_rays, num_rows)
    )
    pix_rows = jnp.broadcast_to(pixels[:, None, :], (n_rays, num_rows, cols))
    aux = jnp.concatenate(
        [dists, noise[..., None], lab_rows[..., None], pix_rows], axis=-1
    ).reshape(total, 3 + cols)
    lane = jnp.arange(n_seg, dtype=jnp.float32)[None, :]

    heads = (
        packed["w_out"][:, 0:1],
        packed["w_out"][:, 1 : 1 + cols],
        packed["w_out"][:, 1 + cols :],
    )
    weights = [packed[k] for k in _PACK_ORDER]
    h = packed["w_in"].shape[1]

    out_shapes = [jax.ShapeDtypeStruct((1, 2), jnp.float32)] + [
        jax.ShapeDtypeStruct(s, jnp.float32)
        for s in (
            packed["w_in"].shape,
            packed["whh"].shape,
            packed["b"].shape,
            packed["g"].shape,
            packed["beta"].shape,
            (h, 1),           # w_dens
            (h, cols),        # w_col
            (h, n_seg),       # w_seg
            (1, 1),           # b_dens
            (1, cols),        # b_col
            (1, n_seg),       # b_seg
        )
    ]

    outs = pl.pallas_call(
        functools.partial(
            _mip_train_kernel,
            num_layers=num_hidden_layers,
            compute_dtype=compute_dtype,
            num_rows=num_rows,
            cols=cols,
            n_seg=n_seg,
            g_scale=2.0 / (cols * n_rays),
            gs_seg=seg_weight / n_rays,
            white_background=white_background,
        ),
        out_shape=out_shapes,
        grid=(grid,),
        in_specs=[
            _tile_spec(tile, f),
            _tile_spec(tile, 3 + cols),
            _full_spec((1, n_seg)),
            *[_full_spec(w.shape) for w in weights],
            *[_full_spec(hh.shape) for hh in heads],
        ],
        out_specs=[_full_spec(s.shape) for s in out_shapes],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(feat2, aux, lane, *weights, *heads)

    rgb_loss = outs[0][0, 0] / n_rays
    seg_loss = outs[0][0, 1] / n_rays
    g = dict(zip(_GRAD_ORDER, outs[1:]))
    return rgb_loss, seg_loss, _unpack_grads(g, num_hidden_layers)


def _unpack_grads(g: Dict[str, Array], num_hidden_layers: int):
    grads = {
        "layers": [
            {
                "linear": {
                    "w": g["w_in"] if i == 0 else g["whh"][i - 1],
                    "b": g["b"][i],
                },
                "ln": {"scale": g["g"][i], "bias": g["beta"][i]},
            }
            for i in range(num_hidden_layers)
        ],
        "out": {
            "w": jnp.concatenate([g["w_dens"], g["w_col"], g["w_seg"]],
                                 axis=-1),
            "b": jnp.concatenate(
                [g["b_dens"], g["b_col"], g["b_seg"]], axis=-1
            ).reshape(-1),
        },
    }
    return grads


def _mip_eval_kernel(*refs, num_layers, compute_dtype, num_rows, cols,
                     n_seg, white_background, splits):
    """Forward-only mip objective: MLP + alpha compositing + RGB/depth/acc
    + full-channel log-space segmentation composite, per-ray outputs
    broadcast to interval rows.  The forward half of ``_mip_train_kernel``
    with the seg composite over ALL classes (eval wants the full
    log-prob vector, not just the label channel)."""
    feat_ref, aux_ref = refs[0:2]
    w = dict(zip(_PACK_ORDER, refs[2 : 2 + len(_PACK_ORDER)]))
    out_ref = refs[2 + len(_PACK_ORDER)]
    w = {k: v[:] for k, v in w.items()}
    dt = compute_dtype

    tile = feat_ref.shape[0]
    rows = tile // splits
    pos = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % num_rows
    for s in range(splits):
        sl = slice(s * rows, (s + 1) * rows)
        feat = feat_ref[sl, :]
        aux = aux_ref[sl, :]
        dist = aux[:, 0:1]
        noise = aux[:, 1:2]
        t_mid = aux[:, 2:3]

        _, out = _forward_chain(feat, w, num_layers, dt)
        dens = out[:, 0:1] + noise
        col = out[:, 1 : 1 + cols]
        seg = out[:, 1 + cols :]

        alpha = jnp.exp(-jnp.maximum(dens, 0.0) * dist)
        log_t = _seg_exclusive_prefix(
            jnp.log(alpha + 1e-10), pos, num_rows
        )
        w_i = (1.0 - alpha) * jnp.exp(log_t)

        rgb = _seg_total(w_i * jax.nn.sigmoid(col), pos, num_rows)
        acc = _seg_total(w_i, pos, num_rows)
        if white_background:
            rgb = rgb + (1.0 - acc)
        depth = _seg_total(w_i * t_mid, pos, num_rows)

        lane_max = jnp.max(seg, axis=-1, keepdims=True)
        lse = lane_max + jnp.log(
            jnp.sum(jnp.exp(seg - lane_max), axis=-1, keepdims=True)
        )
        z = jnp.log(w_i + 1e-10) + (seg - lse)  # [rows, n_seg]
        m_tot = _seg_total_max(z, pos, num_rows)
        seg_out = m_tot + jnp.log(
            _seg_total(jnp.exp(z - m_tot), pos, num_rows)
        )

        out_ref[sl, 0:cols] = rgb
        out_ref[sl, cols : cols + n_seg] = seg_out
        out_ref[sl, cols + n_seg : cols + n_seg + 1] = depth
        out_ref[sl, cols + n_seg + 1 : cols + n_seg + 2] = acc


def mip_eval_pallas(
    params: Dict[str, Any],
    features: Array,
    dists: Array,
    t_mids: Array,
    noise: Optional[Array],
    num_hidden_layers: int,
    color_outputs: int = 3,
    white_background: bool = False,
    compute_dtype=jnp.float32,
    interpret: bool | None = None,
) -> Tuple[Array, Array, Array, Array]:
    """Forward-only fused mip render: ``(rgb [B,C], seg_log_probs [B,K],
    depth [B], acc [B])`` in ONE kernel — replaces the two-step eval path
    (custom-VJP MLP kernel + XLA cumprod/logsumexp compositing) and its
    kernel-boundary round trip of the ``[points, 54]`` head outputs.
    """
    if interpret is None:
        interpret = _interpret_default()
    n_rays, num_rows = features.shape[0], features.shape[1]
    cols = color_outputs
    f = features.shape[-1]
    total = n_rays * num_rows
    tile = _pick_tile(total, num_rows)
    grid = total // tile

    packed = pack_mip_params(params)
    n_seg = packed["w_out"].shape[1] - 1 - cols
    feat2 = features.reshape(total, f).astype(compute_dtype)
    if noise is None:
        noise = jnp.zeros((n_rays, num_rows), jnp.float32)
    aux = jnp.concatenate(
        [dists, noise[..., None], t_mids[..., None]], axis=-1
    ).reshape(total, 3)
    weights = [packed[k] for k in _PACK_ORDER]

    width = cols + n_seg + 2
    out = pl.pallas_call(
        functools.partial(
            _mip_eval_kernel,
            num_layers=num_hidden_layers,
            compute_dtype=compute_dtype,
            num_rows=num_rows,
            cols=cols,
            n_seg=n_seg,
            white_background=white_background,
            splits=_SPLITS,
        ),
        out_shape=jax.ShapeDtypeStruct((total, width), jnp.float32),
        grid=(grid,),
        in_specs=[
            _tile_spec(tile, f),
            _tile_spec(tile, 3),
            *[_full_spec(w.shape) for w in weights],
        ],
        out_specs=_tile_spec(tile, width),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(feat2, aux, *weights)

    per_ray = out.reshape(n_rays, num_rows, width)[:, 0, :]
    return (
        per_ray[:, :cols],
        per_ray[:, cols : cols + n_seg],
        per_ray[:, cols + n_seg],
        per_ray[:, cols + n_seg + 1],
    )


def mip_train_loss_and_grads(
    model,
    params: Dict[str, Any],
    render,
    batch: Dict[str, Array],
    key: Optional[Array],
    seg_weight: float = 0.0,
) -> Tuple[Array, Dict[str, Any], Dict[str, Array]]:
    """Full mip train objective through the fused kernel.

    Mirrors ``make_loss_fn(MipNeRF, render, seg_weight)`` +
    ``MipNeRF.render_rays`` (key split ``(k_strat, k_noise)``,
    ``sample_log_bbox`` fenceposts, IPE features, Gaussian-mean interval
    lengths, density-logit noise) — losses track the general path to float
    tolerance and gradients flow only to params (IPE features carry no
    parameter dependence in training).

    Returns ``(loss, grads, aux)`` shaped like
    ``make_fused_loss_and_grads``'s fn.
    """
    from nerf_tpu.ops import compositing, sampling

    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    n_rays = rays_o.shape[0]
    if key is not None:
        k_strat, k_noise = jax.random.split(key)
    else:
        k_strat = k_noise = None
    t_vals = sampling.sample_log_bbox(
        k_strat,
        (n_rays,),
        render.num_coarse_samples,
        model.cfg.bbox_diagonal,
        randomly_sample=render.randomly_sample,
        dtype=rays_o.dtype,
    )
    means, _, features = model.integrated_pe(rays_o, rays_d, t_vals)
    num_rows = render.num_coarse_samples - 1
    dists = compositing.distances_from_points(means)
    if render.density_noise_std > 0.0 and k_noise is not None:
        # Same counter-based draws as render_rays' [B, R, 1] shape.
        noise = render.density_noise_std * jax.random.normal(
            k_noise, (n_rays, num_rows)
        )
    else:
        noise = jnp.zeros((n_rays, num_rows))
    rgb_loss, seg_loss, grads = mip_train_grads_pallas(
        params,
        features,
        dists,
        noise,
        batch["pixels"],
        batch.get("labels"),
        model.cfg.num_hidden_layers,
        color_outputs=model.cfg.color_outputs,
        seg_weight=seg_weight,
        white_background=render.white_background,
        compute_dtype=jnp.dtype(model.cfg.compute_dtype),
    )
    loss = rgb_loss + seg_weight * seg_loss
    aux = {
        "loss": loss,
        "rgb_loss": rgb_loss,
        "fine_mse": rgb_loss,
    }
    if seg_weight > 0.0:
        aux["seg_loss"] = seg_loss
    return loss, grads, aux
