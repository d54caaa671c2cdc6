"""Fused fine stage for DISJOINT hierarchical training (the default
``reuse_coarse_in_fine=True`` objective).

The hierarchical (64+128) config is the north-star metric, and its fine
stage dominates the step: 2/3 of the MLP points plus the O(S^2) union
compositing.  Round 1 left it on the two-kernel custom-VJP path, which
pays a full forward rematerialization in the backward kernel.  This module
moves the whole fine-stage objective into ONE Pallas call:

    fine encodings -> 10-layer MLP (chain VMEM-resident)
                   -> density noise -> union compositing with the REUSED
                      coarse outputs (order-free, no sort/gather)
                   -> fine-stage MSE
                   -> compositing backward -> MLP backward (NO recompute)

The kernel returns the fine-point parameter gradients directly, plus the
cotangents of the coarse-side quantities it consumed; the step builder
routes those through the coarse custom-VJP (``fused_mlp``) so the reuse
formulation's full gradient — fine loss back through the reused coarse
evaluations — matches the general trainer exactly (parity-tested).

Union-compositing layout (measured design, each rule priced on a v5e
chip — see ``fused_train`` for the ladder rationale and
``scripts/mosaic_probe.py`` for the lane-vs-column op costs):

* The WHOLE scalar chain — union interval lengths, alphas, log
  transmittances, prefix/suffix ladders, compositing weights, and their
  backward — runs in ``[rays, S]`` LANE layout: one ray per sublane row,
  samples along lanes.  The round-3 kernel ran it on ``[rows, 1]``
  column vectors, which the VPU pads to 128 lanes (1/128 lane
  efficiency); the chip trace priced that at ~2 ms/step (fine kernel
  8.84 ms vs its 6.8 ms MLP-proportional bound), and the mosaic_probe
  measurements price column-layout elementwise ops at ~10-20x their
  lane-dense cost.  Lane ladders need NO segment masks (each sublane row
  is one ray).  Only the MLP itself and the ``[rows, C]`` color-head
  math stay row-major, with two register relayouts (density row->lane,
  weight-cotangent lane->row) at the boundary — probe A prices a
  [512, 1]<->[4, 128] relayout at ~100 ns.
* CROSS-block terms run PER RAY on exact ``[Sc, Sf]`` blocks (the
  cross-ray structure is block-diagonal, so slice-wide masks waste
  ``rays_per_slice``× of both VPU compares and MXU MACs).  Per ray the
  same-ray factor is identically 1, so masks are single broadcast ``t``
  comparisons with no ray-id plumbing; the t-weighted sums (partial
  log-transmittances and their two backward scatters) are ``[1, S] @
  [S, S']`` mask matmuls with the VALUE as the lane row.  The mask
  operand is exact 0/1; the value operand uses a one-step Dekker split
  (``_dot_exact_row``) because the MXU's DEFAULT precision truncates f32
  operands to bf16 — a ~2^-9 relative error that is benign for the MLP's
  value-dominated matmuls but NOT for sums of log-transmittance terms
  reaching ``log(1e-10) ~ -23``.
* Everything coarse-side that does not depend on the fine MLP — union
  interval lengths, coarse alphas, the coarse-before-fine partial
  transmittances, the coarse in-block prefix — is computed IN-KERNEL from
  the raw (noised) coarse densities/colors, and the kernel emits the
  ``dens_c``/``col_c`` cotangents directly.  Round 2 ran this as an XLA
  precompute + ``jax.vjp``; the chip trace showed ~3 ms/step of XLA glue,
  so round 3 moved it in-kernel.
* EVERY scalar operand and cotangent crosses the kernel boundary
  LANE-DENSE (``[rays, S]`` per field, ``[rays, C]`` pixels): a narrow
  ``[total, k]`` slab is tiled T(8, 128) on device, physically padding
  HBM (and every XLA copy producing it) by 128/k x — the round-3 aux
  slabs cost ~130 MB/step of padded traffic at 2048x(64+128).

Semantics mirror ``ClassicNeRF.render_rays``'s reuse branch
(``models/nerf.py``): ``ops.compositing.weights_from_unsorted`` with the
(t, index) total order, the 1e-10 epsilon inside the transmittance
product, coarse noise carried into the union, sigmoid color, and the
stage-mean MSE.  Reference behavior covered: the hierarchical contract at
``/root/reference/nerf/model.py:191-193`` with compositing per
``model.py:437-469``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops import compositing
from nerf_tpu.ops.pallas.fused_mlp import (
    _PACK_ORDER,
    _VMEM_LIMIT,
    _bwd_slice,
    _forward_chain,
    _full_spec,
    _interpret_default,
    _pack_order,
    _tile_spec,
    pack_classic_params,
)
from nerf_tpu.ops.pallas.fused_train import (
    _dot_exact2,
    _dot_exact_row,
    _lane2rows,
    _lane_exclusive_prefix,
    _lane_exclusive_suffix,
    _lane_shift_down,
    _lane_shift_up,
    rays2rows,
    unpack_classic_grads,
)

Array = jax.Array

# Fine rows per tile (the MLP runs on fine rows only); 1024 with two
# independent slices is the swept optimum of the kernel family.
TILE_F = 1024
_SPLITS = 2

# Sentinel "no successor" distance for the in-kernel masked mins (f32 max
# is ~3.4e38; anything above _FIN is treated as the reference's 1e10 far
# pad).  jnp.inf is avoided: inf - inf in a dead lane would poison a
# where() the compiler cannot prove dead.
_INF = 1e38
_FIN = 1e37


def _hier_kernel(*refs, compute_dtype, s_coarse, s_fine, cols, g_scale,
                 white_background, splits, has_view=True,
                 ablate=frozenset()):
    """Fused fine-stage train objective, scalar chain in [rays, S] LANE
    layout (module docstring): fine MLP (row layout) -> lane-relayout
    densities -> lane dists/alphas/prefix ladders -> per-ray cross-block
    Dekker dots -> union rgb/loss -> lane backward -> row-relayout
    (g_dens, g_col) -> MLP backward with the VMEM-resident chain."""
    xf_ref = refs[0]
    df_ref = refs[1] if has_view else None
    k = 2 if has_view else 1
    (tf_ref, tc_ref, densc_ref, noisef_ref, dnorm_ref, pix_ref) = (
        refs[k : k + 6]
    )
    k += 6
    colc_refs = refs[k : k + cols]  # coarse color logits, [rays, Sc]/chan
    k += cols
    order = _pack_order(has_view)
    w = dict(zip(order, refs[k : k + len(order)]))
    outs = list(refs[k + len(order) :])
    loss_ref = outs.pop(0)
    grad_refs = dict(zip(order, outs[: len(order)]))
    gdensc_ref = outs[len(order)]
    gcolc_refs = outs[len(order) + 1 : len(order) + 1 + cols]
    (dwhh_ref, db_ref, dg_ref, dbeta_ref) = (
        grad_refs.pop("whh"), grad_refs.pop("b"), grad_refs.pop("g"),
        grad_refs.pop("beta"),
    )
    flat_refs = grad_refs  # the non-stacked weight-grad refs, by name
    w = {k2: v[:] for k2, v in w.items()}
    dt = compute_dtype

    # Profiling ablations (scripts/hier_ablate.py) — static trace-time
    # switches, zero cost on the real path.
    dot_row = _dot_exact_row
    dot2 = _dot_exact2
    if "dekker" in ablate:
        dot_row = lambda v, m: jnp.dot(  # noqa: E731
            v, m, preferred_element_type=jnp.float32
        )
        dot2 = dot_row
    prefix = _lane_exclusive_prefix
    suffix = _lane_exclusive_suffix
    if "ladders" in ablate:
        prefix = suffix = jnp.zeros_like

    @pl.when(pl.program_id(0) == 0)
    def _():
        loss_ref[...] = jnp.zeros_like(loss_ref)
        for ref in (*flat_refs.values(), dwhh_ref, db_ref, dg_ref,
                    dbeta_ref):
            ref[...] = jnp.zeros_like(ref)

    tile_f = xf_ref.shape[0]
    rows_f = tile_f // splits
    rays_sl = rows_f // s_fine
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, s_fine), 1)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, s_coarse), 1)

    acc = None
    loss_sum = jnp.zeros((1, 1), jnp.float32)
    off = 1.0 if white_background else 0.0
    for s in range(splits):
        fsl = slice(s * rows_f, (s + 1) * rows_f)
        rsl = slice(s * rays_sl, (s + 1) * rays_sl)
        x = xf_ref[fsl, :]
        d = df_ref[fsl, :] if has_view else None
        t_f_l = tf_ref[rsl, :]  # [rays_sl, Sf]
        t_c_l = tc_ref[rsl, :]  # [rays_sl, Sc]
        dens_c_l = densc_ref[rsl, :]
        noise_l = noisef_ref[rsl, :]
        dnorm = dnorm_ref[rsl, :]  # [rays_sl, 1]
        pix = pix_ref[rsl, :]  # [rays_sl, C]

        # Per-ray t-mask pair: the cross-block structure is block-diagonal
        # over rays, so every cross term runs on exact per-ray blocks.
        # Fine-before-coarse is STRICT t comparison (fine indices follow
        # coarse indices in the (t, index) total order, so a tie is NOT
        # "before").  P and its complement cover all six per-ray uses:
        #   P  [Sc, Sf]: t_f[f] <  t_c[c]   (cmin_f, g_laf scatter)
        #   ~P [Sc, Sf]: t_f[f] >= t_c[c]   (cross_c gather)
        #   Q  [Sf, Sc]: t_f[f] >= t_c[c]   (cmin_c, g_lac scatter)
        #   ~Q [Sf, Sc]: t_f[f] <  t_c[c]   (cross_f gather)
        def tparts(ri):
            tfr = t_f_l[ri : ri + 1, :]  # [1, Sf]
            tcr = t_c_l[ri : ri + 1, :]  # [1, Sc]
            tfc = tfr.reshape(s_fine, 1)
            tcc = tcr.reshape(s_coarse, 1)
            p = jnp.broadcast_to(tfr, (s_coarse, s_fine)) < tcc
            q = tfc >= jnp.broadcast_to(tcr, (s_fine, s_coarse))
            return tfr, tcr, tfc, tcc, p, q

        def rays(fn):  # [1, X] per-ray pieces -> [rays_sl, X]
            return jnp.concatenate(
                [fn(ri) for ri in range(rays_sl)], axis=0
            )

        # ---- union interval lengths (unsorted_dists specialized) -------
        # Successor of a fine slot: its next in-block neighbour or the
        # first same-ray coarse sample with t_c > t_f (strict); of a
        # coarse slot: next neighbour or the first fine with t_f >= t_c.
        def cmin_f(ri):
            tfr, tcr, tfc, tcc, p, q = tparts(ri)
            return jnp.min(jnp.where(
                p, jnp.broadcast_to(tcc, (s_coarse, s_fine)), _INF
            ), axis=0, keepdims=True)  # [1, Sf]

        def cmin_c(ri):
            tfr, tcr, tfc, tcc, p, q = tparts(ri)
            return jnp.min(jnp.where(
                q, jnp.broadcast_to(tfc, (s_fine, s_coarse)), _INF
            ), axis=0, keepdims=True)  # [1, Sc]

        nxt_f = jnp.where(
            lane_f <= s_fine - 2, _lane_shift_up(t_f_l, 1), _INF
        )
        succ_f = (nxt_f if "cmin" in ablate
                  else jnp.minimum(nxt_f, rays(cmin_f)))
        dist_f = jnp.where(succ_f < _FIN, (succ_f - t_f_l) * dnorm, 1e10)
        nxt_c = jnp.where(
            lane_c <= s_coarse - 2, _lane_shift_up(t_c_l, 1), _INF
        )
        succ_c = (nxt_c if "cmin" in ablate
                  else jnp.minimum(nxt_c, rays(cmin_c)))
        dist_c = jnp.where(succ_c < _FIN, (succ_c - t_c_l) * dnorm, 1e10)

        # ---- coarse-side union quantities (in-kernel precompute) -------
        alpha_c = jnp.exp(-jnp.maximum(dens_c_l, 0.0) * dist_c)
        ac_eps = alpha_c + 1e-10
        log_ac = jnp.log(ac_eps)
        pref_c = prefix(log_ac)

        # ---- fine forward (chain kept VMEM-resident) ----
        chain, dens_raw, col = _forward_chain(x, d, w, dt, keep=True)
        dens_l = dens_raw.reshape(rays_sl, s_fine) + noise_l
        alpha_f = jnp.exp(-jnp.maximum(dens_l, 0.0) * dist_f)
        a_eps = alpha_f + 1e-10
        log_af = jnp.log(a_eps)
        pref_f = prefix(log_af)

        # Partial cross-block log-transmittances: per-ray M=1 Dekker dots
        # with the value as the lane row and the exact 0/1 mask right
        # (log_ac/log_af are slice-local [rays_sl, S]).
        def cross_c(ri):  # [1, Sf] same-ray coarse log-alphas at/below t_f
            tfr, tcr, tfc, tcc, p, q = tparts(ri)
            return dot_row(
                log_ac[ri : ri + 1, :], 1.0 - p.astype(jnp.float32)
            )

        def cross_f(ri):  # [1, Sc] same-ray fine log-alphas strictly below
            tfr, tcr, tfc, tcc, p, q = tparts(ri)
            return dot_row(
                log_af[ri : ri + 1, :], 1.0 - q.astype(jnp.float32)
            )

        if "crossdots" in ablate:
            cross_cl = jnp.zeros((rays_sl, s_fine), jnp.float32)
            cross_fl = jnp.zeros((rays_sl, s_coarse), jnp.float32)
        else:
            cross_cl, cross_fl = rays(cross_c), rays(cross_f)
        t_fine_full = jnp.exp(cross_cl + pref_f)
        w_f = (1.0 - alpha_f) * t_fine_full  # [rays_sl, Sf]
        t_coarse_full = jnp.exp(pref_c + cross_fl)
        w_c = (1.0 - alpha_c) * t_coarse_full  # [rays_sl, Sc]

        # ---- union rgb + stage MSE (per-RAY, no row broadcasts) --------
        sig_f = jax.nn.sigmoid(col)  # [rows_f, C] row layout

        def rgb_f_ray(ri):  # [1, C] fine rgb: both-side Dekker dot
            return dot2(
                w_f[ri : ri + 1, :],
                sig_f[ri * s_fine : (ri + 1) * s_fine, :],
            )

        rgb = rays(rgb_f_ray)  # [rays_sl, C]
        # Coarse contribution per channel as pure lane reductions,
        # assembled into the [rays_sl, C] row with an iota select (lane
        # concats of narrow arrays do not lower in Mosaic).
        cidx = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, cols), 1)
        sig_cl = []
        for c in range(cols):
            sc_ch = jax.nn.sigmoid(colc_refs[c][rsl, :])  # [rays_sl, Sc]
            sig_cl.append(sc_ch)
            rgb_cc = jnp.sum(w_c * sc_ch, axis=1, keepdims=True)
            rgb = rgb + jnp.where(cidx == c, rgb_cc, 0.0)
        if white_background:
            acc_w = jnp.sum(w_f, axis=1, keepdims=True) + jnp.sum(
                w_c, axis=1, keepdims=True
            )  # [rays_sl, 1]
            rgb = rgb + (1.0 - acc_w)
        err = rgb - pix  # [rays_sl, C]
        loss_sum = loss_sum + jnp.sum(
            jnp.mean(err * err, axis=-1, keepdims=True), keepdims=True
        )

        # ---- backward ----
        g_rgb = err * g_scale  # [rays_sl, C]
        # Fine color head (row layout): per-ray cotangent broadcast +
        # lane->row relayout of the fine weights.
        g_rgb_row = rays2rows(g_rgb, rays_sl, s_fine)
        w_f_row = _lane2rows(w_f)
        g_col = w_f_row * sig_f * (1.0 - sig_f) * g_rgb_row
        g_wf_row = jnp.sum(
            (sig_f - off) * g_rgb_row, axis=-1, keepdims=True
        )
        g_wf = g_wf_row.reshape(rays_sl, s_fine)  # row->lane relayout
        # Coarse side: fully lane-dense.
        g_wc = jnp.zeros((rays_sl, s_coarse), jnp.float32)
        for c in range(cols):
            g_ch = g_rgb[:, c : c + 1]  # [rays_sl, 1]
            g_wc = g_wc + (sig_cl[c] - off) * g_ch
            gcolc_refs[c][rsl, :] = (
                sig_cl[c] * (1.0 - sig_cl[c]) * w_c * g_ch
            )
        g_alpha_c = -t_coarse_full * g_wc
        g_logt_c = (1.0 - alpha_c) * t_coarse_full * g_wc
        g_logt_f = (1.0 - alpha_f) * t_fine_full * g_wf
        # cross_f's cotangent scatters back to every fine log-alpha below
        # the coarse sample; cross_c's to every coarse log-alpha at/below
        # the fine sample — per-ray transposed masks, value-row dots.
        def g_laf_ray(ri):  # [1, Sf]
            tfr, tcr, tfc, tcc, p, q = tparts(ri)
            return dot_row(
                g_logt_c[ri : ri + 1, :], p.astype(jnp.float32)
            )

        def g_lac_ray(ri):  # [1, Sc]
            tfr, tcr, tfc, tcc, p, q = tparts(ri)
            return dot_row(
                g_logt_f[ri : ri + 1, :], q.astype(jnp.float32)
            )

        if "crossdots" in ablate:
            g_laf_cross = jnp.zeros((rays_sl, s_fine), jnp.float32)
            g_lac_cross = jnp.zeros((rays_sl, s_coarse), jnp.float32)
        else:
            g_laf_cross = rays(g_laf_ray)
            g_lac_cross = rays(g_lac_ray)
        g_laf = g_laf_cross + suffix(g_logt_f)
        g_alpha_f = -t_fine_full * g_wf + g_laf / a_eps
        g_dens_l = g_alpha_f * (-dist_f * alpha_f) * (
            dens_l > 0.0
        ).astype(jnp.float32)
        g_dens = _lane2rows(g_dens_l)  # lane->row for the MLP bwd
        # Coarse-side backward to (dens_c, col_c): pref_c scatters as the
        # in-block exclusive suffix, cross_c as the per-ray transposed
        # mask against g_logt_f.
        g_logac = suffix(g_logt_c) + g_lac_cross
        g_alpha_c = g_alpha_c + g_logac / ac_eps
        gdensc_ref[rsl, :] = g_alpha_c * (-dist_c * alpha_c) * (
            dens_c_l > 0.0
        ).astype(jnp.float32)

        # MLP backward with NO forward recompute; grads flow only to
        # params (the fine encodings carry no parameter dependence).
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


# The lane-layout machinery (rays2rows/_lane2rows relayouts, lane
# shifts, MXU triangular prefix/suffix sums, Dekker dots) is shared
# with the coarse train kernel and lives in fused_train.py.


# Eval kernel output lanes per RAY: [rgb(cols), depth, acc].


def _hier_eval_kernel(*refs, compute_dtype, s_coarse, s_fine, cols, splits,
                      has_view=True):
    """Forward-only union compositing, scalar chain in [rays, S] LANE
    layout: fine MLP (row layout) -> lane-relayout densities -> lane
    dists/alphas/prefix ladders -> per-ray cross-block Dekker dots ->
    per-ray [rgb, depth, acc] outputs.  Only the per-ray t-masks and the
    rgb weight-x-sigmoid reductions touch row-layout operands.

    View-direction encodings arrive PER RAY (``[rays, DE]``) and are
    broadcast to sample rows IN-KERNEL (``rays2rows`` sublane concat):
    directions are constant along a ray, and the old ``[rays*Sf, DE]``
    row input cost ~1.5 GB/frame of XLA broadcast + HBM traffic at
    400x400x(64+128)."""
    xf_ref = refs[0]
    df_ref = refs[1] if has_view else None
    k = 2 if has_view else 1
    (tfblk_ref, tcblk_ref, densc_ref, dnorm_ref) = refs[k : k + 4]
    k += 4
    colc_refs = refs[k : k + cols]  # coarse color logits, [rays, Sc] per
    k += cols                       # channel (lane-dense, no 128/k HBM pad)
    order = _pack_order(has_view)
    w = dict(zip(order, refs[k : k + len(order)]))
    out_ref = refs[k + len(order)]
    w = {k2: v[:] for k2, v in w.items()}
    dt = compute_dtype

    tile_f = xf_ref.shape[0]
    rows_f = tile_f // splits
    rays_sl = rows_f // s_fine
    rows_c = rays_sl * s_coarse
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, s_fine), 1)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, s_coarse), 1)

    for s in range(splits):
        fsl = slice(s * rows_f, (s + 1) * rows_f)
        csl = slice(s * rows_c, (s + 1) * rows_c)
        rsl = slice(s * rays_sl, (s + 1) * rays_sl)
        x = xf_ref[fsl, :]
        d = (
            rays2rows(df_ref[rsl, :], rays_sl, s_fine)
            if has_view else None
        )
        t_f_l = tfblk_ref[rsl, :]  # [rays_sl, Sf]
        t_c_l = tcblk_ref[rsl, :]  # [rays_sl, Sc]
        dens_c_l = densc_ref[rsl, :]
        dnorm = dnorm_ref[rsl, :]  # [rays_sl, 1]

        def rays(fn):  # [1, X] per-ray pieces -> [rays_sl, X]
            return jnp.concatenate(
                [fn(ri) for ri in range(rays_sl)], axis=0
            )

        def tparts(ri):
            # Per-ray t rows + their [S, 1] vector transposes (the only
            # columns the kernel touches — no [total, k] aux slabs, whose
            # T(8,128) tiling pads HBM 128/k x).  Width-1 lane-slice
            # sample loops were measured SLOWER than these per-ray 2-D
            # blocks (371 vs 295 ms/frame in-kernel) — the per-sample
            # lane broadcasts do not amortize.
            tfr = t_f_l[ri : ri + 1, :]  # [1, Sf]
            tcr = t_c_l[ri : ri + 1, :]  # [1, Sc]
            tfc = tfr.reshape(s_fine, 1)
            tcc = tcr.reshape(s_coarse, 1)
            return tfr, tcr, tfc, tcc

        # -- union interval lengths (lane layout) ------------------------
        # Successor of a fine slot: next in-block neighbour or the first
        # same-ray coarse sample with t_c > t_f (strict); of a coarse
        # slot: next neighbour or the first fine with t_f >= t_c.
        def cmin_f(ri):
            tfr, tcr, tfc, tcc = tparts(ri)
            m = jnp.broadcast_to(tfr, (s_coarse, s_fine)) < tcc
            return jnp.min(jnp.where(
                m, jnp.broadcast_to(tcc, (s_coarse, s_fine)), _INF
            ), axis=0, keepdims=True)  # [1, Sf]

        def cmin_c(ri):
            tfr, tcr, tfc, tcc = tparts(ri)
            m = tfc >= jnp.broadcast_to(tcr, (s_fine, s_coarse))
            return jnp.min(jnp.where(
                m, jnp.broadcast_to(tfc, (s_fine, s_coarse)), _INF
            ), axis=0, keepdims=True)  # [1, Sc]

        nxt_f = jnp.where(
            lane_f <= s_fine - 2, _lane_shift_up(t_f_l, 1), _INF
        )
        succ_f = jnp.minimum(nxt_f, rays(cmin_f))
        dist_f = jnp.where(
            succ_f < _FIN, (succ_f - t_f_l) * dnorm, 1e10
        )
        nxt_c = jnp.where(
            lane_c <= s_coarse - 2, _lane_shift_up(t_c_l, 1), _INF
        )
        succ_c = jnp.minimum(nxt_c, rays(cmin_c))
        dist_c = jnp.where(
            succ_c < _FIN, (succ_c - t_c_l) * dnorm, 1e10
        )
        alpha_c = jnp.exp(-jnp.maximum(dens_c_l, 0.0) * dist_c)
        log_ac = jnp.log(alpha_c + 1e-10)
        pref_c = _lane_exclusive_prefix(log_ac)

        _, dens_raw, col = _forward_chain(x, d, w, dt)
        dens_l = dens_raw.reshape(rays_sl, s_fine)
        alpha_f = jnp.exp(-jnp.maximum(dens_l, 0.0) * dist_f)
        log_af = jnp.log(alpha_f + 1e-10)
        pref_f = _lane_exclusive_prefix(log_af)

        # Cross-block partial log-transmittances: per-ray M=1 Dekker dots
        # with the value as the LANE row and the exact 0/1 t-mask on the
        # right.
        def cross_c(ri):  # [1, Sf]
            tfr, tcr, tfc, tcc = tparts(ri)
            m = (tcc <= jnp.broadcast_to(tfr, (s_coarse, s_fine))).astype(
                jnp.float32
            )
            return _dot_exact_row(log_ac[ri : ri + 1, :], m)

        def cross_f(ri):  # [1, Sc]
            tfr, tcr, tfc, tcc = tparts(ri)
            m = (tfc < jnp.broadcast_to(tcr, (s_fine, s_coarse))).astype(
                jnp.float32
            )
            return _dot_exact_row(log_af[ri : ri + 1, :], m)

        t_fine_full = jnp.exp(rays(cross_c) + pref_f)
        w_f = (1.0 - alpha_f) * t_fine_full
        t_coarse_full = jnp.exp(pref_c + rays(cross_f))
        w_c = (1.0 - alpha_c) * t_coarse_full

        sig_f = jax.nn.sigmoid(col)  # [rows_f, C] row layout

        def rgb_f_ray(ri):  # [1, C] fine rgb: both-side Dekker dot
            return _dot_exact2(
                w_f[ri : ri + 1, :],
                sig_f[ri * s_fine : (ri + 1) * s_fine, :],
            )

        rgb_f = rays(rgb_f_ray)  # [rays_sl, C]
        # Coarse rgb per channel as pure lane reductions (the coarse
        # colors arrive lane-dense per channel).
        for c in range(cols):
            sig_cl = jax.nn.sigmoid(colc_refs[c][rsl, :])
            rgb_cc = jnp.sum(w_c * sig_cl, axis=1, keepdims=True)
            out_ref[rsl, c : c + 1] = rgb_f[:, c : c + 1] + rgb_cc
        depth = jnp.sum(w_f * t_f_l, axis=1, keepdims=True) + jnp.sum(
            w_c * t_c_l, axis=1, keepdims=True
        )
        acc = jnp.sum(w_f, axis=1, keepdims=True) + jnp.sum(
            w_c, axis=1, keepdims=True
        )
        out_ref[rsl, cols : cols + 1] = depth
        out_ref[rsl, cols + 1 : cols + 2] = acc


def fine_union_eval_pallas(
    params: Dict[str, Any],
    x_enc: Array,
    d_enc: Optional[Array],
    t_coarse: Array,
    t_fine: Array,
    dens_c: Array,
    col_c: Array,
    dnorm: Array,
    compute_dtype=jnp.float32,
    interpret: bool | None = None,
    splits: int | None = None,
    tile_rows: int | None = None,
) -> Tuple[Array, Array, Array]:
    """Forward-only fused fine stage for the hierarchical reuse renderer.

    Takes the raw coarse outputs directly (``dens_c [B, Sc, 1]``,
    ``col_c [B, Sc, C]``, per-ray ``dnorm = ||rays_d|| [B]``): union
    interval lengths, coarse alphas/prefixes and the cross-block
    transmittances are all computed in-kernel — no [B, Sf, Sc] XLA masks,
    no precompute round trip.  Fine MLP + order-free union compositing in
    ONE kernel.

    ``d_enc`` is the PER-RAY view-direction encoding ``[B, DE]`` (or
    ``None``): directions are constant along a ray, so the kernel
    broadcasts them to sample rows itself instead of reading a
    ``[B*Sf, DE]`` pre-broadcast slab from HBM (~1.5 GB/frame at
    400x400x(64+128)).

    ``splits``/``tile_rows`` override the tile geometry (the sweep
    hooks); the defaults are the round-5 swept optimum — double-size
    tiles with TWO slices (423.6 vs 426.8 ms/frame single-slice;
    4096/8192-row tiles measured 464+ ms).

    Returns ``(rgb [B, C], depth [B], acc [B])`` over the union.
    """
    if interpret is None:
        interpret = _interpret_default()
    has_view = d_enc is not None
    order = _pack_order(has_view)
    n_rays, s_fine = t_fine.shape[0], t_fine.shape[-1]
    s_coarse = t_coarse.shape[-1]
    cols = col_c.shape[-1]
    xe = x_enc.shape[-1]
    total_f = n_rays * s_fine
    total_c = n_rays * s_coarse
    # Forward-only: no chain retention, so one slice per DOUBLE-size tile
    # (halves the per-tile grid overhead; the lane arrays fill whole
    # vregs).
    r, _ = _pick_tiling(
        n_rays, s_fine, interpret,
        tile_rows=2 * TILE_F if tile_rows is None else tile_rows,
    )
    if splits is None:
        splits = 2 if (r % 2 == 0 and (r // 2) * s_fine % 8 == 0) else 1
    grid = n_rays // r
    tile_f, tile_c = r * s_fine, r * s_coarse

    x2 = x_enc.reshape(total_f, xe).astype(compute_dtype)
    d_ops, d_specs = (), ()
    if has_view:
        de = d_enc.shape[-1]
        d_ops = (d_enc.reshape(n_rays, de).astype(compute_dtype),)
        d_specs = (pl.BlockSpec((r, de), lambda i: (i, 0)),)
    # Every scalar operand enters LANE-DENSE ([rays, S] per field): a
    # narrow [total, k] slab is tiled T(8, 128) on device, physically
    # padding HBM (and every copy producing it) by 128/k x — the round-3
    # eval trace showed a 60 ms/frame fusion materializing exactly such a
    # [total_f, 1] column.
    densc_l = dens_c.reshape(n_rays, s_coarse)
    dnorm2 = dnorm.reshape(n_rays, 1)
    colc_chans = [col_c[..., c] for c in range(cols)]  # [n_rays, Sc] each

    packed = pack_classic_params(params)
    weights = [packed[k] for k in order]

    lane_c = pl.BlockSpec((r, s_coarse), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(
            _hier_eval_kernel,
            compute_dtype=compute_dtype,
            s_coarse=s_coarse,
            s_fine=s_fine,
            cols=cols,
            splits=splits,
            has_view=has_view,
        ),
        out_shape=jax.ShapeDtypeStruct((n_rays, cols + 2), jnp.float32),
        grid=(grid,),
        in_specs=[
            _tile_spec(tile_f, xe),
            *d_specs,
            pl.BlockSpec((r, s_fine), lambda i: (i, 0)),
            lane_c,
            lane_c,
            pl.BlockSpec((r, 1), lambda i: (i, 0)),
            *[lane_c for _ in range(cols)],
            *[_full_spec(wt.shape) for wt in weights],
        ],
        out_specs=pl.BlockSpec((r, cols + 2), lambda i: (i, 0)),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(x2, *d_ops, t_fine, t_coarse, densc_l, dnorm2, *colc_chans,
      *weights)

    return (
        out[:, :cols],
        out[:, cols],
        out[:, cols + 1],
    )


def _pick_tiling(n_rays: int, s_fine: int, interpret: bool,
                 tile_rows: int = TILE_F) -> Tuple[int, int]:
    """Rays per tile + slice count: whole rays per slice, 8-sublane-aligned
    slice boundaries on hardware (the split row-slices of the aux/enc
    tiles; the per-ray cross blocks themselves slice at any offset)."""
    r = min(n_rays, max(1, tile_rows // max(s_fine, 1)))
    while r > 1 and n_rays % r:
        r -= 1
    splits = _SPLITS
    while splits > 1:
        rays_sl, rem = divmod(r, splits)
        aligned = interpret or (rays_sl * s_fine) % 8 == 0
        if rem == 0 and aligned:
            break
        splits -= 1
    return r, splits


def fine_stage_train_pallas(
    params: Dict[str, Any],
    x_enc: Array,
    d_enc: Optional[Array],
    t_coarse: Array,
    t_fine: Array,
    dens_c: Array,
    col_c: Array,
    dnorm: Array,
    noise_f: Array,
    pixels: Array,
    compute_dtype=jnp.float32,
    white_background: bool = False,
    loss_weight: float = 1.0,
    interpret: bool | None = None,
    ablate: frozenset = frozenset(),
) -> Tuple[Array, Dict[str, Any], Tuple[Array, Array]]:
    """One fused evaluation of the disjoint-stage fine objective.

    Args:
        params: ClassicNeRF pytree.
        x_enc / d_enc: ``[B, Sf, XE] / [B, Sf, DE]`` FINE-point encodings.
        t_coarse / t_fine: sorted t-sets ``[B, Sc] / [B, Sf]``.
        dens_c: ``[B, Sc, 1]`` NOISED coarse densities (the reuse path
            carries the coarse stage's noise into the union).
        col_c: ``[B, Sc, C]`` coarse color logits.
        dnorm: ``[B]`` per-ray ``||rays_d||`` (interval-length scale).
        noise_f: ``[B, Sf]`` pre-drawn density noise (zeros if noiseless).
        pixels: ``[B, C]`` targets.
        loss_weight: stage weight (0.5 under the stage-mean MSE).

    Union interval lengths and every coarse-side union quantity are
    computed in-kernel from these raw inputs, and the backward emits the
    ``(g_dens_c, g_col_c)`` cotangents directly — no XLA precompute, no
    ``jax.vjp`` wrapper, no [B, Sf, Sc] HBM masks.  Every scalar operand
    and cotangent crosses the kernel boundary LANE-DENSE (module
    docstring) — the only row-layout traffic is the fine encodings.

    Returns ``(loss, grads, (g_dens_c [B, Sc, 1], g_col_c [B, Sc, C]))``.
    """
    if interpret is None:
        interpret = _interpret_default()
    has_view = d_enc is not None
    order = _pack_order(has_view)
    n_rays, s_fine = t_fine.shape[0], t_fine.shape[-1]
    s_coarse = t_coarse.shape[-1]
    cols = pixels.shape[-1]
    xe = x_enc.shape[-1]
    total_f = n_rays * s_fine
    r, splits = _pick_tiling(n_rays, s_fine, interpret)
    grid = n_rays // r
    tile_f = r * s_fine

    x2 = x_enc.reshape(total_f, xe).astype(compute_dtype)
    d_ops, d_specs = (), ()
    if has_view:
        de = d_enc.shape[-1]
        d_ops = (d_enc.reshape(total_f, de).astype(compute_dtype),)
        d_specs = (_tile_spec(tile_f, de),)
    densc_l = dens_c.reshape(n_rays, s_coarse)
    dnorm2 = dnorm.reshape(n_rays, 1)
    colc_chans = [col_c[..., c] for c in range(cols)]  # [n_rays, Sc] each

    packed = pack_classic_params(params)
    weights = [packed[k] for k in order]

    n_w = len(order)
    lane_c = pl.BlockSpec((r, s_coarse), lambda i: (i, 0))
    lane_f = pl.BlockSpec((r, s_fine), lambda i: (i, 0))
    out_shapes = (
        [jax.ShapeDtypeStruct((1, 1), jnp.float32)]  # loss accumulator
        + [jax.ShapeDtypeStruct(packed[k].shape, jnp.float32) for k in order]
        + [
            jax.ShapeDtypeStruct((n_rays, s_coarse), jnp.float32)
            for _ in range(1 + cols)  # g_dens_c + g_col_c channels
        ]
    )
    out_specs = [_full_spec(s.shape) for s in out_shapes[: 1 + n_w]] + [
        lane_c for _ in range(1 + cols)
    ]

    outs = pl.pallas_call(
        functools.partial(
            _hier_kernel,
            compute_dtype=compute_dtype,
            s_coarse=s_coarse,
            s_fine=s_fine,
            cols=cols,
            g_scale=loss_weight * 2.0 / (cols * n_rays),
            white_background=white_background,
            splits=splits,
            has_view=has_view,
            ablate=ablate,
        ),
        out_shape=out_shapes,
        grid=(grid,),
        in_specs=[
            _tile_spec(tile_f, xe),
            *d_specs,
            lane_f,
            lane_c,
            lane_c,
            lane_f,
            pl.BlockSpec((r, 1), lambda i: (i, 0)),
            pl.BlockSpec((r, cols), lambda i: (i, 0)),
            *[lane_c for _ in range(cols)],
            *[_full_spec(wt.shape) for wt in weights],
        ],
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(x2, *d_ops, t_fine, t_coarse, densc_l, noise_f, dnorm2, pixels,
      *colc_chans, *weights)

    loss = loss_weight * outs[0][0, 0] / n_rays
    grads = unpack_classic_grads(
        dict(zip(order, outs[1 : 1 + n_w])), params
    )
    g_dens_c = outs[1 + n_w][..., None]  # [B, Sc, 1]
    g_col_c = jnp.stack(outs[2 + n_w : 2 + n_w + cols], axis=-1)
    return loss, grads, (g_dens_c, g_col_c)


def reuse_train_loss_and_grads(
    model,
    params: Dict[str, Any],
    render,
    batch: Dict[str, Array],
    key: jax.Array,
) -> Tuple[Array, Dict[str, Any], Dict[str, Array]]:
    """Loss + parameter gradients for ONE hierarchical reuse-formulation
    step, with every MLP evaluation fused:

    * coarse stage through the custom-VJP kernels (``classic_mlp_pallas``),
      its compositing/loss and the inverse-CDF resample in cheap XLA;
    * fine stage through the single fused kernel above;
    * coarse cotangents (coarse-stage loss + fine-stage union terms)
      summed and pushed through ONE coarse backward kernel.

    PRNG semantics mirror ``ClassicNeRF.render_rays`` exactly (same key
    split, same noise draws up to counter-layout), so loss/grads match the
    general trainer to float tolerance.  Returns ``(loss, grads, aux)``.
    """
    from nerf_tpu.ops import sampling
    from nerf_tpu.ops.pallas import fused_mlp

    cfg = model.cfg
    dtype = jnp.dtype(cfg.compute_dtype)
    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    pixels = batch["pixels"]
    n_rays = rays_o.shape[0]
    sc, sf = render.num_coarse_samples, render.num_fine_samples
    std = render.density_noise_std
    bg = 1.0 if render.white_background else None
    stage_w = 0.5  # stage-mean MSE over (coarse, fine)

    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
    t_coarse = sampling.sample_linear(
        k_strat, (n_rays,), sc, render.near, render.far,
        randomly_sample=render.randomly_sample, dtype=rays_o.dtype,
    )

    states_x = batch.get("states_x")
    states_d = batch.get("states_d")

    # -- coarse stage: custom-VJP MLP + XLA compositing/loss --------------
    # [B, S, .]-layout encode (flat-before-encoding measured SLOWER on the
    # custom-VJP path — see the perf notes in CLAUDE.md).
    _, xc_enc, dc_enc = model._encode_inputs(
        rays_o, rays_d, t_coarse, states_x, states_d
    )
    (dens_c_raw, col_c), vjp_c = jax.vjp(
        lambda p: fused_mlp.classic_mlp_pallas(
            p, xc_enc, dc_enc, compute_dtype=dtype
        ),
        params,
    )
    if std > 0.0:
        noise_c = std * jax.random.normal(k_noise_c, (n_rays, sc))
        dens_c = dens_c_raw + noise_c[..., None]
    else:
        dens_c = dens_c_raw
    dists_stage = compositing.distances_from_tvals(t_coarse, rays_d)

    def coarse_loss_fn(dc, cc):
        wts = compositing.weights_from_density(dc, dists_stage)
        rgb = compositing.composite_rgb_with_background(wts, cc, bg)
        err = rgb - pixels
        # Weights as vjp aux: the resampler reuses them without a second
        # cumprod ladder and without entering the cotangent graph.
        return stage_w * jnp.mean(err * err), wts

    loss_c, vjp_cl, weights_c = jax.vjp(
        coarse_loss_fn, dens_c, col_c, has_aux=True
    )
    g_dens_c, g_col_c = vjp_cl(jnp.ones((), loss_c.dtype))

    # -- inverse-CDF fine sampling (stop-gradient weights) ----------------
    t_mids = 0.5 * (t_coarse[..., 1:] + t_coarse[..., :-1])
    t_fine = sampling.sample_pdf(
        k_pdf,
        t_mids,
        jax.lax.stop_gradient(weights_c[..., 1:-1, 0]),
        sf,
        randomly_sample=render.randomly_sample,
    )

    # -- fused fine stage (union dists + coarse precompute in-kernel) -----
    xf_enc, df_enc = model.encode_inputs_flat(
        rays_o, rays_d, t_fine, states_x, states_d
    )
    if std > 0.0:
        noise_f = std * jax.random.normal(k_noise_f, (n_rays, sf))
    else:
        noise_f = jnp.zeros((n_rays, sf), rays_o.dtype)
    dnorm = jnp.linalg.norm(rays_d, axis=-1)
    loss_f, grads_f, (g_dens_c2, g_col_c2) = fine_stage_train_pallas(
        params,
        xf_enc,
        df_enc,
        t_coarse,
        t_fine,
        dens_c,
        col_c,
        dnorm,
        noise_f,
        pixels,
        compute_dtype=dtype,
        white_background=render.white_background,
        loss_weight=stage_w,
    )

    # -- one coarse backward with the SUMMED cotangents -------------------
    (grads_c,) = vjp_c((g_dens_c + g_dens_c2, g_col_c + g_col_c2))
    grads = jax.tree.map(jnp.add, grads_f, grads_c)
    loss = loss_c + loss_f
    aux = {
        "loss": loss,
        "rgb_loss": loss,
        "fine_mse": loss_f / stage_w,
    }
    return loss, grads, aux
