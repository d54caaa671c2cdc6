"""MEGA-fused hierarchical train step: the ENTIRE reuse-formulation
objective — coarse MLP, coarse compositing + loss, inverse-CDF resample,
fine encoding, fine MLP, union compositing + loss, and BOTH backward
sweeps — in ONE Pallas call, with no forward recompute anywhere.

Why: the round-4 roofline (ROOFLINE.md §1) priced the previous
four-dispatch structure (coarse fwd kernel -> XLA compositing/resample ->
fused fine kernel -> coarse recompute-backward kernel) at a ~12.8 ms/step
floor at 2048x(64+128) — exactly the 160k rays/s bar — because the coarse
backward pays a full forward rematerialization (3x fwd FLOPs instead of
2x) and the stage boundaries round-trip the coarse outputs, cotangents
and fine encodings through HBM.  Holding the coarse activation chain
VMEM-RESIDENT through the resample removes the recompute entirely
(MXU-bound floor drops 8.39 -> 7.55 ms/step) and deletes the inter-stage
glue.

In-kernel stages (per ray-tile, grid-sequential weight-grad
accumulation exactly like ``fused_train``):

1. coarse MLP forward, activation chain kept in VMEM
   (``fused_mlp._forward_chain(keep=True)``);
2. coarse compositing + stage MSE forward/backward in the measured-
   fastest COLUMN layout (``fused_train._compositing_fwd_bwd`` — see its
   round-5 layout note), emitting the coarse-loss cotangents and the
   compositing weights;
3. inverse-CDF resample, a bitwise mirror of ``sampling.sample_pdf``:
   the cumulative ladders run in lane layout with the SAME
   Hillis-Steele association as ``ops/cumulative``, the bin selection
   uses the same closed-top-edge interval masks, and the four
   mask-contractions are one-hot Dekker dots (exact selection — a
   one-hot f32 dot with the value operand Dekker-split reconstructs the
   selected value exactly), so the emitted fine t-values match the XLA
   sampler to the last ulp given the same weights and uniforms (the
   uniforms are pre-drawn outside with ``sampling.pdf_uniforms`` —
   identical key, identical values);
4. fine frequency encoding in-kernel.  NOT the ``fused_mlp`` S-matrix
   form (an MXU matmul whose DEFAULT-precision bf16 truncation of the
   position operand would scramble the top octaves: phase error
   ~ f * |x| * 2^-9 >> pi at the highest frequency): the sine argument
   is built as three broadcast FMAs ``sum_c x_c * S_c`` in full f32 —
   bitwise equal to XLA's per-scalar ``x * scales`` products — and the
   sin/cos halves are selected per lane, so the in-kernel encodings are
   bitwise equal to ``encoding.frequency_encoding``'s (after the same
   bf16 cast at the matmul boundary);
5. fine MLP forward (chain kept) + order-free union compositing + fine
   stage MSE + its backward — the ``fused_hier`` kernel body, with the
   coarse-side cotangents kept in-register instead of crossing a kernel
   boundary;
6. fine MLP backward from its resident chain, then the COARSE MLP
   backward from ITS resident chain with the summed cotangents
   (coarse-loss + union terms) — no recompute, no custom VJP, the
   kernel returns the total parameter gradients directly.

Gradient correctness note: the resample consumes the coarse weights
through a stop-gradient in the reference formulation (``fused_hier.
reuse_train_loss_and_grads`` and the general trainer both
``stop_gradient`` the resampler's weights), so t_fine carries NO
parameter dependence and the fine encodings need no backward — the only
cotangent paths are the two MLP backwards above, exactly the general
trainer's gradient.

Reference behavior covered: hierarchical contract
``/root/reference/nerf/model.py:191-193`` ("later stages sample along
rays using an empirical cdf"), compositing ``model.py:437-469``, noise
``:652-654``, stage-broadcast MSE (notebook cell 8).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_tpu.ops import compositing, sampling
from nerf_tpu.ops.pallas.fused_mlp import (
    _VMEM_LIMIT,
    _bwd_slice,
    _forward_chain,
    _full_spec,
    _interpret_default,
    _pack_order,
    _tile_spec,
    pack_classic_params,
    supports_classic_config,
)
from nerf_tpu.ops.pallas.fused_train import (
    _AUX_WIDTH_BASE,
    _compositing_fwd_bwd,
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

# Rays per tile / slices: the fine rows dominate (R * Sf).  Swept on
# chip at the north-star 2048x(64+128) shape: 8/16/32 rays per tile ran
# 17.9/15.7/14.9 ms/step — the mega kernel wants the BIGGEST tile that
# fits VMEM (both stages' chains are resident), which is 32 rays
# (4096 fine rows, ~126M of the 128M physical) with two slices.
TILE_F = 4096
_SPLITS = 2

_INF = 1e38
_FIN = 1e37
_PDF_EPS = 1e-5  # sampling.sample_pdf's eps

# The mega kernel's resident state (both stages' activation chains, two
# slices in flight under the skewed schedule) exceeds the family's
# 100 MB cap at the preferred 32-ray tiles (measured 125.9 MB); v5e
# physical VMEM is 128 MB, so this kernel runs right at the edge.
_MEGA_VMEM_LIMIT = pltpu.CompilerParams(
    vmem_limit_bytes=127 * 1024 * 1024
)


def _lane_inclusive_ladder(v: Array, n: int, combine) -> Array:
    """Inclusive Hillis-Steele ladder over the first ``n`` lanes, with the
    SAME combine order as ``ops.cumulative._doubling`` (k = 1, 2, 4, ...
    while k < n) so the f32 results are bitwise identical.  The shift
    fills zeros; zero is the exact identity for ``add`` and — because
    every cdf partial here is > 0 — for ``max`` as well.  Lanes >= n
    emit garbage the caller must mask."""
    k = 1
    while k < n:
        v = combine(v, _lane_shift_down(v, k))
        k *= 2
    return v


def _resample_lane(w_l, t_c, u, s_coarse, s_fine, rays_sl):
    """Bitwise mirror of ``sampling.sample_pdf(k, t_mids, w[..., 1:-1],
    s_fine)`` in [rays, S] lane layout.  ``w_l`` [rays_sl, Sc] compositing
    weights, ``t_c`` [rays_sl, Sc] sorted coarse t, ``u`` [rays_sl, Sf]
    pre-drawn uniforms (``sampling.pdf_uniforms``).  Returns t_fine
    [rays_sl, Sf] (sorted: u is stratified and the cdf monotone)."""
    nbins = s_coarse - 2  # interior-weight histogram bins
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, s_coarse), 1)

    # bins = t_mids (Sc-1 valid lanes); weights = w[..., 1:-1] (Sc-2).
    mids = 0.5 * (t_c + _lane_shift_up(t_c, 1))  # valid lanes 0..Sc-2
    wb = _lane_shift_up(w_l, 1)  # w_l[i+1] at lane i; valid 0..Sc-3
    bmask = lane_c < nbins
    w_eps = jnp.where(bmask, wb + _PDF_EPS, 0.0)
    pdf = w_eps / jnp.sum(w_eps, axis=1, keepdims=True)
    cdf = _lane_inclusive_ladder(
        jnp.where(bmask, pdf, 0.0), nbins, jnp.add
    )
    # Monotonicity repair (cumulative.cummax): exact, same ladder order.
    cdf = _lane_inclusive_ladder(cdf, nbins, jnp.maximum)
    # Fenceposts: cpost[0] = 0, cpost[1..nbins-1] = cdf[0..nbins-2],
    # cpost[nbins] = 1 (the XLA path's concat-zero + top-clamp).
    cpost = jnp.where(
        lane_c == 0, 0.0, _lane_shift_down(cdf, 1)
    )
    cpost = jnp.where(lane_c == nbins, 1.0, cpost)
    hi = _lane_shift_up(cpost, 1)  # hi[b] = cpost[b+1], valid 0..nbins-1
    binhi = _lane_shift_up(mids, 1)  # binhi[b] = mids[b+1]

    def per_ray(ri):
        u_row = u[ri : ri + 1, :]  # [1, Sf]
        lo_col = cpost[ri : ri + 1, :].reshape(s_coarse, 1)
        hi_col = hi[ri : ri + 1, :].reshape(s_coarse, 1)
        row = jax.lax.broadcasted_iota(
            jnp.int32, (s_coarse, s_fine), 0
        )
        # Top selection interval closed (the sample_pdf NaN fix): the
        # last bin's upper edge compares as +inf.
        sel_hi = jnp.where(row == nbins - 1, _INF, hi_col)
        sel = (
            (u_row >= lo_col) & (u_row < sel_hi) & (row < nbins)
        ).astype(jnp.float32)  # one-hot per column (u)
        vals = jnp.concatenate(
            [
                cpost[ri : ri + 1, :],
                hi[ri : ri + 1, :],
                mids[ri : ri + 1, :],
                binhi[ri : ri + 1, :],
            ],
            axis=0,
        )  # [4, Sc]
        return _dot_exact_row(vals, sel)  # [4, Sf] exact selections

    picked = [per_ray(ri) for ri in range(rays_sl)]

    def gather(row):
        return jnp.concatenate(
            [p[row : row + 1, :] for p in picked], axis=0
        )  # [rays_sl, Sf]

    cdf_below, cdf_above = gather(0), gather(1)
    bins_below, bins_above = gather(2), gather(3)
    denom = cdf_above - cdf_below
    denom = jnp.where(denom < _PDF_EPS, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def _encode_fine(t_fine, o3, d3, enc, is_cos, rays_sl, s_fine,
                 skip_trig=False, exact_trig=False):
    """In-kernel classic frequency encoding of the fine sample positions.

    ``enc`` [3, XE] holds per-input-dim frequency placements (row c has
    the L frequencies duplicated into scalar c's sin AND cos lanes);
    ``is_cos`` [1, XE] is 1.0 on cos lanes.  The sine argument is built
    with VPU broadcast-FMAs in full f32 — see the module docstring for
    why NOT an MXU matmul — so the products are bitwise equal to
    ``encoding.frequency_encoding``'s.

    Default trig: ONE transcendental per lane via the phase identity
    ``cos(z) = sin(z + pi/2)`` — ``where(is_cos, cos, sin)`` evaluates
    BOTH branches over the full width (2x the transcendentals, measured
    ~0.9 ms/step at 2048x128 points x 60 lanes).  The phase add rounds
    the argument by ~1 ulp(|xf|), a ~2.6e-4 worst-case value error at
    the top octave — below the bf16 cast at the matmul boundary.
    ``exact_trig=True`` keeps the bitwise-equal dual-evaluation form
    (the strict parity tests pin it)."""
    t_row = _lane2rows(t_fine)  # [rows_f, 1]
    o_row = rays2rows(o3, rays_sl, s_fine)  # [rows_f, 3]
    d_row = rays2rows(d3, rays_sl, s_fine)
    pts = o_row + d_row * t_row  # o + d*t, f32 (matches _encode_inputs)
    xf = (
        pts[:, 0:1] * enc[0:1, :]
        + pts[:, 1:2] * enc[1:2, :]
        + pts[:, 2:3] * enc[2:3, :]
    )
    if skip_trig:  # profiling ablation: the argument FMAs without trig
        return xf * 0.01
    if exact_trig:
        return jnp.where(is_cos > 0.0, jnp.cos(xf), jnp.sin(xf))
    return jnp.sin(xf + is_cos * jnp.float32(np.pi / 2.0))


def _enc_placement(size: int, bound: float):
    """The shared lane-placement constants (``encoding.
    frequency_placement``): nonzero values are exactly the cached
    frequency scales laid out per ``frequency_encoding``'s
    [sin(L), cos(L)] per-scalar blocks."""
    from nerf_tpu.ops import encoding

    return encoding.frequency_placement(size, bound, dims=3)


def _mega_kernel(*refs, compute_dtype, s_coarse, s_fine, cols, g_scale,
                 white_background, splits, has_view=True,
                 emit_t_fine=False, exact_trig=False,
                 ablate=frozenset()):
    """One grid step = one ray tile through the whole hierarchical
    objective (module docstring).  Scalar chains run lane-dense except
    the coarse compositing (column layout — the measured-fastest form,
    see fused_train) and the MLP row-major math."""
    xc_ref = refs[0]
    k = 1
    dray_ref = None
    if has_view:
        dray_ref = refs[k]
        k += 1
    (auxc_ref, tc_ref, u_ref, noisef_ref, auxr_ref, enc_ref,
     iscos_ref) = refs[k : k + 7]
    k += 7
    order = _pack_order(has_view)
    w = dict(zip(order, refs[k : k + len(order)]))
    outs = list(refs[k + len(order) :])
    lossc_ref = outs.pop(0)
    lossf_ref = outs.pop(0)
    grad_refs = dict(zip(order, outs[: len(order)]))
    tfine_ref = outs[len(order)] if emit_t_fine else None
    (dwhh_ref, db_ref, dg_ref, dbeta_ref) = (
        grad_refs.pop("whh"), grad_refs.pop("b"), grad_refs.pop("g"),
        grad_refs.pop("beta"),
    )
    flat_refs = grad_refs
    w = {k2: v[:] for k2, v in w.items()}
    dt = compute_dtype
    enc = enc_ref[:]
    is_cos = iscos_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        lossc_ref[...] = jnp.zeros_like(lossc_ref)
        lossf_ref[...] = jnp.zeros_like(lossf_ref)
        for ref in (*flat_refs.values(), dwhh_ref, db_ref, dg_ref,
                    dbeta_ref):
            ref[...] = jnp.zeros_like(ref)

    tile_c = xc_ref.shape[0]
    rows_c = tile_c // splits
    rays_sl = rows_c // s_coarse
    rows_f = rays_sl * s_fine
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (rows_c, 1), 0) % s_coarse
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, s_fine), 1)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, s_coarse), 1)
    off = 1.0 if white_background else 0.0

    # ---- per-slice phase functions, traced in a SKEWED order ------------
    # The straight slice-major body serializes each slice's long
    # MXU-phase -> VPU-phase -> MXU-phase chain; Mosaic's scheduler only
    # overlaps work that is close in program order, and the "coarsebwd"
    # ablation measured the coarse backward at its FULL serial cost (no
    # overlap).  Tracing the slices software-pipelined — slice s+1 one
    # phase behind slice s — puts every VPU-heavy phase (compositing/
    # resample/encoding, union scalars) adjacent to the other slice's
    # matmul phase so the units can actually mix.
    def p1_coarse_fwd(e):
        sl = e["s"]
        csl = slice(sl * rows_c, (sl + 1) * rows_c)
        rsl = slice(sl * rays_sl, (sl + 1) * rays_sl)
        e["xc"] = xc_ref[csl, :]
        e["auxc"] = auxc_ref[csl, :]  # [rows_c, 2+C]: dist, noise, pix
        e["t_c_l"] = tc_ref[rsl, :]  # [rays_sl, Sc]
        e["u"] = u_ref[rsl, :]  # [rays_sl, Sf]
        e["noise_f"] = noisef_ref[rsl, :]
        auxr = auxr_ref[rsl, :]  # [rays_sl, 7+C]: o, d, dnorm, pix
        e["o3"] = auxr[:, 0:3]
        e["d3"] = auxr[:, 3:6]
        e["dnorm"] = auxr[:, 6:7]
        e["pix"] = auxr[:, 7 : 7 + cols]
        e["rsl"] = rsl
        e["d_ray"] = dray_ref[rsl, :] if has_view else None
        e["dc"] = (
            rays2rows(e["d_ray"], rays_sl, s_coarse) if has_view else None
        )
        e["chain_c"], dens_c_raw, e["col_c"] = _forward_chain(
            e["xc"], e["dc"], w, dt, keep=True
        )
        e["dens_c_row"] = dens_c_raw + e["auxc"][:, 1:2]  # + noise

    def p2_comp_resample_encode(e):
        # Coarse compositing + stage loss fwd/bwd (column layout).
        (e["loss_c"], e["g_dens_c_row"], e["g_col_c_row"],
         weights_row) = _compositing_fwd_bwd(
            e["dens_c_row"], e["col_c"], e["auxc"][:, 0:1],
            e["auxc"][:, _AUX_WIDTH_BASE:], pos_c, g_scale, s_coarse,
            white_background,
        )
        # Inverse-CDF resample (stop-gradient weights).
        w_l = weights_row.reshape(rays_sl, s_coarse)
        if "resample" in ablate:  # profiling: skip the CDF inversion
            t_f_l = 2.0 + 4.0 * e["u"]
        else:
            t_f_l = _resample_lane(
                w_l, e["t_c_l"], e["u"], s_coarse, s_fine, rays_sl
            )
        e["t_f_l"] = t_f_l
        if emit_t_fine:
            tfine_ref[e["rsl"], :] = t_f_l
        # Fine encodings in-kernel.
        e["xf_enc"] = _encode_fine(
            t_f_l, e["o3"], e["d3"], enc, is_cos, rays_sl, s_fine,
            skip_trig="enc" in ablate, exact_trig=exact_trig,
        )
        e["df"] = (
            rays2rows(e["d_ray"], rays_sl, s_fine) if has_view else None
        )
        # Pre-MLP union quantities: interval lengths, coarse alphas and
        # prefixes, the coarse-side cross transmittances (none of these
        # touch the fine MLP outputs).
        t_c_l = e["t_c_l"]
        dens_c_l = e["dens_c_row"].reshape(rays_sl, s_coarse)
        e["dens_c_l"] = dens_c_l

        def tp(ri):
            tfr = t_f_l[ri : ri + 1, :]
            tcr = t_c_l[ri : ri + 1, :]
            tfc = tfr.reshape(s_fine, 1)
            tcc = tcr.reshape(s_coarse, 1)
            p = jnp.broadcast_to(tfr, (s_coarse, s_fine)) < tcc
            q = tfc >= jnp.broadcast_to(tcr, (s_fine, s_coarse))
            return tfr, tcr, tfc, tcc, p, q

        e["tparts"] = tp

        def rays(fn):
            return jnp.concatenate(
                [fn(ri) for ri in range(rays_sl)], axis=0
            )

        e["rays"] = rays

        def cmin_f(ri):
            tfr, tcr, tfc, tcc, p, q = tp(ri)
            return jnp.min(jnp.where(
                p, jnp.broadcast_to(tcc, (s_coarse, s_fine)), _INF
            ), axis=0, keepdims=True)

        def cmin_c(ri):
            tfr, tcr, tfc, tcc, p, q = tp(ri)
            return jnp.min(jnp.where(
                q, jnp.broadcast_to(tfc, (s_fine, s_coarse)), _INF
            ), axis=0, keepdims=True)

        nxt_f = jnp.where(
            lane_f <= s_fine - 2, _lane_shift_up(t_f_l, 1), _INF
        )
        succ_f = jnp.minimum(nxt_f, rays(cmin_f))
        e["dist_f"] = jnp.where(
            succ_f < _FIN, (succ_f - t_f_l) * e["dnorm"], 1e10
        )
        nxt_c = jnp.where(
            lane_c <= s_coarse - 2, _lane_shift_up(t_c_l, 1), _INF
        )
        succ_c = jnp.minimum(nxt_c, rays(cmin_c))
        dist_c = jnp.where(
            succ_c < _FIN, (succ_c - t_c_l) * e["dnorm"], 1e10
        )
        e["dist_c"] = dist_c
        alpha_c = jnp.exp(-jnp.maximum(dens_c_l, 0.0) * dist_c)
        e["alpha_c"] = alpha_c
        e["ac_eps"] = alpha_c + 1e-10
        log_ac = jnp.log(e["ac_eps"])
        e["pref_c"] = _lane_exclusive_prefix(log_ac)

        def cross_c(ri):
            tfr, tcr, tfc, tcc, p, q = tp(ri)
            return _dot_exact_row(
                log_ac[ri : ri + 1, :], 1.0 - p.astype(jnp.float32)
            )

        e["cross_cl"] = rays(cross_c)

    def p3_fine_fwd(e):
        e["chain_f"], dens_f_raw, e["col_f"] = _forward_chain(
            e["xf_enc"], e["df"], w, dt, keep=True
        )
        e["dens_f_l"] = (
            dens_f_raw.reshape(rays_sl, s_fine) + e["noise_f"]
        )

    def p4_union(e):
        tp, rays = e["tparts"], e["rays"]
        dist_f, dist_c = e["dist_f"], e["dist_c"]
        alpha_c, ac_eps = e["alpha_c"], e["ac_eps"]
        dens_f_l, dens_c_l = e["dens_f_l"], e["dens_c_l"]
        alpha_f = jnp.exp(-jnp.maximum(dens_f_l, 0.0) * dist_f)
        af_eps = alpha_f + 1e-10
        log_af = jnp.log(af_eps)
        pref_f = _lane_exclusive_prefix(log_af)

        def cross_f(ri):
            tfr, tcr, tfc, tcc, p, q = tp(ri)
            return _dot_exact_row(
                log_af[ri : ri + 1, :], 1.0 - q.astype(jnp.float32)
            )

        t_fine_full = jnp.exp(e["cross_cl"] + pref_f)
        w_f = (1.0 - alpha_f) * t_fine_full
        t_coarse_full = jnp.exp(e["pref_c"] + rays(cross_f))
        w_c = (1.0 - alpha_c) * t_coarse_full

        sig_f = jax.nn.sigmoid(e["col_f"])  # [rows_f, C]

        def rgb_f_ray(ri):
            return _dot_exact2(
                w_f[ri : ri + 1, :],
                sig_f[ri * s_fine : (ri + 1) * s_fine, :],
            )

        rgb = rays(rgb_f_ray)  # [rays_sl, C]
        cidx = jax.lax.broadcasted_iota(jnp.int32, (rays_sl, cols), 1)
        sig_cl = []
        for c in range(cols):
            sc_ch = jax.nn.sigmoid(
                e["col_c"][:, c : c + 1].reshape(rays_sl, s_coarse)
            )
            sig_cl.append(sc_ch)
            rgb_cc = jnp.sum(w_c * sc_ch, axis=1, keepdims=True)
            rgb = rgb + jnp.where(cidx == c, rgb_cc, 0.0)
        if white_background:
            acc_w = jnp.sum(w_f, axis=1, keepdims=True) + jnp.sum(
                w_c, axis=1, keepdims=True
            )
            rgb = rgb + (1.0 - acc_w)
        err = rgb - e["pix"]
        e["loss_f"] = jnp.sum(
            jnp.mean(err * err, axis=-1, keepdims=True), keepdims=True
        )

        # Fine-stage backward scalars.
        g_rgb = err * g_scale
        g_rgb_row_f = rays2rows(g_rgb, rays_sl, s_fine)
        w_f_row = _lane2rows(w_f)
        e["g_col_f"] = w_f_row * sig_f * (1.0 - sig_f) * g_rgb_row_f
        g_wf = jnp.sum(
            (sig_f - off) * g_rgb_row_f, axis=-1, keepdims=True
        ).reshape(rays_sl, s_fine)
        g_wc = jnp.zeros((rays_sl, s_coarse), jnp.float32)
        for c in range(cols):
            g_wc = g_wc + (sig_cl[c] - off) * g_rgb[:, c : c + 1]
        g_alpha_c = -t_coarse_full * g_wc
        g_logt_c = (1.0 - alpha_c) * t_coarse_full * g_wc
        g_logt_f = (1.0 - alpha_f) * t_fine_full * g_wf

        def g_laf_ray(ri):
            tfr, tcr, tfc, tcc, p, q = tp(ri)
            return _dot_exact_row(
                g_logt_c[ri : ri + 1, :], p.astype(jnp.float32)
            )

        def g_lac_ray(ri):
            tfr, tcr, tfc, tcc, p, q = tp(ri)
            return _dot_exact_row(
                g_logt_f[ri : ri + 1, :], q.astype(jnp.float32)
            )

        g_laf = rays(g_laf_ray) + _lane_exclusive_suffix(g_logt_f)
        g_alpha_f = -t_fine_full * g_wf + g_laf / af_eps
        g_dens_f_l = g_alpha_f * (-dist_f * alpha_f) * (
            dens_f_l > 0.0
        ).astype(jnp.float32)
        e["g_dens_f"] = _lane2rows(g_dens_f_l)

        # Coarse-side union cotangents, ROW layout, summed with the
        # coarse-loss cotangents from phase 2.
        g_logac = _lane_exclusive_suffix(g_logt_c) + rays(g_lac_ray)
        g_alpha_c = g_alpha_c + g_logac / ac_eps
        g_dens_c_l = g_alpha_c * (-dist_c * alpha_c) * (
            dens_c_l > 0.0
        ).astype(jnp.float32)
        e["g_dens_c_total"] = e["g_dens_c_row"] + _lane2rows(g_dens_c_l)
        sig_c_row = jax.nn.sigmoid(e["col_c"])  # [rows_c, C]
        e["g_col_c_total"] = e["g_col_c_row"] + (
            _lane2rows(w_c)
            * sig_c_row
            * (1.0 - sig_c_row)
            * rays2rows(g_rgb, rays_sl, s_coarse)
        )

    def p5_fine_bwd(e):
        # Two separate sweeps (here and p6), measured better than the
        # alternatives: CONCATENATING the stages' rows into one backward
        # (larger matmuls, one LN-bwd pass) measured MUCH slower (20.1
        # vs 15.7 ms/step at R=16 — the per-layer chain concats are real
        # sublane copies of the whole resident chain, and the doubled
        # liveness OOMs VMEM at R=32).
        _, _, e["grads_f"] = _bwd_slice(
            e["xf_enc"], e["df"], e["g_dens_f"], e["g_col_f"], w, dt,
            chain=e["chain_f"], input_grads=False,
        )

    def p6_coarse_bwd(e):
        if "coarsebwd" in ablate:  # profiling: fine-stage grads only
            e["grads_c"] = None
            return
        _, _, e["grads_c"] = _bwd_slice(
            e["xc"], e["dc"], e["g_dens_c_total"], e["g_col_c_total"],
            w, dt, chain=e["chain_c"], input_grads=False,
        )

    acc = [None]
    lossc_sum = [jnp.zeros((1, 1), jnp.float32)]
    lossf_sum = [jnp.zeros((1, 1), jnp.float32)]

    def p7_accumulate(e):
        # Fold each slice's results as soon as its last phase retires and
        # DROP the env references: deferring all accumulation to the end
        # kept every slice's gradients and leftovers live to the kernel
        # tail and pushed the R=32 tile from 125.9M to 131.5M VMEM —
        # past the 128M physical ceiling.
        lossc_sum[0] = lossc_sum[0] + e["loss_c"]
        lossf_sum[0] = lossf_sum[0] + e["loss_f"]
        both = e["grads_f"]
        if e["grads_c"] is not None:
            both = jax.tree.map(jnp.add, both, e["grads_c"])
        acc[0] = (
            both if acc[0] is None
            else jax.tree.map(jnp.add, acc[0], both)
        )
        e.clear()

    phases = [p1_coarse_fwd, p2_comp_resample_encode, p3_fine_fwd,
              p4_union, p5_fine_bwd, p6_coarse_bwd, p7_accumulate]
    envs = [{"s": sl} for sl in range(splits)]
    if "skew" in ablate:
        # Software-pipelined schedule (slice s+1 one phase behind s):
        # measured ~equal to slice-major at 16-ray tiles (15.76 vs
        # 15.85 ms/step) and VMEM-infeasible at 32-ray tiles (181.7M —
        # two slices of both chains in flight); kept for the record.
        for wave in range(len(phases) + splits - 1):
            for sl in range(splits):
                k = wave - sl
                if 0 <= k < len(phases):
                    phases[k](envs[sl])
    else:
        for e in envs:
            for ph in phases:
                ph(e)
    acc = acc[0]
    lossc_ref[...] += lossc_sum[0]
    lossf_ref[...] += lossf_sum[0]
    for name, ref in flat_refs.items():
        ref[...] += acc[name]
    for i in range(w["b"].shape[0]):
        db_ref[i, :] += acc["b"][i]
        dg_ref[i, :] += acc["g"][i]
        dbeta_ref[i, :] += acc["beta"][i]
    for j in range(w["whh"].shape[0]):
        dwhh_ref[j, :, :] += acc["whh"][j]


def supports_mega(model, render, batch=None) -> bool:
    """The mega kernel covers the north-star family: ClassicNeRF
    architectures (view-conditioned or not) WITHOUT latent states,
    hierarchical ``reuse_coarse_in_fine`` rendering with Sc >= 4."""
    cfg = getattr(model, "cfg", None)
    if cfg is None or not hasattr(cfg, "x_positional_encoding_size"):
        return False
    if not supports_classic_config(cfg):
        return False
    if render.num_fine_samples <= 0 or not render.reuse_coarse_in_fine:
        return False
    if render.num_coarse_samples < 4:
        return False
    if batch is not None and (
        batch.get("states_x") is not None
        or batch.get("states_d") is not None
    ):
        return False
    return True


def _pick_rays_per_tile(n_rays, s_coarse, s_fine, interpret):
    """Rays per tile + slice count: whole rays per slice with
    8-sublane-aligned row-slice boundaries for BOTH stages' row tiles."""
    r = min(n_rays, max(1, TILE_F // max(s_fine, 1)))
    while r > 1 and n_rays % r:
        r -= 1
    splits = _SPLITS
    while splits > 1:
        rays_sl, rem = divmod(r, splits)
        aligned = interpret or (
            (rays_sl * s_fine) % 8 == 0 and (rays_sl * s_coarse) % 8 == 0
        )
        if rem == 0 and aligned:
            break
        splits -= 1
    return r, splits


def mega_train_loss_and_grads(
    model,
    params: Dict[str, Any],
    render,
    batch: Dict[str, Array],
    key: jax.Array,
    interpret: bool | None = None,
    rays_per_tile: int | None = None,
    splits: int | None = None,
    emit_t_fine: bool = False,
    exact_trig: bool = False,
    ablate: frozenset = frozenset(),
) -> Tuple[Array, Dict[str, Any], Dict[str, Array]]:
    """Loss + parameter gradients for ONE hierarchical reuse step through
    the single mega-fused kernel (module docstring).  Drop-in for
    ``fused_hier.reuse_train_loss_and_grads`` on supported configs
    (``supports_mega``); PRNG semantics mirror ``render_rays`` exactly
    (same 4-way key split, same draws), so losses/grads match the
    general trainer to float tolerance.  ``emit_t_fine`` additionally
    returns the in-kernel resampled fine t-values in
    ``aux["t_fine"]`` — the bitwise-mirror resample test's hook."""
    if interpret is None:
        interpret = _interpret_default()
    cfg = model.cfg
    dtype = jnp.dtype(cfg.compute_dtype)
    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    pixels = batch["pixels"]
    n_rays = rays_o.shape[0]
    sc, sf = render.num_coarse_samples, render.num_fine_samples
    cols = pixels.shape[-1]
    std = render.density_noise_std
    stage_w = 0.5
    has_view = cfg.use_viewdirs

    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
    t_coarse = sampling.sample_linear(
        k_strat, (n_rays,), sc, render.near, render.far,
        randomly_sample=render.randomly_sample, dtype=rays_o.dtype,
    )
    points_c = (
        rays_o[:, None, :] + rays_d[:, None, :] * t_coarse[..., None]
    )
    xc_enc = model.encode_position(points_c.reshape(-1, 3)).astype(dtype)
    d_ops = ()
    if has_view:
        d_ops = (model.encode_direction(rays_d).astype(dtype),)

    dists_c = compositing.distances_from_tvals(t_coarse, rays_d)
    if std > 0.0:
        noise_c = std * jax.random.normal(k_noise_c, (n_rays, sc))
        noise_f = std * jax.random.normal(k_noise_f, (n_rays, sf))
    else:
        noise_c = jnp.zeros((n_rays, sc), rays_o.dtype)
        noise_f = jnp.zeros((n_rays, sf), rays_o.dtype)
    u = sampling.pdf_uniforms(
        k_pdf, (n_rays,), sf, randomly_sample=render.randomly_sample,
        dtype=t_coarse.dtype,
    )
    # Coarse row slab [dist, noise, pix] — the proven fused_train layout.
    pix_rows = jnp.broadcast_to(pixels[:, None, :], (n_rays, sc, cols))
    aux_c = jnp.concatenate(
        [dists_c, noise_c[..., None], pix_rows], axis=-1
    ).reshape(n_rays * sc, _AUX_WIDTH_BASE + cols)
    # Per-ray slab [o, d, dnorm, pix].
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    aux_r = jnp.concatenate([rays_o, rays_d, dnorm, pixels], axis=-1)

    enc_np, iscos_np = _enc_placement(
        cfg.x_positional_encoding_size, cfg.normalize_position
    )
    enc = jnp.asarray(enc_np)
    is_cos = jnp.asarray(iscos_np)

    packed = pack_classic_params(params)
    order = _pack_order(has_view)
    weights = [packed[k] for k in order]

    r, auto_splits = _pick_rays_per_tile(n_rays, sc, sf, interpret)
    if rays_per_tile is not None:
        r = rays_per_tile
        auto_splits = _SPLITS if (r % _SPLITS == 0) else 1
    if splits is None:
        splits = auto_splits
    grid = n_rays // r
    tile_c = r * sc

    lane_c = pl.BlockSpec((r, sc), lambda i: (i, 0))
    lane_f = pl.BlockSpec((r, sf), lambda i: (i, 0))
    in_specs = [
        _tile_spec(tile_c, xc_enc.shape[-1]),
    ]
    if has_view:
        in_specs.append(pl.BlockSpec((r, d_ops[0].shape[-1]),
                                     lambda i: (i, 0)))
    in_specs += [
        _tile_spec(tile_c, _AUX_WIDTH_BASE + cols),
        lane_c,
        lane_f,
        lane_f,
        pl.BlockSpec((r, 7 + cols), lambda i: (i, 0)),
        _full_spec(enc.shape),
        _full_spec(is_cos.shape),
        *[_full_spec(wt.shape) for wt in weights],
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((1, 1), jnp.float32),  # coarse loss sum
        jax.ShapeDtypeStruct((1, 1), jnp.float32),  # fine loss sum
    ] + [jax.ShapeDtypeStruct(packed[k].shape, jnp.float32) for k in order]
    out_specs = [_full_spec(s.shape) for s in out_shapes]
    if emit_t_fine:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_rays, sf), jnp.float32)
        )
        out_specs.append(lane_f)

    outs = pl.pallas_call(
        functools.partial(
            _mega_kernel,
            compute_dtype=dtype,
            s_coarse=sc,
            s_fine=sf,
            cols=cols,
            g_scale=stage_w * 2.0 / (cols * n_rays),
            white_background=render.white_background,
            splits=splits,
            has_view=has_view,
            emit_t_fine=emit_t_fine,
            exact_trig=exact_trig,
            ablate=ablate,
        ),
        out_shape=out_shapes,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_MEGA_VMEM_LIMIT,
    )(xc_enc, *d_ops, aux_c, t_coarse, u, noise_f, aux_r, enc, is_cos,
      *weights)

    loss_c = stage_w * outs[0][0, 0] / n_rays
    loss_f = stage_w * outs[1][0, 0] / n_rays
    n_w = len(order)
    grads = unpack_classic_grads(
        dict(zip(order, outs[2 : 2 + n_w])), params
    )
    loss = loss_c + loss_f
    aux = {
        "loss": loss,
        "rgb_loss": loss,
        "fine_mse": loss_f / stage_w,
    }
    if emit_t_fine:
        aux["t_fine"] = outs[2 + n_w]
    return loss, grads, aux

