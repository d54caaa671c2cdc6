"""Fused Pallas TPU kernel for the classic NeRF point MLP (fwd + custom VJP).

Why this kernel exists: the XLA path materializes every layer's
``[points, 256]`` activation in HBM (268 MB per intermediate at the
reference workload of 4096 rays x 64 samples), making the train step
HBM-bound at ~10 % MXU utilization.  This kernel keeps ALL weights
(~2.6 MB) and the entire 10-layer activation chain resident in VMEM per
point-block, so HBM traffic collapses to the kernel's inputs/outputs
(encodings in, 4 floats per point out).  The backward pass recomputes the
forward activations in VMEM (flash-attention-style rematerialization) and
accumulates weight gradients across the sequential grid — no activation
ever round-trips through HBM.

Architecture covered (the v1.2 reference model, SURVEY.md §2.3):

    L0      : x_enc[XE] -> H        (block_0.0)
    L1..L3  : H -> H                (block_0.{3,6,9})
    L4      : [H ++ x_enc] -> H     (block_1.0, skip concat — implemented
                                     as two matmuls, no concat needed)
    L5..L7  : H -> H                (block_1.{3,6,9})
    density : H -> 1                (off L7's output)
    L8      : [H ++ d_enc] -> H     (block_2.0, view conditioning)
    L9      : H -> H                (block_2.3)
    color   : H -> 3

Every layer is Linear -> ReLU -> LayerNorm (checkpoint ordering), LN eps
1e-5 matching ``nerf_tpu.models.mlp``.  Numerics are float32 end-to-end by
default (parity with the XLA path is tested to ~1e-5); matmuls can run in
bf16 with f32 accumulation via ``compute_dtype``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LN_EPS = 1e-5
NUM_LAYERS = 10
NUM_HH = 9  # H->H weight slabs: L1..L9

# Swept on a real v5e chip at 262k points (fwd+bwd):
#   TILE_BWD=256 single chain: 8.3 ms;  1024 with 2 independent 512-row
#   slices (_BWD_SPLITS below): 7.1 ms — the slices' dataflow is
#   independent, so MXU matmuls of one slice overlap the other's
#   LayerNorm-backward VPU work, and the big tile amortizes the per-grid-
#   step weight-gradient accumulation 4x.  4 slices / 128-row slices are
#   both slower (matmuls too small).
TILE_FWD = 1024
TILE_BWD = 1024

# The backward working set exceeds XLA's default 16 MiB scoped-VMEM budget
# at TILE_BWD=512; physical VMEM on v5e/v5p is far larger, so raise the
# per-kernel cap instead of shrinking the tile.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Parameter packing: pytree (models/mlp.py layout) <-> kernel slabs
# ---------------------------------------------------------------------------


def pack_classic_params(params: Dict[str, Any]) -> Dict[str, Array]:
    """Pack the ClassicNeRF pytree into kernel-friendly slabs.

    The skip/view concat layers are split into two matmuls: rows ``:H`` of
    ``block_1[0]``/``block_2[0]`` weights act on the hidden state, the tail
    rows act on the x/d encodings (concat order ``[h, enc]`` per
    ``models/mlp.py::apply_classic_mlp``).

    Differentiable (pure stack/slice), so standard autodiff flows through
    the packing around the custom-VJP core.
    """
    b0, b1 = params["block_0"], params["block_1"]
    b2 = params.get("block_2")  # absent <=> use_viewdirs=False
    h = b0[0]["linear"]["w"].shape[1]

    whh = jnp.stack(
        [b0[i]["linear"]["w"] for i in (1, 2, 3)]
        + [b1[0]["linear"]["w"][:h]]
        + [b1[i]["linear"]["w"] for i in (1, 2, 3)]
        + (
            [b2[0]["linear"]["w"][:h], b2[1]["linear"]["w"]]
            if b2 is not None
            else []
        )
    )  # [9, H, H] with the view branch, [7, H, H] without

    layers = b0 + b1 + (b2 or [])  # layers in execution order
    packed = {
        "w0": b0[0]["linear"]["w"],          # [XE, H]
        "wx": b1[0]["linear"]["w"][h:],      # [XE, H] skip tail
        "whh": whh,
        "b": jnp.stack([l["linear"]["b"] for l in layers]),    # [L, H]
        "g": jnp.stack([l["ln"]["scale"] for l in layers]),    # [L, H]
        "beta": jnp.stack([l["ln"]["bias"] for l in layers]),  # [L, H]
        "w_dens": params["density"]["w"],    # [H, 1]
        "b_dens": params["density"]["b"].reshape(1, 1),
        "w_col": params["color"]["w"],       # [H, C]
        "b_col": params["color"]["b"].reshape(1, -1),
    }
    if b2 is not None:
        packed["wd_in"] = b2[0]["linear"]["w"][h:]  # [DE, H] view tail
    return packed


def supports_classic_config(cfg) -> bool:
    """The kernel covers the reference architecture family — with or
    without the view branch, and at any encoding width (latent-conditioned
    models just widen XE/DE; the slab shapes carry the widths)."""
    return cfg.trunk_blocks == (4, 4) and (
        not cfg.use_viewdirs or cfg.view_branch_depth == 2
    )


def _pack_order(viewdirs: bool) -> Tuple[str, ...]:
    if viewdirs:
        return _PACK_ORDER
    return tuple(k for k in _PACK_ORDER if k != "wd_in")


_PACK_ORDER = (
    "w0", "wx", "wd_in", "whh", "b", "g", "beta",
    "w_dens", "b_dens", "w_col", "b_col",
)


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


# LayerNorm row-statistics strategy.  The kernels are VPU-bound (the
# matmuls use <50% of the MXU while every LN does cross-lane reductions).
# Swept on a real v5e chip at 262k points:
#   "twopass": jnp.mean twice                 (fwd 4.75 ms, fwd+bwd 10.1 ms)
#   "onepass": var = E[a^2] - mu^2            (fwd 2.91 ms, fwd+bwd  8.1 ms)
#   "mxu":     row sums via dot(a, ones)      (fwd 4.46 ms, fwd+bwd 11.3 ms)
# onepass removes one cross-lane reduction pass per LayerNorm and wins by
# ~40% on forward; activations are post-ReLU O(1) so the E[a^2] - mu^2
# cancellation is benign in f32 (parity-tested at rtol 1e-4).
_LN_STATS = "onepass"


def _row_mean2(a, dtype):
    """(mean, mean of squares) along the last axis, per _LN_STATS."""
    n = a.shape[-1]
    if _LN_STATS == "mxu":
        ones = jnp.full((n, 1), 1.0 / n, dtype=jnp.float32)
        mu = _dot(a, ones, dtype)
        m2 = _dot(a * a, ones, dtype)
        return mu, m2
    mu = jnp.mean(a, axis=-1, keepdims=True)
    m2 = jnp.mean(a * a, axis=-1, keepdims=True)
    return mu, m2


def _ln_stats(a, dtype):
    """Returns (mu, var) along the last axis."""
    if _LN_STATS == "twopass":
        mu = jnp.mean(a, axis=-1, keepdims=True)
        var = jnp.mean((a - mu) ** 2, axis=-1, keepdims=True)
        return mu, var
    mu, m2 = _row_mean2(a, dtype)
    return mu, jnp.maximum(m2 - mu * mu, 0.0)


def _layer_fwd(pre, b_row, g_row, beta_row, dtype=jnp.float32):
    """Linear-output ``pre`` -> ReLU -> LayerNorm.

    Returns (xhat, inv, thr, out) where ``thr = -mu * inv`` — the backward
    needs only these: the ReLU mask ``a > 0`` is exactly ``xhat > thr``
    (both sides are ``(a - mu) * inv`` vs ``(0 - mu) * inv`` with inv > 0),
    so the raw activation ``a`` never has to be retained or re-normalized.
    """
    a = jnp.maximum(pre + b_row[None, :], 0.0)
    mu, var = _ln_stats(a, dtype)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (a - mu) * inv
    return xhat, inv, -mu * inv, xhat * g_row[None, :] + beta_row[None, :]


def _dot(a, b, dtype):
    if dtype != jnp.float32:
        a = a.astype(dtype)
        b = b.astype(dtype)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b, dtype):
    """a @ b^T without materializing the transpose."""
    if dtype != jnp.float32:
        a = a.astype(dtype)
        b = b.astype(dtype)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_tn(a, b, dtype):
    """a^T @ b (contract leading axes) — weight-gradient shape."""
    if dtype != jnp.float32:
        a = a.astype(dtype)
        b = b.astype(dtype)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _forward_chain(x, d, w, dtype, keep=False):
    """Shared fwd math: returns (chain, density, color).

    With ``keep=True`` each layer's ``(xhat, inv, thr)`` is retained for the
    backward sweep — one [T, H] tensor + two [T, 1] scalars per layer, so
    the resident chain is half of what keeping (a, h) pairs would cost, and
    the backward never recomputes LayerNorm statistics (the sweep's h is
    reconstructed as ``xhat * g + beta`` and its ReLU mask as
    ``xhat > thr``).

    The view branch (L8/L9 + ``d``) runs iff ``wd_in`` is packed; without
    it the color head reads the trunk output directly
    (``use_viewdirs=False`` — ``models/mlp.py::apply_classic_mlp``).
    """
    chain = []

    def layer(i, pre):
        xhat, inv, thr, out = _layer_fwd(
            pre, w["b"][i], w["g"][i], w["beta"][i], dtype
        )
        if keep:
            chain.append((xhat, inv, thr))
        return out

    h = layer(0, _dot(x, w["w0"], dtype))
    for i in (1, 2, 3):
        h = layer(i, _dot(h, w["whh"][i - 1], dtype))
    h = layer(4, _dot(h, w["whh"][3], dtype) + _dot(x, w["wx"], dtype))
    for i in (5, 6, 7):
        h = layer(i, _dot(h, w["whh"][i - 1], dtype))
    density = _dot(h, w["w_dens"], dtype) + w["b_dens"][0]
    if "wd_in" in w:
        h = layer(8, _dot(h, w["whh"][7], dtype) + _dot(d, w["wd_in"], dtype))
        h = layer(9, _dot(h, w["whh"][8], dtype))
    color = _dot(h, w["w_col"], dtype) + w["b_col"][0]
    return chain, density, color


# --- in-kernel frequency encoding -----------------------------------------
#
# The classic encoder is sin/cos of per-scalar frequency products
# (ops/encoding.py::frequency_encoding).  Writing the 60+36-wide encodings
# to HBM just to read them back into the kernel costs ~2 ms/step in sine
# fusions, layout copies and pads at the reference workload, and makes the
# custom-VJP residuals 16x larger than the raw points.  Instead the kernel
# takes raw [T, 3] points/dirs and computes
#
#     enc = sin(x @ S + phase)
#
# where S is a static [3, D*2L] placement matrix (S[c, c*2L + j] = f_j for
# both the sin block and, with phase pi/2, the cos block — cos(z) =
# sin(z + pi/2)).  One tiny MXU matmul + one VPU sine; the backward is
# d(enc)/dx = (g * cos(x @ S + phase)) @ S^T.


def _enc_consts(size: int, bound: float, dims: int = 3):
    """Static (S, phase) numpy constants matching frequency_encoding."""
    import numpy as np

    L = size // 2
    start = -np.log2(bound)
    f = np.power(2.0, np.linspace(start, start + L - 1.0, L)) * (np.pi / 2.0)
    S = np.zeros((dims, dims * size), np.float32)
    ph = np.zeros((1, dims * size), np.float32)
    for c in range(dims):
        S[c, c * size : c * size + L] = f
        S[c, c * size + L : c * size + 2 * L] = f
        ph[0, c * size + L : c * size + 2 * L] = np.pi / 2.0
    return S, ph


def _encode_in_kernel(x3, d3, enc_refs):
    """Returns (x_enc, d_enc, xf, df) — xf/df are the sine arguments,
    kept for the backward's cosine.  ``enc_refs = (sx, phx, sd, phd)``."""
    sx, phx, sd, phd = (r[:] for r in enc_refs)
    xf = jnp.dot(x3, sx, preferred_element_type=jnp.float32) + phx
    df = jnp.dot(d3, sd, preferred_element_type=jnp.float32) + phd
    return jnp.sin(xf), jnp.sin(df), xf, df


_NUM_ENC_REFS = 4  # sx, phx, sd, phd


# Independent row-slices per forward tile (same MXU/VPU-overlap rationale
# as _BWD_SPLITS below).  Swept on v5e: (1024, 2) is the joint optimum —
# kernel-only (2048, 4) is 7% faster at 262k points, but 2048-row tiles
# cost 20% on full-image eval (lax.map tiles of ~2k rays leave too few
# grid steps to pipeline), and (1024, 2) gives eval 641 ms vs 662 ms
# single-chain at 400x400 64+128.
_FWD_SPLITS = 2


def _fwd_kernel(*refs, compute_dtype, fuse_encoding=False, has_view=True):
    x_ref = refs[0]
    d_ref = refs[1] if has_view else None
    k = 2 if has_view else 1
    enc_refs = None
    if fuse_encoding:
        enc_refs = refs[k : k + _NUM_ENC_REFS]
        k += _NUM_ENC_REFS
    order = _pack_order(has_view)
    w = dict(zip(order, refs[k : k + len(order)]))
    out_ref = refs[k + len(order)]
    w = {k2: v[:] for k2, v in w.items()}
    rows = x_ref.shape[0] // _FWD_SPLITS
    for s in range(_FWD_SPLITS):
        sl = slice(s * rows, (s + 1) * rows)
        x = x_ref[sl, :]
        d = d_ref[sl, :] if has_view else None
        if fuse_encoding:
            x, d, _, _ = _encode_in_kernel(x, d, enc_refs)
        _, density, color = _forward_chain(x, d, w, compute_dtype)
        out_ref[sl, 0:1] = density
        out_ref[sl, 1:] = color


def _ln_relu_bwd(g_out, saved, g_row, beta_row, dtype=jnp.float32):
    """Backward through LayerNorm(ReLU-output a) given dL/d(layer out).

    ``saved = (xhat, inv, thr)`` comes from the rematerialized forward — no
    LayerNorm statistics are recomputed here.  Returns (dpre, dg_partial,
    dbeta_partial, h) where dpre is dL/d(linear pre-activation + bias
    input), i.e. after the ReLU mask (``xhat > thr`` — see ``_layer_fwd``),
    and h is the reconstructed layer output ``xhat * g + beta``.
    """
    xhat, inv, thr = saved
    h = xhat * g_row[None, :] + beta_row[None, :]
    dg = jnp.sum(g_out * xhat, axis=0)
    dbeta = jnp.sum(g_out, axis=0)
    dxhat = g_out * g_row[None, :]
    m_dxhat, m_cross = _bwd_means(dxhat, xhat, dtype)
    da = inv * (dxhat - m_dxhat - xhat * m_cross)
    dpre = da * (xhat > thr)
    return dpre, dg, dbeta, h


def _bwd_means(dxhat, xhat, dtype):
    """mean(dxhat) and mean(dxhat*xhat) along the last axis."""
    if _LN_STATS == "mxu":
        n = dxhat.shape[-1]
        ones = jnp.full((n, 1), 1.0 / n, dtype=jnp.float32)
        return _dot(dxhat, ones, dtype), _dot(dxhat * xhat, ones, dtype)
    return (
        jnp.mean(dxhat, axis=-1, keepdims=True),
        jnp.mean(dxhat * xhat, axis=-1, keepdims=True),
    )


# Row-slices per backward tile.  The backward alternates a matmul (MXU)
# with a LayerNorm backward (VPU) along a single dependency chain; with two
# independent half-tiles in flight, the VLIW scheduler can overlap one
# half's MXU work with the other's VPU work.  Swept on hardware (see the
# TILE_BWD note above): 2 x 512-row slices is the sweet spot.
_BWD_SPLITS = 2


def _bwd_slice(x, d, g_dens, g_col, w, dt, chain=None,
               input_grads=True):
    """Full backward math for one row-slice.

    Returns (dx, dd, grads) where grads maps _PACK_ORDER names (minus the
    two input grads) to VALUE contributions — the caller accumulates them
    into the output refs, so independent slices form independent dataflow.

    ``chain``: a precomputed forward chain (fused train kernel, where the
    forward ran in the same kernel invocation and its activations are still
    VMEM-resident); ``None`` rematerializes it (the two-kernel custom-VJP
    path, where the forward ran in a separate kernel).
    """
    if chain is None:
        # Rematerialize the forward, keeping only (xhat, inv, thr) per
        # layer — the backward sweep reuses the forward's LN statistics.
        chain, _, _ = _forward_chain(x, d, w, dt, keep=True)

    viewdirs = "wd_in" in w
    n_layers = NUM_LAYERS if viewdirs else NUM_LAYERS - 2
    n_hh = NUM_HH if viewdirs else NUM_HH - 2
    grads = {}
    db = [None] * n_layers
    dg = [None] * n_layers
    dbeta = [None] * n_layers
    dwhh = [None] * n_hh

    def layer_bwd(i, g_h):
        dpre, dg_i, dbeta_i, h_i = _ln_relu_bwd(
            g_h, chain[i], w["g"][i], w["beta"][i], dt
        )
        dg[i] = dg_i
        dbeta[i] = dbeta_i
        db[i] = jnp.sum(dpre, axis=0)
        return dpre, h_i

    # ``dwhh[j] = h_j^T dpre_{j+1}`` is emitted one layer late, when layer
    # j's backward reconstructs h_j (``dpre_next`` carries dpre_{j+1}).
    dd = None
    if viewdirs:
        # L9 + color head
        dpre_next, h9 = layer_bwd(9, _dot_t(g_col, w["w_col"], dt))
        grads["w_col"] = _dot_tn(h9, g_col, dt)
        grads["b_col"] = jnp.sum(g_col, axis=0, keepdims=True)
        # L8 (view conditioning)
        dpre, h8 = layer_bwd(8, _dot_t(dpre_next, w["whh"][8], dt))
        dwhh[8] = _dot_tn(h8, dpre_next, dt)
        grads["wd_in"] = _dot_tn(d, dpre, dt)
        dd = _dot_t(dpre, w["wd_in"], dt) if input_grads else None
        dpre_next = dpre
        # L7 (density head joins at h7)
        g_h = (
            _dot_t(dpre_next, w["whh"][7], dt)
            + _dot_t(g_dens, w["w_dens"], dt)
        )
        dpre, h7 = layer_bwd(7, g_h)
        dwhh[7] = _dot_tn(h7, dpre_next, dt)
    else:
        # No view branch: BOTH heads join at the trunk output h7.
        g_h = _dot_t(g_col, w["w_col"], dt) + _dot_t(g_dens, w["w_dens"], dt)
        dpre, h7 = layer_bwd(7, g_h)
        grads["w_col"] = _dot_tn(h7, g_col, dt)
        grads["b_col"] = jnp.sum(g_col, axis=0, keepdims=True)
    grads["w_dens"] = _dot_tn(h7, g_dens, dt)
    grads["b_dens"] = jnp.sum(g_dens, axis=0, keepdims=True)
    dpre_next = dpre
    # L6..L5
    for j in (6, 5):
        dpre, h_j = layer_bwd(j, _dot_t(dpre_next, w["whh"][j], dt))
        dwhh[j] = _dot_tn(h_j, dpre_next, dt)
        dpre_next = dpre
    # L4 (skip)
    dpre, h4 = layer_bwd(4, _dot_t(dpre_next, w["whh"][4], dt))
    dwhh[4] = _dot_tn(h4, dpre_next, dt)
    grads["wx"] = _dot_tn(x, dpre, dt)
    dx = _dot_t(dpre, w["wx"], dt) if input_grads else None
    dpre_next = dpre
    # L3..L1
    for j in (3, 2, 1):
        dpre, h_j = layer_bwd(j, _dot_t(dpre_next, w["whh"][j], dt))
        dwhh[j] = _dot_tn(h_j, dpre_next, dt)
        dpre_next = dpre
    # L0
    dpre, h0 = layer_bwd(0, _dot_t(dpre_next, w["whh"][0], dt))
    dwhh[0] = _dot_tn(h0, dpre_next, dt)
    grads["w0"] = _dot_tn(x, dpre, dt)
    if input_grads:
        dx = dx + _dot_t(dpre, w["w0"], dt)
    grads["whh"] = dwhh
    grads["b"] = db
    grads["g"] = dg
    grads["beta"] = dbeta
    return dx, dd, grads


def _bwd_kernel(*refs, compute_dtype, fuse_encoding=False, has_view=True):
    x_ref = refs[0]
    d_ref = refs[1] if has_view else None
    gout_ref = refs[2 if has_view else 1]
    k = 3 if has_view else 2
    enc_refs = None
    if fuse_encoding:
        enc_refs = refs[k : k + _NUM_ENC_REFS]
        k += _NUM_ENC_REFS
    order = _pack_order(has_view)
    w = dict(zip(order, refs[k : k + len(order)]))
    outs = list(refs[k + len(order) :])
    dx_ref = outs.pop(0)
    dd_ref = outs.pop(0) if has_view else None
    (dw0_ref, dwx_ref) = outs[0:2]
    dwdin_ref = outs[2] if has_view else None
    (dwhh_ref, db_ref, dg_ref, dbeta_ref, dwdens_ref, dbdens_ref,
     dwcol_ref, dbcol_ref) = outs[3 if has_view else 2 :]
    flat_refs = {
        "w0": dw0_ref, "wx": dwx_ref,
        "w_dens": dwdens_ref, "b_dens": dbdens_ref,
        "w_col": dwcol_ref, "b_col": dbcol_ref,
    }
    if has_view:
        flat_refs["wd_in"] = dwdin_ref

    w = {k2: v[:] for k2, v in w.items()}
    dt = compute_dtype

    # Zero the weight-grad accumulators on the first grid step (they use a
    # constant index_map, so the same VMEM block persists across steps).
    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (*flat_refs.values(), dwhh_ref, db_ref, dg_ref,
                    dbeta_ref):
            ref[...] = jnp.zeros_like(ref)

    tile = x_ref.shape[0]
    rows = tile // _BWD_SPLITS
    acc = None  # summed across slices, written to refs ONCE — keeps the
    # slices' dataflow independent so the scheduler can interleave them.
    for s in range(_BWD_SPLITS):
        sl = slice(s * rows, (s + 1) * rows)
        x = x_ref[sl, :]
        d = d_ref[sl, :] if has_view else None
        xf = df = None
        if fuse_encoding:
            x, d, xf, df = _encode_in_kernel(x, d, enc_refs)
        dx, dd, grads = _bwd_slice(
            x, d, gout_ref[sl, 0:1], gout_ref[sl, 1:], w, dt
        )
        if acc is None:
            acc = grads
        else:
            acc = jax.tree.map(jnp.add, acc, grads)
        if not fuse_encoding:
            dx_ref[sl, :] = dx
            if has_view:
                dd_ref[sl, :] = dd
        else:
            # Chain rule through the in-kernel encoding to raw points/dirs.
            sx, _, sd, _ = (r[:] for r in enc_refs)
            dx_ref[sl, :] = jax.lax.dot_general(
                dx * jnp.cos(xf), sx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dd_ref[sl, :] = jax.lax.dot_general(
                dd * jnp.cos(df), sd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    for name, ref in flat_refs.items():
        ref[...] += acc[name]
    for i in range(w["b"].shape[0]):
        db_ref[i, :] += acc["b"][i]
        dg_ref[i, :] += acc["g"][i]
        dbeta_ref[i, :] += acc["beta"][i]
    for j in range(w["whh"].shape[0]):
        dwhh_ref[j, :, :] += acc["whh"][j]


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------


def _pad_points(arr: Array, tile: int) -> Tuple[Array, int]:
    p = arr.shape[0]
    pad = (-p) % tile
    if pad:
        arr = jnp.pad(arr, ((0, pad), (0, 0)))
    return arr, p


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _tile_spec(tile, width):
    return pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_core(packed, x_enc, d_enc, compute_dtype, interpret, enc_cfg=None):
    return _fused_fwd_call(
        packed, x_enc, d_enc, compute_dtype, interpret, enc_cfg
    )


def _enc_operands(enc_cfg):
    """(sx, phx, sd, phd) as jnp operands for the kernels, or ()."""
    if enc_cfg is None:
        return ()
    x_size, x_bound, d_size, d_bound = enc_cfg
    sx, phx = _enc_consts(x_size, x_bound)
    sd, phd = _enc_consts(d_size, d_bound)
    return tuple(jnp.asarray(a) for a in (sx, phx, sd, phd))


def _fused_fwd_call(packed, x_enc, d_enc, compute_dtype, interpret, enc_cfg):
    has_view = d_enc is not None
    p = x_enc.shape[0]
    xe = x_enc.shape[1]
    cols = 1 + packed["w_col"].shape[1]
    x_pad, _ = _pad_points(x_enc, TILE_FWD)
    d_ops, d_specs = (), ()
    if has_view:
        d_pad, _ = _pad_points(d_enc, TILE_FWD)
        d_ops = (d_pad,)
        d_specs = (_tile_spec(TILE_FWD, d_enc.shape[1]),)
    grid = x_pad.shape[0] // TILE_FWD

    enc_ops = _enc_operands(enc_cfg)
    weights = [packed[k] for k in _pack_order(has_view)]
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            compute_dtype=compute_dtype,
            fuse_encoding=enc_cfg is not None,
            has_view=has_view,
        ),
        out_shape=jax.ShapeDtypeStruct((x_pad.shape[0], cols), jnp.float32),
        grid=(grid,),
        in_specs=[
            _tile_spec(TILE_FWD, xe),
            *d_specs,
            *[_full_spec(e.shape) for e in enc_ops],
            *[_full_spec(w.shape) for w in weights],
        ],
        out_specs=_tile_spec(TILE_FWD, cols),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(x_pad, *d_ops, *enc_ops, *weights)
    return out[:p]


def _fused_fwd_rule(packed, x_enc, d_enc, compute_dtype, interpret, enc_cfg):
    out = _fused_fwd_call(
        packed, x_enc, d_enc, compute_dtype, interpret, enc_cfg
    )
    return out, (packed, x_enc, d_enc)


def _fused_bwd_rule(compute_dtype, interpret, enc_cfg, residuals, g_out):
    packed, x_enc, d_enc = residuals
    has_view = d_enc is not None
    order = _pack_order(has_view)
    p = x_enc.shape[0]
    xe = x_enc.shape[1]
    x_pad, _ = _pad_points(x_enc, TILE_BWD)
    d_ops, d_in_specs = (), ()
    if has_view:
        d_pad, _ = _pad_points(d_enc, TILE_BWD)
        d_ops = (d_pad,)
        d_in_specs = (_tile_spec(TILE_BWD, d_enc.shape[1]),)
    g_pad, _ = _pad_points(g_out, TILE_BWD)  # zero pad => zero grads
    grid = x_pad.shape[0] // TILE_BWD

    weights = [packed[k] for k in order]
    wshapes = {k: packed[k].shape for k in order}

    out_shapes = [
        jax.ShapeDtypeStruct((x_pad.shape[0], xe), jnp.float32),  # dx
    ]
    if has_view:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (x_pad.shape[0], d_enc.shape[1]), jnp.float32
            )  # dd
        )
    n_lead = len(out_shapes)
    out_shapes += [
        jax.ShapeDtypeStruct(wshapes[k], jnp.float32) for k in order
    ]
    out_specs = [
        _tile_spec(TILE_BWD, s.shape[1]) for s in out_shapes[:n_lead]
    ] + [_full_spec(s.shape) for s in out_shapes[n_lead:]]

    enc_ops = _enc_operands(enc_cfg)
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            compute_dtype=compute_dtype,
            fuse_encoding=enc_cfg is not None,
            has_view=has_view,
        ),
        out_shape=out_shapes,
        grid=(grid,),
        in_specs=[
            _tile_spec(TILE_BWD, xe),
            *d_in_specs,
            _tile_spec(TILE_BWD, g_out.shape[1]),
            *[_full_spec(e.shape) for e in enc_ops],
            *[_full_spec(w.shape) for w in weights],
        ],
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(x_pad, *d_ops, g_pad, *enc_ops, *weights)

    dx = outs[0]
    dd = outs[1] if has_view else None
    d_packed = dict(zip(order, outs[n_lead:]))
    # Cotangent dtypes must match the primal inputs (which may be bf16 when
    # compute_dtype is bf16); the in-kernel accumulation stays f32.
    return (
        d_packed,
        dx[:p].astype(x_enc.dtype),
        dd[:p].astype(d_enc.dtype) if has_view else None,
    )


_fused_core.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def classic_mlp_pallas(
    params: Dict[str, Any],
    x_enc: Array,
    d_enc: Optional[Array] = None,
    compute_dtype=jnp.float32,
    interpret: bool | None = None,
) -> Tuple[Array, Array]:
    """Fused evaluation of the classic NeRF MLP on encoded points.

    Args:
        params: ClassicNeRF pytree (``models/mlp.py`` layout).
        x_enc: ``[..., XE]`` encoded positions (latent-conditioned models
            pass their widened encodings — the kernel reads XE/DE from the
            arrays).
        d_enc: ``[..., DE]`` encoded view directions, or ``None`` for the
            ``use_viewdirs=False`` architecture (no view branch; the color
            head reads the trunk output).
        compute_dtype: matmul input dtype (f32 default; bf16 for speed).
        interpret: force Pallas interpreter (defaults to auto: interpreter
            off-TPU so tests run on CPU).

    Returns:
        ``(density [..., 1], color_logits [..., C])``.
    """
    if interpret is None:
        interpret = _interpret_default()
    lead = x_enc.shape[:-1]
    # Cast the encodings BEFORE the kernel boundary: on TPU the MXU's
    # DEFAULT precision truncates f32 matmul inputs to bf16 anyway, so a
    # bf16 compute dtype makes the kernel outputs bit-identical while
    # halving the encoding HBM traffic and the XLA layout copies feeding
    # the kernel (measured: 365k -> 381k train rays/s, 229k -> 255k eval
    # rays/s on v5e).
    x2 = x_enc.reshape(-1, x_enc.shape[-1]).astype(compute_dtype)
    d2 = (
        None
        if d_enc is None
        else d_enc.reshape(-1, d_enc.shape[-1]).astype(compute_dtype)
    )
    packed = pack_classic_params(params)
    out = _fused_core(packed, x2, d2, compute_dtype, interpret)
    cols = out.shape[-1]
    out = out.reshape(*lead, cols)
    return out[..., 0:1], out[..., 1:]


def classic_pointmlp_pallas(
    params: Dict[str, Any],
    points: Array,
    dirs: Array,
    x_encoding_size: int,
    x_bound: float,
    d_encoding_size: int,
    d_bound: float,
    compute_dtype=jnp.float32,
    interpret: bool | None = None,
) -> Tuple[Array, Array]:
    """Fully fused encoder + classic MLP on RAW points/directions.

    Computes the classic frequency encoding IN-KERNEL (see the note above
    ``_enc_consts``) so HBM traffic is the raw [P, 3] coordinates instead
    of the [P, 96] encodings.  MEASURED SLOWER than the pre-encoded path
    on a v5e chip (15.4 vs 12.6 ms/step at the reference train workload):
    Mosaic's in-kernel sine costs far more than XLA's fused sine, and the
    backward rematerializes it.  Kept as a tested option — the tradeoff
    flips if HBM bandwidth, not the VPU, is the binding constraint (e.g.
    much wider encodings) — but the model defaults to encode-then-
    ``classic_mlp_pallas``.

    Args:
        params: ClassicNeRF pytree.
        points: ``[..., 3]`` world-space sample positions.
        dirs: ``[..., 3]`` view directions (broadcast to points' shape).
        x_encoding_size / x_bound: ``cfg.x_positional_encoding_size`` and
            ``cfg.normalize_position`` (frequency table, static).
        d_encoding_size / d_bound: same for the view-direction encoder.

    Returns:
        ``(density [..., 1], color_logits [..., C])``.
    """
    if "block_2" not in params:
        raise ValueError(
            "classic_pointmlp_pallas covers the view-conditioned "
            "architecture only; use classic_mlp_pallas(x_enc, None) for "
            "use_viewdirs=False"
        )
    if interpret is None:
        interpret = _interpret_default()
    lead = points.shape[:-1]
    p2 = points.reshape(-1, points.shape[-1])
    d2 = dirs.reshape(-1, dirs.shape[-1])
    packed = pack_classic_params(params)
    enc_cfg = (
        int(x_encoding_size), float(x_bound),
        int(d_encoding_size), float(d_bound),
    )
    out = _fused_core(packed, p2, d2, compute_dtype, interpret, enc_cfg)
    cols = out.shape[-1]
    out = out.reshape(*lead, cols)
    return out[..., 0:1], out[..., 1:]
