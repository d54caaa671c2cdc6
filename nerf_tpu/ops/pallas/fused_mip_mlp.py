"""Fused Pallas TPU kernel for the HEAD-generation (mip) point MLP.

Same design as ``fused_mlp.py`` (see its module docstring for the
HBM-traffic rationale), specialized to the HEAD architecture (reference
``model.py:525-542``): 5 x (Linear -> LayerNorm -> ReLU) then one output
Linear to ``1 + color + segmentation`` logits.  Note the LN/ReLU ordering
is the REVERSE of the v1.2 model (LN before ReLU here).

Forward keeps weights + activations VMEM-resident; the custom VJP
rematerializes the forward per block and accumulates weight gradients
across the sequential grid.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from nerf_tpu.ops.pallas.fused_mlp import (
    LN_EPS,
    _VMEM_LIMIT,
    _bwd_means,
    _ln_stats,
    _dot,
    _dot_t,
    _dot_tn,
    _full_spec,
    _interpret_default,
    _pad_points,
    _tile_spec,
)

Array = jax.Array

TILE_FWD = 1024
# The slice-interleaving trick that wins 15% on the classic kernel
# (fused_mlp._BWD_SPLITS) measures as a wash here — this chain is shallower
# (6 Linears) and its wide output head already keeps the MXU busier — so
# the defaults stay single-slice / smaller tile (lower VMEM).  A/B on v5e:
# (512, 1) 7.96 ms vs (1024, 2) 7.98 ms at the 4096x64 train workload.
TILE_BWD = 512
_BWD_SPLITS = 1

_PACK_ORDER = ("w_in", "whh", "b", "g", "beta", "w_out", "b_out")


def pack_mip_params(params: Dict[str, Any]) -> Dict[str, Array]:
    """Pack the MipNeRF pytree (models/mlp.py layout) into kernel slabs."""
    layers = params["layers"]
    return {
        "w_in": layers[0]["linear"]["w"],                          # [F, H]
        "whh": jnp.stack([l["linear"]["w"] for l in layers[1:]]),  # [L-1,H,H]
        "b": jnp.stack([l["linear"]["b"] for l in layers]),        # [L, H]
        "g": jnp.stack([l["ln"]["scale"] for l in layers]),        # [L, H]
        "beta": jnp.stack([l["ln"]["bias"] for l in layers]),      # [L, H]
        "w_out": params["out"]["w"],                               # [H, O]
        "b_out": params["out"]["b"].reshape(1, -1),                # [1, O]
    }


def supports_mip_config(cfg) -> bool:
    return cfg.num_hidden_layers >= 2


def _ln(z, g_row, beta_row, dtype=jnp.float32):
    """LayerNorm.  Returns (xhat, inv, out)."""
    mu, var = _ln_stats(z, dtype)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (z - mu) * inv
    return xhat, inv, xhat * g_row[None, :] + beta_row[None, :]


def _forward_chain(feat, w, num_layers, dtype, keep=False):
    """Returns (chain, out).

    With ``keep=True`` each layer retains ``(xhat, inv)`` for the backward
    sweep — the LayerNorm output (for the ReLU mask) and the post-ReLU
    activation are both reconstructable from xhat, so no statistics are
    recomputed in the backward and the resident chain is one [T, H] tensor
    per layer.
    """
    chain = []
    h = feat
    for i in range(num_layers):
        wmat = w["w_in"] if i == 0 else w["whh"][i - 1]
        z = _dot(h, wmat, dtype) + w["b"][i][None, :]
        xhat, inv, ln_out = _ln(z, w["g"][i], w["beta"][i], dtype)
        h = jnp.maximum(ln_out, 0.0)
        if keep:
            chain.append((xhat, inv))
    out = _dot(h, w["w_out"], dtype) + w["b_out"][0]
    return chain, out


def _fwd_kernel(*refs, num_layers, compute_dtype):
    feat_ref = refs[0]
    w = {k: r[:] for k, r in zip(_PACK_ORDER, refs[1 : 1 + len(_PACK_ORDER)])}
    out_ref = refs[1 + len(_PACK_ORDER)]
    _, out = _forward_chain(feat_ref[:], w, num_layers, compute_dtype)
    out_ref[...] = out


def _ln_relu_bwd(g_h, saved, g_row, beta_row, dtype=jnp.float32):
    """Backward through ReLU(LN(z)) given ``saved = (xhat, inv)`` from the
    rematerialized forward — no statistics recomputed.

    Returns (dz, dg_part, dbeta_part, h) with h = ReLU(LN(z)) reconstructed
    from xhat.
    """
    xhat, inv = saved
    ln_out = xhat * g_row[None, :] + beta_row[None, :]
    h = jnp.maximum(ln_out, 0.0)
    gy = g_h * (ln_out > 0.0)  # relu mask first (relu is outermost)
    dg = jnp.sum(gy * xhat, axis=0)
    dbeta = jnp.sum(gy, axis=0)
    dxhat = gy * g_row[None, :]
    m_dxhat, m_cross = _bwd_means(dxhat, xhat, dtype)
    dz = inv * (dxhat - m_dxhat - xhat * m_cross)
    return dz, dg, dbeta, h


def _bwd_slice(feat, g_out, w, num_layers, dt):
    """Full backward math for one row-slice; returns (dfeat, grads) with
    grads as VALUE contributions so slices stay dataflow-independent."""
    # Rematerialize, keeping (xhat, inv) per layer; each h and ReLU mask is
    # reconstructed during the backward sweep.  ``dwhh[j] = h_j^T dz_{j+1}``
    # is emitted one layer late (``dz_next`` carries dz_{j+1}).
    chain, _ = _forward_chain(feat, w, num_layers, dt, keep=True)

    grads = {
        "b_out": jnp.sum(g_out, axis=0, keepdims=True),
        "b": [None] * num_layers,
        "g": [None] * num_layers,
        "beta": [None] * num_layers,
        "whh": [None] * (num_layers - 1),
    }
    g_h = _dot_t(g_out, w["w_out"], dt)

    dz_next = None
    for i in range(num_layers - 1, -1, -1):
        if dz_next is not None:
            g_h = _dot_t(dz_next, w["whh"][i], dt)
        dz, dg_i, dbeta_i, h_i = _ln_relu_bwd(g_h, chain[i], w["g"][i],
                                              w["beta"][i], dt)
        grads["g"][i] = dg_i
        grads["beta"][i] = dbeta_i
        grads["b"][i] = jnp.sum(dz, axis=0)
        if i == num_layers - 1:
            grads["w_out"] = _dot_tn(h_i, g_out, dt)
        else:
            grads["whh"][i] = _dot_tn(h_i, dz_next, dt)
        dz_next = dz
    grads["w_in"] = _dot_tn(feat, dz_next, dt)
    return _dot_t(dz_next, w["w_in"], dt), grads


def _bwd_kernel(*refs, num_layers, compute_dtype):
    feat_ref, gout_ref = refs[0], refs[1]
    w = {k: r[:] for k, r in zip(_PACK_ORDER, refs[2 : 2 + len(_PACK_ORDER)])}
    (dfeat_ref, dwin_ref, dwhh_ref, db_ref, dg_ref, dbeta_ref, dwout_ref,
     dbout_ref) = refs[2 + len(_PACK_ORDER) :]
    dt = compute_dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (dwin_ref, dwhh_ref, db_ref, dg_ref, dbeta_ref,
                    dwout_ref, dbout_ref):
            ref[...] = jnp.zeros_like(ref)

    rows = feat_ref.shape[0] // _BWD_SPLITS
    acc = None
    for s in range(_BWD_SPLITS):
        sl = slice(s * rows, (s + 1) * rows)
        dfeat, grads = _bwd_slice(
            feat_ref[sl, :], gout_ref[sl, :], w, num_layers, dt
        )
        dfeat_ref[sl, :] = dfeat
        acc = grads if acc is None else jax.tree.map(jnp.add, acc, grads)

    dwin_ref[...] += acc["w_in"]
    dwout_ref[...] += acc["w_out"]
    dbout_ref[...] += acc["b_out"]
    for i in range(num_layers):
        db_ref[i, :] += acc["b"][i]
        dg_ref[i, :] += acc["g"][i]
        dbeta_ref[i, :] += acc["beta"][i]
    for j in range(num_layers - 1):
        dwhh_ref[j, :, :] += acc["whh"][j]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_core(packed, feat, num_layers, compute_dtype, interpret):
    return _fwd_call(packed, feat, num_layers, compute_dtype, interpret)


def _fwd_call(packed, feat, num_layers, compute_dtype, interpret):
    p = feat.shape[0]
    f = feat.shape[1]
    o = packed["w_out"].shape[1]
    feat_pad, _ = _pad_points(feat, TILE_FWD)
    grid = feat_pad.shape[0] // TILE_FWD
    weights = [packed[k] for k in _PACK_ORDER]
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, num_layers=num_layers, compute_dtype=compute_dtype
        ),
        out_shape=jax.ShapeDtypeStruct((feat_pad.shape[0], o), jnp.float32),
        grid=(grid,),
        in_specs=[
            _tile_spec(TILE_FWD, f),
            *[_full_spec(w.shape) for w in weights],
        ],
        out_specs=_tile_spec(TILE_FWD, o),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(feat_pad, *weights)
    return out[:p]


def _fwd_rule(packed, feat, num_layers, compute_dtype, interpret):
    return (
        _fwd_call(packed, feat, num_layers, compute_dtype, interpret),
        (packed, feat),
    )


def _bwd_rule(num_layers, compute_dtype, interpret, residuals, g_out):
    packed, feat = residuals
    p, f = feat.shape
    feat_pad, _ = _pad_points(feat, TILE_BWD)
    g_pad, _ = _pad_points(g_out, TILE_BWD)
    grid = feat_pad.shape[0] // TILE_BWD
    weights = [packed[k] for k in _PACK_ORDER]

    out_shapes = [
        jax.ShapeDtypeStruct((feat_pad.shape[0], f), jnp.float32),
        *[jax.ShapeDtypeStruct(packed[k].shape, jnp.float32)
          for k in _PACK_ORDER],
    ]
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_layers=num_layers, compute_dtype=compute_dtype
        ),
        out_shape=out_shapes,
        grid=(grid,),
        in_specs=[
            _tile_spec(TILE_BWD, f),
            _tile_spec(TILE_BWD, g_out.shape[1]),
            *[_full_spec(w.shape) for w in weights],
        ],
        out_specs=[
            _tile_spec(TILE_BWD, f),
            *[_full_spec(s.shape) for s in out_shapes[1:]],
        ],
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(feat_pad, g_pad, *weights)

    # Cotangent dtype must match the (possibly bf16) primal features.
    dfeat = outs[0][:p].astype(feat.dtype)
    d_packed = dict(zip(_PACK_ORDER, outs[1:]))
    return d_packed, dfeat


_fused_core.defvjp(_fwd_rule, _bwd_rule)


def mip_mlp_pallas(
    params: Dict[str, Any],
    features: Array,
    num_hidden_layers: int,
    color_outputs: int = 3,
    compute_dtype=jnp.float32,
    interpret: bool | None = None,
) -> Tuple[Array, Array, Array]:
    """Fused evaluation of the HEAD MLP on IPE features.

    Returns ``(density [..., 1], color [..., C], segmentation [..., S])``
    mirroring ``apply_mip_mlp``.
    """
    if interpret is None:
        interpret = _interpret_default()
    lead = features.shape[:-1]
    # Pre-kernel cast: bit-identical on TPU (MXU DEFAULT precision already
    # truncates f32 matmul inputs to bf16) but halves the feature HBM
    # traffic into the kernel — see fused_mlp.classic_mlp_pallas.
    f2 = features.reshape(-1, features.shape[-1]).astype(compute_dtype)
    packed = pack_mip_params(params)
    out = _fused_core(packed, f2, num_hidden_layers, compute_dtype, interpret)
    out = out.reshape(*lead, out.shape[-1])
    return (
        out[..., :1],
        out[..., 1 : 1 + color_outputs],
        out[..., 1 + color_outputs :],
    )
