"""Functional MLP modules for both reference model generations.

Parameters are plain pytrees (nested dicts/lists of ``jnp`` arrays) so they
compose directly with ``jax.grad``, ``optax``, ``pjit`` shardings and
checkpoint serialization.  Weights are stored **(in, out)** so the forward
pass is ``x @ W + b`` — the MXU-friendly layout (the reference/torch stores
``(out, in)``; the ``.pth`` importer transposes).

Two architectures:

* ``classic``: the v1.2-generation 8-layer NeRF MLP reconstructed from
  ``/root/reference/examples/nerf.pth`` (SURVEY.md §2.3) — two trunk blocks
  of 4 x (Linear -> ReLU -> LayerNorm) with a positional-encoding skip
  concat into block 1, a density head off the trunk, and a 2-layer
  view-conditioned color branch.
* ``mip``: the HEAD-generation model (reference ``model.py:525-542``) — 5 x
  (Linear -> LayerNorm -> ReLU) then one output Linear producing
  ``[density | color | segmentation]`` logits.

Initialization matches torch ``nn.Linear`` defaults (uniform
``+-1/sqrt(fan_in)`` for weights and biases, LayerNorm at identity) so
training dynamics are comparable with the reference.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_tpu.config import ClassicNeRFConfig, MipNeRFConfig

Array = jax.Array
Params = Dict[str, Any]

LAYER_NORM_EPS = 1e-5  # torch nn.LayerNorm default


def _init_linear(key: jax.Array, in_dim: int, out_dim: int,
                 dtype=jnp.float32) -> Params:
    """torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, dtype=jnp.float32))
    wk, bk = jax.random.split(key)
    return {
        "w": jax.random.uniform(
            wk, (in_dim, out_dim), dtype=dtype, minval=-bound, maxval=bound
        ),
        "b": jax.random.uniform(
            bk, (out_dim,), dtype=dtype, minval=-bound, maxval=bound
        ),
    }


def _init_layer_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def linear(p: Params, x: Array) -> Array:
    return x @ p["w"] + p["b"]


def layer_norm(p: Params, x: Array) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + LAYER_NORM_EPS)
    return y * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# ResidualBlock (reference component #1 — dead code there, kept for parity)
# ---------------------------------------------------------------------------


def init_residual_block(
    key: jax.Array, hidden_size: int, feedforward_size: int, dtype=jnp.float32
) -> Params:
    """Pre-LN-style residual MLP block (reference ``model.py:7-21``:
    Linear -> GELU -> Linear, LayerNorm over ``x + h``).  The reference
    never instantiates it (SURVEY.md §2.1 #1); provided for API parity."""
    k1, k2 = jax.random.split(key)
    return {
        "linear_one": _init_linear(k1, hidden_size, feedforward_size, dtype),
        "linear_two": _init_linear(k2, feedforward_size, hidden_size, dtype),
        "ln": _init_layer_norm(hidden_size, dtype),
    }


def apply_residual_block(p: Params, x: Array) -> Array:
    # approximate=False: torch nn.GELU defaults to the exact erf form.
    h = linear(
        p["linear_two"],
        jax.nn.gelu(linear(p["linear_one"], x), approximate=False),
    )
    return layer_norm(p["ln"], x + h)


# ---------------------------------------------------------------------------
# Classic (v1.2) architecture
# ---------------------------------------------------------------------------


def init_classic_mlp(key: jax.Array, cfg: ClassicNeRFConfig,
                     dtype=jnp.float32) -> Params:
    """Build the v1.2 parameter pytree.

    Structure (mirrors checkpoint tensor names for a 1:1 importer):
      block_0: 4 layers of {linear, ln}, input = x encoding (60-dim default)
      block_1: 4 layers, input = hidden ++ x encoding (skip; 316-dim)
      block_2: view_branch_depth layers, input = hidden ++ d encoding (292)
      density/color: linear heads.
    """
    h = cfg.hidden_size
    n0, n1 = cfg.trunk_blocks
    keys = iter(jax.random.split(key, n0 + n1 + cfg.view_branch_depth + 2))

    def block(first_in: int, depth: int) -> List[Params]:
        layers = []
        for i in range(depth):
            in_dim = first_in if i == 0 else h
            layers.append(
                {
                    "linear": _init_linear(next(keys), in_dim, h, dtype),
                    "ln": _init_layer_norm(h, dtype),
                }
            )
        return layers

    params: Params = {
        "block_0": block(cfg.x_encoding_dim, n0),
        "block_1": block(h + cfg.x_encoding_dim, n1),
        "density": _init_linear(next(keys), h, 1, dtype),
    }
    if cfg.use_viewdirs:
        params["block_2"] = block(h + cfg.d_encoding_dim, cfg.view_branch_depth)
        params["color"] = _init_linear(next(keys), h, cfg.color_outputs, dtype)
    else:
        params["color"] = _init_linear(next(keys), h, cfg.color_outputs, dtype)
    return params


def _run_block(layers: List[Params], x: Array) -> Array:
    """Linear -> ReLU -> LayerNorm, repeated (v1.2 checkpoint ordering)."""
    for layer in layers:
        x = layer_norm(layer["ln"], jax.nn.relu(linear(layer["linear"], x)))
    return x


def apply_classic_mlp(
    params: Params,
    cfg: ClassicNeRFConfig,
    x_enc: Array,
    d_enc: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Evaluate the v1.2 MLP on encoded positions (+ encoded view dirs).

    Args:
        x_enc: ``[..., x_encoding_dim]`` encoded positions (+ latent states).
        d_enc: ``[..., d_encoding_dim]`` encoded view directions, required
            when ``cfg.use_viewdirs``.

    Returns:
        ``(density [..., 1], color_logits [..., color_outputs])`` — raw; the
        renderer applies relu/sigmoid during compositing (reference
        ``model.py:467, 660``).
    """
    h = _run_block(params["block_0"], x_enc)
    h = _run_block(params["block_1"], jnp.concatenate([h, x_enc], axis=-1))
    density = linear(params["density"], h)
    if cfg.use_viewdirs:
        if d_enc is None:
            raise ValueError("use_viewdirs=True requires encoded directions")
        h = _run_block(params["block_2"], jnp.concatenate([h, d_enc], axis=-1))
    color = linear(params["color"], h)
    return density, color


# ---------------------------------------------------------------------------
# Mip (HEAD) architecture
# ---------------------------------------------------------------------------


def init_mip_mlp(key: jax.Array, cfg: MipNeRFConfig, dtype=jnp.float32) -> Params:
    """Build the HEAD parameter pytree (reference ``model.py:525-542``)."""
    keys = iter(jax.random.split(key, cfg.num_hidden_layers + 1))
    layers = []
    in_dim = cfg.feature_dim
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "linear": _init_linear(next(keys), in_dim, cfg.hidden_size, dtype),
                "ln": _init_layer_norm(cfg.hidden_size, dtype),
            }
        )
        in_dim = cfg.hidden_size
    return {
        "layers": layers,
        "out": _init_linear(next(keys), cfg.hidden_size, cfg.num_outputs, dtype),
    }


def apply_mip_mlp(
    params: Params, cfg: MipNeRFConfig, features: Array
) -> Tuple[Array, Array, Array]:
    """Evaluate the HEAD MLP: Linear -> LayerNorm -> ReLU stack + output split.

    Mirrors reference ``model.py:589-592`` (the split into density, color,
    segmentation logits), but with an axis-agnostic split instead of the
    hardcoded ``dim=2`` (reference defect §2.4.5).
    """
    h = features
    for layer in params["layers"]:
        h = jax.nn.relu(layer_norm(layer["ln"], linear(layer["linear"], h)))
    out = linear(params["out"], h)
    density = out[..., :1]
    color = out[..., 1 : 1 + cfg.color_outputs]
    segmentation = out[..., 1 + cfg.color_outputs :]
    return density, color, segmentation


def count_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
