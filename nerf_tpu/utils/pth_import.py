"""Import reference PyTorch checkpoints into nerf_tpu parameter pytrees.

The reference ships a pretrained v1.2 tiny_nerf lego checkpoint at
``/root/reference/examples/nerf.pth`` (638,468 params, 44 tensors —
SURVEY.md §2.3).  Its ``state_dict`` layout:

* ``block_0.{0,3,6,9}`` Linear + ``block_0.{2,5,8,11}`` LayerNorm — trunk 1
* ``block_1.{0,3,6,9}`` / ``block_1.{2,5,8,11}``                 — trunk 2 (skip)
* ``block_2.{0,3}``     / ``block_2.{2,5}``                      — view branch
* ``density.{weight,bias}``, ``color.{weight,bias}``             — heads

torch Linear weights are ``(out, in)``; nerf_tpu stores ``(in, out)`` for
``x @ W`` on the MXU, so weights are transposed on import.  Also exports the
reverse direction so nerf_tpu training runs can be saved as
reference-compatible ``.pth`` files.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

import jax.numpy as jnp

from nerf_tpu.config import ClassicNeRFConfig

Params = Dict[str, Any]


def _to_np(tensor) -> np.ndarray:
    try:  # torch tensor
        return tensor.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(tensor)


def classic_params_from_state_dict(
    state_dict: Mapping[str, Any], cfg: ClassicNeRFConfig
) -> Params:
    """Convert a reference v1.2 ``state_dict`` into a ClassicNeRF pytree."""
    sd = {k: _to_np(v) for k, v in state_dict.items()}

    def linear(prefix: str) -> Params:
        return {
            "w": jnp.asarray(sd[f"{prefix}.weight"].T),
            "b": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    def ln(prefix: str) -> Params:
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    def block(name: str, depth: int) -> list:
        # Sequential indices: Linear at 3i, ReLU at 3i+1, LayerNorm at 3i+2.
        return [
            {"linear": linear(f"{name}.{3 * i}"), "ln": ln(f"{name}.{3 * i + 2}")}
            for i in range(depth)
        ]

    n0, n1 = cfg.trunk_blocks
    params: Params = {
        "block_0": block("block_0", n0),
        "block_1": block("block_1", n1),
        "density": linear("density"),
        "color": linear("color"),
    }
    if cfg.use_viewdirs:
        params["block_2"] = block("block_2", cfg.view_branch_depth)

    _check_classic_shapes(params, cfg)
    return params


def _check_classic_shapes(params: Params, cfg: ClassicNeRFConfig) -> None:
    h = cfg.hidden_size
    got = params["block_0"][0]["linear"]["w"].shape
    want = (cfg.x_encoding_dim, h)
    if got != want:
        raise ValueError(
            f"block_0 input mismatch: checkpoint {got}, config expects {want} "
            f"(density_inputs={cfg.density_inputs}, "
            f"x_positional_encoding_size={cfg.x_positional_encoding_size})"
        )
    got = params["block_1"][0]["linear"]["w"].shape
    want = (h + cfg.x_encoding_dim, h)
    if got != want:
        raise ValueError(f"block_1 skip-input mismatch: {got} vs {want}")
    if cfg.use_viewdirs:
        got = params["block_2"][0]["linear"]["w"].shape
        want = (h + cfg.d_encoding_dim, h)
        if got != want:
            raise ValueError(f"block_2 view-input mismatch: {got} vs {want}")


def load_classic_checkpoint(path: str, cfg: ClassicNeRFConfig) -> Params:
    """Load a reference ``.pth`` file (requires torch, CPU-only is fine)."""
    import torch

    state_dict = torch.load(path, map_location="cpu")
    return classic_params_from_state_dict(state_dict, cfg)


def classic_params_to_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Reverse conversion: nerf_tpu ClassicNeRF pytree -> reference-layout
    state_dict (numpy arrays; wrap in torch tensors to ``torch.save``)."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix: str, p: Params) -> None:
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_ln(prefix: str, p: Params) -> None:
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    put_linear("density", params["density"])
    put_linear("color", params["color"])
    for name in ("block_0", "block_1", "block_2"):
        if name not in params:
            continue
        for i, layer in enumerate(params[name]):
            put_linear(f"{name}.{3 * i}", layer["linear"])
            put_ln(f"{name}.{3 * i + 2}", layer["ln"])
    return sd
