"""Checkpointing with resume — the subsystem the reference lacks.

The reference only ever ``torch.save``s raw model weights
(``train_conditional_nerf.py:160-161``): no optimizer state, no step, no
load path — a crash loses the run (SURVEY.md §5).  Here the FULL train
state (params + Adam moments + step + PRNG key) round-trips through a
single ``.npz`` per step with atomic writes, retention, and resume; plus
export/import to the reference's ``.pth`` layout for interop.

Format: one ``checkpoint_<step>.npz`` holding the positionally-flattened
state pytree (leaf ``i`` under key ``leaf_{i:05d}``) plus the pytree-path
names for integrity checking.  Restoring requires a template state with the
same structure (the normal JAX pattern — structure comes from code, data
from disk).
"""

from __future__ import annotations

import os
import re
import tempfile
from typing import Any, List, Optional

import jax
import numpy as np

from nerf_tpu.train.state import TrainState

_CKPT_RE = re.compile(r"checkpoint_(\d+)\.npz$")


def _leaf_names(tree: Any) -> List[str]:
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [jax.tree_util.keystr(path) for path, _ in paths]


def save_checkpoint(
    directory: str, state: TrainState, keep: int = 3
) -> str:
    """Atomically write ``checkpoint_<step>.npz``; prune to ``keep`` newest."""
    os.makedirs(directory, exist_ok=True)
    step = int(state.step)
    leaves = jax.tree_util.tree_leaves(state)
    payload = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["leaf_names"] = np.asarray(_leaf_names(state))

    path = os.path.join(directory, f"checkpoint_{step}.npz")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)

    for old in all_checkpoints(directory)[:-keep]:
        os.remove(os.path.join(directory, old))
    return path


def all_checkpoints(directory: str) -> List[str]:
    """Checkpoint filenames sorted by step (oldest first)."""
    if not os.path.isdir(directory):
        return []
    found = []
    for name in os.listdir(directory):
        m = _CKPT_RE.match(name)
        if m:
            found.append((int(m.group(1)), name))
    return [name for _, name in sorted(found)]


def latest_checkpoint(directory: str) -> Optional[str]:
    names = all_checkpoints(directory)
    return os.path.join(directory, names[-1]) if names else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Load a checkpoint into the structure of ``template``.

    Validates leaf count and pytree-path names so a config/architecture
    mismatch fails loudly instead of silently loading wrong weights.
    """
    with np.load(path, allow_pickle=False) as data:
        names = list(data["leaf_names"])
        leaves = [data[f"leaf_{i:05d}"] for i in range(len(names))]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    t_names = _leaf_names(template)
    if len(leaves) != len(t_leaves) or [str(n) for n in names] != t_names:
        raise ValueError(
            f"checkpoint structure mismatch: file has {len(leaves)} leaves, "
            f"template has {len(t_leaves)}; first differing path: "
            f"{next((a for a, b in zip(map(str, names), t_names) if a != b), '<count>')}"
        )
    for got, want in zip(leaves, t_leaves):
        if got.shape != np.shape(want):
            raise ValueError(
                f"checkpoint leaf shape mismatch: {got.shape} vs {np.shape(want)}"
            )
    return jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(x) for x in leaves]
    )


def restore_latest(directory: str, template: TrainState) -> Optional[TrainState]:
    path = latest_checkpoint(directory)
    return restore_checkpoint(path, template) if path else None


# -- reference interop -------------------------------------------------------


def export_reference_pth(path: str, params: Any) -> None:
    """Save ClassicNeRF params as a reference-loadable ``.pth`` state_dict."""
    import torch

    from nerf_tpu.utils.pth_import import classic_params_to_state_dict

    sd = {
        k: torch.as_tensor(np.array(v))
        for k, v in classic_params_to_state_dict(params).items()
    }
    torch.save(sd, path)
