"""Checkpointing with resume — the subsystem the reference lacks.

The reference only ever ``torch.save``s raw model weights
(``train_conditional_nerf.py:160-161``): no optimizer state, no step, no
load path — a crash loses the run (SURVEY.md §5).  Here the FULL train
state (params + Adam moments + step + PRNG key) round-trips through
atomic writes with retention and resume; plus export/import to the
reference's ``.pth`` layout for interop.

Two on-disk layouts, auto-detected on restore:

* **Single-file** (one process, fully-addressable state): one
  ``checkpoint_<step>.npz`` holding the positionally-flattened state
  pytree (leaf ``i`` under key ``leaf_{i:05d}``) plus the pytree-path
  names for integrity checking.
* **Sharded** (non-addressable leaves — TP/DP global meshes spanning
  processes): every process writes ONLY its addressable,
  ``replica_id == 0`` shards to ``checkpoint_<step>.shards<p>.npz``
  (shard key carries the global index bounds), then all processes
  barrier and process 0 atomically writes the ``checkpoint_<step>.npz``
  manifest — its presence marks the checkpoint complete, so a crash
  mid-write never leaves a restorable-looking partial checkpoint.
  Restore reassembles the global leaves from every shard file and
  re-shards them to the TEMPLATE state's shardings
  (``jax.make_array_from_callback``, so each process materializes only
  its own shards on device).

Restoring requires a template state with the same structure (the normal
JAX pattern — structure comes from code, data from disk).
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
_SHARDS_RE = re.compile(r"checkpoint_(\d+)\.shards(\d+)\.npz$")


def _leaf_names(tree: Any) -> List[str]:
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [jax.tree_util.keystr(path) for path, _ in paths]


def _needs_sharded_layout(leaves: List[Any]) -> bool:
    # Sharded iff any leaf is NOT fully addressable from this process (a
    # TP/DP state over a multi-process global mesh).  A ``device_get``'d
    # or host-numpy state is always addressable — that stays single-file
    # even under multi-process (coordinator-gated by the caller), so the
    # replicated-state save pattern keeps working without a barrier.
    return any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        for x in leaves
    )


def _atomic_savez(directory: str, path: str, payload: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_checkpoint(
    directory: str, state: TrainState, keep: int = 3,
    sharded: Optional[bool] = None,
) -> str:
    """Atomically write checkpoint ``<step>``; prune to ``keep`` newest.

    Safe for sharded/multi-host states: accepts the live (device,
    possibly non-addressable) state directly — do NOT ``device_get`` it
    first.  Every process must call this (collective in the sharded
    layout); returns the manifest path.

    ``sharded``: force a layout (``None`` auto-selects — sharded iff
    any leaf is non-addressable from this process).
    """
    os.makedirs(directory, exist_ok=True)
    step = int(state.step)
    leaves = jax.tree_util.tree_leaves(state)
    path = os.path.join(directory, f"checkpoint_{step}.npz")

    if sharded is None:
        sharded = _needs_sharded_layout(leaves)
    if not sharded:
        payload = {
            f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)
        }
        payload["leaf_names"] = np.asarray(_leaf_names(state))
        _atomic_savez(directory, path, payload)
        _prune(directory, keep)
        return path

    # -- sharded layout: one shard file per process, then the manifest ----
    proc = jax.process_index()
    payload = {}
    for i, x in enumerate(leaves):
        if not isinstance(x, jax.Array):
            # Python scalars etc. — replicated by construction; proc 0
            # records them in the manifest.
            continue
        for j, shard in enumerate(x.addressable_shards):
            if shard.replica_id != 0:
                continue  # replicated copy; exactly one replica writes
            # Encode the global bounds of this shard: [dims, 2] int64.
            bounds = np.array(
                [
                    [
                        0 if sl.start is None else sl.start,
                        dim if sl.stop is None else sl.stop,
                    ]
                    for sl, dim in zip(shard.index, x.shape)
                ],
                dtype=np.int64,
            ).reshape(len(x.shape), 2)
            payload[f"leaf_{i:05d}.s{j}.data"] = np.asarray(shard.data)
            payload[f"leaf_{i:05d}.s{j}.bounds"] = bounds
    shard_path = os.path.join(
        directory, f"checkpoint_{step}.shards{proc}.npz"
    )
    _atomic_savez(directory, shard_path, payload)

    # All shard files durable before the manifest marks completion.
    _barrier(f"nerf_tpu_ckpt_save_{step}")
    if proc == 0:
        manifest = {
            "leaf_names": np.asarray(_leaf_names(state)),
            "sharded": np.asarray(True),
            "num_shard_files": np.asarray(jax.process_count()),
        }
        for i, x in enumerate(leaves):
            if isinstance(x, jax.Array):
                manifest[f"leaf_{i:05d}.shape"] = np.asarray(
                    x.shape, dtype=np.int64
                )
                manifest[f"leaf_{i:05d}.dtype"] = np.asarray(str(x.dtype))
            else:
                manifest[f"leaf_{i:05d}.value"] = np.asarray(x)
        _atomic_savez(directory, path, manifest)
    _barrier(f"nerf_tpu_ckpt_done_{step}")
    _prune(directory, keep, proc=proc)
    return path


def _prune(directory: str, keep: int, proc: int = 0) -> None:
    """Remove all files of checkpoints older than the ``keep`` newest.

    In the sharded layout each process removes its OWN shard files;
    process 0 additionally removes manifests (and any single-file
    checkpoints from earlier phases of the run).
    """
    drop_steps = {
        int(_CKPT_RE.match(name).group(1))
        for name in all_checkpoints(directory)[:-keep]
    }
    if not drop_steps:
        return
    for name in os.listdir(directory):
        m = _CKPT_RE.match(name)
        if m and proc == 0 and int(m.group(1)) in drop_steps:
            os.remove(os.path.join(directory, name))
            continue
        m = _SHARDS_RE.match(name)
        if (
            m
            and int(m.group(1)) in drop_steps
            and int(m.group(2)) == proc
        ):
            os.remove(os.path.join(directory, name))


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


def _validate_names(names: List[str], template: TrainState) -> tuple:
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    t_names = _leaf_names(template)
    if len(names) != len(t_leaves) or [str(n) for n in names] != t_names:
        raise ValueError(
            f"checkpoint structure mismatch: file has {len(names)} leaves, "
            f"template has {len(t_leaves)}; first differing path: "
            f"{next((a for a, b in zip(map(str, names), t_names) if a != b), '<count>')}"
        )
    return t_leaves, treedef


def _check_shape(got_shape, want) -> None:
    if tuple(got_shape) != tuple(np.shape(want)):
        raise ValueError(
            f"checkpoint leaf shape mismatch: {tuple(got_shape)} vs "
            f"{np.shape(want)}"
        )


def _reshard_like(arr: np.ndarray, want: Any) -> Any:
    """Place a host array like the template leaf (same sharding if any).

    Only multi-device template leaves pin their sharding (each process
    materializes just its own shards); single-device leaves come back as
    ordinary UNCOMMITTED arrays so a later ``device_put`` onto a global
    mesh (e.g. ``prepare_parallel_state`` after restore) stays a plain
    host upload instead of a cross-host device transfer.
    """
    if (
        isinstance(want, jax.Array)
        and hasattr(want, "sharding")
        and len(want.sharding.device_set) > 1
    ):
        return jax.make_array_from_callback(
            arr.shape, want.sharding, lambda idx: arr[idx]
        )
    return jax.numpy.asarray(arr)


def _restore_sharded(
    path: str, manifest, template: TrainState
) -> TrainState:
    directory = os.path.dirname(path) or "."
    step = int(_CKPT_RE.match(os.path.basename(path)).group(1))
    names = list(manifest["leaf_names"])
    t_leaves, treedef = _validate_names(names, template)
    n_files = int(manifest["num_shard_files"])

    # Assemble each leaf on host from every process's shard file.  Reads
    # the full global array per leaf — fine at NeRF scale; the device
    # placement below still only materializes this process's shards.
    out: List[Any] = [None] * len(names)
    shapes = {}
    for i, want in enumerate(t_leaves):
        key = f"leaf_{i:05d}"
        if f"{key}.value" in manifest:
            out[i] = jax.numpy.asarray(manifest[f"{key}.value"])
        else:
            shape = tuple(int(s) for s in manifest[f"{key}.shape"])
            _check_shape(shape, want)
            shapes[i] = (
                np.zeros(shape, dtype=np.dtype(str(manifest[f"{key}.dtype"]))),
                np.zeros(shape, dtype=bool),
            )
    for p in range(n_files):
        shard_path = os.path.join(
            directory, f"checkpoint_{step}.shards{p}.npz"
        )
        if not os.path.exists(shard_path):
            raise FileNotFoundError(
                f"sharded checkpoint is missing {shard_path} "
                f"(manifest expects {n_files} shard files)"
            )
        with np.load(shard_path, allow_pickle=False) as data:
            for key in data.files:
                if not key.endswith(".data"):
                    continue
                i = int(key[5:10])
                bounds = data[key[: -len(".data")] + ".bounds"]
                sl = tuple(slice(int(a), int(b)) for a, b in bounds)
                arr, seen = shapes[i]
                arr[sl] = data[key]
                seen[sl] = True
    for i, (arr, seen) in shapes.items():
        if not seen.all():
            raise ValueError(
                f"sharded checkpoint leaf {names[i]} has uncovered "
                f"elements — missing or truncated shard files"
            )
        out[i] = _reshard_like(arr, t_leaves[i])
    return jax.tree_util.tree_unflatten(treedef, out)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Load a checkpoint into the structure of ``template``.

    Validates leaf count and pytree-path names so a config/architecture
    mismatch fails loudly instead of silently loading wrong weights.
    Handles both layouts; sharded leaves are placed with the TEMPLATE's
    shardings (restore onto a different mesh shape than the save ran on
    is supported — the global arrays are layout-independent).
    """
    with np.load(path, allow_pickle=False) as data:
        if "sharded" in data.files:
            return _restore_sharded(path, data, template)
        names = list(data["leaf_names"])
        leaves = [data[f"leaf_{i:05d}"] for i in range(len(names))]
    t_leaves, treedef = _validate_names(names, template)
    for got, want in zip(leaves, t_leaves):
        _check_shape(got.shape, want)
    return jax.tree_util.tree_unflatten(
        treedef,
        [_reshard_like(x, want) for x, want in zip(leaves, t_leaves)],
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
