"""Device meshes and shardings for multi-chip / multi-host runs.

The reference is strictly single-process single-GPU (SURVEY.md §2.2: no
torch.distributed anywhere; one ``.cuda()`` placement).  The TPU-native
equivalent is pure data parallelism over rays: a 1-D ``batch`` mesh axis,
parameters replicated, the per-step ray batch sharded.  Params are tiny
(~0.3-0.6 M) so gradient all-reduce is one small psum over ICI that XLA
overlaps with the backward pass — TP/PP would be counterproductive at this
size (SURVEY.md §2.2).

All helpers work identically on a real pod slice and on the virtual
8-device CPU platform used in CI
(``--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"
SAMPLE_AXIS = "sample"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: int = 0,
    axis_name: str = BATCH_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
    prefer_platform: Optional[str] = None,
) -> Mesh:
    """Build a 1-D device mesh over the ray-batch axis.

    ``prefer_platform='cpu'`` picks the virtual CPU devices even when a TPU
    backend is also registered (needed because this environment force-loads
    the axon TPU platform alongside CPU).
    """
    if devices is None:
        if prefer_platform is not None:
            devices = jax.devices(prefer_platform)
        else:
            devices = jax.devices()
    if num_devices:
        if len(devices) < num_devices:
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} visible"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(
    batch_devices: int,
    second_devices: int,
    second_axis: str = SAMPLE_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
    prefer_platform: Optional[str] = None,
) -> Mesh:
    """Build a 2-D ``(batch, sample|model)`` mesh.

    The second axis carries either the samples-per-ray dimension
    (sequence parallelism, ``parallel/sample_parallel.py``) or the MLP
    hidden dimension (tensor parallelism, ``parallel/tensor_parallel.py``).
    On real hardware lay the fast-varying axis along the ICI torus links;
    here the device order of ``jax.devices()`` is used as-is.
    """
    n = batch_devices * second_devices
    if devices is None:
        devices = (
            jax.devices(prefer_platform) if prefer_platform else jax.devices()
        )
    if len(devices) < n:
        raise ValueError(f"requested {n} devices, only {len(devices)} visible")
    grid = np.asarray(devices[:n]).reshape(batch_devices, second_devices)
    return Mesh(grid, (BATCH_AXIS, second_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with the ray axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / train state) over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
