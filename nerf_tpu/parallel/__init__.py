"""Parallel layer: meshes, SPMD train/render, multi-host init."""
from nerf_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from nerf_tpu.parallel.train import (
    make_parallel_train_step,
    make_parallel_sampling_train_step,
    make_parallel_multi_step_train_fn,
    make_parallel_render,
    prepare_parallel_state,
    render_image_sharded,
)
from nerf_tpu.parallel.sample_parallel import (
    make_sample_parallel_render,
    make_sample_parallel_train_step,
)
from nerf_tpu.parallel.tensor_parallel import (
    make_tp_render_rays,
    make_tp_train_step,
    prepare_tp_state,
    shard_params,
)
from nerf_tpu.parallel import distributed
from nerf_tpu.parallel.watchdog import (
    Heartbeat,
    Supervisor,
    read_heartbeats,
    stale_processes,
    stalled_processes,
)
