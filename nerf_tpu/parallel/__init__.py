"""Parallel layer: meshes, SPMD train/render, multi-host init."""
from nerf_tpu.parallel.mesh import make_mesh, batch_sharding, replicated_sharding, shard_batch, replicate
from nerf_tpu.parallel.train import (
    make_parallel_train_step,
    make_parallel_render,
    prepare_parallel_state,
    render_image_sharded,
)
from nerf_tpu.parallel import distributed
