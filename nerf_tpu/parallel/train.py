"""Data-parallel training and rendering over a device mesh.

SPMD via ``jit`` + shardings (the pjit path): the ray batch is sharded over
the ``batch`` mesh axis, the train state is replicated, and XLA inserts the
gradient all-reduce (psum over ICI on real hardware) and overlaps it with
the backward pass through its latency-hiding scheduler — the TPU-native
replacement for the NCCL/DDP machinery the reference never had
(SURVEY.md §5 "distributed communication backend").

Key property tested in CI on the virtual 8-device CPU mesh: an N-way
sharded step computes the SAME update as the single-device step (batch-mean
loss ⇒ mean of per-shard gradients), and sharded rendering equals
single-device rendering.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from nerf_tpu.config import RenderConfig
from nerf_tpu.parallel.mesh import (
    batch_sharding,
    replicate,
    replicated_sharding,
    shard_batch,
)
from nerf_tpu.train.loop import make_loss_fn
from nerf_tpu.train.state import TrainState, fold_key

Array = jax.Array


def _make_sharded_vag(
    model,
    render: RenderConfig,
    mesh: Mesh,
    segmentation_loss_weight: float = 0.0,
):
    """shard_map'd (grads, aux) of the batch loss: every device evaluates
    ONLY its local ray shard (crucial for Pallas kernels, which XLA's
    automatic partitioner would otherwise wrap in batch all-gathers,
    replicating the whole computation on every chip) and the per-shard
    gradients are combined with an explicit ``pmean`` — the psum over ICI
    that replaces NCCL all-reduce (SURVEY.md §5)."""
    from jax.sharding import PartitionSpec as P

    from jax import shard_map

    loss_fn = make_loss_fn(model, render, segmentation_loss_weight)
    axis = mesh.axis_names[0]

    def local_value_and_grad(params, key, batch):
        # Decorrelate stochastic sampling across shards.
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, batch
        )
        grads = jax.lax.pmean(grads, axis)
        aux = jax.lax.pmean(aux, axis)
        return grads, aux

    # check_vma=False: Pallas out_shapes carry no varying-mesh-axes
    # annotation, which the shard_map checker would otherwise reject.
    return shard_map(
        local_value_and_grad,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )


def make_parallel_train_step(
    model,
    optimizer: optax.GradientTransformation,
    render: RenderConfig,
    mesh: Mesh,
    segmentation_loss_weight: float = 0.0,
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, Array]], Tuple[TrainState, Dict]]:
    """Jitted SPMD train step: state replicated, batch ray-sharded.

    The gradient computation runs under ``shard_map`` (see
    ``_make_sharded_vag``); the optimizer update then runs replicated.

    Numerics: with ``randomly_sample=False`` the sharded step is exactly the
    single-device step (batch-mean loss ⇒ pmean of shard-mean gradients).
    With stochastic sampling the per-ray noise differs from the
    single-device run (keys are folded per shard) but is identically
    distributed.
    """
    sharded_vag = _make_sharded_vag(
        model, render, mesh, segmentation_loss_weight
    )

    def step(state: TrainState, batch: Dict[str, Array]):
        key = fold_key(state)
        grads, aux = sharded_vag(state.params, key, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            key=state.key,
        )
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: repl, _state_shape_token())
    return jax.jit(
        step,
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_sampling_train_step(
    model,
    optimizer: optax.GradientTransformation,
    render: RenderConfig,
    bank,
    batch_size: int,
    mesh: Mesh,
    segmentation_loss_weight: float = 0.0,
    donate: bool = True,
) -> Callable[[TrainState], Tuple[TrainState, Dict]]:
    """SPMD train step with the batch gather fused in (device-resident).

    The multi-chip counterpart of ``train.loop.make_sampling_train_step``:
    the ray bank's arrays are closed over as jit constants, the random
    index gather runs on-device, and a sharding constraint splits the
    gathered batch over the ``batch`` mesh axis before the ``shard_map``'d
    gradient computation.  This is what ``Trainer(mesh=...)`` drives — no
    host-side batch plumbing per step.
    """
    sharded_vag = _make_sharded_vag(
        model, render, mesh, segmentation_loss_weight
    )
    data = batch_sharding(mesh)

    def step(state: TrainState):
        key = fold_key(state)
        batch = bank.sample_batch(
            jax.random.fold_in(key, 0x5A17), batch_size
        )
        batch = jax.lax.with_sharding_constraint(
            batch, {k: data for k in batch}
        )
        grads, aux = sharded_vag(state.params, key, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            key=state.key,
        )
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    repl = replicated_sharding(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: repl, _state_shape_token())
    return jax.jit(
        step,
        in_shardings=(state_sh,),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_multi_step_train_fn(
    model,
    optimizer: optax.GradientTransformation,
    render: RenderConfig,
    bank,
    batch_size: int,
    mesh: Mesh,
    num_steps: int,
    segmentation_loss_weight: float = 0.0,
    fused: bool = False,
) -> Callable[[TrainState], Tuple[TrainState, Dict]]:
    """K fused SPMD steps per dispatch: ``lax.scan`` over the sharded
    sampling step, state donated.

    The multi-chip counterpart of ``make_multi_step_train_fn`` /
    ``make_fused_multi_step_train_fn``: one device program runs K steps of
    on-device batch gather (sharded over the ``batch`` axis), per-shard
    loss/gradients, the ICI gradient ``pmean`` and the replicated Adam
    update — one dispatch, one fetch, no host round-trips in between.

    ``fused=True`` computes each shard's gradients through the fully-fused
    Pallas train path (``train.loop.make_fused_loss_and_grads``) instead of
    autodiff over ``render_rays``; per-shard PRNG folding matches the
    general sharded step, and each device evaluates ONLY its ray shard
    (``shard_map``, not the automatic partitioner — see
    ``_make_sharded_vag``).
    """
    from jax.sharding import PartitionSpec as P

    from jax import shard_map

    axis = mesh.axis_names[0]
    if fused:
        from nerf_tpu.train.loop import make_fused_loss_and_grads

        loss_and_grads = make_fused_loss_and_grads(
            model, render, segmentation_loss_weight
        )

        def local_value_and_grad(params, key, batch):
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            _, grads, aux = loss_and_grads(params, key, batch)
            return jax.lax.pmean(grads, axis), jax.lax.pmean(aux, axis)

        sharded_vag = shard_map(
            local_value_and_grad,
            mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    else:
        sharded_vag = _make_sharded_vag(
            model, render, mesh, segmentation_loss_weight
        )
    data = batch_sharding(mesh)

    def one_step(state: TrainState, _):
        key = fold_key(state)
        batch = bank.sample_batch(
            jax.random.fold_in(key, 0x5A17), batch_size
        )
        batch = jax.lax.with_sharding_constraint(
            batch, {k: data for k in batch}
        )
        grads, aux = sharded_vag(state.params, key, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, params, opt_state, state.key),
            aux,
        )

    def run(state: TrainState):
        return jax.lax.scan(one_step, state, None, length=num_steps)

    repl = replicated_sharding(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: repl, _state_shape_token())
    return jax.jit(
        run,
        in_shardings=(state_sh,),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def _state_shape_token():
    """A TrainState-shaped token tree for sharding specification.

    ``jax.jit`` accepts a pytree-prefix for in_shardings, but TrainState's
    exact structure varies with the optimizer; a 4-field NamedTuple of
    ``None`` placeholders lets tree_map paint every leaf replicated.
    """
    return TrainState(step=0, params=0, opt_state=0, key=0)


def prepare_parallel_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate a host/single-device train state across the mesh."""
    return replicate(state, mesh)


def make_parallel_render(
    model,
    render: RenderConfig,
    mesh: Mesh,
) -> Callable[..., Array]:
    """Sharded batch-of-rays renderer: rays split over the mesh, params
    replicated, pixels gathered — the multi-chip eval path (each chip
    renders its pixel shard; no inter-chip traffic until the output gather,
    SURVEY.md §5 long-context row)."""

    def render_fn(params, rays_o, rays_d, states_x, states_d):
        # Zero-width state arrays mean "no conditioning" (keeps the arity
        # static for the sharding contract).
        sx = states_x if states_x.shape[-1] > 0 else None
        sd = states_d if states_d.shape[-1] > 0 else None
        out = model.render_rays(
            params, None, rays_o, rays_d, render, states_x=sx, states_d=sd
        )
        rgb = out.rgb[..., -1, :]
        if out.segmentation is not None:
            return jnp.concatenate([rgb, out.segmentation[..., -1, :]], -1)
        return rgb

    data = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    return jax.jit(
        render_fn,
        in_shardings=(repl, data, data, data, data),
        out_shardings=data,
    )


def render_image_sharded(
    model,
    params,
    mesh: Mesh,
    camera_o,
    camera_r,
    image_h: int,
    image_w: int,
    focal_length: float,
    render: RenderConfig,
    states_x=None,
    states_d=None,
) -> Array:
    """Full-image eval render with pixels sharded across the mesh.

    Pads the ray grid to a multiple of the mesh size, shards, renders, and
    reassembles ``[B, H, W, C]`` on the host.
    """
    from nerf_tpu.ops import cameras

    rays_o, rays_d = cameras.pose_to_rays(
        camera_o, camera_r, image_h, image_w, focal_length
    )
    b = rays_o.shape[0]
    n = b * image_h * image_w
    rays_o = rays_o.reshape(n, 3)
    rays_d = rays_d.reshape(n, 3)

    def expand_states(states):
        if states is None:
            return jnp.zeros((rays_o.shape[0], 0), rays_o.dtype)
        states = jnp.broadcast_to(
            states[:, None, :], (b, image_h * image_w, states.shape[-1])
        )
        return states.reshape(-1, states.shape[-1])

    sx = expand_states(states_x)
    sd = expand_states(states_d)

    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    if pad:
        rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
        rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad), (0, 0)))
        sd = jnp.pad(sd, ((0, pad), (0, 0)))

    render_fn = make_parallel_render(model, render, mesh)
    params = replicate(params, mesh)
    sh = batch_sharding(mesh)
    out = render_fn(
        params,
        jax.device_put(rays_o, sh),
        jax.device_put(rays_d, sh),
        jax.device_put(sx, sh),
        jax.device_put(sd, sh),
    )
    out = jax.device_get(out)[:n]
    return out.reshape(b, image_h, image_w, -1)
