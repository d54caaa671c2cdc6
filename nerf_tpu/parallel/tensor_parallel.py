"""Tensor parallelism: shard the MLP hidden dimension across the mesh.

At the reference's model sizes (0.3-0.6 M params, SURVEY.md §6) pure data
parallelism over rays is the performance-optimal decomposition and TP is
counterproductive (SURVEY.md §2.2) — but the capability exists for wide
configs (``hidden_size`` in the thousands), where one chip's VMEM can no
longer hold the weights next to the activations.

Design: the idiomatic GSPMD path, *not* hand-written collectives.  Every
weight matrix gets a ``PartitionSpec`` over a ``model`` mesh axis — column-
sharded into each Linear, row-sharded out of it, LayerNorm scale/bias
sharded with the features — and XLA's SPMD partitioner propagates the
shardings through the computation and inserts the all-reduces (over ICI on
real hardware) where contractions cross the shard boundary.  This composes
freely with batch data parallelism on the same mesh: ``(batch, model)``.

TP uses the pure-XLA MLP path (``models/mlp.py``): the fused Pallas kernel
holds the full weight set in one core's VMEM by design and is the faster
choice whenever the model *fits*, which is exactly the regime where TP is
unnecessary.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_tpu.config import ClassicNeRFConfig, MipNeRFConfig, RenderConfig
from nerf_tpu.parallel.mesh import BATCH_AXIS, MODEL_AXIS

Array = jax.Array
Params = Dict[str, Any]


def _layer_specs(axis: str) -> Params:
    """Specs for one {linear, ln} trunk layer: activations (and therefore
    the Linear output dim, LN params) live sharded over ``axis``."""
    return {
        "linear": {"w": P(None, axis), "b": P(axis)},
        "ln": {"scale": P(axis), "bias": P(axis)},
    }


def classic_param_specs(
    cfg: ClassicNeRFConfig, axis: str = MODEL_AXIS
) -> Params:
    """PartitionSpec pytree matching ``models/mlp.py::init_classic_mlp``.

    Trunk Linears are column-sharded (output features over ``axis``) so the
    hidden activations stay sharded through ReLU; the density/color heads
    are row-sharded (contraction over the sharded hidden dim -> XLA inserts
    the all-reduce producing tiny replicated head outputs).
    """
    specs: Params = {
        "block_0": [_layer_specs(axis) for _ in range(cfg.trunk_blocks[0])],
        "block_1": [_layer_specs(axis) for _ in range(cfg.trunk_blocks[1])],
        "density": {"w": P(axis, None), "b": P()},
        "color": {"w": P(axis, None), "b": P()},
    }
    if cfg.use_viewdirs:
        specs["block_2"] = [
            _layer_specs(axis) for _ in range(cfg.view_branch_depth)
        ]
    return specs


def mip_param_specs(cfg: MipNeRFConfig, axis: str = MODEL_AXIS) -> Params:
    """PartitionSpec pytree matching ``models/mlp.py::init_mip_mlp``."""
    return {
        "layers": [_layer_specs(axis) for _ in range(cfg.num_hidden_layers)],
        "out": {"w": P(axis, None), "b": P()},
    }


def param_specs_for(model) -> Params:
    cfg = model.cfg
    if isinstance(cfg, ClassicNeRFConfig):
        return classic_param_specs(cfg)
    if isinstance(cfg, MipNeRFConfig):
        return mip_param_specs(cfg)
    raise TypeError(f"no tensor-parallel specs for {type(cfg).__name__}")


def shard_params(params: Params, model, mesh: Mesh) -> Params:
    """Place a parameter pytree with hidden dims sharded over ``model``."""
    specs = param_specs_for(model)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _require_xla_path(model) -> None:
    if getattr(model.cfg, "use_pallas", False):
        raise ValueError(
            "tensor parallelism shards the hidden dim via GSPMD and needs the "
            "pure-XLA MLP path; construct the model with use_pallas=False"
        )


def make_tp_render_rays(
    model,
    render: RenderConfig,
    mesh: Mesh,
) -> Callable[..., Array]:
    """Jitted renderer with params hidden-dim-sharded over ``model`` and rays
    sharded over ``batch`` (if the mesh has one): finest-stage RGB."""
    _require_xla_path(model)
    specs = param_specs_for(model)
    param_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs
    )
    data = NamedSharding(
        mesh, P(BATCH_AXIS) if BATCH_AXIS in mesh.axis_names else P()
    )

    def render_fn(params, rays_o, rays_d):
        out = model.render_rays(params, None, rays_o, rays_d, render)
        return out.rgb[..., -1, :]

    return jax.jit(
        render_fn,
        in_shardings=(param_sh, data, data),
        out_shardings=data,
    )


def make_tp_train_step(
    model,
    optimizer,
    render: RenderConfig,
    mesh: Mesh,
    donate: bool = True,
):
    """Jitted train step with TP-sharded params (+ ray DP over ``batch``).

    The input state MUST be prepared with ``prepare_tp_state`` — the step
    takes its shardings from the input arrays (XLA propagates them through
    the whole graph and inserts the gradient collectives), so a state whose
    params were never ``device_put`` with the TP specs would silently run
    fully replicated.  The optimizer state mirrors the parameter shardings
    (Adam moments stay sharded too — the FSDP-flavored benefit of TP for
    wide configs).
    """
    import optax

    from nerf_tpu.train.loop import make_loss_fn
    from nerf_tpu.train.state import TrainState, fold_key

    _require_xla_path(model)
    loss_fn = make_loss_fn(model, render, 0.0)

    def step(state: TrainState, batch):
        key = fold_key(state)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, batch
        )
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
        return new_state, aux

    # No explicit in/out shardings: they come from the prepare_tp_state'd
    # input arrays (opt_state mirrors params leaf-for-leaf for Adam but has
    # scalar leaves too — propagation gets both right without a hand-built
    # prefix tree).
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def prepare_tp_state(state, model, mesh: Mesh):
    """Shard an existing train state for TP: params + matching Adam moments
    over ``model``, scalars replicated."""
    from nerf_tpu.train.state import TrainState

    specs = param_specs_for(model)

    def put(tree):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree,
            specs,
        )

    repl = NamedSharding(mesh, P())
    params_structure = jax.tree_util.tree_structure(state.params)

    def mirrors_params(n):
        return jax.tree_util.tree_structure(n) == params_structure

    def put_opt(node):
        # optax Adam state: ScaleByAdamState(count, mu, nu) — mu/nu mirror
        # params and get the TP shardings; scalars (count etc.) replicate.
        if mirrors_params(node):
            return put(node)
        return jax.device_put(node, repl)

    opt_state = jax.tree_util.tree_map(
        put_opt, state.opt_state, is_leaf=mirrors_params
    )
    return TrainState(
        step=jax.device_put(state.step, repl),
        params=put(state.params),
        opt_state=opt_state,
        key=jax.device_put(state.key, repl),
    )
