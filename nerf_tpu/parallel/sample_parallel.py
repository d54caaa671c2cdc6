"""Sequence parallelism: shard the samples-per-ray axis across the mesh.

The reference's only long-sequence mechanism is a host-side Python chunk
loop over rays (``/root/reference/nerf/model.py:750-761``).  Its NeRF
analogue of "sequence length" is rays x samples/ray (SURVEY.md §2.2), and
this module is the TPU-native sequence-parallel decomposition of that axis:
a 2-D ``(batch, sample)`` mesh where each chip evaluates the encoder + MLP
for only its slice of the samples along every ray it owns, and the
volume-rendering integral is completed with two cheap collectives:

1. **Transmittance hand-off**: transmittance at sample ``i`` is
   ``prod_{j<i}(alpha_j + 1e-10)``.  Each shard forms its local exclusive
   cumulative product, ``all_gather``s one scalar per ray (its shard's total
   product), and scales by the product of all earlier shards — the
   associative-prefix decomposition of the compositing scan across chips.
2. **Pixel reduction**: per-shard partial sums of ``w * sigmoid(c)`` (and
   depth / opacity) are combined with ``psum`` over the ``sample`` axis.

These collectives move O(rays) scalars while the O(rays x samples) MLP work
stays fully sharded, so the sample axis scales like a sequence-parallel
transformer (per-token work sharded, per-sequence reductions collective).

The hierarchical fine stage stays sample-parallel too, in BOTH
formulations:

* re-evaluate (``reuse_coarse_in_fine=False``): the COARSE stage
  ``all_gather``s its per-sample weight vector (O(rays x coarse_samples)
  floats — needed as the resampler's input), every shard runs the
  (deterministic, shared-key) inverse-CDF resampler on the full weight
  vector, and each shard evaluates only its slice of the merged
  coarse+fine sample list;
* disjoint-stage reuse (``reuse_coarse_in_fine=True``, the default): the
  coarse stage ``all_gather``s its raw (noised) density + color logits
  instead, the fine MLP runs only on each shard's slice of the NEW fine
  samples, and the order-free union composite completes with the same
  cross-shard machinery — the fine-block transmittance prefix hands off
  via per-shard log-alpha totals (O(rays)), and the fine-before-coarse
  cross terms are one ``psum`` of an O(rays x coarse_samples) partial.

Supports ``ClassicNeRF`` (the flagship).  ``MipNeRF`` renders S-1 intervals
from S fenceposts with 64 intervals at HEAD — too shallow for the sample
axis to be worth sharding; it uses the data-parallel path instead.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_tpu.config import RenderConfig
from nerf_tpu.ops import compositing, cumulative, sampling
from nerf_tpu.parallel.mesh import BATCH_AXIS, SAMPLE_AXIS
from nerf_tpu.train.state import TrainState, fold_key

Array = jax.Array


def _local_slice(x: Array, axis_name: str, num_shards: int, axis: int) -> Array:
    """Slice this shard's chunk of ``x`` along ``axis`` (static size)."""
    size = x.shape[axis]
    if size % num_shards:
        raise ValueError(
            f"sample count {size} not divisible by {num_shards} sample shards"
        )
    loc = size // num_shards
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(x, idx * loc, loc, axis=axis)


def _sharded_stage(
    model,
    params,
    noise_key: Optional[jax.Array],
    rays_o: Array,
    rays_d: Array,
    t_full: Array,
    states_x: Optional[Array],
    states_d: Optional[Array],
    density_noise_std: float,
    num_shards: int,
    gather_weights: bool = False,
    gather_raw: bool = False,
) -> Tuple[Array, Optional[Any], Array, Array]:
    """One compositing stage with the sample axis sharded over ``SAMPLE_AXIS``.

    ``t_full`` is the full per-ray fencepost vector (replicated along the
    sample mesh axis); the expensive encoder+MLP runs only on this shard's
    slice.  Returns ``(rgb, gathered, depth, acc)`` where ``rgb``/``depth``/
    ``acc`` are complete (post-``psum``) and ``gathered`` is the
    all-gathered per-sample weight vector (``gather_weights=True``; the
    re-evaluate resampler's input) or the all-gathered ``(noised_density,
    color_logits)`` pair (``gather_raw=True``; the reuse-formulation union
    consumes the raw coarse outputs) — fine stages skip the gather.
    """
    t_loc = _local_slice(t_full, SAMPLE_AXIS, num_shards, axis=-1)
    _, density, color = model.forward(
        params, rays_o, rays_d, t_loc, states_x, states_d
    )
    if noise_key is not None and density_noise_std > 0.0:
        noise_key = jax.random.fold_in(
            noise_key, jax.lax.axis_index(SAMPLE_AXIS)
        )
        density = density + density_noise_std * jax.random.normal(
            noise_key, density.shape, density.dtype
        )

    # Interval lengths come from the full fencepost vector so the shard
    # boundary intervals are exact (the 1e10 far pad lands on the last shard).
    dists_loc = _local_slice(
        compositing.distances_from_tvals(t_full, rays_d),
        SAMPLE_AXIS,
        num_shards,
        axis=-2,
    )
    alpha = jnp.exp(-jax.nn.relu(density) * dists_loc)
    a_eps = alpha + 1e-10
    # Local inclusive product ladder; its last entry is this shard's total.
    incl = cumulative.cumprod(a_eps, axis=-2)
    excl = jnp.concatenate(
        [jnp.ones_like(incl[..., :1, :]), incl[..., :-1, :]], axis=-2
    )
    shard_total = incl[..., -1, :]  # [rays, 1]
    totals = jax.lax.all_gather(shard_total, SAMPLE_AXIS)  # [P, rays, 1]
    idx = jax.lax.axis_index(SAMPLE_AXIS)
    mask = (jnp.arange(num_shards) < idx)[:, None, None]
    carry_in = jnp.prod(jnp.where(mask, totals, 1.0), axis=0)  # [rays, 1]
    weights = (1.0 - alpha) * (carry_in[..., None, :] * excl)

    rgb = jax.lax.psum(
        jnp.sum(weights * jax.nn.sigmoid(color), axis=-2), SAMPLE_AXIS
    )
    depth = jax.lax.psum(
        jnp.sum(weights[..., 0] * t_loc, axis=-1), SAMPLE_AXIS
    )
    acc = jax.lax.psum(jnp.sum(weights[..., 0], axis=-1), SAMPLE_AXIS)
    gathered = None
    if gather_weights:
        gathered = jax.lax.all_gather(
            weights, SAMPLE_AXIS, axis=len(weights.shape) - 2, tiled=True
        )
    elif gather_raw:
        gathered = tuple(
            jax.lax.all_gather(
                x, SAMPLE_AXIS, axis=len(x.shape) - 2, tiled=True
            )
            for x in (density, color)
        )
    return rgb, gathered, depth, acc


def _sharded_reuse_fine_stage(
    model,
    params,
    noise_key: Optional[jax.Array],
    rays_o: Array,
    rays_d: Array,
    t_coarse: Array,
    dens_c_full: Array,
    col_c_full: Array,
    t_fine: Array,
    states_x: Optional[Array],
    states_d: Optional[Array],
    density_noise_std: float,
    num_shards: int,
) -> Tuple[Array, Array, Array]:
    """Disjoint-stage fine pass with the FINE sample axis sharded.

    Mirrors the single-device reuse branch (``models/nerf.py``): the MLP
    runs only on this shard's slice of the new fine samples; the coarse
    block's (noised) density/color arrive all-gathered and replicated.
    The order-free union composite completes with two collectives:

    * the fine-block transmittance prefix hands off across shards via
      per-shard log-alpha totals (``all_gather`` of O(rays) scalars — the
      same associative-prefix decomposition as ``_sharded_stage``);
    * the fine-before-coarse cross terms (``sum of fine log-alphas with
      t_f < t_c``) are per-shard partials combined with one ``psum`` of
      an O(rays x Sc) tensor.

    The coarse block's direct contribution to rgb/depth/acc is added on
    shard 0 only (it is replicated), so the final ``psum`` counts it once.
    Returns complete ``(rgb, depth, acc)``.
    """
    # Replicated coarse-side quantities under the UNION total order.
    dist_c_u, dist_f_u = compositing.union_dists_sorted(
        t_coarse, t_fine, rays_d
    )
    alpha_c = jnp.exp(
        -jax.nn.relu(dens_c_full[..., 0]) * dist_c_u[..., 0]
    )  # [rays, Sc]
    log_ac = jnp.log(alpha_c + 1e-10)
    pref_own = cumulative.cumsum(log_ac, axis=-1) - log_ac  # exclusive
    sig_c = jax.nn.sigmoid(col_c_full)

    # Local fine slice: MLP + noise (same scheme as _sharded_stage).
    t_f_loc = _local_slice(t_fine, SAMPLE_AXIS, num_shards, axis=-1)
    _, dens_f, col_f = model.forward(
        params, rays_o, rays_d, t_f_loc, states_x, states_d
    )
    if noise_key is not None and density_noise_std > 0.0:
        noise_key = jax.random.fold_in(
            noise_key, jax.lax.axis_index(SAMPLE_AXIS)
        )
        dens_f = dens_f + density_noise_std * jax.random.normal(
            noise_key, dens_f.shape, dens_f.dtype
        )
    dist_f_loc = _local_slice(dist_f_u, SAMPLE_AXIS, num_shards, axis=-2)
    alpha_f = jnp.exp(-jax.nn.relu(dens_f) * dist_f_loc)  # [rays, Sf/P, 1]
    log_af = jnp.log(alpha_f + 1e-10)

    # Cross-shard fine-block exclusive prefix (log-space hand-off).
    incl = cumulative.cumsum(log_af, axis=-2)
    excl = incl - log_af
    shard_total = incl[..., -1, :]  # [rays, 1]
    totals = jax.lax.all_gather(shard_total, SAMPLE_AXIS)  # [P, rays, 1]
    idx = jax.lax.axis_index(SAMPLE_AXIS)
    mask = (jnp.arange(num_shards) < idx)[:, None, None]
    carry_in = jnp.sum(jnp.where(mask, totals, 0.0), axis=0)  # [rays, 1]
    pref_f = excl + carry_in[..., None, :]

    # Coarse log-alphas before each local fine sample (coarse ties sort
    # BEFORE fine — the concatenated (t, index) order).
    before_c = t_coarse[..., None, :] <= t_f_loc[..., :, None]
    cross_c = jnp.sum(
        jnp.where(before_c, log_ac[..., None, :], 0.0), axis=-1
    )  # [rays, Sf/P]
    w_f = (1.0 - alpha_f) * jnp.exp(cross_c[..., None] + pref_f)

    # Fine log-alphas strictly before each coarse sample: local partial,
    # completed with one psum over the sample shards.
    before_f = t_f_loc[..., None, :] < t_coarse[..., :, None]
    cross_f = jax.lax.psum(
        jnp.sum(
            jnp.where(before_f, log_af[..., None, :, 0], 0.0), axis=-1
        ),
        SAMPLE_AXIS,
    )  # [rays, Sc]
    w_c = (1.0 - alpha_c) * jnp.exp(pref_own + cross_f)

    first = (idx == 0).astype(w_c.dtype)
    coarse_rgb = jnp.sum(w_c[..., None] * sig_c, axis=-2)
    rgb = jax.lax.psum(
        jnp.sum(w_f * jax.nn.sigmoid(col_f), axis=-2) + first * coarse_rgb,
        SAMPLE_AXIS,
    )
    depth = jax.lax.psum(
        jnp.sum(w_f[..., 0] * t_f_loc, axis=-1)
        + first * jnp.sum(w_c * t_coarse, axis=-1),
        SAMPLE_AXIS,
    )
    acc = jax.lax.psum(
        jnp.sum(w_f[..., 0], axis=-1) + first * jnp.sum(w_c, axis=-1),
        SAMPLE_AXIS,
    )
    return rgb, depth, acc


def _render_rays_sample_parallel(
    model,
    params,
    key: Optional[jax.Array],
    rays_o: Array,
    rays_d: Array,
    render: RenderConfig,
    states_x: Optional[Array],
    states_d: Optional[Array],
    num_shards: int,
) -> Tuple[Array, Array, Array]:
    """Coarse (+ optional hierarchical fine) rendering, sample-sharded.

    Semantics mirror ``ClassicNeRF.render_rays`` (stratified coarse pass,
    stop-gradient coarse weights into the inverse-CDF fine pass, shared
    parameters across stages); returns ``(rgb_stages, depth, acc)`` with the
    same ``[rays, stages, 3]`` stage axis.
    """
    if key is not None:
        k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
    else:
        k_strat = k_noise_c = k_pdf = k_noise_f = None

    batch_shape = rays_o.shape[:-1]
    # Fenceposts are one scalar per sample per ray: generated replicated
    # along the sample axis (same key on every shard) so each shard can
    # slice its chunk consistently.
    t_coarse = sampling.sample_linear(
        k_strat,
        batch_shape,
        render.num_coarse_samples,
        render.near,
        render.far,
        randomly_sample=render.randomly_sample,
        dtype=rays_o.dtype,
    )
    hierarchical = render.num_fine_samples > 0
    reuse = hierarchical and render.reuse_coarse_in_fine
    rgb_c, gathered, depth, acc = _sharded_stage(
        model, params, k_noise_c, rays_o, rays_d, t_coarse,
        states_x, states_d, render.density_noise_std, num_shards,
        gather_weights=hierarchical and not reuse,
        gather_raw=reuse,
    )
    if render.white_background:
        rgb_c = rgb_c + (1.0 - acc[..., None])

    stages = [rgb_c]
    if hierarchical:
        t_mids = 0.5 * (t_coarse[..., 1:] + t_coarse[..., :-1])
        if reuse:
            dens_full, col_full = gathered
            w_full = compositing.weights_from_density(
                dens_full,
                compositing.distances_from_tvals(t_coarse, rays_d),
            )
        else:
            w_full = gathered
        w_bins = jax.lax.stop_gradient(w_full[..., 1:-1, 0])
        # Same key on every sample shard -> identical fine fenceposts; the
        # resampler itself is O(rays x samples) scalar work, cheap to
        # replicate relative to the sharded MLP evaluation.
        t_fine = sampling.sample_pdf(
            k_pdf,
            t_mids,
            w_bins,
            render.num_fine_samples,
            randomly_sample=render.randomly_sample,
        )
        if reuse:
            rgb_f, depth, acc = _sharded_reuse_fine_stage(
                model, params, k_noise_f, rays_o, rays_d, t_coarse,
                dens_full, col_full, t_fine, states_x, states_d,
                render.density_noise_std, num_shards,
            )
        else:
            t_all = sampling.merge_samples(t_coarse, t_fine)
            rgb_f, _, depth, acc = _sharded_stage(
                model, params, k_noise_f, rays_o, rays_d, t_all,
                states_x, states_d, render.density_noise_std, num_shards,
            )
        if render.white_background:
            rgb_f = rgb_f + (1.0 - acc[..., None])
        stages.append(rgb_f)

    return jnp.stack(stages, axis=-2), depth, acc


def _check_render(render: RenderConfig) -> None:
    del render  # both hierarchical formulations are supported


def make_sample_parallel_render(
    model,
    render: RenderConfig,
    mesh: Mesh,
) -> Callable[..., Array]:
    """Jitted sample-parallel ray renderer over a ``(batch, sample)`` mesh.

    Rays are sharded over ``batch``, the per-ray sample axis is sharded over
    ``sample``, parameters are replicated.  Returns the finest-stage RGB
    ``[rays, 3]``; numerically equals the single-device
    ``ClassicNeRF.render_rays`` up to compositing-product reassociation.
    """
    if SAMPLE_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh must carry a '{SAMPLE_AXIS}' axis: {mesh}")
    _check_render(render)
    num_shards = mesh.shape[SAMPLE_AXIS]

    def local_fn(params, rays_o, rays_d):
        rgb_stages, _, _ = _render_rays_sample_parallel(
            model, params, None, rays_o, rays_d, render, None, None,
            num_shards,
        )
        return rgb_stages[..., -1, :]

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(BATCH_AXIS), P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS),
        check_vma=False,
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.jit(
        sharded, in_shardings=(repl, data, data), out_shardings=data
    )


def make_sample_parallel_train_step(
    model,
    optimizer: optax.GradientTransformation,
    render: RenderConfig,
    mesh: Mesh,
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, Array]], Tuple[TrainState, Dict]]:
    """Jitted 2-D-parallel train step: rays over ``batch``, samples over
    ``sample``, state replicated.

    Gradients are ``psum``med over the sample axis (each shard contributes
    the gradient of its sample slice) and ``pmean``ed over the batch axis —
    the same per-update numerics as the single-device step (batch-mean MSE).
    """
    _check_render(render)
    num_shards = mesh.shape[SAMPLE_AXIS]

    def local_loss(params, key, batch):
        if key is not None:
            # Decorrelate stochastic sampling between ray shards, but NOT
            # between sample shards (every sample shard must draw the same
            # fenceposts for its slice of each ray to line up).
            key = jax.random.fold_in(key, jax.lax.axis_index(BATCH_AXIS))
        rgb_stages, _, _ = _render_rays_sample_parallel(
            model, params, key,
            batch["rays_o"], batch["rays_d"], render,
            batch.get("states_x"), batch.get("states_d"),
            num_shards,
        )
        # Stage-broadcast MSE, identical to train.loop.make_loss_fn (the
        # reference broadcast at train_conditional_nerf.py:132).
        err = rgb_stages - batch["pixels"][..., None, :]
        return jnp.mean(err**2)

    def local_value_and_grad(params, key, batch):
        loss, grads = jax.value_and_grad(local_loss)(params, key, batch)
        grads = jax.lax.psum(grads, SAMPLE_AXIS)
        grads = jax.lax.pmean(grads, BATCH_AXIS)
        loss = jax.lax.pmean(loss, BATCH_AXIS)
        return grads, {"loss": loss}

    sharded_vag = jax.shard_map(
        local_value_and_grad,
        mesh=mesh,
        in_specs=(P(), P(), P(BATCH_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(state: TrainState, batch: Dict[str, Array]):
        key = fold_key(state)
        grads, aux = sharded_vag(state.params, key, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                key=state.key,
            ),
            aux,
        )

    from nerf_tpu.parallel.train import _state_shape_token

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(BATCH_AXIS))
    state_sh = jax.tree_util.tree_map(lambda _: repl, _state_shape_token())
    return jax.jit(
        step,
        in_shardings=(state_sh, data),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )
