"""NeRF renderers: ray rendering and full-image rendering for both model
generations, as pure-functional JAX with explicit PRNG keys.

TPU-first design notes (vs. the reference ``/root/reference/nerf/model.py``):

* ``render_rays`` is one fused jitted graph per config — sampling, encoding,
  MLP and compositing never round-trip to host (the reference interleaves
  Python).
* ``render_image`` replaces the reference's sequential Python chunk loop
  (``model.py:750-761``) with a static-shape ``lax.map`` over ray tiles:
  rays are padded to a multiple of the tile size, the whole map compiles
  once per (H, W, tile) shape, and tiles can be sharded over a device mesh.
* Randomness (stratified jitter at ``model.py:432``, density noise at
  ``model.py:652-654``) is threaded through explicit keys.

``MipNeRF`` mirrors HEAD semantics (``model.py:596-668``) including the
vestigial stage axis in its outputs; ``ClassicNeRF`` implements the v1.2
generation (SURVEY.md §2.3): near/far stratified coarse sampling, optional
inverse-CDF hierarchical fine sampling, view-conditioned color, optional
latent conditioning (conditional NeRF).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_tpu.config import ClassicNeRFConfig, MipNeRFConfig, RenderConfig
from nerf_tpu.models import mlp as mlp_lib
from nerf_tpu.ops import cameras, compositing, encoding, sampling

Array = jax.Array
Params = Dict[str, Any]


class RenderOutput(NamedTuple):
    """Per-ray render results.

    ``rgb`` carries a stage axis ``[..., num_stages, 3]`` mirroring the
    reference contract (stacked at ``model.py:667``; loss sums stages, eval
    takes the last).  Extras are framework additions.
    """

    rgb: Array
    segmentation: Optional[Array] = None
    depth: Optional[Array] = None
    acc: Optional[Array] = None


def _maybe_add_density_noise(
    key: Optional[jax.Array], density: Array, std: float
) -> Array:
    """Gaussian density-logit noise (reference ``model.py:652-654``)."""
    if std == 0.0 or key is None:
        return density
    return density + jax.random.normal(key, density.shape, density.dtype) * std


# ---------------------------------------------------------------------------
# Classic (v1.2) renderer
# ---------------------------------------------------------------------------


class ClassicNeRF:
    """The v1.2-generation model: classic PE + 8-layer view-conditioned MLP
    with stratified coarse and inverse-CDF fine sampling."""

    def __init__(self, cfg: ClassicNeRFConfig):
        self.cfg = cfg
        # Prefill the eager frequency-scale constants (model construction
        # is always outside jit) so every later consumer — the traced
        # encode paths AND the fused kernels' in-kernel placements — bakes
        # the SAME values (see encoding._SCALES_CACHE).
        encoding.frequency_scales_np(
            cfg.x_positional_encoding_size, cfg.normalize_position
        )
        if cfg.use_viewdirs:
            encoding.frequency_scales_np(
                cfg.d_positional_encoding_size, cfg.direction_bound
            )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return mlp_lib.init_classic_mlp(key, self.cfg, dtype)

    # -- encoders ----------------------------------------------------------

    def encode_position(
        self, x: Array, states_x: Optional[Array] = None
    ) -> Array:
        """Classic frequency encoding of positions (+ optional latent state).

        Latent conditioning appends the per-scene state scalars to the xyz
        scalars before encoding (``density_inputs = 3 + state_dim``,
        reference ``train_conditional_nerf.py:103-104``).
        """
        cfg = self.cfg
        if states_x is not None and states_x.shape[-1] > 0:
            states_x = jnp.broadcast_to(
                states_x, x.shape[:-1] + states_x.shape[-1:]
            )
            x = jnp.concatenate([x, states_x], axis=-1)
        scales = encoding.bbox_frequency_scales(
            cfg.x_positional_encoding_size, cfg.normalize_position, x.dtype
        )
        return encoding.frequency_encoding(x, scales)

    def encode_direction(
        self, d: Array, states_d: Optional[Array] = None
    ) -> Array:
        cfg = self.cfg
        if states_d is not None and states_d.shape[-1] > 0:
            states_d = jnp.broadcast_to(
                states_d, d.shape[:-1] + states_d.shape[-1:]
            )
            d = jnp.concatenate([d, states_d], axis=-1)
        scales = encoding.bbox_frequency_scales(
            cfg.d_positional_encoding_size, cfg.direction_bound, d.dtype
        )
        return encoding.frequency_encoding(d, scales)

    # -- core evaluation ---------------------------------------------------

    def _encode_inputs(
        self,
        rays_o: Array,
        rays_d: Array,
        t_vals: Array,
        states_x: Optional[Array],
        states_d: Optional[Array],
    ) -> Tuple[Array, Array, Optional[Array]]:
        """Sample points + their (position, direction) encodings."""
        points = (
            rays_o[..., None, :] + rays_d[..., None, :] * t_vals[..., :, None]
        )
        x_enc = self.encode_position(
            points,
            None if states_x is None else states_x[..., None, :],
        )
        d_enc = None
        if self.cfg.use_viewdirs:
            # Directions are constant along a ray: encode ONCE per ray and
            # broadcast the result over samples — S x fewer sines (the
            # sine fusion showed up at ~170 us/step in the chip trace).
            per_ray = self.encode_direction(rays_d, states_d)
            d_enc = jnp.broadcast_to(
                per_ray[..., None, :],
                points.shape[:-1] + per_ray.shape[-1:],
            )
        return points, x_enc, d_enc

    def encode_inputs_flat(
        self,
        rays_o: Array,
        rays_d: Array,
        t_vals: Array,
        states_x: Optional[Array] = None,
        states_d: Optional[Array] = None,
    ) -> Tuple[Array, Optional[Array]]:
        """Flat-layout variant of ``_encode_inputs`` for the fused-kernel
        paths: encodes on ``[rays*S, 3]`` rows (writes the kernels'
        row-major layout directly — measured ~+1% when no gradients flow
        through the encodings) with per-ray latents broadcast to the
        per-point rows.  The one shared copy of the latent-widening rule
        consumed by the fused train builders.

        Returns ``(x_enc [rays, S, XE], d_enc [rays, S, DE] or None)``.
        """
        n_rays, s = t_vals.shape[0], t_vals.shape[-1]
        points = (
            rays_o[:, None, :] + rays_d[:, None, :] * t_vals[..., None]
        )

        def flat_states(st):
            if st is None or st.shape[-1] == 0:
                return None
            return jnp.broadcast_to(
                st[:, None, :], (n_rays, s, st.shape[-1])
            ).reshape(-1, st.shape[-1])

        x_enc = self.encode_position(
            points.reshape(-1, 3), flat_states(states_x)
        ).reshape(n_rays, s, -1)
        d_enc = None
        if self.cfg.use_viewdirs:
            # Per-ray encode + broadcast (see _encode_inputs): directions
            # do not vary along the ray.
            per_ray = self.encode_direction(rays_d, states_d)
            d_enc = jnp.broadcast_to(
                per_ray[:, None, :], (n_rays, s, per_ray.shape[-1])
            )
        return x_enc, d_enc

    def forward(
        self,
        params: Params,
        rays_o: Array,
        rays_d: Array,
        t_vals: Array,
        states_x: Optional[Array] = None,
        states_d: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array]:
        """Evaluate density/color at ``o + t*d`` for every sample.

        Returns ``(points [..., S, 3], density [..., S, 1],
        color_logits [..., S, C])``.
        """
        points, x_enc, d_enc = self._encode_inputs(
            rays_o, rays_d, t_vals, states_x, states_d
        )
        if self.cfg.use_pallas:
            from nerf_tpu.ops.pallas import fused_mlp

            if fused_mlp.supports_classic_config(self.cfg):
                # Cast at the ENCODING PRODUCER (the kernel wrapper's own
                # cast becomes a no-op): adjacent to the sine fusion XLA
                # folds the convert in, while at the kernel boundary it
                # materializes a standalone f32->bf16 layout copy plus
                # the full f32 encoding round trip (~15 ms/frame at
                # 400x400x(64+128)).
                dt = jnp.dtype(self.cfg.compute_dtype)
                density, color = fused_mlp.classic_mlp_pallas(
                    params,
                    x_enc.astype(dt),
                    None if d_enc is None else d_enc.astype(dt),
                    compute_dtype=dt,
                )
                return points, density, color
        density, color = mlp_lib.apply_classic_mlp(params, self.cfg, x_enc, d_enc)
        return points, density, color

    def _render_stage(
        self,
        params: Params,
        noise_key: Optional[jax.Array],
        rays_o: Array,
        rays_d: Array,
        t_vals: Array,
        states_x: Optional[Array],
        states_d: Optional[Array],
        density_noise_std: float,
        white_background: bool = False,
    ) -> Tuple[Array, Array, Array, Array, Array]:
        """One coarse or fine pass: evaluate, composite. Returns
        ``(rgb, weights [..., S, 1], depth, noised_density, color)``."""
        points, density, color = self.forward(
            params, rays_o, rays_d, t_vals, states_x, states_d
        )
        density = _maybe_add_density_noise(noise_key, density, density_noise_std)
        weights = compositing.weights_from_density(
            density, compositing.distances_from_tvals(t_vals, rays_d)
        )
        rgb = compositing.composite_rgb_with_background(
            weights, color, 1.0 if white_background else None
        )
        depth = compositing.composite_depth(weights, t_vals)
        return rgb, weights, depth, density, color

    def _use_fused_union(self, render: RenderConfig, rays_o: Array) -> bool:
        """Gate for the fused union-compositing eval kernel: deterministic
        (no density noise — eval renders), reference architecture family
        (with or without the view branch), flat ray batch.  The kernel is
        forward-only (no VJP), so callers additionally opt in via
        ``render_rays(fused_eval=True)`` — ``render_image`` does;
        differentiable paths must not."""
        from nerf_tpu.ops.pallas import fused_mlp

        return (
            self.cfg.use_pallas
            and fused_mlp.supports_classic_config(self.cfg)
            and render.density_noise_std == 0.0
            and rays_o.ndim == 2
        )

    def render_rays(
        self,
        params: Params,
        key: Optional[jax.Array],
        rays_o: Array,
        rays_d: Array,
        render: RenderConfig,
        states_x: Optional[Array] = None,
        states_d: Optional[Array] = None,
        fused_eval: bool = False,
    ) -> RenderOutput:
        """Render a batch of rays: stratified coarse pass plus optional
        inverse-CDF hierarchical fine pass (shared weights across stages, as
        the single unprefixed block set in ``examples/nerf.pth`` implies).

        ``fused_eval=True`` opts eval callers into the forward-only fused
        union-compositing kernel (``_use_fused_union``); training paths that
        differentiate through ``render_rays`` must leave it off.
        """
        if key is not None:
            k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
        else:
            k_strat = k_noise_c = k_pdf = k_noise_f = None

        batch_shape = rays_o.shape[:-1]
        t_coarse = sampling.sample_linear(
            k_strat,
            batch_shape,
            render.num_coarse_samples,
            render.near,
            render.far,
            randomly_sample=render.randomly_sample,
            dtype=rays_o.dtype,
        )
        rgb_c, weights_c, depth_c, density_c, color_c = self._render_stage(
            params, k_noise_c, rays_o, rays_d, t_coarse,
            states_x, states_d, render.density_noise_std,
            render.white_background,
        )

        stages = [rgb_c]
        weights, t_vals, depth = weights_c, t_coarse, depth_c
        acc = None  # None => composite_acc(weights) at return

        if render.num_fine_samples > 0:
            t_mids = 0.5 * (t_coarse[..., 1:] + t_coarse[..., :-1])
            w_bins = jax.lax.stop_gradient(weights_c[..., 1:-1, 0])
            t_fine = sampling.sample_pdf(
                k_pdf,
                t_mids,
                w_bins,
                render.num_fine_samples,
                randomly_sample=render.randomly_sample,
            )
            if (
                fused_eval
                and render.reuse_coarse_in_fine
                and self._use_fused_union(render, rays_o)
            ):
                # Deterministic eval fast path: fine MLP + the order-free
                # union compositing in ONE Pallas kernel
                # (ops/pallas/fused_hier.py::fine_union_eval_pallas) — no
                # [.., S, S] transmittance masks in HBM, no per-point
                # density/color kernel-boundary round trip.  Union interval
                # lengths and the coarse-side quantities are computed
                # IN-KERNEL from the raw coarse outputs.
                from nerf_tpu.ops.pallas import fused_hier

                t_cat = jnp.concatenate([t_coarse, t_fine], axis=-1)
                points_f = (
                    rays_o[..., None, :]
                    + rays_d[..., None, :] * t_fine[..., :, None]
                )
                # Cast to the kernel's compute dtype RIGHT AT the sine
                # producer: left to the kernel wrapper, XLA materializes
                # the convert as a standalone [B*Sf, XE] layout copy
                # (~10 ms/frame at 400x400x128) instead of fusing it
                # into the encoding fusion.
                xf_enc = self.encode_position(
                    points_f,
                    None if states_x is None else states_x[..., None, :],
                ).astype(jnp.dtype(self.cfg.compute_dtype))
                # Per-ray dir encodings: the kernel broadcasts to sample
                # rows itself (directions are constant along a ray).
                df_ray = (
                    self.encode_direction(rays_d, states_d)
                    if self.cfg.use_viewdirs else None
                )
                rgb_f, depth_f, acc_f = fused_hier.fine_union_eval_pallas(
                    params,
                    xf_enc,
                    df_ray,
                    t_coarse,
                    t_fine,
                    density_c,
                    color_c,
                    jnp.linalg.norm(rays_d, axis=-1),
                    compute_dtype=jnp.dtype(self.cfg.compute_dtype),
                )
                if render.white_background:
                    rgb_f = rgb_f + (1.0 - acc_f[..., None])
                acc = acc_f
                t_all = t_cat
                weights_f = None
            elif render.reuse_coarse_in_fine:
                # Disjoint-stage fine pass: the network runs only on the
                # NEW fine samples; the coarse evaluations (density noise
                # included) are reused, and the union is composited
                # order-free — no sort/permutation of MLP outputs.
                _, density_f, color_f = self.forward(
                    params, rays_o, rays_d, t_fine, states_x, states_d
                )
                density_f = _maybe_add_density_noise(
                    k_noise_f, density_f, render.density_noise_std
                )
                t_cat = jnp.concatenate([t_coarse, t_fine], axis=-1)
                col_cat = jnp.concatenate([color_c, color_f], axis=-2)
                weights_f = compositing.weights_from_union_sorted(
                    density_c, density_f, t_coarse, t_fine, rays_d
                )
                rgb_f = compositing.composite_rgb_with_background(
                    weights_f,
                    col_cat,
                    1.0 if render.white_background else None,
                )
                depth_f = compositing.composite_depth(weights_f, t_cat)
                t_all = t_cat
            else:
                # NeRF-paper formulation: re-evaluate the full merged,
                # sorted sample set.
                t_all = sampling.merge_samples(t_coarse, t_fine)
                rgb_f, weights_f, depth_f, _, _ = self._render_stage(
                    params, k_noise_f, rays_o, rays_d, t_all,
                    states_x, states_d, render.density_noise_std,
                    render.white_background,
                )
            stages.append(rgb_f)
            weights, t_vals, depth = weights_f, t_all, depth_f

        if acc is None:
            acc = compositing.composite_acc(weights)
        return RenderOutput(
            rgb=jnp.stack(stages, axis=-2),
            depth=depth,
            acc=acc,
        )

    def render_image(
        self,
        params: Params,
        key: Optional[jax.Array],
        camera_o: Array,
        camera_r: Array,
        image_h: int,
        image_w: int,
        focal_length: float,
        render: RenderConfig,
        states_x: Optional[Array] = None,
        states_d: Optional[Array] = None,
    ) -> Array:
        """Render full images ``[B, H, W, C]``, tiled on-chip via ``lax.map``.

        Replaces the reference's host-side chunk loop (``model.py:750-761``)
        — the finest stage per ray is kept, matching ``x[:, -1]`` at
        ``model.py:757``.
        """
        def per_tile(args):
            tile_o, tile_d, tile_sx, tile_sd, tile_key = args
            out = self.render_rays(
                params, tile_key, tile_o, tile_d, render, tile_sx, tile_sd,
                fused_eval=True,
            )
            return out.rgb[..., -1, :]

        rgb = _tiled_over_rays(
            per_tile,
            key,
            camera_o,
            camera_r,
            image_h,
            image_w,
            focal_length,
            render.rays_per_tile,
            self.cfg.color_outputs,
            states_x,
            states_d,
            use_ndc=render.use_ndc,
        )
        return rgb


# ---------------------------------------------------------------------------
# Mip (HEAD) renderer
# ---------------------------------------------------------------------------


class MipNeRF:
    """The HEAD-generation model: IPE cone casting, log-spaced bbox sampling,
    density + RGB + segmentation heads (reference ``model.py:471-668``)."""

    def __init__(self, cfg: MipNeRFConfig):
        self.cfg = cfg

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return mlp_lib.init_mip_mlp(key, self.cfg, dtype)

    def integrated_pe(
        self, rays_o: Array, rays_d: Array, t_vals: Array
    ) -> Tuple[Array, Array, Array]:
        """Cone-cast + IPE featurize (reference ``model.py:544-551``)."""
        cfg = self.cfg
        r_dot = 1.0 / (math.sqrt(3.0) * cfg.focal_length)
        means, covs = encoding.cast_rays(
            t_vals, rays_o, rays_d, r_dot, cfg.ray_shape
        )
        features = encoding.integrated_pos_enc(
            means, covs, cfg.min_deg, cfg.max_deg
        )
        return means, covs, features

    def forward(
        self,
        params: Params,
        rays_o: Array,
        rays_d: Array,
        t_vals: Array,
        states_x: Optional[Array] = None,
        states_d: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array, Array]:
        """Mirror of reference ``NeRF.forward`` (``model.py:553-594``):
        S fencepost t-values produce S-1 interval Gaussians.  ``states_*``
        are accepted and ignored, matching HEAD behavior.
        """
        del states_x, states_d
        means, _, features = self.integrated_pe(rays_o, rays_d, t_vals)
        if self.cfg.use_pallas:
            from nerf_tpu.ops.pallas import fused_mip_mlp

            if fused_mip_mlp.supports_mip_config(self.cfg):
                density, color, segmentation = fused_mip_mlp.mip_mlp_pallas(
                    params,
                    features,
                    self.cfg.num_hidden_layers,
                    self.cfg.color_outputs,
                    compute_dtype=jnp.dtype(self.cfg.compute_dtype),
                )
                return means, density, color, segmentation
        density, color, segmentation = mlp_lib.apply_mip_mlp(
            params, self.cfg, features
        )
        return means, density, color, segmentation

    def _use_fused_eval(self, render: RenderConfig, rays_o: Array) -> bool:
        """Gate for the forward-only fused eval kernel (MLP + compositing
        + seg composite in one call): deterministic renders, flat ray
        batch.  Callers opt in via ``render_rays(fused_eval=True)`` —
        ``render_image`` does; differentiable paths must not (no VJP)."""
        from nerf_tpu.ops.pallas import fused_mip_mlp

        return (
            self.cfg.use_pallas
            and fused_mip_mlp.supports_mip_config(self.cfg)
            and render.density_noise_std == 0.0
            and rays_o.ndim == 2
        )

    def render_rays(
        self,
        params: Params,
        key: Optional[jax.Array],
        rays_o: Array,
        rays_d: Array,
        render: RenderConfig,
        states_x: Optional[Array] = None,
        states_d: Optional[Array] = None,
        fused_eval: bool = False,
    ) -> RenderOutput:
        """Mirror of reference ``NeRF.render_rays`` (``model.py:596-668``),
        including the single-entry stage axis on rgb/segmentation outputs."""
        if key is not None:
            k_strat, k_noise = jax.random.split(key)
        else:
            k_strat = k_noise = None

        t_vals = sampling.sample_log_bbox(
            k_strat,
            rays_o.shape[:-1],
            render.num_coarse_samples,
            self.cfg.bbox_diagonal,
            randomly_sample=render.randomly_sample,
            dtype=rays_o.dtype,
        )
        if fused_eval and self._use_fused_eval(render, rays_o):
            # Forward-only fused path: MLP + compositing + the log-space
            # seg composite in ONE kernel (ops/pallas/fused_mip_train.py)
            # — no [points, 54] head-output round trip through HBM.
            from nerf_tpu.ops.pallas import fused_mip_train

            del states_x, states_d  # accepted and ignored (HEAD behavior)
            means, _, features = self.integrated_pe(rays_o, rays_d, t_vals)
            t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
            rgb, seg, depth, acc = fused_mip_train.mip_eval_pallas(
                params,
                features,
                compositing.distances_from_points(means),
                t_mids,
                None,
                self.cfg.num_hidden_layers,
                color_outputs=self.cfg.color_outputs,
                white_background=render.white_background,
                compute_dtype=jnp.dtype(self.cfg.compute_dtype),
            )
            return RenderOutput(
                rgb=rgb[..., None, :],
                segmentation=seg[..., None, :],
                depth=depth,
                acc=acc,
            )
        points, density, color, segmentation = self.forward(
            params, rays_o, rays_d, t_vals, states_x, states_d
        )
        density = _maybe_add_density_noise(
            k_noise, density, render.density_noise_std
        )
        weights = compositing.compositing_weights(points, density)
        rgb = compositing.composite_rgb_with_background(
            weights, color, 1.0 if render.white_background else None
        )
        seg = compositing.composite_segmentation(weights, segmentation)
        # Interval midpoints give the depth estimate for the S-1 intervals.
        t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        return RenderOutput(
            rgb=rgb[..., None, :],
            segmentation=seg[..., None, :],
            depth=compositing.composite_depth(weights, t_mids),
            acc=compositing.composite_acc(weights),
        )

    def render_image(
        self,
        params: Params,
        key: Optional[jax.Array],
        camera_o: Array,
        camera_r: Array,
        image_h: int,
        image_w: int,
        focal_length: float,
        render: RenderConfig,
        states_x: Optional[Array] = None,
        states_d: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """Full-image render: ``([B,H,W,3], [B,H,W,num_classes])``.

        Mirrors reference ``model.py:670-770`` but tiled under ``jit``.
        """
        cfg = self.cfg

        def per_tile(args):
            tile_o, tile_d, tile_sx, tile_sd, tile_key = args
            out = self.render_rays(
                params, tile_key, tile_o, tile_d, render, tile_sx, tile_sd,
                fused_eval=True,
            )
            return jnp.concatenate(
                [out.rgb[..., -1, :], out.segmentation[..., -1, :]], axis=-1
            )

        both = _tiled_over_rays(
            per_tile,
            key,
            camera_o,
            camera_r,
            image_h,
            image_w,
            focal_length,
            render.rays_per_tile,
            cfg.color_outputs + cfg.segmentation_outputs,
            states_x,
            states_d,
        )
        return both[..., : cfg.color_outputs], both[..., cfg.color_outputs :]


# ---------------------------------------------------------------------------
# Shared full-image tiling
# ---------------------------------------------------------------------------


def _tiled_over_rays(
    per_tile_fn,
    key: Optional[jax.Array],
    camera_o: Array,
    camera_r: Array,
    image_h: int,
    image_w: int,
    focal_length: float,
    rays_per_tile: int,
    out_channels: int,
    states_x: Optional[Array],
    states_d: Optional[Array],
    use_ndc: bool = False,
) -> Array:
    """Generate the world-space ray grid, pad rays to a tile multiple, and
    ``lax.map`` the per-tile renderer over static-shape tiles.

    This is the TPU replacement for the reference's Python list-comprehension
    chunking (``model.py:750-761``): one compiled graph, sequential tiles
    bound VMEM/HBM footprint, and per-tile PRNG keys keep stochastic renders
    reproducible.
    """
    rays_o, rays_d = cameras.pose_to_rays(
        camera_o, camera_r, image_h, image_w, focal_length
    )
    if use_ndc:
        rays_o, rays_d = cameras.ndc_rays(
            rays_o, rays_d, image_h, image_w, focal_length
        )
    batch = rays_o.shape[0]
    n_rays = batch * image_h * image_w
    rays_o = rays_o.reshape(n_rays, 3)
    rays_d = rays_d.reshape(n_rays, 3)

    def expand_states(states):
        if states is None:
            return None
        states = jnp.broadcast_to(
            states[:, None, :], (batch, image_h * image_w, states.shape[-1])
        )
        return states.reshape(n_rays, states.shape[-1])

    states_x = expand_states(states_x)
    states_d = expand_states(states_d)

    # Small images never pad past their own (16-aligned) ray count — a
    # 16x16 render must not become one 4000-ray tile.
    rays_per_tile = min(rays_per_tile, max(16, -(-n_rays // 16) * 16))
    num_tiles = max(1, -(-n_rays // rays_per_tile))
    padded = num_tiles * rays_per_tile
    pad = padded - n_rays

    def pad_rays(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    tiles_o = pad_rays(rays_o).reshape(num_tiles, rays_per_tile, 3)
    tiles_d = pad_rays(rays_d).reshape(num_tiles, rays_per_tile, 3)
    tiles_sx = (
        pad_rays(states_x).reshape(num_tiles, rays_per_tile, -1)
        if states_x is not None
        else jnp.zeros((num_tiles, rays_per_tile, 0), rays_o.dtype)
    )
    tiles_sd = (
        pad_rays(states_d).reshape(num_tiles, rays_per_tile, -1)
        if states_d is not None
        else jnp.zeros((num_tiles, rays_per_tile, 0), rays_o.dtype)
    )
    if key is not None:
        tile_keys = jax.random.split(key, num_tiles)
    else:
        # lax.map needs a concrete array; renderers ignore it when the
        # render config is deterministic.
        tile_keys = jnp.zeros((num_tiles, 2), dtype=jnp.uint32)

    def tile_fn(args):
        tile_o, tile_d, tile_sx, tile_sd, raw_key = args
        tile_key = (
            jax.random.wrap_key_data(raw_key.astype(jnp.uint32), impl="threefry2x32")
            if key is not None
            else None
        )
        sx = tile_sx if tile_sx.shape[-1] > 0 else None
        sd = tile_sd if tile_sd.shape[-1] > 0 else None
        return per_tile_fn((tile_o, tile_d, sx, sd, tile_key))

    if key is not None:
        tile_keys = jax.random.key_data(tile_keys)

    out = jax.lax.map(
        tile_fn, (tiles_o, tiles_d, tiles_sx, tiles_sd, tile_keys)
    )
    out = out.reshape(padded, out_channels)[:n_rays]
    return out.reshape(batch, image_h, image_w, out_channels)
