"""Reconstructed torch v1.2 classic-NeRF — the executable oracle the
reference lost.

The v1.2 generation's source is gone from the reference working tree
(``/root/reference/nerf/model.py:191-193`` keeps only docstrings); this
module rebuilds it IN PYTORCH from the specification pinned by the
shipped checkpoint and the stale call sites (SURVEY.md §2.3):

* trunk: two blocks of 4 x (Linear -> ReLU -> LayerNorm) with a
  positional-encoding skip concat into block 1 (``examples/nerf.pth``
  tensor names/shapes — ``block_0.0.weight (256, 60)``,
  ``block_1.0.weight (256, 316)``);
* density head off the trunk; 2-layer view-conditioned color branch
  (``block_2.0.weight (256, 292)``);
* classic sin/cos frequency encoding with the bbox-derived base frequency
  (reference ``model.py:216-240``, minus the dead amplitude);
* linear stratified sampling between explicit near/far planes (notebook
  cell 8 call site) and inverse-CDF hierarchical fine sampling built from
  the NeRF paper's spec (the reference docstring contract);
* compositing per ``model.py:437-469``: 1e10 far pad,
  ``alpha = exp(-relu(sigma) * dist)``, shifted ``cumprod(alpha + 1e-10)``
  transmittance, sigmoid colors.

The module's ``state_dict`` keys intentionally match ``nerf.pth`` 1:1, so
``load_state_dict(torch.load('nerf.pth'))`` works directly.  It serves
three roles (VERDICT round-1 items 2 and 6):

1. the classic generation's value/GRADIENT oracle — torch autograd over an
   independent implementation (sequential ``cumprod``, sorted hierarchical
   merge with gathers — exactly the constructs the TPU path re-designed
   away) cross-checks the JAX path's math;
2. validation that ``utils/pth_import`` maps checkpoints faithfully in
   both directions;
3. the apples-to-apples quality baseline: train THIS model and the TPU
   framework on the same synthetic scene, compare PSNR at equal steps.
"""

from __future__ import annotations

import math

import torch
from torch import nn


def frequency_scales(size: int, bound: float) -> torch.Tensor:
    """Mirror of reference ``model.py:216-224``: lowest frequency
    ``pi / (2 * bound)``, octaves above it, ``size // 2`` frequencies."""
    start = -math.log2(bound)
    exponents = torch.linspace(start, start + size / 2.0 - 1.0, size // 2)
    return torch.pow(torch.tensor(2.0), exponents) * (math.pi / 2.0)


def positional_encoding(x: torch.Tensor, scales: torch.Tensor) -> torch.Tensor:
    """Per-scalar ``[sin(x f_0..f_{L-1}), cos(x f_0..f_{L-1})]`` blocks,
    concatenated over the last axis (reference ``model.py:226-240``)."""
    xf = x[..., :, None] * scales  # [..., D, L]
    emb = torch.cat([torch.sin(xf), torch.cos(xf)], dim=-1)  # [..., D, 2L]
    return emb.reshape(*emb.shape[:-2], -1)


def _mlp_block(in_dim: int, hidden: int, depth: int) -> nn.Sequential:
    """(Linear -> ReLU -> LayerNorm) x depth — Linears land at Sequential
    indices 0,3,6,9 and LayerNorms at 2,5,8,11, matching the checkpoint."""
    layers = []
    for i in range(depth):
        layers += [
            nn.Linear(in_dim if i == 0 else hidden, hidden),
            nn.ReLU(),
            nn.LayerNorm(hidden),
        ]
    return nn.Sequential(*layers)


class TorchClassicNeRF(nn.Module):
    """The reconstructed v1.2 ``NeRF`` module (state_dict-compatible with
    ``examples/nerf.pth``)."""

    def __init__(
        self,
        hidden_size: int = 256,
        x_positional_encoding_size: int = 20,
        d_positional_encoding_size: int = 12,
        normalize_position: float = 6.0,
        density_inputs: int = 3,
        color_inputs: int = 3,
        use_viewdirs: bool = True,
    ):
        super().__init__()
        self.use_viewdirs = use_viewdirs
        xe = density_inputs * x_positional_encoding_size
        de = color_inputs * d_positional_encoding_size
        # persistent=False: the shipped checkpoint has no buffer entries.
        self.register_buffer(
            "x_scales",
            frequency_scales(x_positional_encoding_size, normalize_position),
            persistent=False,
        )
        self.register_buffer(
            "d_scales",
            frequency_scales(d_positional_encoding_size, normalize_position),
            persistent=False,
        )
        self.block_0 = _mlp_block(xe, hidden_size, 4)
        self.block_1 = _mlp_block(hidden_size + xe, hidden_size, 4)
        self.density = nn.Linear(hidden_size, 1)
        if use_viewdirs:
            self.block_2 = _mlp_block(hidden_size + de, hidden_size, 2)
        self.color = nn.Linear(hidden_size, 3)

    # -- core evaluation ---------------------------------------------------

    def forward(self, rays_o, rays_d, t_vals, states_x=None, states_d=None):
        """Density/color logits at ``o + t*d``; latent states are appended
        to the raw scalars BEFORE encoding (``train_conditional_nerf.py:
        103-104`` widened-input semantics)."""
        points = rays_o[..., None, :] + rays_d[..., None, :] * t_vals[..., :, None]
        if states_x is not None:
            sx = states_x[..., None, :].expand(*points.shape[:-1], -1)
            x_in = torch.cat([points, sx], dim=-1)
        else:
            x_in = points
        x_enc = positional_encoding(x_in, self.x_scales)
        h = self.block_0(x_enc)
        h = self.block_1(torch.cat([h, x_enc], dim=-1))
        density = self.density(h)
        if self.use_viewdirs:
            dirs = rays_d[..., None, :].expand(*points.shape[:-1], -1)
            if states_d is not None:
                sd = states_d[..., None, :].expand(*points.shape[:-1], -1)
                d_in = torch.cat([dirs, sd], dim=-1)
            else:
                d_in = dirs
            d_enc = positional_encoding(d_in, self.d_scales)
            h = self.block_2(torch.cat([h, d_enc], dim=-1))
        color = self.color(h)
        return density, color

    # -- sampling ----------------------------------------------------------

    @staticmethod
    def sample_linear(batch_shape, num_samples, near, far,
                      randomly_sample=False, generator=None):
        t = torch.linspace(near, far, num_samples).expand(
            *batch_shape, num_samples
        )
        if randomly_sample:
            mid = 0.5 * (t[..., 1:] + t[..., :-1])
            lower = torch.cat([t[..., :1], mid], dim=-1)
            upper = torch.cat([mid, t[..., -1:]], dim=-1)
            u = torch.rand(t.shape, generator=generator)
            t = lower + (upper - lower) * u
        return t

    @staticmethod
    def sample_pdf(bins, weights, num_samples, randomly_sample=False,
                   generator=None, eps=1e-5):
        """Inverse-CDF fine sampling, NeRF-paper spec — torch-idiomatic
        ``searchsorted`` + ``gather`` (the constructs the TPU path avoids;
        agreement validates the dense-mask re-design)."""
        weights = weights + eps
        pdf = weights / weights.sum(dim=-1, keepdim=True)
        cdf = torch.cumsum(pdf, dim=-1)
        cdf = torch.cat(
            [torch.zeros_like(cdf[..., :1]), cdf[..., :-1],
             torch.ones_like(cdf[..., :1])],
            dim=-1,
        )
        grid = torch.arange(num_samples, dtype=bins.dtype)
        if randomly_sample:
            u = (
                grid + torch.rand(
                    *bins.shape[:-1], num_samples, generator=generator
                )
            ) / num_samples
        else:
            u = ((grid + 0.5) / num_samples).expand(
                *bins.shape[:-1], num_samples
            )
        idx = torch.searchsorted(cdf, u.contiguous(), right=True) - 1
        idx = idx.clamp(0, cdf.shape[-1] - 2)
        cdf_below = torch.gather(cdf, -1, idx)
        cdf_above = torch.gather(cdf, -1, idx + 1)
        bins_below = torch.gather(bins, -1, idx.clamp(max=bins.shape[-1] - 1))
        bins_above = torch.gather(
            bins, -1, (idx + 1).clamp(max=bins.shape[-1] - 1)
        )
        denom = cdf_above - cdf_below
        denom = torch.where(denom < eps, torch.ones_like(denom), denom)
        t = (u - cdf_below) / denom
        return bins_below + t * (bins_above - bins_below)

    # -- compositing (reference model.py:437-469 semantics) ----------------

    @staticmethod
    def compositing_weights(density, t_vals, rays_d):
        dists = (t_vals[..., 1:] - t_vals[..., :-1]) * rays_d.norm(
            dim=-1, keepdim=True
        )
        dists = torch.cat(
            [dists, torch.full_like(dists[..., :1], 1e10)], dim=-1
        )[..., None]
        alpha = torch.exp(-torch.relu(density) * dists)
        trans = torch.cumprod(alpha[..., :-1, :] + 1e-10, dim=-2)
        trans = torch.cat([torch.ones_like(trans[..., :1, :]), trans], dim=-2)
        return (1.0 - alpha) * trans

    def render_rays(
        self,
        rays_o,
        rays_d,
        near,
        far,
        num_samples,
        num_fine_samples=0,
        randomly_sample=False,
        density_noise_std=0.0,
        states_x=None,
        states_d=None,
        generator=None,
    ):
        """Returns ``[rays, stages, 3]`` composited RGB (stage axis =
        coarse, then fine when hierarchical — the reference's loss
        broadcasts over it, ``train_conditional_nerf.py:132``)."""
        batch_shape = rays_o.shape[:-1]
        t_c = self.sample_linear(
            batch_shape, num_samples, near, far, randomly_sample, generator
        )

        def stage(t_vals):
            density, color = self(rays_o, rays_d, t_vals, states_x, states_d)
            if density_noise_std > 0.0:
                density = density + density_noise_std * torch.randn(
                    density.shape, generator=generator
                )
            w = self.compositing_weights(density, t_vals, rays_d)
            rgb = (w * torch.sigmoid(color)).sum(dim=-2)
            return rgb, w

        rgb_c, w_c = stage(t_c)
        stages = [rgb_c]
        if num_fine_samples > 0:
            mids = 0.5 * (t_c[..., 1:] + t_c[..., :-1])
            t_f = self.sample_pdf(
                mids, w_c[..., 1:-1, 0].detach(), num_fine_samples,
                randomly_sample, generator,
            )
            # Sorted merge + re-evaluate: torch-idiomatic gather/sort —
            # one of the two hierarchical formulations; deterministic
            # no-noise renders equal the disjoint-reuse formulation up to
            # float reassociation.
            t_all, _ = torch.sort(torch.cat([t_c, t_f], dim=-1), dim=-1)
            rgb_f, _ = stage(t_all)
            stages.append(rgb_f)
        return torch.stack(stages, dim=-2)
