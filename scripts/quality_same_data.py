"""Apples-to-apples quality comparison: torch v1.2 vs nerf_tpu, SAME data.

The lego quality numbers in BASELINE.md train on renders of the shipped
checkpoint (the real ``tiny_nerf_data.npz`` photos are stripped from the
reference and this environment has no egress) — a teacher-distillation
target that is smoother than real photos, so those rows are NOT directly
comparable to the notebook's ≈32 dB anchor.  This script is the honest
comparison: both frameworks train from scratch on the SAME synthetic
scene (``nerf_tpu.data.synthesize_scene`` — an analytic
emission-absorption volume whose ground truth comes from brute-force
quadrature of the same volume-rendering equation), with identical
hyperparameters, and report holdout PSNR at equal step counts.

The torch side is the reconstructed v1.2 model (``tests/torch_v12.py``,
validated against ``examples/nerf.pth`` and the JAX path by
``tests/test_v12_oracle.py``) running the reference training recipe
(notebook cell 8: Adam, stage-broadcast MSE, stratified sampling +
density noise).  Run on CPU it is the reference's ≈158 rays/s scale
anchor; the point here is PSNR-at-equal-steps, not walltime.

Usage:
    python scripts/quality_same_data.py --steps 1500 --batch-size 256
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")  # tests/ package for the torch oracle


def psnr(mse: float) -> float:
    # Reference formula (train_conditional_nerf.py:152-153).
    return -10.0 * np.log(mse) / 2.30258509299


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--fine-samples", type=int, default=0,
                    help="hierarchical fine samples (both frameworks run "
                    "the re-evaluate formulation, the one the torch v1.2 "
                    "oracle implements)")
    ap.add_argument("--image-hw", type=int, default=64)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-jax", action="store_true",
                    help="run only the torch half (the two halves are "
                    "independent; run them in parallel and merge the JSONs)")
    ap.add_argument("--chip", action="store_true",
                    help="run the nerf_tpu half on the default (TPU) "
                    "platform instead of forcing CPU — amends the "
                    "controlled-comparison caveat, used when CPU walltime "
                    "does not allow both halves")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    import jax

    if not args.chip:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.data import RayBank, synthesize_scene
    from nerf_tpu.train import (
        create_train_state,
        evaluate,
        make_multi_step_train_fn,
    )

    scene = synthesize_scene(
        num_views=args.views, image_hw=args.image_hw, focal=80.0
    )
    holdout = args.views - 1
    train_images = np.asarray(scene.images[:holdout])
    near, far = 2.0, 6.0

    results = {"config": vars(args)}

    def checkpoint_results():
        # Incremental dump so a killed run keeps its partial curves.
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    # ---- nerf_tpu ---------------------------------------------------------
    cfg = ClassicNeRFConfig(normalize_position=6.0)
    model = ClassicNeRF(cfg)
    render = RenderConfig(
        num_coarse_samples=args.num_samples,
        num_fine_samples=args.fine_samples, near=near, far=far,
        randomly_sample=True, density_noise_std=args.noise,
        # Match the torch oracle's hierarchical objective (sorted merge +
        # re-evaluate) so the two losses are the same quantity.
        reuse_coarse_in_fine=False,
    )
    bank = RayBank.from_images(
        train_images, scene.pose_o[:holdout], scene.pose_r[:holdout],
        scene.focal,
    )
    if not args.skip_jax:
        opt = optax.adam(args.lr)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        chunk = args.eval_every
        run = make_multi_step_train_fn(
            model, opt, render, bank, args.batch_size, chunk
        )
        jax_curve = []
        t0 = time.time()
        for step in range(chunk, args.steps + 1, chunk):
            state, aux = run(state)
            _, value = evaluate(model, state.params, scene, render, holdout)
            jax_curve.append((step, float(value)))
            print(
                f"[nerf_tpu] step {step}: holdout PSNR "
                f"{float(value):.2f} dB", flush=True,
            )
            results["nerf_tpu"] = {
                "curve": jax_curve, "walltime_s": time.time() - t0,
            }
            checkpoint_results()

    # ---- torch v1.2 -------------------------------------------------------
    if not args.skip_torch:
        import torch

        from tests.torch_v12 import TorchClassicNeRF

        torch.manual_seed(0)
        tm = TorchClassicNeRF(normalize_position=6.0)
        topt = torch.optim.Adam(tm.parameters(), lr=args.lr)
        gen = torch.Generator().manual_seed(1)

        rays_o = torch.from_numpy(np.array(bank.rays_o))
        rays_d = torch.from_numpy(np.array(bank.rays_d))
        pixels = torch.from_numpy(np.array(bank.pixels))
        n_rays = rays_o.shape[0]

        def torch_eval() -> float:
            hb = RayBank.from_images(
                np.asarray(scene.images[holdout:]),
                scene.pose_o[holdout:], scene.pose_r[holdout:], scene.focal,
            )
            eo = torch.from_numpy(np.array(hb.rays_o))
            ed = torch.from_numpy(np.array(hb.rays_d))
            gt = torch.from_numpy(np.array(hb.pixels))
            preds = []
            with torch.no_grad():
                for s in range(0, eo.shape[0], 1024):
                    out = tm.render_rays(
                        eo[s : s + 1024], ed[s : s + 1024], near, far,
                        args.num_samples,
                        num_fine_samples=args.fine_samples,
                    )
                    preds.append(out[..., -1, :])
            mse = float(((torch.cat(preds) - gt) ** 2).mean())
            return psnr(mse)

        torch_curve = []
        t0 = time.time()
        for step in range(1, args.steps + 1):
            idx = torch.randint(0, n_rays, (args.batch_size,), generator=gen)
            out = tm.render_rays(
                rays_o[idx], rays_d[idx], near, far, args.num_samples,
                num_fine_samples=args.fine_samples,
                randomly_sample=True, density_noise_std=args.noise,
                generator=gen,
            )
            loss = ((out - pixels[idx][:, None, :]) ** 2).mean()
            topt.zero_grad()
            loss.backward()
            topt.step()
            if step % args.eval_every == 0:
                value = torch_eval()
                torch_curve.append((step, value))
                print(
                    f"[torch v1.2] step {step}: holdout PSNR {value:.2f} dB "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
                results["torch_v12"] = {
                    "curve": torch_curve, "walltime_s": time.time() - t0,
                }
                checkpoint_results()

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
