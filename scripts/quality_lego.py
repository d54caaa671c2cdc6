"""End-to-end quality benchmark: train tiny_nerf lego at the notebook config.

The reference's quality anchor is the example notebook's run — ~32 dB
holdout PSNR after 40k iterations on ``tiny_nerf_data.npz`` (BASELINE.md).
That .npz is stripped from the repo (``.MISSING_LARGE_BLOBS``), but the
shipped pretrained checkpoint ``examples/nerf.pth`` IS the lego scene: this
script renders training views from the checkpoint (teacher), trains a fresh
model from scratch on those renders with the notebook's exact
hyperparameters (batch 1024 rays, 64 samples, lr 1e-4 Adam, density noise
1.0, near/far 2/6), and reports held-out-view PSNR against the teacher.

Run on the real chip:  python scripts/quality_lego.py --steps 40000
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
from nerf_tpu.data import RayBank
from nerf_tpu.data.scenes import spherical_poses
from nerf_tpu.train import create_train_state
from nerf_tpu.train.loop import make_multi_step_train_fn
from nerf_tpu.train.metrics import mse_to_psnr
from nerf_tpu.utils.pth_import import load_classic_checkpoint


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="/root/reference/examples/nerf.pth")
    ap.add_argument("--steps", type=int, default=40_000)
    ap.add_argument("--views", type=int, default=106)
    ap.add_argument("--image-hw", type=int, default=100)
    ap.add_argument("--focal", type=float, default=138.88887889922103)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--use-pallas", action="store_true", default=True)
    ap.add_argument("--compute-dtype", default="float32")
    ap.add_argument("--fine-samples", type=int, default=0,
                    help="enable the hierarchical pipeline: N inverse-CDF "
                         "fine samples on top of the coarse pass (the "
                         "notebook config is coarse-only)")
    ap.add_argument("--fused", action="store_true",
                    help="train through the fully-fused train kernel "
                         "(ops/pallas/fused_train.py; coarse-only)")
    args = ap.parse_args()

    cfg = ClassicNeRFConfig(
        normalize_position=6.0,
        use_pallas=args.use_pallas,
        compute_dtype=args.compute_dtype,
    )
    teacher = ClassicNeRF(cfg)
    teacher_params = load_classic_checkpoint(args.checkpoint, cfg)

    # Teacher renders = training set (notebook: 105 train + 1 holdout view).
    pose_o, pose_r = spherical_poses(args.views, radius=4.0, seed=0)
    eval_render = RenderConfig(
        num_coarse_samples=128, near=2.0, far=6.0,
        randomly_sample=False, density_noise_std=0.0, rays_per_tile=2048,
    )
    t0 = time.time()
    images = teacher.render_image(
        teacher_params, None, pose_o, pose_r,
        args.image_hw, args.image_hw, args.focal, eval_render,
    )
    images = jnp.clip(images, 0.0, 1.0)
    jax.block_until_ready(images)
    print(f"teacher rendered {args.views} views in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    bank = RayBank.from_images(
        images[:-1], pose_o[:-1], pose_r[:-1], args.focal
    )

    # Notebook training config (example.ipynb cells 5-8); --fine-samples
    # adds the hierarchical stage (disjoint-stage fine pass by default).
    train_render = RenderConfig(
        num_coarse_samples=64, num_fine_samples=args.fine_samples,
        near=2.0, far=6.0,
        randomly_sample=True, density_noise_std=1.0,
    )
    model = ClassicNeRF(cfg)
    opt = optax.adam(args.lr)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
    if args.fused:
        from nerf_tpu.train import make_fused_multi_step_train_fn as maker
    else:
        maker = make_multi_step_train_fn
    run = maker(model, opt, train_render, bank, args.batch_size, args.chunk)

    hold_render = RenderConfig(
        num_coarse_samples=64, num_fine_samples=args.fine_samples,
        near=2.0, far=6.0,
        randomly_sample=False, density_noise_std=0.0, rays_per_tile=2048,
    )
    t0 = time.time()
    for start in range(0, args.steps, args.chunk):
        state, aux = run(state)
        loss = float(jax.device_get(aux["loss"])[-1])
        step = start + args.chunk
        if step % 5000 == 0 or step == args.chunk:
            img = model.render_image(
                state.params, None, pose_o[-1:], pose_r[-1:],
                args.image_hw, args.image_hw, args.focal, hold_render,
            )[0]
            mse = float(jnp.mean((img - images[-1]) ** 2))
            psnr = mse_to_psnr(mse)
            rays_s = step * args.batch_size / (time.time() - t0)
            print(
                f"step {step}: loss {loss:.5f}, holdout PSNR {psnr:.2f} dB, "
                f"{rays_s:,.0f} rays/s", file=sys.stderr, flush=True,
            )
    img = model.render_image(
        state.params, None, pose_o[-1:], pose_r[-1:],
        args.image_hw, args.image_hw, args.focal, hold_render,
    )[0]
    mse = float(jnp.mean((img - images[-1]) ** 2))
    print(f"FINAL holdout PSNR vs teacher after {args.steps} steps: "
          f"{mse_to_psnr(mse):.2f} dB")


if __name__ == "__main__":
    main()
