"""tiny_nerf trainer — the TPU-native equivalent of the reference's
``examples/example.ipynb`` canonical run.

Reproduces the notebook's recipe (cells 3-9): load ``tiny_nerf_data.npz``
(or synthesize the offline stand-in scene when the file is absent — the
blob is stripped from the reference repo), hold out the last view,
1024-ray batches, ``NeRF(normalize_position=6.0)``, Adam lr=1e-4,
``render_rays(..., 2.0, 6.0, 64, randomly_sample=True,
density_noise_std=1.0)``, eval render + PSNR every 1000 iterations, and a
reference-layout ``.pth`` weight export.  Notebook-parity target:
~32 dB holdout PSNR by 40k steps on the real tiny_nerf data.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import optax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--logging-dir", type=str, default="tiny_nerf_experiment")
    p.add_argument("--data", type=str, default="tiny_nerf_data.npz",
                   help="tiny_nerf npz; synthesized scene if missing")
    p.add_argument("--num-steps", type=int, default=40_000)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--normalize-position", type=float, default=6.0)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--near-plane", type=float, default=2.0)
    p.add_argument("--far-plane", type=float, default=6.0)
    p.add_argument("--num-samples-per-ray", type=int, default=64)
    p.add_argument("--num-fine-samples", type=int, default=0)
    p.add_argument("--density-noise-std", type=float, default=1.0)
    p.add_argument("--log-interval", type=int, default=1000)
    p.add_argument("--use-pallas", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the ray batch over all visible chips "
                        "(1-D batch mesh; replicated params, psum "
                        "gradients over ICI)")
    # Synthetic-fallback scene size (used only when --data is absent).
    p.add_argument("--synthetic-views", type=int, default=24)
    p.add_argument("--synthetic-hw", type=int, default=100)
    return p


def main(argv=None) -> None:
    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig, TrainConfig
    from nerf_tpu.data import RayBank, load_tiny_nerf, synthesize_scene
    from nerf_tpu.train import Trainer

    args = build_parser().parse_args(argv)
    os.makedirs(args.logging_dir, exist_ok=True)
    with open(os.path.join(args.logging_dir, "params.json"), "w") as f:
        json.dump(vars(args), f)

    if os.path.exists(args.data):
        scene = load_tiny_nerf(args.data)
        print(f"loaded {args.data}: {scene.images.shape}")
    else:
        print(f"{args.data} not found; synthesizing the offline scene")
        scene = synthesize_scene(num_views=args.synthetic_views,
                                 image_hw=args.synthetic_hw,
                                 focal=1.389 * args.synthetic_hw,
                                 num_samples=512)

    bank = RayBank.from_images(
        scene.images[:-1], scene.pose_o[:-1], scene.pose_r[:-1], scene.focal
    )

    model = ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=args.normalize_position,
            use_pallas=args.use_pallas,
        )
    )
    render = RenderConfig(
        num_coarse_samples=args.num_samples_per_ray,
        num_fine_samples=args.num_fine_samples,
        near=args.near_plane,
        far=args.far_plane,
        density_noise_std=args.density_noise_std,
    )
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        num_steps=args.num_steps,
        log_interval=args.log_interval,
        eval_interval=args.log_interval,
        checkpoint_interval=args.log_interval,
        seed=args.seed,
    )
    mesh = None
    if args.data_parallel:
        from nerf_tpu.parallel import make_mesh

        mesh = make_mesh()
    trainer = Trainer(model, render, train_cfg,
                      logging_dir=args.logging_dir,
                      optimizer=optax.adam(args.learning_rate),
                      mesh=mesh)
    state = trainer.init_state(resume=args.resume)
    state = trainer.fit(bank, eval_scene=scene, state=state)

    from nerf_tpu.train.checkpoint import export_reference_pth

    try:
        export_reference_pth(
            os.path.join(args.logging_dir, "nerf.pth"),
            jax.device_get(state.params),
        )
    except ImportError:
        pass


if __name__ == "__main__":
    main()
