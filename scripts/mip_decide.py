"""Execute the mip train decision rule (BASELINE.md round-3 note).

Times BOTH mip train formulations on the chip at the bench config
(4096 rays x 64 intervals, chain-length differenced):

  one-call   the fully-fused ``fused_mip_train`` kernel (round-2/3
             default): fwd + compositing + MSE (+ seg CE) + bwd in one
             pallas_call, grads returned directly.
  two-kernel the round-1 formulation: custom-VJP ``fused_mip_mlp`` pair
             (fwd kernel + recompute-bwd kernel) with compositing/loss in
             XLA, driven through the general trainer.

Prints a JSON verdict; the default route lives in
``train/loop.py::make_fused_step_fn`` and should follow the winner.

Usage: python scripts/mip_decide.py [--seg-weight 0.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--seg-weight", type=float, default=0.0)
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=40)
    args = ap.parse_args()

    import jax

    from nerf_tpu import MipNeRF, MipNeRFConfig, RenderConfig
    from bench import bench_train_step, _random_bank

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = MipNeRF(MipNeRFConfig(use_pallas=True, compute_dtype="bfloat16"))
    render = RenderConfig(
        num_coarse_samples=64, randomly_sample=True, density_noise_std=1.0,
    )
    bank = _random_bank()
    out = {}
    for name, fused in (("one_call", True), ("two_kernel", False)):
        t = bench_train_step(
            model, render, args.batch, k1=args.k1, k2=args.k2,
            fused=fused, bank=bank,
        )
        out[name] = {
            "ms_per_step": round(t * 1e3, 3),
            "rays_per_s": round(args.batch / t),
        }
        print(f"{name}: {t*1e3:.2f} ms/step = {args.batch/t:,.0f} rays/s",
              file=sys.stderr, flush=True)
    out["winner"] = min(out, key=lambda k: out[k]["ms_per_step"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
