"""rays_per_tile sweep for the fused hierarchical 400x400 eval render.

The 2048-ray tile optimum predates the in-kernel union work (round-3's
XLA-side merge pushed bigger tiles onto a slow loop strategy); with the
union dists, coarse precompute and ladders now inside the kernel the
sweet spot may have moved.  Chain-differenced frames like bench.py.

Usage: python scripts/eval_tile_sweep.py [--tiles 2048,4096,8000]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="2048,4000,8000,16000")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.data.scenes import spherical_poses

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = ClassicNeRF(
        ClassicNeRFConfig(normalize_position=6.0, use_pallas=True,
                          compute_dtype="bfloat16")
    )
    params = model.init(jax.random.PRNGKey(0))
    pose_o, pose_r = spherical_poses(1, radius=4.0)

    out = {}
    for tile in (int(t) for t in args.tiles.split(",")):
        render = RenderConfig(
            num_coarse_samples=64, num_fine_samples=128, near=2.0,
            far=6.0, randomly_sample=False, density_noise_std=0.0,
            rays_per_tile=tile,
        )

        def frames(n):
            def body(img, _):
                img = model.render_image(
                    params, None, pose_o, pose_r, 400, 400, 555.0, render
                )
                return img, ()

            o, _ = jax.lax.scan(
                body, jnp.zeros((1, 400, 400, 3)), None, length=n
            )
            return o

        try:
            f2 = jax.jit(functools.partial(frames, 2))
            f6 = jax.jit(functools.partial(frames, 6))
            np.asarray(f2()); np.asarray(f6())
            best2 = best6 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(f2())
                best2 = min(best2, time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f6())
                best6 = min(best6, time.perf_counter() - t0)
            per = (best6 - best2) / 4
            out[tile] = {"ms_per_frame": round(per * 1e3, 1),
                         "rays_per_s": round(160_000 / per)}
            print(f"tile {tile}: {per*1e3:.1f} ms/frame "
                  f"({160_000/per:,.0f} rays/s)", file=sys.stderr, flush=True)
        except Exception as e:
            out[tile] = {"error": str(e)[:200]}
            print(f"tile {tile}: ERROR {str(e)[:160]}", file=sys.stderr,
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
