"""Geometry sweep for the fused union-eval kernel: splits x tile_rows.

The eval kernel runs one slice per double-size tile (r=16 rays, 2048
fine rows) and measures 54% of its MXU bound — far below the train
kernel family's 68-74% — so this sweeps the slice/tile geometry through
the full `render_image` path (monkeypatching the kernel wrapper's new
`splits`/`tile_rows` hooks).  Chain-differenced frames like bench.py.

Usage: python scripts/eval_geom_sweep.py [--cases 1:2048,2:2048,...]
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
    ap.add_argument(
        "--cases", default="1:2048,2:2048,1:4096,2:4096,1:8192,4:8192"
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.data.scenes import spherical_poses
    from nerf_tpu.ops.pallas import fused_hier

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = ClassicNeRF(
        ClassicNeRFConfig(normalize_position=6.0, use_pallas=True,
                          compute_dtype="bfloat16")
    )
    params = model.init(jax.random.PRNGKey(0))
    pose_o, pose_r = spherical_poses(1, radius=4.0)
    render = RenderConfig(
        num_coarse_samples=64, num_fine_samples=128, near=2.0, far=6.0,
        randomly_sample=False, density_noise_std=0.0, rays_per_tile=2048,
    )
    base = fused_hier.fine_union_eval_pallas

    results = {}
    for case in args.cases.split(","):
        sp, tr = (int(v) for v in case.split(":"))

        def patched(*a, **kw):
            kw["splits"] = sp
            kw["tile_rows"] = tr
            return base(*a, **kw)

        fused_hier.fine_union_eval_pallas = patched
        try:
            def frames(n):
                def body(img, _):
                    img = model.render_image(
                        params, None, pose_o, pose_r, 400, 400, 555.0,
                        render,
                    )
                    return img, ()

                out, _ = jax.lax.scan(
                    body, jnp.zeros((1, 400, 400, 3)), None, length=n
                )
                return out

            f2 = jax.jit(lambda: frames(2))
            f6 = jax.jit(lambda: frames(6))
            np.asarray(f2()), np.asarray(f6())
            best2 = best6 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(f2())
                best2 = min(best2, time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f6())
                best6 = min(best6, time.perf_counter() - t0)
            ms = (best6 - best2) / 4 * 1e3
            results[case] = {
                "ms_per_frame": round(ms, 1),
                "rays_per_s": round(160_000 / ms * 1e3),
            }
            print(f"[{case}] {ms:.1f} ms/frame "
                  f"({160_000/ms*1e3:,.0f} rays/s)", file=sys.stderr,
                  flush=True)
        except Exception as e:  # noqa: BLE001
            results[case] = {"error": f"{type(e).__name__}: {e}"}
            print(f"[{case}] FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
        finally:
            fused_hier.fine_union_eval_pallas = base
    print(json.dumps(results))


if __name__ == "__main__":
    main()
