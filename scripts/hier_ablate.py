"""On-chip ablation + tiling sweep for the fused hier fine-stage kernel.

The round-4 hierarchical roofline (ROOFLINE.md) prices the fine kernel at
8.91 ms/step vs its 5.03 ms MXU bound — ~2.1 ms of in-kernel compositing
overhead (cross-block Dekker dots, per-ray mask builds, ladders,
MLP-boundary relayouts) plus the MLP's own VPU work.  This script times
the REAL ``fine_stage_train_pallas`` call in isolation (K-step scan,
chain-length differenced) under targeted ablations so the overhead can be
attributed before optimizing:

  full       the shipping kernel
  dekker     plain single-matmul dots (halves/thirds the tiny-dot count)
  crossdots  cross_c/cross_f/g_laf/g_lac -> zeros (dots + their masks die)
  cmin       union successor = in-block neighbour only (cmin masks die)
  ladders    prefix/suffix ladders -> zeros
  tile:R:S   _pick_tiling override (rays-per-tile block = R rows, S splits)

Ablated kernels compute WRONG losses — this is a profiler, not a path.

Usage: python scripts/hier_ablate.py [--variants full,dekker,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="full,dekker,crossdots,cmin,ladders,"
                    "tile:1024:1,tile:2048:2,tile:2048:4")
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig
    from nerf_tpu.ops.pallas import fused_hier

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = ClassicNeRF(
        ClassicNeRFConfig(normalize_position=6.0, use_pallas=True,
                          compute_dtype="bfloat16")
    )
    params = model.init(jax.random.PRNGKey(0))
    n, sc, sf = args.rays, 64, 128
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    rays_o = jax.random.normal(ks[0], (n, 3))
    rays_d = jax.random.normal(ks[1], (n, 3))
    t_coarse = jnp.sort(jax.random.uniform(ks[2], (n, sc), minval=2.0,
                                           maxval=6.0), axis=-1)
    t_fine = jnp.sort(jax.random.uniform(ks[3], (n, sf), minval=2.0,
                                         maxval=6.0), axis=-1)
    dens_c = jax.random.normal(ks[4], (n, sc, 1))
    col_c = jax.random.normal(ks[5], (n, sc, 3))
    noise_f = jax.random.normal(ks[6], (n, sf))
    pixels = jax.random.uniform(ks[7], (n, 3))
    dnorm = jnp.linalg.norm(rays_d, axis=-1)
    xf_enc, df_enc = model.encode_inputs_flat(
        rays_o, rays_d, t_fine, None, None
    )
    dt = jnp.bfloat16

    def timed(fn, x):
        np.asarray(jax.device_get(fn(x)))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(x)))
            best = min(best, time.perf_counter() - t0)
        return best

    def chain(k, ablate, tiling):
        orig_pick = fused_hier._pick_tiling
        if tiling is not None:
            fused_hier._pick_tiling = (
                lambda n_rays, s_fine, interp, tile_rows=0: tiling
            )
        try:
            def body(carry, _):
                # Serialize steps: fold the prior loss into an input.
                x = xf_enc + carry * 1e-30
                loss, grads, (gd, gc) = fused_hier.fine_stage_train_pallas(
                    params, x, df_enc, t_coarse, t_fine, dens_c, col_c,
                    dnorm, noise_f, pixels, compute_dtype=dt,
                    ablate=ablate,
                )
                return loss, ()

            f = jax.jit(
                lambda l0: jax.lax.scan(body, l0, None, length=k)[0]
            )
            return timed(f, jnp.zeros(()))
        finally:
            fused_hier._pick_tiling = orig_pick

    results = {}
    for v in args.variants.split(","):
        tiling, ablate = None, frozenset()
        if v.startswith("tile:"):
            _, rows, splits = v.split(":")
            r = max(1, int(rows) // sf)
            tiling = (r, int(splits))
        elif v != "full":
            ablate = frozenset(v.split("+"))
        try:
            t1 = chain(args.k1, ablate, tiling)
            t2 = chain(args.k2, ablate, tiling)
        except Exception as e:  # Mosaic rejections are data too
            results[v] = {"error": str(e)[:200]}
            print(f"{v}: ERROR {str(e)[:200]}", file=sys.stderr, flush=True)
            continue
        ms = (t2 - t1) / (args.k2 - args.k1) * 1e3
        results[v] = {"ms_per_call": round(ms, 3)}
        print(f"{v}: {ms:.3f} ms/call", file=sys.stderr, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
