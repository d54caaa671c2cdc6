"""Mosaic construct probes for the lane-dense compositing redesign.

The fused hier kernels do their compositing math on [rows, 1] column
vectors, which the VPU pads to 128 lanes — 1/128 lane efficiency.  The
round-3 hier trace prices that at ~2 ms/step (fine kernel 8.84 ms vs its
6.8 ms MLP-proportional bound).  Moving the scalar chain to [rays, S]
lane layout needs three constructs this script probes ON CHIP, each in
isolation (compile + run + chain-differenced timing):

  A. reshape [rows, 1] -> [rays, S]        (sublane->lane relayout)
  B. lane-axis roll/shift ladders on [rays, S]
  C. op-for-op cost: N elementwise ops on [rows, 1] vs [rays, S]

Usage: python scripts/mosaic_probe.py [--probe A,B,C] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--probe", default="A,B,C")
    ap.add_argument("--k", type=int, default=512,
                    help="grid length (tiles per call)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = args.cpu
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    ROWS, RAYS, S = 1024, 8, 128
    REPS = int(__import__("os").environ.get("PROBE_REPS", "64"))

    def timeit(fn, x):
        # The relay's block_until_ready does not reliably wait (bench.py):
        # a real device_get fetch is the only sync.
        np.asarray(jax.device_get(fn(x)))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(x)))
            best = min(best, time.perf_counter() - t0)
        return best

    def run_probe(name, kernel, in_shape, out_shape):
        grid = args.k

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_shape[0] * grid,) +
                                           out_shape[1:], jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec(in_shape, lambda i: (i, 0))],
            out_specs=pl.BlockSpec(out_shape, lambda i: (i, 0)),
            interpret=interpret,
        )
        f = jax.jit(f)
        x = jnp.asarray(
            np.random.default_rng(0).normal(
                size=(in_shape[0] * grid,) + in_shape[1:]
            ),
            jnp.float32,
        )
        try:
            t = timeit(f, x)
            print(f"[{name}] {t*1e6:.0f} us / {grid} tiles "
                  f"({t/grid*1e9:.0f} ns/tile)", flush=True)
            return t
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return None

    probes = set(args.probe.split(","))

    if "A" in probes:
        # A1: reshape column -> lane-grid, repeated (costs REPS relayouts)
        def k_reshape(x_ref, y_ref):
            x = x_ref[...]  # [ROWS, 1]
            acc = jnp.zeros((RAYS, S), jnp.float32)
            for i in range(REPS):
                acc = acc * 0.9 + (x * (1.0 + 1e-6 * i)).reshape(RAYS, S)
            y_ref[...] = acc

        run_probe("A1 reshape (512,1)->(4,128) x64", k_reshape,
                  (ROWS, 1), (RAYS, S))

        # A2: the inverse lane-grid -> column
        def k_reshape_back(x_ref, y_ref):
            x = x_ref[...]  # [RAYS, S]
            acc = jnp.zeros((ROWS, 1), jnp.float32)
            for i in range(REPS):
                acc = acc * 0.9 + (x * (1.0 + 1e-6 * i)).reshape(ROWS, 1)
            y_ref[...] = acc

        run_probe("A2 reshape (4,128)->(512,1) x64", k_reshape_back,
                  (RAYS, S), (ROWS, 1))

    if "B" in probes:
        # Lane-axis shift ladder (exclusive prefix along lanes).
        def k_lane_ladder(x_ref, y_ref):
            x = x_ref[...]  # [RAYS, S]
            lane = jax.lax.broadcasted_iota(jnp.int32, (RAYS, S), 1)
            p = x
            for _ in range(8):  # ~8 ladders per fine slice
                for k2 in (1, 2, 4, 8, 16, 32, 64):
                    sh = pltpu.roll(p, k2, 1)
                    p = jnp.where(lane >= k2, p * 0.5 + sh, p)
            y_ref[...] = p

        run_probe("B lane ladders x8 on (4,128)", k_lane_ladder,
                  (RAYS, S), (RAYS, S))

        # Reference: same ladders on the column layout (sublane rolls).
        def k_sub_ladder(x_ref, y_ref):
            x = x_ref[...]  # [ROWS, 1]
            pos = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0) % S
            p = x
            for _ in range(8):
                for k2 in (1, 2, 4, 8, 16, 32, 64):
                    sh = pltpu.roll(p, k2, 0)
                    p = jnp.where(pos >= k2, p * 0.5 + sh, p)
            y_ref[...] = p

        run_probe("B' sublane ladders x8 on (512,1)", k_sub_ladder,
                  (ROWS, 1), (ROWS, 1))

    if "C" in probes:
        def k_col_ops(x_ref, y_ref):
            x = x_ref[...]  # [ROWS, 1]
            for _ in range(REPS):
                x = x * x * 1e-6 + x * 0.999
            y_ref[...] = x

        def k_lane_ops(x_ref, y_ref):
            x = x_ref[...]  # [RAYS, S]
            for _ in range(REPS):
                x = x * x * 1e-6 + x * 0.999
            y_ref[...] = x

        run_probe("C1 64 muladds on (512,1)", k_col_ops,
                  (ROWS, 1), (ROWS, 1))
        run_probe("C2 64 muladds on (4,128)", k_lane_ops,
                  (RAYS, S), (RAYS, S))


    if "D" in probes:
        # Per-ray M=1 cross matmuls: 8 rays x 4 quantities x 2 (Dekker) =
        # 64 small dots per tile, value row read from the lane layout.
        SC = 64

        def k_m1(x_ref, y_ref):
            x = x_ref[...]  # [RAYS, S] lane layout (reuse as log_ac rows)
            tc = x[:, 0:SC]
            acc = []
            for ri in range(RAYS):
                row = tc[ri : ri + 1, :]  # [1, SC]
                col = x[ri : ri + 1, :]   # [1, S] fine t row
                m = (col < row.reshape(SC, 1)[0:SC, :]).astype(jnp.float32)
                piece = jnp.zeros((1, S), jnp.float32)
                for _ in range(4):
                    hi = row.astype(jnp.bfloat16).astype(jnp.float32)
                    lo = row - hi
                    piece = piece + jnp.dot(
                        hi, m, preferred_element_type=jnp.float32
                    ) + jnp.dot(lo, m, preferred_element_type=jnp.float32)
                acc.append(piece)
            y_ref[...] = jnp.concatenate(acc, axis=0)

        run_probe("D 64 M=1 dekker dots [1,64]@[64,128]", k_m1,
                  (RAYS, S), (RAYS, S))

    if "E" in probes:
        # Mask build cost reference: per-ray [S, SC] compares only.
        SC = 64

        def k_masks(x_ref, y_ref):
            x = x_ref[...]
            out = jnp.zeros((RAYS, S), jnp.float32)
            for ri in range(RAYS):
                row = x[ri : ri + 1, :]
                colv = x[ri : ri + 1, 0:SC]
                m = (jnp.broadcast_to(row, (SC, S)) <
                     jnp.broadcast_to(x[ri : ri + 1, 0:1], (SC, S))
                     ).astype(jnp.float32)
                out = out + jnp.sum(m[0:RAYS, :], axis=0, keepdims=True)
            y_ref[...] = out

        run_probe("E 8x [64,128] mask builds", k_masks,
                  (RAYS, S), (RAYS, S))

if __name__ == "__main__":
    main()
