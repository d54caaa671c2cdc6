"""Repeated-measurement variance for the coarse headline bench.

The r1->r3 coarse drift (504k -> 486k -> 495k rays/s) has been
unexplained for two rounds; this measures the same 4096x64 fused train
step N times in ONE chip session (one compile, N chain-differenced
timings) so BASELINE.md can carry mean +/- spread.

Usage: python scripts/coarse_variance.py [--n 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=40)
    args = ap.parse_args()

    import time

    import jax
    import optax

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.train import create_train_state, make_fused_multi_step_train_fn
    from bench import _random_bank

    def time_chain(run, state, repeats=3):
        # Like bench._time_chain but RETURNS the rebound state: the train
        # fn donates its input, so the caller must carry the fresh state
        # across repeated timings (reusing the old one hits a deleted
        # buffer on the second outer iteration).
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, aux = run(state)
            float(jax.device_get(aux["loss"])[-1])
            best = min(best, time.perf_counter() - t0)
        return best, state

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = ClassicNeRF(
        ClassicNeRFConfig(normalize_position=6.0, use_pallas=True,
                          compute_dtype="bfloat16")
    )
    render = RenderConfig(
        num_coarse_samples=64, near=2.0, far=6.0,
        randomly_sample=True, density_noise_std=1.0,
    )
    opt = optax.adam(1e-4)
    bank = _random_bank()

    runs = {}
    states = {}
    for k in (args.k1, args.k2):
        runs[k] = make_fused_multi_step_train_fn(
            model, opt, render, bank, args.batch, k
        )
        st = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        st, aux = runs[k](st)  # compile + warm (donates)
        float(jax.device_get(aux["loss"])[-1])
        states[k] = st

    samples = []
    for i in range(args.n):
        t1, states[args.k1] = time_chain(runs[args.k1], states[args.k1])
        t2, states[args.k2] = time_chain(runs[args.k2], states[args.k2])
        ms = (t2 - t1) / (args.k2 - args.k1) * 1e3
        samples.append(ms)
        print(f"run {i}: {ms:.3f} ms/step "
              f"({args.batch/ms*1e3:,.0f} rays/s)", file=sys.stderr,
              flush=True)
    arr = np.asarray(samples)
    out = {
        "ms_per_step_samples": [round(x, 3) for x in samples],
        "mean_ms": round(float(arr.mean()), 3),
        "std_ms": round(float(arr.std()), 3),
        "min_ms": round(float(arr.min()), 3),
        "rays_per_s_mean": round(args.batch / arr.mean() * 1e3),
        "rays_per_s_best": round(args.batch / arr.min() * 1e3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
