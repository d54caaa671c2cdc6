"""Chip check for the mega-fused hierarchical kernel: compile, loss
parity vs the current reuse path, and chain-differenced step timing for
BOTH paths in one session.

Usage: python scripts/mega_chip_check.py [--batch 2048] [--n 3]
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
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=40)
    ap.add_argument("--rays-per-tile", type=int, default=None)
    ap.add_argument("--mega-only", action="store_true")
    ap.add_argument("--ablate", default="",
                    help="comma list: enc,resample,coarsebwd")
    ap.add_argument("--splits", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.ops.pallas import fused_hier, fused_mega
    from nerf_tpu.train import TrainState, create_train_state
    from nerf_tpu.train.loop import fold_key
    from bench import _random_bank

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = ClassicNeRF(
        ClassicNeRFConfig(normalize_position=6.0, use_pallas=True,
                          compute_dtype="bfloat16")
    )
    render = RenderConfig(
        num_coarse_samples=64, num_fine_samples=128, near=2.0, far=6.0,
        randomly_sample=True, density_noise_std=1.0,
    )
    opt = optax.adam(1e-4)
    bank = _random_bank()

    def make_run(step_fn, k):
        def one_step(state, _):
            key = fold_key(state)
            batch = bank.sample_batch(
                jax.random.fold_in(key, 0x5A17), args.batch
            )
            loss, grads, aux = step_fn(state.params, key, batch)
            updates, opt_state = opt.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(state.step + 1, params, opt_state, state.key),
                {"loss": loss},
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run(state):
            return jax.lax.scan(one_step, state, None, length=k)

        return run

    ablate = frozenset(a for a in args.ablate.split(",") if a)

    def mega_step(params, key, batch):
        return fused_mega.mega_train_loss_and_grads(
            model, params, render, batch, key,
            rays_per_tile=args.rays_per_tile, splits=args.splits,
            ablate=ablate,
        )

    def reuse_step(params, key, batch):
        return fused_hier.reuse_train_loss_and_grads(
            model, params, render, batch, key
        )

    def time_chain(run, state, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            state, aux = run(state)
            float(jax.device_get(aux["loss"])[-1])
            best = min(best, time.perf_counter() - t0)
        return best, state

    paths = {"mega": mega_step}
    if not args.mega_only:
        paths["reuse"] = reuse_step
    results = {}
    for name, step_fn in paths.items():
        runs, states = {}, {}
        for k in (args.k1, args.k2):
            t0 = time.perf_counter()
            runs[k] = make_run(step_fn, k)
            st = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
            st, aux = runs[k](st)
            last = float(jax.device_get(aux["loss"])[-1])
            print(
                f"[{name}] K={k} compiled+warm in "
                f"{time.perf_counter()-t0:.1f}s, loss[K-1]={last:.6f}",
                file=sys.stderr, flush=True,
            )
            states[k] = st
        samples = []
        for i in range(args.n):
            t1, states[args.k1] = time_chain(runs[args.k1], states[args.k1])
            t2, states[args.k2] = time_chain(runs[args.k2], states[args.k2])
            ms = (t2 - t1) / (args.k2 - args.k1) * 1e3
            samples.append(ms)
            print(
                f"[{name}] run {i}: {ms:.3f} ms/step "
                f"({args.batch/ms*1e3:,.0f} rays/s)",
                file=sys.stderr, flush=True,
            )
        arr = np.asarray(samples)
        results[name] = {
            "ms_mean": round(float(arr.mean()), 3),
            "ms_std": round(float(arr.std()), 3),
            "rays_per_s_mean": round(args.batch / arr.mean() * 1e3),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
