"""Quick on-chip check of the fused hierarchical train path: Mosaic
compile, one-step loss parity vs the general trainer, and the benched
2048x(64+128) step time (chain-length differenced like bench.py).

Usage: python scripts/hier_chip_check.py [--skip-parity]
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
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.train import (
        create_train_state,
        make_fused_multi_step_train_fn,
        make_loss_fn,
    )
    from bench import _random_bank, _time_chain

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    model = ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=6.0, use_pallas=True,
            compute_dtype="bfloat16",
        )
    )
    render = RenderConfig(
        num_coarse_samples=64, num_fine_samples=128, near=2.0, far=6.0,
        randomly_sample=True, density_noise_std=1.0,
    )
    bank = _random_bank()
    out = {}

    if not args.skip_parity:
        # One-step loss parity on REAL Mosaic vs the general trainer.
        from nerf_tpu.ops.pallas import fused_hier

        params = model.init(jax.random.PRNGKey(0))
        batch = bank.gather(jnp.arange(args.batch))
        key = jax.random.PRNGKey(7)
        loss_fn = make_loss_fn(model, render)
        loss_ref, _ = jax.jit(loss_fn)(params, key, batch)
        loss_fused, grads, _ = jax.jit(
            lambda p, k, b: fused_hier.reuse_train_loss_and_grads(
                model, p, render, b, k
            )
        )(params, key, batch)
        lr, lf = float(loss_ref), float(loss_fused)
        gmax = float(
            max(jnp.max(jnp.abs(g)) for g in jax.tree.leaves(grads))
        )
        rel = abs(lf - lr) / abs(lr)
        print(f"loss ref={lr:.6f} fused={lf:.6f} rel={rel:.2e} "
              f"gmax={gmax:.3e}", file=sys.stderr, flush=True)
        out["loss_rel_err"] = rel
        assert rel < 1e-4, "on-chip loss parity failed"
        assert np.isfinite(gmax), "non-finite grads on chip"

    opt = optax.adam(1e-4)
    results = {}
    for k in (args.k1, args.k2):
        run = make_fused_multi_step_train_fn(
            model, opt, render, bank, args.batch, k
        )
        state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
        state, aux = run(state)
        float(jax.device_get(aux["loss"])[-1])
        results[k] = _time_chain(run, state)
    t_step = (results[args.k2] - results[args.k1]) / (args.k2 - args.k1)
    out["ms_per_step"] = round(t_step * 1e3, 3)
    out["rays_per_s"] = round(args.batch / t_step)
    print(f"{t_step*1e3:.2f} ms/step = {args.batch/t_step:,.0f} rays/s",
          file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
