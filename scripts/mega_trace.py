"""Device-time breakdown of the mega-fused step: kernel vs XLA glue.

Usage: python scripts/mega_trace.py [--rays-per-tile 32] [--ablate ...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from roofline import device_time_by_kernel  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--rays-per-tile", type=int, default=None)
    ap.add_argument("--ablate", default="")
    args = ap.parse_args()

    import jax
    import optax

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.ops.pallas import fused_mega
    from nerf_tpu.train import TrainState, create_train_state
    from nerf_tpu.train.loop import fold_key
    from bench import _random_bank

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
    ablate = frozenset(a for a in args.ablate.split(",") if a)

    def one_step(state, _):
        key = fold_key(state)
        batch = bank.sample_batch(jax.random.fold_in(key, 0x5A17),
                                  args.batch)
        loss, grads, aux = fused_mega.mega_train_loss_and_grads(
            model, params=state.params, render=render, batch=batch,
            key=key, rays_per_tile=args.rays_per_tile, ablate=ablate,
        )
        updates, opt_state = opt.update(grads, state.opt_state,
                                        state.params)
        params2 = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params2, opt_state,
                          state.key), {"loss": loss}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state):
        return jax.lax.scan(one_step, state, None, length=args.k)

    st = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
    st, aux = run(st)
    float(jax.device_get(aux["loss"])[-1])
    tdir = tempfile.mkdtemp(prefix="megatrace")
    with jax.profiler.trace(tdir):
        st, aux = run(st)
        float(jax.device_get(aux["loss"])[-1])
    by_name = device_time_by_kernel(tdir)
    total = sum(by_name.values())
    print(f"device total: {total/args.k*1e-3:.3f} ms/step")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {us/args.k:10.1f} us/step  {name[:90]}")


if __name__ == "__main__":
    main()
