"""Root-cause harness for the hierarchical quality-run NaN.

``examples/same_data_quality_hier.json`` diverged to NaN between steps
3000 and 3500 through the GENERAL XLA trainer (re-evaluate formulation,
sigma=1.0 noise, batch 256, 64+128 samples).  This script reruns the
exact configuration with no evals, finds the first non-finite step by
chunked scan + host-state rollback, then replays the offending step
one at a time and dumps diagnostics (which stage goes non-finite first,
density/weight/param extrema, grad norms).

Usage:
    python scripts/nan_hunt.py [--cpu] [--steps 5000] [--chunk 100]

Default platform is the chip (minutes); --cpu reproduces the quality
run's exact f32 numerics (hours).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stats(name, x):
    x = np.asarray(x)
    fin = np.isfinite(x)
    return {
        "name": name,
        "finite_frac": float(fin.mean()),
        "min": float(x[fin].min()) if fin.any() else None,
        "max": float(x[fin].max()) if fin.any() else None,
        "absmax": float(np.abs(x[fin]).max()) if fin.any() else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--fine-samples", type=int, default=128)
    ap.add_argument("--image-hw", type=int, default=100)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.data import RayBank, synthesize_scene
    from nerf_tpu.ops import compositing, sampling
    from nerf_tpu.train import (
        create_train_state,
        make_loss_fn,
        make_multi_step_train_fn,
    )
    from nerf_tpu.train.state import TrainState, fold_key

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    # EXACT quality_same_data.py configuration.
    scene = synthesize_scene(
        num_views=args.views, image_hw=args.image_hw, focal=80.0
    )
    holdout = args.views - 1
    cfg = ClassicNeRFConfig(normalize_position=6.0)
    model = ClassicNeRF(cfg)
    render = RenderConfig(
        num_coarse_samples=args.num_samples,
        num_fine_samples=args.fine_samples, near=2.0, far=6.0,
        randomly_sample=True, density_noise_std=args.noise,
        reuse_coarse_in_fine=False,
    )
    bank = RayBank.from_images(
        np.asarray(scene.images[:holdout]), scene.pose_o[:holdout],
        scene.pose_r[:holdout], scene.focal,
    )
    opt = optax.adam(args.lr)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
    run = make_multi_step_train_fn(
        model, opt, render, bank, args.batch_size, args.chunk
    )

    # ---- phase 1: chunked scan with host-state rollback -------------------
    host_state = jax.device_get(state)
    first_bad = None
    for start in range(0, args.steps, args.chunk):
        state, aux = run(state)
        losses = np.asarray(jax.device_get(aux["loss"]))
        gn = np.asarray(jax.device_get(aux["grad_norm"]))
        if not np.all(np.isfinite(losses)):
            bad = int(np.argmax(~np.isfinite(losses)))
            first_bad = start + bad + 1
            print(f"chunk [{start+1}, {start+args.chunk}]: first non-finite "
                  f"loss at step {first_bad}; "
                  f"loss[{bad-1}]={losses[bad-1] if bad else float('nan')} "
                  f"grad_norm[bad-1]={gn[bad-1] if bad else float('nan')}",
                  file=sys.stderr, flush=True)
            break
        print(f"steps {start+1}-{start+args.chunk}: loss "
              f"{losses[-1]:.5f} max_grad_norm {gn.max():.3e}",
              file=sys.stderr, flush=True)
        host_state = jax.device_get(state)

    results = {"config": vars(args), "first_bad_step": first_bad}
    if first_bad is None:
        print("no divergence found", file=sys.stderr)
        print(json.dumps(results))
        if args.out:
            json.dump(results, open(args.out, "w"), indent=2)
        return

    # ---- phase 2: replay the bad chunk step-by-step ------------------------
    state = jax.device_put(host_state)
    loss_fn = make_loss_fn(model, render)

    @jax.jit
    def one_step_diag(state):
        key = fold_key(state)
        batch = bank.sample_batch(
            jax.random.fold_in(key, 0x5A17), args.batch_size
        )
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, batch
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state, state.key)
        gmax = jax.tree.reduce(
            jnp.maximum,
            jax.tree.map(lambda g: jnp.max(jnp.abs(g)), grads),
        )
        pmax = jax.tree.reduce(
            jnp.maximum,
            jax.tree.map(lambda p: jnp.max(jnp.abs(p)), params),
        )
        return new_state, loss, gmax, pmax, batch, key

    trail = []
    bad_key = bad_batch = None
    prev_state_host = jax.device_get(state)
    for i in range(args.chunk):
        new_state, loss, gmax, pmax, batch, key = one_step_diag(state)
        loss, gmax, pmax = (float(loss), float(gmax), float(pmax))
        step_no = int(jax.device_get(new_state.step))
        trail.append({"step": step_no, "loss": loss, "gmax": gmax,
                      "pmax": pmax})
        if not (np.isfinite(loss) and np.isfinite(gmax)):
            bad_key, bad_batch = key, jax.device_get(batch)
            print(f"step {step_no}: loss={loss} gmax={gmax} pmax={pmax} "
                  "<- FIRST NON-FINITE", file=sys.stderr, flush=True)
            break
        prev_state_host = jax.device_get(state)
        state = new_state
    results["trail_tail"] = trail[-12:]

    if bad_key is None:
        print("bad step did not replay (nondeterministic?)", file=sys.stderr)
        print(json.dumps(results))
        return

    # ---- phase 3: dissect the offending step -------------------------------
    # Re-render the bad batch with intermediate dumps (general path math,
    # mirrored from models/nerf.py::render_rays).
    params = jax.device_put(prev_state_host).params
    batch = {k: jnp.asarray(v) for k, v in bad_batch.items()
             if v is not None}
    k_strat, k_noise_c, k_pdf, k_noise_f = jax.random.split(bad_key, 4)

    def dissect(params):
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        t_coarse = sampling.sample_linear(
            k_strat, rays_o.shape[:-1], args.num_samples, 2.0, 6.0,
            randomly_sample=True, dtype=rays_o.dtype,
        )
        _, dens_c, col_c = model.forward(
            params, rays_o, rays_d, t_coarse, None, None
        )
        noise_c = args.noise * jax.random.normal(
            k_noise_c, dens_c.shape, dens_c.dtype
        )
        dens_cn = dens_c + noise_c
        dists_c = compositing.distances_from_tvals(t_coarse, rays_d)
        w_c = compositing.weights_from_density(dens_cn, dists_c)
        t_mids = 0.5 * (t_coarse[..., 1:] + t_coarse[..., :-1])
        t_fine = sampling.sample_pdf(
            k_pdf, t_mids, jax.lax.stop_gradient(w_c[..., 1:-1, 0]),
            args.fine_samples, randomly_sample=True,
        )
        t_all = sampling.merge_samples(t_coarse, t_fine)
        d_all = jnp.diff(t_all, axis=-1)
        _, dens_f, col_f = model.forward(
            params, rays_o, rays_d, t_all, None, None
        )
        noise_f = args.noise * jax.random.normal(
            k_noise_f, dens_f.shape, dens_f.dtype
        )
        dists_f = compositing.distances_from_tvals(t_all, rays_d)
        w_f = compositing.weights_from_density(dens_f + noise_f, dists_f)
        return {
            "t_coarse": t_coarse, "dens_c": dens_c, "w_c": w_c,
            "t_fine": t_fine, "t_all": t_all, "min_diff_t_all": d_all.min(),
            "dens_f": dens_f, "w_f": w_f, "dists_f": dists_f,
            "min_dists_f": dists_f.min(),
        }

    vals = jax.jit(dissect)(params)
    diag = []
    for k2, v in jax.device_get(vals).items():
        diag.append(stats(k2, v))
        print(diag[-1], file=sys.stderr, flush=True)
    results["dissection"] = diag
    print(json.dumps(results))
    if args.out:
        json.dump(results, open(args.out, "w"), indent=2)


if __name__ == "__main__":
    main()
