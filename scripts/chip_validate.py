"""One serialized pass of every chip-side validation + measurement.

The axon relay wedges if two chip clients run concurrently (CLAUDE.md), so
all chip work goes through this ONE process in sequence:

1. compile-check the kernels that only ran in interpret mode so far
   (classic fused-eval union kernel, mip fused train, mip fused eval);
2. measure train throughput: coarse 4096x64, hierarchical 2048x(64+128),
   mip 4096x64 (+ seg CE), conditional/latent classic;
3. measure eval throughput: 400x400 hierarchical render (fused path).

Prints one JSON dict at the end; failures in one section are recorded and
do not sink the rest.  Timing uses chain-length differencing (bench.py).

Usage:  python scripts/chip_validate.py [--skip-slow]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def section(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                RESULTS[name] = fn()
                RESULTS[name]["ok"] = True
            except Exception as e:  # noqa: BLE001
                traceback.print_exc()
                RESULTS[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            RESULTS[name]["wall_s"] = round(time.time() - t0, 1)
            print(f"[{name}] {RESULTS[name]}", file=sys.stderr, flush=True)
        return run
    return deco


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-slow", action="store_true")
    ap.add_argument("--sweep", action="store_true",
                    help="tile sweeps for the hier train kernel + eval render")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_tpu import (
        ClassicNeRF,
        ClassicNeRFConfig,
        MipNeRF,
        MipNeRFConfig,
        RenderConfig,
    )
    from bench import bench_train_step

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    model_bf16 = ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=6.0, use_pallas=True,
            compute_dtype="bfloat16",
        )
    )

    @section("fused_eval_compile")
    def _fused_eval():
        # Classic fused union eval kernel on real Mosaic.
        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=6.0, use_pallas=True)
        )
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        rays_o = jnp.asarray(rng.normal(size=(2048, 3)).astype(np.float32) * 0.5)
        rays_d = jnp.asarray(rng.normal(size=(2048, 3)).astype(np.float32))
        render = RenderConfig(
            num_coarse_samples=64, num_fine_samples=128, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0,
        )
        out = model.render_rays(
            params, None, rays_o, rays_d, render, fused_eval=True
        )
        ref = model.render_rays(
            params, None, rays_o, rays_d, render, fused_eval=False
        )
        diff = float(
            jnp.max(jnp.abs(out.rgb[..., -1, :] - ref.rgb[..., -1, :]))
        )
        assert diff < 5e-3, f"fused eval mismatch on chip: {diff}"
        return {"max_abs_diff_vs_xla": diff}

    @section("mip_fused_compile")
    def _mip_fused():
        # Mip fused train + eval kernels on real Mosaic.
        from nerf_tpu.ops.pallas import fused_mip_train
        from nerf_tpu.train.loop import make_loss_fn

        cfg = MipNeRFConfig(use_pallas=True)
        model = MipNeRF(cfg)
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        batch = {
            "rays_o": jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32)),
            "rays_d": jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32)),
            "pixels": jnp.asarray(rng.uniform(size=(256, 3)).astype(np.float32)),
            "labels": jnp.asarray(rng.integers(0, 50, size=(256,))),
        }
        key = jax.random.PRNGKey(3)
        loss, grads, _ = fused_mip_train.mip_train_loss_and_grads(
            model, params, RenderConfig(num_coarse_samples=64,
                                        randomly_sample=True,
                                        density_noise_std=1.0),
            batch, key, 0.25,
        )
        xla = MipNeRF(MipNeRFConfig(use_pallas=False))
        loss_fn = make_loss_fn(xla, RenderConfig(num_coarse_samples=64,
                                                 randomly_sample=True,
                                                 density_noise_std=1.0), 0.25)
        (ref_loss, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(
            params, key, batch
        )
        dl = abs(float(loss) - float(ref_loss))
        assert dl < 1e-3 * max(1.0, abs(float(ref_loss))), dl
        # Eval kernel.
        render = RenderConfig(num_coarse_samples=64, randomly_sample=False,
                              density_noise_std=0.0)
        out = model.render_rays(params, None, batch["rays_o"],
                                batch["rays_d"], render, fused_eval=True)
        ref = xla.render_rays(params, None, batch["rays_o"],
                              batch["rays_d"], render)
        dr = float(jnp.max(jnp.abs(out.rgb - ref.rgb)))
        assert dr < 5e-3, dr
        return {"train_loss_diff": dl, "eval_rgb_diff": dr}

    @section("train_coarse")
    def _coarse():
        render = RenderConfig(num_coarse_samples=64, near=2.0, far=6.0,
                              randomly_sample=True, density_noise_std=1.0)
        t = bench_train_step(model_bf16, render, 4096, fused=True)
        return {"ms_per_step": round(t * 1e3, 2),
                "rays_per_s": round(4096 / t)}

    @section("train_noviewdirs")
    def _noviewdirs():
        # BASELINE.json config #1 as written: 64 coarse samples, NO
        # view-direction conditioning (round-2 fused-kernel extension).
        model = ClassicNeRF(
            ClassicNeRFConfig(
                normalize_position=6.0, use_pallas=True,
                compute_dtype="bfloat16", use_viewdirs=False,
            )
        )
        render = RenderConfig(num_coarse_samples=64, near=2.0, far=6.0,
                              randomly_sample=True, density_noise_std=1.0)
        t = bench_train_step(model, render, 4096, fused=True)
        return {"ms_per_step": round(t * 1e3, 2),
                "rays_per_s": round(4096 / t)}

    @section("train_hierarchical")
    def _hier():
        render = RenderConfig(num_coarse_samples=64, num_fine_samples=128,
                              near=2.0, far=6.0, randomly_sample=True,
                              density_noise_std=1.0)
        t = bench_train_step(model_bf16, render, 2048, k1=4, k2=16,
                             fused=True)
        return {"ms_per_step": round(t * 1e3, 2),
                "rays_per_s": round(2048 / t)}

    @section("train_mip")
    def _mip_train():
        model = MipNeRF(MipNeRFConfig(use_pallas=True,
                                      compute_dtype="bfloat16"))
        render = RenderConfig(num_coarse_samples=64, randomly_sample=True,
                              density_noise_std=1.0)
        t = bench_train_step(model, render, 4096, fused=True)
        return {"ms_per_step": round(t * 1e3, 2),
                "rays_per_s": round(4096 / t)}

    @section("train_conditional")
    def _cond():
        # Latent-conditioned classic (BASELINE config #4) on the fused path.
        from nerf_tpu.data import RayBank

        rng = np.random.default_rng(0)
        n = 200_000
        n_img = 20
        bank = RayBank(
            rays_o=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
            rays_d=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
            pixels=jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32),
            labels=None,
            # Real per-image latent tables gathered through image_index
            # (the documented RayBank contract) so the bench exercises
            # the gather, not just row 0.
            image_index=jnp.asarray(rng.integers(0, n_img, size=(n,)),
                                    jnp.int32),
            states_x=jnp.asarray(rng.normal(size=(n_img, 2)), jnp.float32),
            states_d=jnp.asarray(rng.normal(size=(n_img, 1)), jnp.float32),
            image_shape=(n_img, 100, 100),
            focal_length=100.0,
        )
        cfg = ClassicNeRFConfig(
            normalize_position=6.0, use_pallas=True,
            compute_dtype="bfloat16", density_inputs=5, color_inputs=4,
        )
        model = ClassicNeRF(cfg)
        render = RenderConfig(num_coarse_samples=64, near=2.0, far=6.0,
                              randomly_sample=True, density_noise_std=1.0)
        t = bench_train_step(model, render, 4096, fused=True, bank=bank)
        return {"ms_per_step": round(t * 1e3, 2),
                "rays_per_s": round(4096 / t)}

    @section("eval_render")
    def _eval():
        from nerf_tpu.data.scenes import spherical_poses

        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=6.0, use_pallas=True,
                              compute_dtype="bfloat16")
        )
        params = model.init(jax.random.PRNGKey(0))
        pose_o, pose_r = spherical_poses(1, radius=4.0)
        render = RenderConfig(
            num_coarse_samples=64, num_fine_samples=128, near=2.0, far=6.0,
            randomly_sample=False, density_noise_std=0.0,
            rays_per_tile=2048,
        )

        def frames(n):
            def body(img, _):
                img = model.render_image(
                    params, None, pose_o, pose_r, 400, 400, 555.0, render
                )
                return img, ()
            import jax.lax as lax

            out, _ = lax.scan(body, jnp.zeros((1, 400, 400, 3)), None,
                              length=n)
            return out

        f2 = jax.jit(lambda: frames(2))
        f6 = jax.jit(lambda: frames(6))
        f2().block_until_ready()
        f6().block_until_ready()
        ts = {}
        for name, f in (("f2", f2), ("f6", f6)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f())
                best = min(best, time.perf_counter() - t0)
            ts[name] = best
        per_frame = (ts["f6"] - ts["f2"]) / 4
        return {"ms_per_frame": round(per_frame * 1e3, 1),
                "rays_per_s": round(160_000 / per_frame)}

    @section("eval_render_ndc")
    def _eval_ndc():
        # BASELINE.json config #5: LLFF-style forward-facing scene, NDC
        # rays, 504x378, full 64+128 coarse+fine pipeline.
        from nerf_tpu.data.scenes import forward_facing_poses

        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=1.0, use_pallas=True,
                              compute_dtype="bfloat16")
        )
        params = model.init(jax.random.PRNGKey(0))
        pose_o, pose_r = forward_facing_poses(1)
        h, w = 378, 504
        render = RenderConfig(
            num_coarse_samples=64, num_fine_samples=128, near=0.0, far=1.0,
            randomly_sample=False, density_noise_std=0.0,
            use_ndc=True, rays_per_tile=2048,
        )

        import jax.lax as lax

        def frames(n):
            def body(img, _):
                img = model.render_image(
                    params, None, pose_o, pose_r, h, w, 500.0, render
                )
                return img, ()

            out, _ = lax.scan(body, jnp.zeros((1, h, w, 3)), None, length=n)
            return out

        f2 = jax.jit(lambda: frames(2))
        f6 = jax.jit(lambda: frames(6))
        f2().block_until_ready()
        f6().block_until_ready()
        best2 = best6 = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f2())
            best2 = min(best2, time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(f6())
            best6 = min(best6, time.perf_counter() - t0)
        per_frame = (best6 - best2) / 4
        return {"ms_per_frame": round(per_frame * 1e3, 1),
                "rays_per_s": round(h * w / per_frame)}

    @section("sweep_hier_tiles")
    def _sweep_hier():
        # Tile sweep for the fused hierarchical fine kernel.  TILE_F and
        # _SPLITS are module globals read at trace time, so patch + rebuild
        # re-jits each point.  Keep the grid small: each point recompiles
        # (~30 s) and times two chain lengths.
        from nerf_tpu.ops.pallas import fused_hier

        render = RenderConfig(num_coarse_samples=64, num_fine_samples=128,
                              near=2.0, far=6.0, randomly_sample=True,
                              density_noise_std=1.0)
        base = (fused_hier.TILE_F, fused_hier._SPLITS)
        points = {}
        try:
            for tile in (512, 1024, 2048):
                for splits in (1, 2):
                    fused_hier.TILE_F, fused_hier._SPLITS = tile, splits
                    t = bench_train_step(model_bf16, render, 2048,
                                         k1=4, k2=16, fused=True)
                    points[f"tile{tile}_sp{splits}"] = {
                        "ms_per_step": round(t * 1e3, 2),
                        "rays_per_s": round(2048 / t),
                    }
                    print(f"  hier tile={tile} splits={splits}: "
                          f"{2048 / t:,.0f} rays/s", file=sys.stderr,
                          flush=True)
        finally:
            fused_hier.TILE_F, fused_hier._SPLITS = base
        return {"points": points}

    @section("sweep_eval_tiles")
    def _sweep_eval():
        # rays_per_tile sweep for the fused 400x400 hierarchical render.
        from nerf_tpu.data.scenes import spherical_poses

        model = ClassicNeRF(
            ClassicNeRFConfig(normalize_position=6.0, use_pallas=True,
                              compute_dtype="bfloat16")
        )
        params = model.init(jax.random.PRNGKey(0))
        pose_o, pose_r = spherical_poses(1, radius=4.0)
        import jax.lax as lax

        points = {}
        for tile in (1024, 2048, 4096):
            render = RenderConfig(
                num_coarse_samples=64, num_fine_samples=128,
                near=2.0, far=6.0, randomly_sample=False,
                density_noise_std=0.0, rays_per_tile=tile,
            )

            def frame():
                return model.render_image(
                    params, None, pose_o, pose_r, 400, 400, 555.0, render
                )

            import jax.lax as lax

            def frames(n):
                def body(img, _):
                    return frame(), ()
                out, _ = lax.scan(body, jnp.zeros((1, 400, 400, 3)),
                                  None, length=n)
                return out

            f2 = jax.jit(functools.partial(frames, 2))
            f6 = jax.jit(functools.partial(frames, 6))
            np.asarray(f2()); np.asarray(f6())
            best2 = best6 = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(f2())
                best2 = min(best2, time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f6())
                best6 = min(best6, time.perf_counter() - t0)
            per_frame = (best6 - best2) / 4
            points[f"tile{tile}"] = {
                "ms_per_frame": round(per_frame * 1e3, 1),
                "rays_per_s": round(160_000 / per_frame),
            }
            print(f"  eval rays_per_tile={tile}: "
                  f"{160_000 / per_frame:,.0f} rays/s", file=sys.stderr,
                  flush=True)
        return {"points": points}

    _fused_eval()
    _mip_fused()
    _coarse()
    _noviewdirs()
    _hier()
    _mip_train()
    _cond()
    if not args.skip_slow:
        _eval()
        _eval_ndc()
    if args.sweep:
        _sweep_hier()
        _sweep_eval()

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
