"""Smoke tests for the three CLI entry points (tiny, fast CPU runs).

These drive exactly what a user would run: the tiny_nerf trainer
(notebook-equivalent, reference examples/example.ipynb), the conditional
trainer (reference train_conditional_nerf.py contract incl. the pickle
payload format), and the checkpoint renderer.
"""

import json
import os
import pickle

import numpy as np
import pytest


class TestTinyNerfCli:
    def test_short_training_run(self, tmp_path):
        from nerf_tpu.cli import train_tiny_nerf

        logdir = str(tmp_path / "run")
        train_tiny_nerf.main([
            "--logging-dir", logdir,
            "--data", str(tmp_path / "missing.npz"),  # -> synthetic scene
            "--num-steps", "6",
            "--batch-size", "128",
            "--num-samples-per-ray", "8",
            "--log-interval", "3",
            "--synthetic-views", "3",
            "--synthetic-hw", "24",
        ])
        assert os.path.exists(os.path.join(logdir, "params.json"))
        with open(os.path.join(logdir, "params.json")) as f:
            assert json.load(f)["num_steps"] == 6
        # checkpoints + pth export + metrics land in the logging dir
        names = os.listdir(logdir)
        assert any(n.endswith(".pth") for n in names), names
        assert any("checkpoint" in n for n in names), names

    def test_data_parallel_flag(self, tmp_path):
        # The --data-parallel flag drives the mesh Trainer over all 8
        # virtual devices end-to-end.
        from nerf_tpu.cli import train_tiny_nerf

        logdir = str(tmp_path / "dp_run")
        train_tiny_nerf.main([
            "--logging-dir", logdir,
            "--data", str(tmp_path / "missing.npz"),
            "--num-steps", "6",
            "--batch-size", "128",
            "--num-samples-per-ray", "8",
            "--log-interval", "3",
            "--synthetic-views", "3",
            "--synthetic-hw", "24",
            "--data-parallel",
        ])
        assert os.path.exists(os.path.join(logdir, "params.json"))


class TestConditionalCli:
    def test_short_training_run(self, tmp_path):
        from nerf_tpu.cli import train_conditional

        rng = np.random.default_rng(0)
        b, hw = 3, 12
        payload = {
            "images": rng.uniform(size=(b, hw, hw, 3)).astype(np.float32),
            "poses": np.concatenate(
                [rng.normal(size=(b, 3)), rng.normal(size=(b, 3))], -1
            ).astype(np.float32),
            "states": rng.normal(size=(b, 4)).astype(np.float32),
        }
        data = tmp_path / "data_for_nerf.pkl"
        with open(data, "wb") as f:
            pickle.dump(payload, f)
        logdir = str(tmp_path / "run")
        train_conditional.main([
            "--logging-dir", logdir,
            "--data", str(data),
            "--epochs", "1",
            "--batch-size", "64",
            "--num-samples-per-ray", "8",
            "--near-plane", "2.0",
            "--far-plane", "6.0",
            "--log-interval", "2",
        ])
        assert os.path.exists(os.path.join(logdir, "params.json"))


class TestRenderCli:
    def test_render_reference_checkpoint(self, tmp_path):
        if not os.path.exists("/root/reference/examples/nerf.pth"):
            pytest.skip("reference checkpoint unavailable")
        from nerf_tpu.cli import render

        outdir = str(tmp_path / "renders")
        render.main([
            "--checkpoint", "/root/reference/examples/nerf.pth",
            "--output-dir", outdir,
            "--image-size", "24",
            "--focal", "33.33",
            "--num-views", "2",
            "--num-samples-per-ray", "16",
        ])
        files = os.listdir(outdir)
        assert files, "no renders written"
