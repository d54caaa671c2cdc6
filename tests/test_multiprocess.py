"""Real multi-PROCESS distributed tests (2 processes, CPU backend, Gloo).

Everything else in the suite exercises multi-device sharding inside one
process; these tests spawn two actual Python processes through
``nerf_tpu.parallel.distributed.initialize`` — the same code path a
multi-host TPU pod uses — and check:

* the global 2-process mesh trains, with each host feeding only its
  ``host_local_slice`` of the global batch, and both processes agree on
  the loss;
* checkpoint/restart recovery: kill the job after N steps, restart both
  processes from the checkpoint, and training resumes exactly (the §5
  failure-recovery story: periodic sharded checkpoints + restart).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1])
    port = sys.argv[2]
    ckpt_dir = sys.argv[3]
    phase = sys.argv[4]  # "first" or "resume"

    from nerf_tpu.parallel import distributed
    distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=rank)
    assert jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.parallel import (make_parallel_train_step,
                                   prepare_parallel_state)
    from nerf_tpu.train import create_train_state
    from nerf_tpu.train.checkpoint import restore_latest, save_checkpoint

    mesh = Mesh(np.asarray(jax.devices()), ("batch",))
    model = ClassicNeRF(ClassicNeRFConfig(
        normalize_position=6.0, x_positional_encoding_size=8,
        d_positional_encoding_size=4, hidden_size=16, trunk_blocks=(2, 2),
        view_branch_depth=1))
    render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                          randomly_sample=False, density_noise_std=0.0)
    opt = optax.adam(1e-3)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
    if phase == "resume":
        restored = restore_latest(ckpt_dir, state)
        assert restored is not None, "no checkpoint to resume from"
        state = restored
        assert int(state.step) == 3, int(state.step)
    state = prepare_parallel_state(state, mesh)
    step = make_parallel_train_step(model, opt, render, mesh, donate=False)

    GLOBAL_BATCH = 32
    rng = np.random.default_rng(0)  # same global data on every host
    g = {
        "rays_o": rng.normal(size=(GLOBAL_BATCH, 3)).astype(np.float32),
        "rays_d": rng.normal(size=(GLOBAL_BATCH, 3)).astype(np.float32),
        "pixels": rng.uniform(size=(GLOBAL_BATCH, 3)).astype(np.float32),
    }
    sl = distributed.host_local_slice(GLOBAL_BATCH, GLOBAL_BATCH)
    sharding = NamedSharding(mesh, P("batch"))
    batch = {
        k: jax.make_array_from_process_local_data(
            sharding, v[sl], (GLOBAL_BATCH, 3))
        for k, v in g.items()
    }

    losses = []
    for _ in range(3):
        state, aux = step(state, batch)
        losses.append(float(jax.device_get(aux["loss"])))

    distributed.collective_barrier()
    if phase == "first" and distributed.is_coordinator():
        save_checkpoint(ckpt_dir, jax.device_get(state))
    print(f"RANK{rank} {phase} step={int(state.step)} "
          f"losses={','.join(f'{l:.6f}' for l in losses)}", flush=True)
    """
)


_WORKER_SP = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1])
    port = sys.argv[2]

    from nerf_tpu.parallel import distributed
    distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=rank)

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.parallel import (make_sample_parallel_train_step,
                                   prepare_parallel_state)
    from nerf_tpu.train import create_train_state, make_train_step

    # One device per process; the GLOBAL mesh is (batch=1, sample=2) — each
    # PROCESS owns one shard of the samples-per-ray axis (the north-star
    # "rays and samples sharded across a pod slice" decomposition).
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 2), ("batch", "sample"))
    model = ClassicNeRF(ClassicNeRFConfig(
        normalize_position=6.0, x_positional_encoding_size=8,
        d_positional_encoding_size=4, hidden_size=16, trunk_blocks=(2, 2),
        view_branch_depth=1))
    render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                          randomly_sample=False, density_noise_std=0.0)
    opt = optax.adam(1e-3)

    GLOBAL_BATCH = 32
    rng = np.random.default_rng(0)  # same global data on every host
    g = {
        "rays_o": rng.normal(size=(GLOBAL_BATCH, 3)).astype(np.float32),
        "rays_d": rng.normal(size=(GLOBAL_BATCH, 3)).astype(np.float32),
        "pixels": rng.uniform(size=(GLOBAL_BATCH, 3)).astype(np.float32),
    }
    sharding = NamedSharding(mesh, P("batch"))
    batch = {
        k: jax.make_array_from_process_local_data(
            sharding, v, (GLOBAL_BATCH, 3))
        for k, v in g.items()
    }

    state = prepare_parallel_state(
        create_train_state(model.init(jax.random.PRNGKey(0)), opt), mesh)
    step = make_sample_parallel_train_step(model, opt, render, mesh,
                                           donate=False)
    losses = []
    for _ in range(3):
        state, aux = step(state, batch)
        losses.append(float(jax.device_get(aux["loss"])))

    # Single-device oracle computed host-locally on the same data.
    s0 = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
    single = make_train_step(model, opt, render, donate=False)
    ref_losses = []
    local_batch = {k: jnp.asarray(v) for k, v in g.items()}
    for _ in range(3):
        s0, aux = single(s0, local_batch)
        ref_losses.append(float(jax.device_get(aux["loss"])))

    ok = np.allclose(losses, ref_losses, rtol=1e-5)
    print(f"RANK{rank} sp losses={','.join(f'{l:.6f}' for l in losses)} "
          f"match_single={ok}", flush=True)
    assert ok, (losses, ref_losses)
    """
)


_WORKER_TP = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1])
    port = sys.argv[2]

    from nerf_tpu.parallel import distributed
    distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=rank)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.parallel.tensor_parallel import make_tp_render_rays

    # One device per process; the GLOBAL mesh shards the MLP hidden dim
    # ACROSS the process boundary (each process holds half of every
    # weight matrix; XLA's all-reduces run over the distributed backend).
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 2), ("batch", "model"))
    model = ClassicNeRF(ClassicNeRFConfig(
        normalize_position=6.0, x_positional_encoding_size=8,
        d_positional_encoding_size=4, hidden_size=16, trunk_blocks=(2, 2),
        view_branch_depth=1, use_pallas=False))
    params = model.init(jax.random.PRNGKey(0))
    render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                          randomly_sample=False, density_noise_std=0.0)

    rng = np.random.default_rng(0)  # same rays on every host
    rays_o = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))

    # jit in_shardings place the (host-replicated) params into the TP
    # layout; XLA inserts the cross-process collectives.
    tp_render = make_tp_render_rays(model, render, mesh)
    rgb_tp = np.asarray(
        jax.device_get(tp_render(params, rays_o, rays_d))
    )

    # Host-local single-device oracle.
    rgb_local = np.asarray(model.render_rays(
        params, None, rays_o, rays_d, render).rgb[..., -1, :])
    ok = np.allclose(rgb_tp, rgb_local, rtol=1e-5, atol=1e-6)
    print(f"RANK{rank} tp mean={rgb_tp.mean():.6f} match={ok}", flush=True)
    assert ok
    """
)


_WORKER_TP_CKPT = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1])
    port = sys.argv[2]
    ckpt_dir = sys.argv[3]
    phase = sys.argv[4]  # "first" or "resume"

    from nerf_tpu.parallel import distributed
    distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=rank)

    import os
    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.parallel.tensor_parallel import (make_tp_train_step,
                                                   prepare_tp_state)
    from nerf_tpu.train import create_train_state
    from nerf_tpu.train.checkpoint import restore_latest, save_checkpoint

    # Hidden dim split ACROSS the process boundary: every param (and Adam
    # moment) leaf is non-addressable from either process, so the sharded
    # checkpoint layout is the only correct one.
    mesh = Mesh(np.asarray(jax.devices()).reshape(1, 2), ("batch", "model"))
    model = ClassicNeRF(ClassicNeRFConfig(
        normalize_position=6.0, x_positional_encoding_size=8,
        d_positional_encoding_size=4, hidden_size=16, trunk_blocks=(2, 2),
        view_branch_depth=1, use_pallas=False))
    render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                          randomly_sample=False, density_noise_std=0.0)
    opt = optax.adam(1e-3)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
    state = prepare_tp_state(state, model, mesh)
    if phase == "resume":
        restored = restore_latest(ckpt_dir, state)
        assert restored is not None, "no checkpoint to resume from"
        state = restored
        assert int(state.step) == 3, int(state.step)

    step = make_tp_train_step(model, opt, render, mesh, donate=False)

    GLOBAL_BATCH = 32
    rng = np.random.default_rng(0)  # same global data on every host
    g = {
        "rays_o": rng.normal(size=(GLOBAL_BATCH, 3)).astype(np.float32),
        "rays_d": rng.normal(size=(GLOBAL_BATCH, 3)).astype(np.float32),
        "pixels": rng.uniform(size=(GLOBAL_BATCH, 3)).astype(np.float32),
    }
    repl = NamedSharding(mesh, P())
    batch = {
        k: jax.make_array_from_process_local_data(repl, v, (GLOBAL_BATCH, 3))
        for k, v in g.items()
    }

    losses = []
    for _ in range(3):
        state, aux = step(state, batch)
        losses.append(float(jax.device_get(aux["loss"])))

    if phase == "first":
        # EVERY process calls save (collective): each writes only its own
        # addressable shards, proc 0 gates completion with the manifest.
        save_checkpoint(ckpt_dir, state)
        if rank == 0:
            names = sorted(os.listdir(ckpt_dir))
            assert names == ["checkpoint_3.npz", "checkpoint_3.shards0.npz",
                             "checkpoint_3.shards1.npz"], names
    distributed.collective_barrier()
    print(f"RANK{rank} {phase} step={int(state.step)} "
          f"losses={','.join(f'{l:.6f}' for l in losses)}", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(tmp_path, port, phase):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = _repo + os.pathsep + env.get("PYTHONPATH", "")
    # ^ workers import nerf_tpu; the package is not pip-installed here
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(r), str(port),
             str(tmp_path / "ckpt"), phase],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]
    return outs


class TestTwoProcessSampleParallel:
    def test_cross_process_sample_sharding_matches_single_device(
        self, tmp_path
    ):
        """Two processes, samples-per-ray axis split ACROSS the process
        boundary: the compositing hand-off collectives run over the
        distributed backend, and the loss sequence must equal the
        single-device oracle."""
        port = _free_port()
        worker = tmp_path / "worker_sp.py"
        worker.write_text(_WORKER_SP)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # one CPU device per process
        _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = _repo + os.pathsep + env.get("PYTHONPATH", "")
        # ^ workers import nerf_tpu; the package is not pip-installed here
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(r), str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
            for r in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
            assert p.returncode == 0, out.decode()[-2000:]
        lines = [
            next(l for l in o.splitlines() if l.startswith(f"RANK{r}"))
            for r, o in enumerate(outs)
        ]
        assert "match_single=True" in lines[0]
        assert "match_single=True" in lines[1]
        # Both processes observed the identical global loss sequence.
        assert lines[0].split(" ", 1)[1] == lines[1].split(" ", 1)[1]


class TestTwoProcessTensorParallel:
    def test_cross_process_hidden_dim_sharding_matches_local(self, tmp_path):
        """Two processes, MLP hidden dim split ACROSS the process boundary
        via GSPMD param shardings: rendering must equal the local oracle."""
        port = _free_port()
        worker = tmp_path / "worker_tp.py"
        worker.write_text(_WORKER_TP)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # one CPU device per process
        _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = _repo + os.pathsep + env.get("PYTHONPATH", "")
        # ^ workers import nerf_tpu; the package is not pip-installed here
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(r), str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
            for r in range(2)
        ]
        for r, p in enumerate(procs):
            out, _ = p.communicate(timeout=300)
            text = out.decode()
            assert p.returncode == 0, text[-2000:]
            assert f"RANK{r} tp" in text and "match=True" in text


class TestTwoProcessShardedCheckpoint:
    def test_tp_sharded_checkpoint_restart(self, tmp_path):
        """dp×tp global mesh with the model axis ACROSS the process
        boundary: the train state is non-addressable from either process,
        so save must go through the sharded layout (per-process shard
        files + manifest) and restore must reassemble + re-shard.  Kill
        after 3 steps, restart, and the resumed run must agree across
        ranks and keep counting steps."""

        def run(phase, port):
            worker = tmp_path / "worker_tp_ckpt.py"
            worker.write_text(_WORKER_TP_CKPT)
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)  # one CPU device per process
            _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            env["PYTHONPATH"] = _repo + os.pathsep + env.get("PYTHONPATH", "")
            # ^ workers import nerf_tpu; the package is not pip-installed here
            procs = [
                subprocess.Popen(
                    [sys.executable, str(worker), str(r), str(port),
                     str(tmp_path / "ckpt"), phase],
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    env=env,
                )
                for r in range(2)
            ]
            outs = []
            for p in procs:
                out, _ = p.communicate(timeout=300)
                outs.append(out.decode())
                assert p.returncode == 0, out.decode()[-2000:]
            return [
                next(l for l in o.splitlines() if l.startswith(f"RANK{r}"))
                for r, o in enumerate(outs)
            ]

        lines = run("first", _free_port())
        assert "step=3" in lines[0]
        assert lines[0].split(" ", 2)[2] == lines[1].split(" ", 2)[2]

        lines2 = run("resume", _free_port())
        assert "step=6" in lines2[0]
        assert lines2[0].split(" ", 2)[2] == lines2[1].split(" ", 2)[2]
        # Resumed losses continue to improve on the first phase's start.
        first = [float(x) for x in lines[0].split("losses=")[1].split(",")]
        resumed = [float(x) for x in
                   lines2[0].split("losses=")[1].split(",")]
        assert resumed[-1] < first[0]


class TestTwoProcessTraining:
    def test_train_and_checkpoint_restart_recovery(self, tmp_path):
        port = _free_port()
        outs = _run_pair(tmp_path, port, "first")
        lines = [
            next(l for l in o.splitlines() if l.startswith(f"RANK{r}"))
            for r, o in enumerate(outs)
        ]
        # Both hosts computed the identical global loss sequence.
        assert lines[0].split(" ", 2)[2] == lines[1].split(" ", 2)[2]
        assert "step=3" in lines[0]

        # "Kill" the job (processes exited), restart from the checkpoint.
        port2 = _free_port()
        outs2 = _run_pair(tmp_path, port2, "resume")
        lines2 = [
            next(l for l in o.splitlines() if l.startswith(f"RANK{r}"))
            for r, o in enumerate(outs2)
        ]
        assert "step=6" in lines2[0]
        assert lines2[0].split(" ", 2)[2] == lines2[1].split(" ", 2)[2]
        # Training kept improving after the restart.
        first_losses = [float(x) for x in
                        lines[0].split("losses=")[1].split(",")]
        resumed_losses = [float(x) for x in
                          lines2[0].split("losses=")[1].split(",")]
        assert resumed_losses[-1] < first_losses[0]
