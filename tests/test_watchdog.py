"""Failure-detection tests: heartbeats, staleness, supervised restart.

SURVEY.md §5's failure row calls for heartbeat-based detection plus
kill-a-host fault injection in the multi-process CPU harness; the
reference has none of this (crash = lose the run,
``train_conditional_nerf.py:160-161``).  The supervisor tests here inject
REAL faults — a SIGKILL mid-run and a silent hang — and assert the gang
is restarted and completes from durable state.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
import time

import pytest

from nerf_tpu.parallel.watchdog import (
    Heartbeat,
    Supervisor,
    clear_heartbeats,
    read_heartbeats,
    stale_processes,
)


class TestHeartbeat:
    def test_beat_and_read(self, tmp_path):
        hb = Heartbeat(str(tmp_path), process_id=3, interval=0.05)
        with hb:
            hb.update(17)
            recs = read_heartbeats(str(tmp_path))
        assert recs[3]["step"] == 17
        assert recs[3]["pid"] == os.getpid()
        assert abs(recs[3]["time"] - time.time()) < 5.0

    def test_background_thread_keeps_beating(self, tmp_path):
        with Heartbeat(str(tmp_path), process_id=0, interval=0.02):
            t0 = read_heartbeats(str(tmp_path))[0]["time"]
            time.sleep(0.2)
            t1 = read_heartbeats(str(tmp_path))[0]["time"]
        assert t1 > t0  # thread re-beat without any update() call

    def test_staleness_detection(self, tmp_path):
        hb = Heartbeat(str(tmp_path), process_id=1, interval=1000.0)
        hb.beat()  # one beat, no thread
        assert stale_processes(str(tmp_path), timeout=60.0) == []
        future = time.time() + 120.0
        assert stale_processes(str(tmp_path), timeout=60.0, now=future) == [1]

    def test_torn_file_is_treated_as_missing(self, tmp_path):
        hb_dir = tmp_path / "heartbeats"
        hb_dir.mkdir()
        (hb_dir / "proc_0.json").write_text('{"pid": 1, "proc')  # torn
        assert read_heartbeats(str(tmp_path)) == {}

    def test_clear(self, tmp_path):
        Heartbeat(str(tmp_path), process_id=0).beat()
        clear_heartbeats(str(tmp_path))
        assert read_heartbeats(str(tmp_path)) == {}


_CRASHY_WORKER = textwrap.dedent(
    """
    import os, sys, signal, time
    sys.path.insert(0, {repo!r})
    from nerf_tpu.parallel.watchdog import Heartbeat

    run_dir, rank = sys.argv[1], int(sys.argv[2])
    mode = sys.argv[3]  # "crash-once" | "hang-once" | "clean"
    marker = os.path.join(run_dir, f"attempted_{{rank}}")
    first_attempt = not os.path.exists(marker)
    open(marker, "w").close()

    # Durable progress lives in a per-rank counter file ("checkpoint").
    ckpt = os.path.join(run_dir, f"progress_{{rank}}")
    step = int(open(ckpt).read()) if os.path.exists(ckpt) else 0

    hb = Heartbeat(run_dir, process_id=rank, interval=0.05).start()
    while step < 6:
        step += 1
        with open(ckpt + ".tmp", "w") as f:
            f.write(str(step))
        os.replace(ckpt + ".tmp", ckpt)
        hb.update(step)
        if first_attempt and step == 3 and rank == 1:
            if mode == "crash-once":
                os.kill(os.getpid(), signal.SIGKILL)  # mid-run fault
            if mode == "hang-once":
                # Wedged-collective simulation: the beat thread KEEPS
                # beating (process alive) but step never advances — only
                # the progress timeout can catch this.
                time.sleep(600)
            if mode == "dead-beat-once":
                hb.stop()  # crashed-without-exit: beats stop entirely
                time.sleep(600)
        time.sleep(0.02)
    hb.stop()
    """
)


def _write_worker(tmp_path):
    worker = tmp_path / "worker.py"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker.write_text(_CRASHY_WORKER.format(repo=repo))
    return worker


class TestSupervisor:
    def _run(self, tmp_path, mode, timeout, progress_timeout=None):
        worker = _write_worker(tmp_path)
        sup = Supervisor(
            lambda rank, _a: [
                sys.executable, str(worker), str(tmp_path), str(rank), mode
            ],
            num_processes=2,
            run_dir=str(tmp_path),
            heartbeat_timeout=timeout,
            progress_timeout=progress_timeout,
            poll_interval=0.05,
            max_restarts=2,
        )
        restarts = sup.run()
        for rank in range(2):
            assert (tmp_path / f"progress_{rank}").read_text() == "6"
        return restarts

    def test_clean_run_no_restarts(self, tmp_path):
        assert self._run(tmp_path, "clean", timeout=30.0) == 0

    def test_sigkill_mid_run_restarts_and_completes(self, tmp_path):
        # Rank 1 SIGKILLs itself mid-run on the first attempt; the
        # supervisor must detect the dead rank, kill the survivor, and
        # relaunch — workers resume from their durable progress files.
        assert self._run(tmp_path, "crash-once", timeout=30.0) == 1

    def test_wedged_rank_detected_by_progress_timeout(self, tmp_path):
        # Rank 1 stays ALIVE and its heartbeat thread keeps beating (the
        # wedged-collective case: XLA releases the GIL, the daemon thread
        # runs on) but step stops advancing — only the PROGRESS timeout
        # can trigger the restart.
        assert (
            self._run(
                tmp_path, "hang-once", timeout=30.0, progress_timeout=5.0
            )
            == 1
        )

    def test_dead_beats_detected_by_heartbeat_timeout(self, tmp_path):
        # Rank 1's beat thread dies while the process lives (crashed-
        # without-exit): heartbeat staleness catches it.  The timeout must
        # exceed worst-case beat starvation on a loaded single-core box —
        # bare interpreter startup alone is ~4.5 s here (sitecustomize),
        # and a sibling rank's import can starve the beat thread that long.
        assert self._run(tmp_path, "dead-beat-once", timeout=10.0) == 1

    def test_startup_hang_detected(self, tmp_path):
        # A worker that wedges BEFORE its first beat (e.g. stuck in
        # distributed init) never registers — the startup grace check
        # must fail the gang rather than spin forever.
        worker = tmp_path / "worker.py"
        worker.write_text(
            "import json, os, sys, time\n"
            "run_dir = sys.argv[1]\n"
            "marker = os.path.join(run_dir, 'attempted')\n"
            "first = not os.path.exists(marker)\n"
            "open(marker, 'w').close()\n"
            "if first:\n"
            "    time.sleep(600)  # hung startup, no heartbeat ever\n"
            "# Healthy resume: register a beat immediately (raw write —\n"
            "# no heavy imports, so the test is not racy under load).\n"
            "hb = os.path.join(run_dir, 'heartbeats')\n"
            "os.makedirs(hb, exist_ok=True)\n"
            "now = time.time()\n"
            "rec = {'pid': os.getpid(), 'process_id': 0, 'step': 0,\n"
            "       'time': now, 'progress_time': now}\n"
            "with open(os.path.join(hb, 'proc_0.json'), 'w') as f:\n"
            "    json.dump(rec, f)\n"
        )
        sup = Supervisor(
            lambda rank, _a: [sys.executable, str(worker), str(tmp_path)],
            num_processes=1,
            run_dir=str(tmp_path),
            heartbeat_timeout=30.0,
            # Must exceed interpreter startup: ~4.5 s on this box for a
            # bare `python -c pass` (sitecustomize), more under suite load.
            startup_timeout=30.0,
            poll_interval=0.05,
            max_restarts=2,
        )
        assert sup.run() == 1

    def test_gives_up_after_max_restarts(self, tmp_path):
        worker = tmp_path / "worker.py"
        worker.write_text("import sys; sys.exit(9)\n")
        sup = Supervisor(
            lambda rank, _a: [sys.executable, str(worker)],
            num_processes=1,
            run_dir=str(tmp_path),
            heartbeat_timeout=30.0,
            poll_interval=0.05,
            max_restarts=2,
        )
        with pytest.raises(RuntimeError, match="after 2 restarts"):
            sup.run()
        # Exactly max_restarts restarts were PERFORMED (3 launches total).
        assert sup.restarts == 2


_TRAIN_WORKER = textwrap.dedent(
    """
    import os, signal, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    rank = int(sys.argv[1])
    port = sys.argv[2]
    run_dir = sys.argv[3]

    from nerf_tpu.parallel import distributed
    distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=rank)

    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from nerf_tpu import ClassicNeRF, ClassicNeRFConfig, RenderConfig
    from nerf_tpu.parallel import (Heartbeat, make_parallel_train_step,
                                   prepare_parallel_state)
    from nerf_tpu.train import create_train_state
    from nerf_tpu.train.checkpoint import restore_latest, save_checkpoint

    marker = os.path.join(run_dir, f"attempted_{rank}")
    first_attempt = not os.path.exists(marker)
    open(marker, "w").close()

    mesh = Mesh(np.asarray(jax.devices()), ("batch",))
    model = ClassicNeRF(ClassicNeRFConfig(
        normalize_position=6.0, x_positional_encoding_size=8,
        d_positional_encoding_size=4, hidden_size=16, trunk_blocks=(2, 2),
        view_branch_depth=1))
    render = RenderConfig(num_coarse_samples=8, near=2.0, far=6.0,
                          randomly_sample=False, density_noise_std=0.0)
    opt = optax.adam(1e-3)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), opt)
    restored = restore_latest(run_dir, state)
    if restored is not None:
        state = restored
    state = prepare_parallel_state(state, mesh)
    step_fn = make_parallel_train_step(model, opt, render, mesh,
                                       donate=False)

    GLOBAL_BATCH = 32
    rng = np.random.default_rng(0)
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

    hb = Heartbeat(run_dir, process_id=rank, interval=0.1).start()
    while int(state.step) < 5:
        state, aux = step_fn(state, batch)
        hb.update(int(state.step))
        if rank == 0:
            save_checkpoint(run_dir, jax.device_get(state), keep=10)
        if first_attempt and rank == 1 and int(state.step) == 2:
            # MID-STEP fault: rank 1 dies between its checkpoint beat and
            # the next collective; rank 0 will wedge inside psum.
            os.kill(os.getpid(), signal.SIGKILL)
    hb.stop()
    print(f"RANK{rank} done step={int(state.step)} "
          f"loss={float(jax.device_get(aux['loss'])):.6f}", flush=True)
    """
)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class TestMidStepFaultInjection:
    def test_sigkill_during_training_recovers_via_supervisor(self, tmp_path):
        """The full §5 story end-to-end: two REAL jax.distributed processes
        training on a global mesh; rank 1 is SIGKILLed between step 2's
        checkpoint and step 3's collectives (rank 0 wedges inside psum);
        the supervisor kills the gang and relaunches; the restarted gang
        resumes from the step-2 checkpoint and finishes training."""
        worker = tmp_path / "worker_train.py"
        worker.write_text(_TRAIN_WORKER)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # one CPU device per process
        _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = _repo + os.pathsep + env.get("PYTHONPATH", "")
        # ^ workers import nerf_tpu; the package is not pip-installed here
        ports = [_free_port(), _free_port(), _free_port()]

        sup = Supervisor(
            lambda rank, attempt: [
                sys.executable, str(worker), str(rank),
                str(ports[attempt]), str(tmp_path),
            ],
            num_processes=2,
            run_dir=str(tmp_path),
            heartbeat_timeout=60.0,  # exit-code detection drives this one
            poll_interval=0.1,
            max_restarts=2,
            env=env,
        )
        restarts = sup.run()
        assert restarts == 1
        names = [n for n in os.listdir(tmp_path) if n.startswith("checkpoint_")]
        assert any("checkpoint_5" in n for n in names), names
