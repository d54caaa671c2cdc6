"""Sharded / multi-host-safe checkpointing (SURVEY §5 failure recovery).

The single-file layout ``np.asarray``s every leaf — correct only when the
whole state is addressable from one process.  These tests pin the sharded
layout on the 8-virtual-device mesh: TP-partitioned params AND Adam
moments round-trip exactly, restore re-shards to the template's layout
(including a DIFFERENT mesh shape than the save ran on), completion is
manifest-gated, and retention prunes shard files too.  The REAL 2-process
version (state partitioned across process boundaries, kill + resume) is
``tests/test_multiprocess.py::test_tp_sharded_checkpoint_restart``.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_tpu import ClassicNeRF, ClassicNeRFConfig
from nerf_tpu.parallel.tensor_parallel import prepare_tp_state
from nerf_tpu.train import create_train_state
from nerf_tpu.train.checkpoint import (
    restore_latest,
    save_checkpoint,
)


def _small_model():
    return ClassicNeRF(
        ClassicNeRFConfig(
            normalize_position=6.0,
            x_positional_encoding_size=8,
            d_positional_encoding_size=4,
            hidden_size=16,
            trunk_blocks=(2, 2),
            view_branch_depth=1,
            use_pallas=False,
        )
    )


def _tp_state(model, mesh, seed=0, step=7):
    opt = optax.adam(1e-3)
    state = create_train_state(model.init(jax.random.PRNGKey(seed)), opt)
    state = state._replace(step=jnp.asarray(step, jnp.int32))
    return prepare_tp_state(state, model, mesh)


def _assert_states_equal(a, b):
    fa = jax.tree_util.tree_leaves(jax.device_get(a))
    fb = jax.tree_util.tree_leaves(jax.device_get(b))
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture
def mesh24():
    dev = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(dev, ("batch", "model"))


class TestShardedRoundTrip:
    def test_tp_state_roundtrips_through_sharded_layout(
        self, tmp_path, mesh24
    ):
        model = _small_model()
        state = _tp_state(model, mesh24)
        save_checkpoint(str(tmp_path), state, sharded=True)
        assert os.path.exists(tmp_path / "checkpoint_7.npz")
        assert os.path.exists(tmp_path / "checkpoint_7.shards0.npz")

        template = _tp_state(model, mesh24, seed=1)  # different values
        restored = restore_latest(str(tmp_path), template)
        _assert_states_equal(restored, state)
        # Shardings come from the template, not the file: TP params (and
        # the mirrored Adam moments) stay partitioned after restore.
        w = restored.params["block_0"][0]["linear"]["w"]
        t = template.params["block_0"][0]["linear"]["w"]
        assert w.sharding == t.sharding
        assert not w.sharding.is_fully_replicated

    def test_auto_layout_single_process_is_single_file(
        self, tmp_path, mesh24
    ):
        model = _small_model()
        state = _tp_state(model, mesh24)
        save_checkpoint(str(tmp_path), state)  # auto: addressable -> single
        assert os.path.exists(tmp_path / "checkpoint_7.npz")
        assert not os.path.exists(tmp_path / "checkpoint_7.shards0.npz")
        restored = restore_latest(str(tmp_path), _tp_state(model, mesh24, 1))
        _assert_states_equal(restored, state)

    def test_sharded_restore_onto_different_mesh_shape(
        self, tmp_path, mesh24
    ):
        model = _small_model()
        state = _tp_state(model, mesh24)
        save_checkpoint(str(tmp_path), state, sharded=True)
        # Restore into a 4x2 mesh template — the global arrays are
        # layout-independent, the template dictates the new placement.
        mesh42 = Mesh(
            np.asarray(jax.devices()[:8]).reshape(4, 2), ("batch", "model")
        )
        template = _tp_state(model, mesh42, seed=1)
        restored = restore_latest(str(tmp_path), template)
        _assert_states_equal(restored, state)
        w = restored.params["block_0"][0]["linear"]["w"]
        assert w.sharding.mesh.shape["model"] == 2

    def test_missing_shard_file_fails_loudly(self, tmp_path, mesh24):
        model = _small_model()
        state = _tp_state(model, mesh24)
        save_checkpoint(str(tmp_path), state, sharded=True)
        os.remove(tmp_path / "checkpoint_7.shards0.npz")
        with pytest.raises(FileNotFoundError, match="missing"):
            restore_latest(str(tmp_path), _tp_state(model, mesh24, 1))

    def test_retention_prunes_shard_files(self, tmp_path, mesh24):
        model = _small_model()
        for step in (1, 2, 3, 4):
            state = _tp_state(model, mesh24, step=step)
            save_checkpoint(str(tmp_path), state, keep=2, sharded=True)
        names = sorted(os.listdir(tmp_path))
        assert names == [
            "checkpoint_3.npz",
            "checkpoint_3.shards0.npz",
            "checkpoint_4.npz",
            "checkpoint_4.shards0.npz",
        ]

    def test_structure_mismatch_fails_loudly(self, tmp_path, mesh24):
        model = _small_model()
        state = _tp_state(model, mesh24)
        save_checkpoint(str(tmp_path), state, sharded=True)
        other = ClassicNeRF(
            ClassicNeRFConfig(
                normalize_position=6.0,
                x_positional_encoding_size=8,
                d_positional_encoding_size=4,
                hidden_size=16,
                trunk_blocks=(2, 1),
                view_branch_depth=1,
                use_pallas=False,
            )
        )
        template = _tp_state(other, mesh24, seed=1)
        with pytest.raises(ValueError, match="structure mismatch"):
            restore_latest(str(tmp_path), template)
