"""Multi-host coherence: input interleaving, main-process write gating.

The real multi-process runtime can't run in one test process, so the
process topology is simulated by monkeypatching peppa_tpu.utils.dist —
everything downstream (datamodule plan slicing, Trainer write gating,
val replication) consults that module.
"""

import os

import numpy as np
import pytest

from peppa_tpu.data.datamodule import multihost_interleave


class FakeBatch:
    def __init__(self, shape, tag):
        self.video = np.zeros(shape)
        self.audio = np.zeros((shape[0], 10))
        self.tag = tag


def test_interleave_single_process_is_identity():
    entries = list(range(7))
    assert list(multihost_interleave(entries, lambda e: (), 0, 1)) == entries


def test_interleave_same_steps_same_shapes_across_hosts():
    # a stream mixing two bucket shapes, as bucketed_batches produces
    shapes = ["A", "B", "A", "A", "B", "A", "B", "A"]
    entries = [(s, i) for i, s in enumerate(shapes)]
    key = lambda e: e[0]
    pc = 2
    per_host = [list(multihost_interleave(entries, key, pi, pc))
                for pi in range(pc)]
    # every host sees the same number of steps
    assert len(per_host[0]) == len(per_host[1])
    # at every step all hosts hold the same shape
    for e0, e1 in zip(*per_host):
        assert e0[0] == e1[0]
    # hosts hold disjoint entries
    ids0 = {e[1] for e in per_host[0]}
    ids1 = {e[1] for e in per_host[1]}
    assert not (ids0 & ids1)
    # A appears 5 times -> 2 complete groups (1 dropped); B 3 times -> 1
    # group (1 dropped): 3 steps per host
    assert len(per_host[0]) == 3


def test_interleave_drops_ragged_tail():
    entries = [("A", i) for i in range(3)]
    out = [list(multihost_interleave(entries, lambda e: e[0], pi, 2))
           for pi in range(2)]
    assert len(out[0]) == len(out[1]) == 1


def test_native_plan_interleave_matches_python_path():
    # plan entries as bucket_plan produces: (items, (t, h, w, c, s))
    plan = [([1, 2], (8, 32, 32, 3, 1280)),
            ([3, 4], (20, 32, 32, 3, 3200)),
            ([5, 6], (8, 32, 32, 3, 1280)),
            ([7, 8], (8, 32, 32, 3, 1280))]
    key = lambda p: (len(p[0]),) + tuple(p[1])
    host0 = list(multihost_interleave(plan, key, 0, 2))
    host1 = list(multihost_interleave(plan, key, 1, 2))
    assert host0 == [([1, 2], (8, 32, 32, 3, 1280))]
    assert host1 == [([5, 6], (8, 32, 32, 3, 1280))]


def test_train_batches_multihost_slices(tmp_path, monkeypatch):
    """Two simulated hosts: same step count, same shapes, disjoint data."""
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.utils import dist
    from tests.test_training_loop import tiny_config

    cfg = tiny_config(tmp_path)
    cfg.tpu.native_loader = False
    streams = {}
    for pi in range(2):
        monkeypatch.setattr(dist, "process_index", lambda pi=pi: pi)
        monkeypatch.setattr(dist, "process_count", lambda: 2)
        data = SyntheticPigData(cfg, n_train=16, n_val=8)
        data.setup()
        streams[pi] = list(data.train_batches(epoch=0))
    assert len(streams[0]) == len(streams[1]) > 0
    for b0, b1 in zip(streams[0], streams[1]):
        assert b0.video.shape == b1.video.shape
        assert b0.audio.shape == b1.audio.shape
        assert not np.allclose(b0.audio, b1.audio)  # disjoint slices


def test_trainer_nonmain_process_writes_nothing(tmp_path, monkeypatch):
    """process_index=1 must not create version dirs, metrics, checkpoints."""
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer
    from peppa_tpu.utils import dist

    monkeypatch.setattr(dist, "process_index", lambda: 1)
    monkeypatch.setattr(dist, "process_count", lambda: 2)
    from tests.test_training_loop import tiny_config

    cfg = tiny_config(tmp_path)
    cfg.training.num_sanity_val_steps = 0
    cfg.training.limit_train_batches = 1
    cfg.training.limit_val_batches = 1
    log_dir = str(tmp_path / "logs")
    data = SyntheticPigData(cfg, n_train=16, n_val=8)
    trainer = Trainer(cfg, log_dir=log_dir)
    state = trainer.fit(data)
    assert int(np.asarray(state.step)) > 0
    # no version_0, no metrics.csv, no checkpoints anywhere under log_dir
    assert not os.path.exists(os.path.join(log_dir, "version_0"))
    for root, _, files in os.walk(log_dir):
        assert not any(f.endswith((".ckpt", ".csv", ".yaml")) for f in files), \
            (root, files)


def test_trainer_main_process_still_writes(tmp_path, monkeypatch):
    """process_index=0 of 2 writes artifacts as usual (and replicated val)."""
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer
    from peppa_tpu.utils import dist

    monkeypatch.setattr(dist, "process_index", lambda: 0)
    monkeypatch.setattr(dist, "process_count", lambda: 2)
    from tests.test_training_loop import tiny_config

    cfg = tiny_config(tmp_path)
    cfg.training.num_sanity_val_steps = 0
    cfg.training.limit_train_batches = 1
    cfg.training.limit_val_batches = 1
    data = SyntheticPigData(cfg, n_train=16, n_val=8)
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    trainer.fit(data)
    assert os.path.exists(os.path.join(trainer.version_dir, "hparams.yaml"))
    assert os.path.exists(os.path.join(trainer.version_dir, "metrics.csv"))
    assert os.path.exists(os.path.join(trainer.version_dir, "checkpoints",
                                       "last.ckpt"))


def test_replicating_snapshot_gathers_sharded_leaves():
    """_replicating_snapshot (the multi-host save path) must return fully
    replicated copies of sharded leaves: with tensor/data-sharded state, no
    single process can address every shard, so the snapshot all-gathers via
    out_shardings before the writing process materializes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from peppa_tpu.training.checkpoint import _replicating_snapshot

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    tree = {
        "w": jax.device_put(jnp.arange(32.0).reshape(8, 4),
                            NamedSharding(mesh, PartitionSpec("data",
                                                              "model"))),
        "b": jax.device_put(jnp.ones((4,)),
                            NamedSharding(mesh, PartitionSpec("model"))),
        "step": jnp.int32(7),
    }
    out = _replicating_snapshot(tree)
    for key in ("w", "b"):
        assert out[key].sharding.is_fully_replicated, key
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(tree[key]))
    assert int(out["step"]) == 7
    # fresh buffers: deleting the source must not invalidate the snapshot
    tree["w"].delete()
    np.testing.assert_array_equal(
        np.asarray(out["w"]), np.arange(32.0).reshape(8, 4))
