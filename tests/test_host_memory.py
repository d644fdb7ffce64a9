"""Host-memory watchdog + session-recycle machinery (utils/host_memory.py).

The axon-plugin reset itself only exists on the tunneled TPU host (verified
there: bit-exact state round-trip, transparent executable rebind).  These
tests cover everything around it on CPU: RSS probing, watchdog gating, the
Prefetcher's generation protocol (queued device batches re-shard after a
recycle), and a full Trainer run whose losses are bit-identical with a
mid-run recycle injected.
"""
import os

import numpy as np
import pytest

from peppa_tpu.utils.host_memory import (HostMemoryWatchdog, SessionRecycler,
                                         host_rss_bytes)
from peppa_tpu.utils.prefetch import Prefetcher


def test_host_rss_bytes_sane():
    rss = host_rss_bytes()
    assert rss > 10 * (1 << 20)  # a python + jax process is >10 MB
    assert rss < 1 << 40


def test_recycler_unavailable_off_axon():
    r = SessionRecycler()
    assert not r.available  # no axon plugin mapped in CPU test processes


def test_watchdog_disabled_without_limit():
    w = HostMemoryWatchdog(None)
    assert not w.check()


def test_watchdog_warns_without_recycler_and_stays_quiet():
    w = HostMemoryWatchdog(1e-6)  # ~1 kB: always over
    assert w.recycler is not None and not w.recycler.available
    assert not w.check()  # no recycler -> never asks caller to recycle
    assert w._warned
    assert not w.check()


def test_watchdog_triggers_with_fake_recycler():
    class Fake:
        available = True

    w = HostMemoryWatchdog(1e-6, recycler=Fake())
    assert w.check()
    w2 = HostMemoryWatchdog(1 << 14, recycler=Fake())  # 16 TB: never over
    assert not w2.check()


def test_recycle_preserves_shardings_and_non_jax_leaves():
    """recycle() must round-trip a MIXED tree — sharded jax arrays, numpy
    leaves (no .sharding), python scalars — preserving each jax leaf's
    sharding.  Regression: a paired tree.map over a shardings tree with
    None leaves raised a structure mismatch, and the broad fallback
    silently dropped every sharding."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    class FakeLib:
        def axon_reset(self):
            return 0

    r = SessionRecycler()
    r._lib = FakeLib()

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("data",))
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    tree = {
        "sharded": jax.device_put(jnp.arange(8.0).reshape(4, 2), sharding),
        "plain": jnp.ones((3,)),
        "numpy": np.arange(5),
        "scalar": 7,
    }
    out = r.recycle(tree)
    assert out["sharded"].sharding == sharding
    np.testing.assert_array_equal(np.asarray(out["sharded"]),
                                  np.arange(8.0).reshape(4, 2))
    np.testing.assert_array_equal(np.asarray(out["numpy"]), np.arange(5))
    np.testing.assert_array_equal(np.asarray(out["plain"]), np.ones((3,)))
    assert int(np.asarray(out["scalar"])) == 7


# ---------------------------------------------------------------- prefetcher

class CountingShard:
    """shard_fn standin: tags output so re-shards are observable."""

    def __init__(self):
        self.calls = []

    def __call__(self, b):
        self.calls.append(b)
        return ("sharded", len(self.calls), b)


def test_prefetcher_reshards_stale_generations():
    shard = CountingShard()
    batches = list(range(6))
    p = Prefetcher(iter(batches), shard, depth=3)
    it = iter(p)
    first = next(it)
    assert first[2] == 0

    import time
    time.sleep(0.3)  # let the worker fill the queue with old-gen items

    with p.recycling():
        pass  # caller would reset the session + recycle its state here

    got = [next(it) for _ in range(5)]
    assert [g[2] for g in got] == [1, 2, 3, 4, 5]  # order + content preserved
    # every batch sharded at least once; stale queued ones exactly twice
    assert shard.calls.count(0) == 1  # consumed before the recycle
    n_reshards = len(shard.calls) - len(batches)
    assert n_reshards >= 1  # at least the queued items were re-sharded
    p.close()


def test_prefetcher_sync_mode_recycling_noop():
    shard = CountingShard()
    p = Prefetcher(iter([1, 2]), shard, depth=0)
    it = iter(p)
    assert next(it)[2] == 1
    with p.recycling():
        pass
    assert next(it)[2] == 2
    assert len(shard.calls) == 2  # lazy sharding: nothing stale to redo


# ------------------------------------------------------------- trainer e2e

@pytest.mark.slow
def test_training_losses_bit_identical_across_recycle(tmp_path, monkeypatch):
    """A mid-run session recycle must not perturb training at all."""
    import jax

    from peppa_tpu.config import Config
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training import loop as loop_mod

    def tiny_config():
        cfg = Config()
        cfg.data.target_size = (32, 32)
        cfg.data.audio_sample_rate = 1600
        cfg.data.data_dir = str(tmp_path / "data")
        cfg.data.train.batch_size = 4
        cfg.data.val.batch_size = 4
        cfg.data.train.duration = 0.8
        cfg.data.val.duration = 0.8
        cfg.training.precision = "fp32"
        cfg.training.max_epochs = 2
        cfg.training.num_sanity_val_steps = 0
        cfg.training.limit_train_batches = 4
        cfg.training.limit_val_batches = 1
        cfg.training.log_every_n_steps = 1
        cfg.optimizer.t_total = 100
        cfg.tpu.bucket_durations = (0.8, 2.0)
        cfg.tpu.donate_state = False
        cfg.tpu.mesh_shape = (1, 1)
        cfg.tpu.native_loader = False
        cfg.audio.full = False
        cfg.audio.pretrained = False
        cfg.video.pretrained = False
        cfg.video.version = "r3d_18"
        return cfg

    def losses(log_dir):
        import csv

        path = os.path.join(log_dir, "version_0", "metrics.csv")
        with open(path) as f:
            return [row["train_loss"] for row in csv.DictReader(f)
                    if row.get("train_loss")]

    class HostRoundTripRecycler:
        """The recycle data path without the axon reset (CPU has no leak)."""

        available = True
        recycles = 0

        def recycle(self, tree):
            type(self).recycles += 1
            shardings = jax.tree.map(
                lambda a: getattr(a, "sharding", None), tree)
            host = jax.device_get(tree)
            return jax.tree.map(
                lambda h, s: jax.device_put(h, s) if s is not None
                else jax.device_put(h), host, shardings)

    class TriggerAtStep3:
        def __init__(self, limit_gb, recycler=None):
            self.recycler = HostRoundTripRecycler()
            self.seen = 0

        def check(self):
            self.seen += 1
            return self.seen == 3

        def note_recycled(self):
            pass

    def run(log_dir, watchdog_cls):
        monkeypatch.setattr(loop_mod, "HostMemoryWatchdog", watchdog_cls)
        cfg = tiny_config()
        data = SyntheticPigData(cfg, n_train=8, n_val=4, seed=0)
        trainer = loop_mod.Trainer(cfg, log_dir=str(tmp_path / log_dir))
        trainer.fit(data)
        return losses(str(tmp_path / log_dir))

    plain = run("plain", HostMemoryWatchdog)
    recycled = run("recycled", TriggerAtStep3)
    assert HostRoundTripRecycler.recycles >= 1
    assert len(plain) == len(recycled) >= 4  # 2 epochs x (8 clips / batch 4)
    assert plain == recycled  # string-identical csv values => bit-identical


def test_watchdog_hysteresis_raises_limit():
    class Fake:
        available = True

    w = HostMemoryWatchdog(1e-6, recycler=Fake())
    assert w.check()
    w.note_recycled()  # post-recycle RSS >> limit: raise it off the floor
    assert w.limit_bytes >= host_rss_bytes()
    assert not w.check()


def test_watchdog_ratchet_capped_below_physical_ram():
    from peppa_tpu.utils.host_memory import host_mem_total_bytes

    class Fake:
        available = True

    w = HostMemoryWatchdog(1e-6, recycler=Fake())
    w.note_recycled()
    assert w.limit_bytes <= int(0.8 * host_mem_total_bytes())
