"""Async checkpoint writer: equivalence with sync saves, ordering, linking.

No reference equivalent (Lightning saves synchronously); the async manager
overlaps the multi-GB state fetch + serialize + write with the next epoch's
training (training/checkpoint.py::CheckpointManager).
"""

import glob
import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

from peppa_tpu.training.checkpoint import (CheckpointManager, load_checkpoint,
                                           save_checkpoint)


def fake_state(seed: int = 0):
    rng = np.random.default_rng(seed)
    return SimpleNamespace(
        step=np.int32(7 + seed),
        params={"w": rng.standard_normal((4, 3)).astype(np.float32),
                "b": rng.standard_normal((3,)).astype(np.float32)},
        batch_stats={"mean": rng.standard_normal((3,)).astype(np.float32)},
        opt_state={"m": {"w": rng.standard_normal((4, 3)).astype(np.float32)}},
    )


def assert_payload_equal(a, b):
    assert int(a["step"]) == int(b["step"])
    np.testing.assert_array_equal(a["params"]["w"], b["params"]["w"])
    np.testing.assert_array_equal(a["params"]["b"], b["params"]["b"])
    np.testing.assert_array_equal(a["batch_stats"]["mean"],
                                  b["batch_stats"]["mean"])


@pytest.mark.parametrize("async_saves", [False, True])
def test_manager_writes_monitors_and_last(tmp_path, async_saves):
    state = fake_state(0)
    mgr = CheckpointManager(str(tmp_path), async_saves=async_saves)
    metrics = {"valnarr_rec_fixed": 0.5, "valnarr_triplet": 0.6}
    mgr.on_validation_end(state, metrics, epoch=0)
    mgr.wait()

    ckpts = sorted(os.path.basename(p) for p in
                   glob.glob(str(tmp_path / "checkpoints" / "*.ckpt")))
    assert ckpts == ["epoch=0-valnarr_rec_fixed=0.50.ckpt",
                     "epoch=0-valnarr_triplet=0.60.ckpt", "last.ckpt"]
    # all three published from ONE snapshot: identical payloads
    payloads = [load_checkpoint(str(tmp_path / "checkpoints" / c))[0]
                for c in ckpts]
    for p in payloads[1:]:
        assert_payload_equal(payloads[0], p)
    sync_ref = tmp_path / "ref.ckpt"
    save_checkpoint(str(sync_ref), state, {"epoch": 0})
    assert_payload_equal(load_checkpoint(str(sync_ref))[0], payloads[0])


def test_improvement_replaces_best_and_keeps_links_independent(tmp_path):
    mgr = CheckpointManager(str(tmp_path), async_saves=True)
    s0, s1 = fake_state(0), fake_state(1)
    mgr.on_validation_end(s0, {"valnarr_rec_fixed": 0.4,
                               "valnarr_triplet": 0.5}, epoch=0)
    # epoch 1: rec improves, triplet does not
    mgr.on_validation_end(s1, {"valnarr_rec_fixed": 0.7,
                               "valnarr_triplet": 0.4}, epoch=1)
    mgr.wait()

    names = sorted(os.path.basename(p) for p in
                   glob.glob(str(tmp_path / "checkpoints" / "*.ckpt")))
    assert names == ["epoch=0-valnarr_triplet=0.50.ckpt",
                     "epoch=1-valnarr_rec_fixed=0.70.ckpt", "last.ckpt"]
    # last.ckpt was rewritten with epoch-1 state; the epoch-0 triplet best,
    # which hard-linked epoch-0's blob, must still hold epoch-0's state
    last, last_meta = load_checkpoint(str(tmp_path / "checkpoints" / "last.ckpt"))
    assert_payload_equal(last, {"step": s1.step, "params": s1.params,
                                "batch_stats": s1.batch_stats})
    old, old_meta = load_checkpoint(
        str(tmp_path / "checkpoints" / "epoch=0-valnarr_triplet=0.50.ckpt"))
    assert_payload_equal(old, {"step": s0.step, "params": s0.params,
                               "batch_stats": s0.batch_stats})
    assert last_meta["epoch"] == 1
    assert old_meta["epoch"] == 0
    # no stray tmp files
    assert glob.glob(str(tmp_path / "checkpoints" / "*.tmp~")) == []


def test_writer_failure_surfaces_on_wait(tmp_path, monkeypatch):
    mgr = CheckpointManager(str(tmp_path), async_saves=True)
    import peppa_tpu.training.checkpoint as C

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(C, "_publish", boom)
    mgr.on_validation_end(fake_state(), {"valnarr_rec_fixed": 0.5,
                                         "valnarr_triplet": 0.5}, epoch=0)
    with pytest.raises(OSError, match="disk full"):
        mgr.wait()


def test_snapshot_survives_donation_of_originals(tmp_path):
    """The async writer must keep working after the next (donating) train
    step invalidates the ORIGINAL state buffers — regression for the
    mid-run 'Array has been deleted' crash on hardware: _start_fetch now
    copies into fresh device buffers before the loop resumes."""
    import jax
    import jax.numpy as jnp

    from peppa_tpu.training.checkpoint import _materialize, _start_fetch

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    want_w, want_b = np.asarray(w), np.asarray(b)
    state = SimpleNamespace(step=jnp.int32(11),
                            params={"w": w, "b": b},
                            batch_stats={}, opt_state={"m": {"w": w * 0.5}})
    payload = _start_fetch(state)

    # the next train step donates the original buffers (a no-op on the CPU
    # backend — on TPU they are marked deleted at dispatch; either way the
    # snapshot must read its own fresh copies)
    donate = jax.jit(lambda a: a + 1.0, donate_argnums=0)
    _ = donate(w)
    _ = donate(b)
    if w.is_deleted():
        with pytest.raises(RuntimeError):
            np.asarray(w)

    got = _materialize(payload)  # what the writer thread does
    np.testing.assert_array_equal(got["params"]["w"], want_w)
    np.testing.assert_array_equal(got["params"]["b"], want_b)
    np.testing.assert_array_equal(got["opt_state"]["m"]["w"], want_w * 0.5)
    assert int(got["step"]) == 11
