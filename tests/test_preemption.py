"""Preemption handling: signal guard + trainer integration.

A scheduler SIGTERM/SIGUSR1 must not kill training mid-step: the Trainer
saves checkpoints/preempted.ckpt at the next step boundary and stops
cleanly, and the checkpoint resumes the interrupted epoch (training/
preemption.py, loop.py::_on_preempted).
"""

import os
import signal

import numpy as np
import pytest

from peppa_tpu.training.preemption import PreemptionGuard

from test_training_loop import tiny_config


def test_guard_triggers_on_signal_and_restores_handler():
    prev = signal.getsignal(signal.SIGUSR1)
    with PreemptionGuard(("SIGUSR1",)) as guard:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGUSR1)
        # CPython delivers the signal to the main thread at the next
        # bytecode boundary; the handler only sets an event
        assert guard.triggered
        assert guard.signame == "SIGUSR1"
    assert signal.getsignal(signal.SIGUSR1) is prev


def test_guard_ignores_unknown_signal_names():
    with PreemptionGuard(("SIGNOSUCH",)) as guard:
        assert not guard.triggered


def test_guard_is_inert_outside_context():
    guard = PreemptionGuard(("SIGUSR1",))
    prev = signal.getsignal(signal.SIGUSR1)
    assert signal.getsignal(signal.SIGUSR1) is prev  # nothing installed
    assert not guard.triggered


class _PreemptingData:
    """Wraps a datamodule; raises SIGUSR1 in-process after N train batches."""

    def __init__(self, inner, after_batches: int):
        self._inner = inner
        self._after = after_batches

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def train_batches(self, epoch):
        for i, batch in enumerate(self._inner.train_batches(epoch)):
            yield batch
            if i + 1 == self._after:
                os.kill(os.getpid(), signal.SIGUSR1)


@pytest.mark.slow
def test_trainer_preemption_saves_resumable_checkpoint(tmp_path):
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.checkpoint import load_checkpoint
    from peppa_tpu.training.loop import Trainer

    cfg = tiny_config(tmp_path)
    cfg.training.max_epochs = 3
    cfg.training.limit_train_batches = 3
    cfg.training.num_sanity_val_steps = 0
    data = _PreemptingData(SyntheticPigData(cfg, n_train=12, n_val=8),
                           after_batches=1)
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit(data)

    assert trainer.preempted
    step = int(np.asarray(state.step))
    assert step >= 1  # stopped at a step boundary, not after the full run
    assert step < 9  # and well before the 3-epoch budget

    path = os.path.join(trainer.version_dir, "checkpoints", "preempted.ckpt")
    assert os.path.exists(path)

    # the checkpoint must restore into a fresh state and resume the
    # interrupted epoch (meta epoch = last COMPLETED epoch = -1 here)
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.training.optimization import make_optimizer
    from peppa_tpu.training.state import TrainState
    import jax

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(
        cfg.optimizer,
        accumulate_grad_batches=cfg.training.accumulate_grad_batches,
        params=variables["params"])
    fresh = TrainState.create(variables, tx)
    restored, meta = load_checkpoint(path, fresh)
    assert int(np.asarray(restored.step)) == step
    assert meta["epoch"] == -1  # epoch 0 was interrupted -> replay it
    assert "SIGUSR1" in meta["reason"]


class _PreemptDuringSetupData:
    """Delivers the signal during data.setup() — before any train step.

    Regression: the guard must cover ALL of fit() (setup, compile, sanity
    validation), not just the step loop; SIGUSR1's default disposition
    would otherwise kill the process mid-setup.
    """

    def __init__(self, inner):
        self._inner = inner

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def setup(self):
        self._inner.setup()
        os.kill(os.getpid(), signal.SIGUSR1)


@pytest.mark.slow
def test_preemption_during_setup_stops_cleanly(tmp_path):
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer

    cfg = tiny_config(tmp_path)
    data = _PreemptDuringSetupData(SyntheticPigData(cfg, n_train=8, n_val=8))
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit(data)

    assert trainer.preempted
    assert int(np.asarray(state.step)) == 0  # stopped before any step
    path = os.path.join(trainer.version_dir, "checkpoints", "preempted.ckpt")
    assert os.path.exists(path)  # initial state saved: requeue resumes it


def _fake_preempted_run(log_dir, cfg, version: int, mtime: float = None):
    """Lay out version_N/{hparams.yaml, checkpoints/preempted.ckpt}."""
    from peppa_tpu.training.checkpoint import save_hparams

    vdir = os.path.join(log_dir, f"version_{version}")
    os.makedirs(os.path.join(vdir, "checkpoints"), exist_ok=True)
    save_hparams(vdir, cfg)
    path = os.path.join(vdir, "checkpoints", "preempted.ckpt")
    with open(path, "wb") as f:
        f.write(b"ckpt")
    with open(path + ".json", "w") as f:
        f.write("{}")
    if mtime is not None:
        os.utime(path, (mtime, mtime))
    return path


def test_find_preempted_checkpoint_matches_config(tmp_path):
    from peppa_tpu.training.checkpoint import (
        consume_preempted_checkpoint, find_preempted_checkpoint)

    log_dir = str(tmp_path / "logs")
    cfg = tiny_config(tmp_path)
    assert find_preempted_checkpoint(cfg, log_dir) is None  # nothing yet

    # a run of a DIFFERENT config (other seed) must never match
    import copy

    other = copy.deepcopy(cfg)
    other.training.seed = cfg.training.seed + 1
    _fake_preempted_run(log_dir, other, version=0, mtime=3000.0)
    assert find_preempted_checkpoint(cfg, log_dir) is None

    # two matching runs: the newest preempted.ckpt wins
    old = _fake_preempted_run(log_dir, cfg, version=1, mtime=1000.0)
    new = _fake_preempted_run(log_dir, cfg, version=2, mtime=2000.0)
    assert find_preempted_checkpoint(cfg, log_dir) == new

    # git_commit differences are ignored (requeued job = new commit stamp ok)
    stamped = copy.deepcopy(cfg)
    stamped.git_commit = "deadbeef"
    assert find_preempted_checkpoint(stamped, log_dir) == new

    # consuming retires a checkpoint from future auto-resume, keeps the data
    consume_preempted_checkpoint(new)
    assert not os.path.exists(new)
    assert os.path.exists(new + ".consumed")
    assert find_preempted_checkpoint(cfg, log_dir) == old


@pytest.mark.slow
def test_trainer_without_preemption_is_unaffected(tmp_path):
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer

    cfg = tiny_config(tmp_path)
    data = SyntheticPigData(cfg, n_train=8, n_val=8)
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    trainer.fit(data)
    assert not trainer.preempted
    assert not os.path.exists(os.path.join(
        trainer.version_dir, "checkpoints", "preempted.ckpt"))
