"""End-to-end training-loop smoke test: tiny model, synthetic data, CPU mesh.

Exercises the full Trainer path — init, sanity validation, bucketed batching,
jit'd train step with grad accumulation, the 4-loader validation protocol,
dual checkpoint monitors + last.ckpt, metrics logging — and then best-model
loading + checkpoint resume.
"""

import os

import numpy as np
import pytest

from peppa_tpu.config import Config


def tiny_config(tmp_path):
    cfg = Config()
    cfg.data.target_size = (32, 32)
    cfg.data.audio_sample_rate = 1600
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.data.train.batch_size = 4
    cfg.data.val.batch_size = 4
    cfg.data.train.duration = 0.8
    cfg.data.val.duration = 0.8
    cfg.training.precision = "fp32"
    cfg.training.accumulate_grad_batches = 2
    cfg.training.max_epochs = 1
    cfg.training.num_sanity_val_steps = 1
    cfg.training.limit_train_batches = 2
    cfg.training.limit_val_batches = 2
    cfg.training.log_every_n_steps = 1
    cfg.optimizer.t_total = 100
    cfg.tpu.bucket_durations = (0.8, 2.0)
    cfg.tpu.donate_state = False
    cfg.tpu.mesh_shape = (1, 1)  # batch 4 won't shard over 8 CPU devices
    cfg.audio.full = False  # conv-only trunk: much faster on CPU
    cfg.video.version = "r3d_18"
    return cfg


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.checkpoint import load_best_model, load_checkpoint
    from peppa_tpu.training.loop import Trainer

    cfg = tiny_config(tmp_path)
    data = SyntheticPigData(cfg, n_train=12, n_val=8)
    log_dir = str(tmp_path / "logs")
    trainer = Trainer(cfg, log_dir=log_dir)
    state = trainer.fit(data)
    assert int(np.asarray(state.step)) > 0

    version_dir = trainer.version_dir
    assert os.path.exists(os.path.join(version_dir, "hparams.yaml"))
    assert os.path.exists(os.path.join(version_dir, "metrics.csv"))
    ckpts = os.listdir(os.path.join(version_dir, "checkpoints"))
    assert "last.ckpt" in ckpts
    assert any(c.startswith("epoch=") for c in ckpts)

    # best-model loading (evaluation entry)
    model, variables, config2, path = load_best_model(version_dir)
    assert "params" in variables
    # loaded config round-trips the training config
    assert config2.data.target_size == cfg.data.target_size

    # resume: restore last.ckpt into a fresh state
    import jax

    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.training.optimization import make_optimizer
    from peppa_tpu.training.state import TrainState

    model2, variables2 = init_model(cfg, jax.random.PRNGKey(1))
    tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=2,
                        params=variables2["params"])
    fresh = TrainState.create(variables2, tx)
    restored, meta = load_checkpoint(
        os.path.join(version_dir, "checkpoints", "last.ckpt"), fresh)
    assert int(np.asarray(restored.step)) == int(np.asarray(state.step))
    assert "metrics" in meta


@pytest.mark.slow
def test_resume_is_bit_identical(tmp_path):
    """Epoch-aligned resume: restarting from last.ckpt replays exactly the
    losses a continuous run produces (same data stream, same rng folding)."""
    import csv

    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer

    def losses(version_dir):
        out = {}
        with open(os.path.join(version_dir, "metrics.csv")) as f:
            for row in csv.DictReader(f):
                if row.get("train_loss"):
                    out[int(row["step"])] = float(row["train_loss"])
        return out

    def make(tag, max_epochs, resume_from=None):
        cfg = tiny_config(tmp_path)
        cfg.training.max_epochs = max_epochs
        cfg.training.num_sanity_val_steps = 0
        cfg.training.limit_train_batches = 3
        cfg.training.limit_val_batches = 1
        data = SyntheticPigData(cfg, n_train=12, n_val=8)
        tr = Trainer(cfg, log_dir=str(tmp_path / tag))
        tr.fit(data, resume_from=resume_from)
        return tr.version_dir

    continuous = losses(make("a", max_epochs=2))
    first = make("b", max_epochs=1)
    resumed = losses(make("c", max_epochs=2, resume_from=os.path.join(
        first, "checkpoints", "last.ckpt")))
    # epoch-1 steps (4..6 with 3 batches/epoch) must match bit for bit
    epoch1 = {s: v for s, v in continuous.items() if s > 3}
    assert epoch1, continuous
    for step, want in epoch1.items():
        assert resumed.get(step) == want, (step, resumed.get(step), want)


@pytest.mark.slow
def test_mid_epoch_resume_is_step_accurate(tmp_path):
    """STEP-ACCURATE mid-epoch resume (VERDICT r4 #3, single-process side):
    a run stopped strictly inside an epoch (max_steps) writes last.ckpt with
    `epoch_batch_offset`; resuming from it skips the already-trained batches
    of the deterministic (seed, epoch) stream — no batch is double-stepped —
    and the final losses match a continuous run bit for bit."""
    import csv
    import json

    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer

    def losses(version_dir):
        out = {}
        with open(os.path.join(version_dir, "metrics.csv")) as f:
            for row in csv.DictReader(f):
                if row.get("train_loss"):
                    out[int(row["step"])] = float(row["train_loss"])
        return out

    def make(tag, max_steps=None, resume_from=None):
        cfg = tiny_config(tmp_path)
        cfg.training.max_epochs = 2
        cfg.training.max_steps = max_steps
        cfg.training.accumulate_grad_batches = 1
        cfg.training.num_sanity_val_steps = 0
        cfg.training.limit_train_batches = 3
        cfg.training.limit_val_batches = 1
        data = SyntheticPigData(cfg, n_train=12, n_val=8)
        tr = Trainer(cfg, log_dir=str(tmp_path / tag))
        tr.fit(data, resume_from=resume_from)
        return tr.version_dir

    continuous = losses(make("straight"))          # 2 epochs x 3 = 6 steps
    partial = make("partial", max_steps=4)         # stops at micro 4: 1 batch
    with open(os.path.join(partial, "checkpoints", "last.ckpt.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 0, meta                # last COMPLETED epoch
    assert meta["epoch_batch_offset"] == 1, meta   # 1 batch of epoch 1 done
    resumed = losses(make("resumed", resume_from=os.path.join(
        partial, "checkpoints", "last.ckpt")))
    # the resumed run must produce steps 5..6 ONLY (4 was already trained),
    # each bit-identical to the continuous run
    assert sorted(resumed) == [5, 6], resumed
    for step in (5, 6):
        assert resumed[step] == continuous[step], (
            step, resumed[step], continuous[step])


def test_nonfinite_loss_watchdog(tmp_path, monkeypatch):
    """A NaN loss aborts with an emergency checkpoint (failure detection)."""
    import numpy as np

    import peppa_tpu.training.loop as L
    from peppa_tpu.data.datamodule import SyntheticPigData

    cfg = tiny_config(tmp_path)
    cfg.training.log_every_n_steps = 1
    data = SyntheticPigData(cfg, n_train=8, n_val=8)
    trainer = L.Trainer(cfg, log_dir=str(tmp_path / "logs"))

    import peppa_tpu.training.step as S

    real = S.make_train_step

    def poisoned(model, margin, donate=True, **kw):
        step = real(model, margin, donate=donate, **kw)

        def run(state, batch, rng):
            new_state, metrics = step(state, batch, rng)
            metrics = dict(metrics)
            metrics["train_loss"] = np.float32("nan")
            return new_state, metrics

        return run

    monkeypatch.setattr(L, "make_train_step", poisoned)
    with pytest.raises(L.NonFiniteLossError):
        trainer.fit(data)
    assert os.path.exists(os.path.join(trainer.version_dir, "checkpoints",
                                       "emergency-nonfinite.ckpt"))


def test_nonfinite_loss_watchdog_off_logging_boundary(tmp_path, monkeypatch):
    """A NaN at a step that is NOT a logging step still aborts (every-step
    watchdog, checked one step late to preserve device pipelining)."""
    import numpy as np

    import peppa_tpu.training.loop as L
    import peppa_tpu.training.step as S
    from peppa_tpu.data.datamodule import SyntheticPigData

    cfg = tiny_config(tmp_path)
    cfg.training.log_every_n_steps = 100  # never reached
    cfg.training.limit_train_batches = 3
    cfg.training.num_sanity_val_steps = 0
    data = SyntheticPigData(cfg, n_train=16, n_val=8)
    trainer = L.Trainer(cfg, log_dir=str(tmp_path / "logs"))

    real = S.make_train_step

    def poisoned(model, margin, donate=True, **kw):
        step = real(model, margin, donate=donate, **kw)
        calls = {"n": 0}

        def run(state, batch, rng):
            new_state, metrics = step(state, batch, rng)
            calls["n"] += 1
            if calls["n"] == 2:  # poison step 2 only (not a logging step)
                metrics = dict(metrics)
                metrics["train_loss"] = np.float32("nan")
            return new_state, metrics

        return run

    monkeypatch.setattr(L, "make_train_step", poisoned)
    with pytest.raises(L.NonFiniteLossError, match="step 2"):
        trainer.fit(data)
    assert os.path.exists(os.path.join(trainer.version_dir, "checkpoints",
                                       "emergency-nonfinite.ckpt"))


@pytest.mark.slow
def test_val_check_interval_steps(tmp_path):
    """training.val_check_interval=N validates every N micro-steps (replacing
    per-epoch validation) and validates the final state of the run."""
    import csv

    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer

    cfg = tiny_config(tmp_path)
    cfg.training.num_sanity_val_steps = 0
    cfg.training.limit_train_batches = 5  # 5 micro-steps per epoch
    cfg.training.limit_val_batches = 1
    cfg.training.max_epochs = 1
    cfg.training.val_check_interval = 2
    data = SyntheticPigData(cfg, n_train=20, n_val=8)
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    trainer.fit(data)

    with open(os.path.join(trainer.version_dir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    val_steps = [int(r["step"]) for r in rows if r.get("val_loss")]
    # steps 2 and 4 from the interval, plus the final-state validation at 5
    assert val_steps == [2, 4, 5]
    # checkpoints exist (on_validation_end fired)
    ckpts = os.listdir(os.path.join(trainer.version_dir, "checkpoints"))
    assert "last.ckpt" in ckpts
    # resume-epoch semantics: the final validation ran after epoch 0 fully
    # completed, so meta records epoch 0 (resume = epoch 1); a mid-epoch
    # checkpoint would record -1 so a resume replays the interrupted epoch
    import json

    with open(os.path.join(trainer.version_dir, "checkpoints",
                           "last.ckpt.json")) as f:
        assert json.load(f)["epoch"] == 0


def test_resume_restores_monitor_bests(tmp_path):
    """Reference parity (Lightning resume restores ModelCheckpoint state):
    a resumed run must not demote an earlier best — observed live when a
    soak resume wrote a 'best' of 0.61 over a restored 0.94."""
    from peppa_tpu.training.checkpoint import CheckpointManager

    m = CheckpointManager(str(tmp_path / "v0"), async_saves=False)
    m.restore_monitor_state([
        {"monitor": "valnarr_rec_fixed", "mode": "max",
         "best_model_score": 0.76, "best_model_path": "old/epoch=14.ckpt"},
        {"monitor": "valnarr_triplet", "mode": "max",
         "best_model_score": 0.94, "best_model_path": "old/epoch=14t.ckpt"},
    ])
    rec, tri = m.monitors
    assert rec.best_score == 0.76 and tri.best_score == 0.94
    # a worse post-resume validation must NOT become a new best
    assert rec.decide({"valnarr_rec_fixed": 0.61}, epoch=77) is None
    assert tri.decide({"valnarr_triplet": 0.61}, epoch=77) is None
    # a genuinely better one must (and must not delete the old run's file)
    decision = rec.decide({"valnarr_rec_fixed": 0.80}, epoch=80)
    assert decision is not None
    path, removals = decision
    assert "epoch=80" in path and removals == []

    # monitor_state round-trips through a fresh manager (preempted.ckpt meta)
    m2 = CheckpointManager(str(tmp_path / "v1"), async_saves=False)
    m2.restore_monitor_state(m.monitor_state())
    assert m2.monitors[0].best_score == 0.80
    assert m2.monitors[1].best_score == 0.94


@pytest.mark.slow
def test_mid_epoch_break_records_last_full_epoch(tmp_path):
    """A max_steps break mid-epoch must stamp the checkpoint meta with the
    last FULLY trained epoch (-1 here: epoch 0 was partial), the same replay
    convention as preemption — recording epoch 0 would make a resume skip
    the untrained remainder of epoch 0."""
    import json

    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer

    # per-epoch validation path (val_check_interval=None)
    cfg = tiny_config(tmp_path)
    cfg.training.num_sanity_val_steps = 0
    cfg.training.limit_train_batches = 4
    cfg.training.limit_val_batches = 1
    cfg.training.max_epochs = 1
    cfg.training.accumulate_grad_batches = 1
    cfg.training.max_steps = 2  # breaks after micro-step 2 of 4
    data = SyntheticPigData(cfg, n_train=16, n_val=8)
    tr = Trainer(cfg, log_dir=str(tmp_path / "a"))
    tr.fit(data)
    with open(os.path.join(tr.version_dir, "checkpoints",
                           "last.ckpt.json")) as f:
        assert json.load(f)["epoch"] == -1

    # trailing-validation path (val_check_interval set), final epoch partial:
    # the old full_epochs heuristic stamped epoch 0 here
    cfg2 = tiny_config(tmp_path)
    cfg2.training.num_sanity_val_steps = 0
    cfg2.training.limit_train_batches = 4
    cfg2.training.limit_val_batches = 1
    cfg2.training.max_epochs = 1
    cfg2.training.accumulate_grad_batches = 1
    cfg2.training.max_steps = 3
    cfg2.training.val_check_interval = 2
    data2 = SyntheticPigData(cfg2, n_train=16, n_val=8)
    tr2 = Trainer(cfg2, log_dir=str(tmp_path / "b"))
    tr2.fit(data2)
    with open(os.path.join(tr2.version_dir, "checkpoints",
                           "last.ckpt.json")) as f:
        assert json.load(f)["epoch"] == -1

    # and a COMPLETED final epoch still stamps epoch 0
    cfg3 = tiny_config(tmp_path)
    cfg3.training.num_sanity_val_steps = 0
    cfg3.training.limit_train_batches = 2
    cfg3.training.limit_val_batches = 1
    cfg3.training.max_epochs = 1
    data3 = SyntheticPigData(cfg3, n_train=8, n_val=8)
    tr3 = Trainer(cfg3, log_dir=str(tmp_path / "c"))
    tr3.fit(data3)
    with open(os.path.join(tr3.version_dir, "checkpoints",
                           "last.ckpt.json")) as f:
        assert json.load(f)["epoch"] == 0


def test_resume_from_best_monitor_ckpt_restores_all_bests(tmp_path):
    """Resuming from a BEST-monitor .ckpt (whose sidecar is a single
    monitor meta, not a last.ckpt-style "monitors" list) must restore that
    monitor's best AND the sibling monitor's best from its sidecar in the
    same checkpoints dir — otherwise the first post-resume validation
    demotes the real best (the exact bug test_resume_restores_monitor_bests
    covers for last.ckpt resumes)."""
    import json

    from peppa_tpu.training.checkpoint import CheckpointManager

    ckdir = tmp_path / "v0" / "checkpoints"
    ckdir.mkdir(parents=True)
    rec_meta = {"monitor": "valnarr_rec_fixed", "mode": "max",
                "best_model_score": 0.76, "epoch": 14}
    tri_meta = {"monitor": "valnarr_triplet", "mode": "max",
                "best_model_score": 0.94, "epoch": 12}
    last_meta = {"monitor": None, "best_model_score": None, "epoch": 14,
                 "monitors": [rec_meta, tri_meta]}
    for name, meta in [("epoch=14-valnarr_rec_fixed=0.76.ckpt", rec_meta),
                       ("epoch=12-valnarr_triplet=0.94.ckpt", tri_meta),
                       ("last.ckpt", last_meta)]:
        (ckdir / name).write_bytes(b"")
        (ckdir / (name + ".json")).write_text(json.dumps(meta))

    # resume_from the rec-monitor best: both monitors restored
    resume_from = str(ckdir / "epoch=14-valnarr_rec_fixed=0.76.ckpt")
    metas = CheckpointManager.resume_monitors_meta(resume_from, rec_meta)
    m = CheckpointManager(str(tmp_path / "v1"), async_saves=False)
    m.restore_monitor_state(metas)
    assert m.monitors[0].best_score == 0.76
    assert m.monitors[1].best_score == 0.94
    assert m.monitors[0].decide({"valnarr_rec_fixed": 0.61}, epoch=15) is None
    assert m.monitors[1].decide({"valnarr_triplet": 0.61}, epoch=15) is None

    # last.ckpt resumes keep using the explicit monitors list verbatim
    assert CheckpointManager.resume_monitors_meta(
        str(ckdir / "last.ckpt"), last_meta) == [rec_meta, tri_meta]
    # non-monitor resumes (emergency blobs without metas) restore nothing
    assert CheckpointManager.resume_monitors_meta(
        str(ckdir / "x.ckpt"), {}) == []
