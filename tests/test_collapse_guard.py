"""Embedding-collapse guard: detector semantics + Trainer integration.

The phenomenon being guarded (train loss pinning at the constant-embedding
saddle 2*margin*(1-1/B) after corpus saturation) was measured on hardware in
the round-5 schedule-scale runs (PERF.md "Schedule-scale recipe runs");
scripts/collapse_dissection.py reproduces it end-to-end on a tiny model.
No reference equivalent (SURVEY.md §5.3 — Lightning trains on silently).
"""

import numpy as np
import pytest

from peppa_tpu.training.collapse import CollapseDetector


@pytest.mark.smoke
class TestCollapseDetector:
    MARGIN, B = 0.2, 8

    def saddle(self):
        return 2 * self.MARGIN * (1 - 1 / self.B)

    def test_saddle_value_matches_constant_embedding_loss(self):
        # the detector's target must equal the actual loss of a collapsed
        # model: constant embeddings -> every similarity equal
        from peppa_tpu.ops.loss import triplet_loss

        v = np.tile(np.random.default_rng(0).normal(size=(1, 16)), (self.B, 1))
        a = np.tile(np.random.default_rng(1).normal(size=(1, 16)), (self.B, 1))
        loss = float(triplet_loss(np.float32(v), np.float32(a),
                                  margin=self.MARGIN, use_pallas=False))
        det = CollapseDetector(self.MARGIN, self.B)
        assert abs(loss - det.saddle) < 1e-6

    def test_random_init_neighbourhood_never_fires(self):
        # a fresh model's loss starts near the saddle (similarities ~0) but
        # fluctuates batch to batch; without ever having learned, even a
        # dead-constant stream must not fire (learned gate)
        det = CollapseDetector(self.MARGIN, self.B, window=5)
        for _ in range(100):
            assert not det.update(self.saddle())

    def test_fires_after_window_pinned_losses_once_learned(self):
        det = CollapseDetector(self.MARGIN, self.B, window=5)
        for loss in [0.30, 0.12, 0.05]:  # learning phase
            assert not det.update(loss)
        for i in range(4):  # pinned, but window not yet full
            assert not det.update(self.saddle())
        assert det.update(self.saddle())  # 5th consecutive pin
        assert det.fired and det.update(0.05)  # latched

    def test_excursion_resets_the_window(self):
        det = CollapseDetector(self.MARGIN, self.B, window=5)
        det.update(0.05)
        for _ in range(4):
            det.update(self.saddle())
        assert not det.update(0.2)  # off the saddle: reset
        for _ in range(4):
            assert not det.update(self.saddle())
        assert det.update(self.saddle())

    def test_noisy_near_saddle_losses_do_not_fire(self):
        # batch-dependent losses hovering NEAR the saddle (spread >> pin_tol)
        # are ordinary hard-phase training, not collapse
        det = CollapseDetector(self.MARGIN, self.B, window=5)
        det.update(0.05)
        rng = np.random.default_rng(2)
        for _ in range(50):
            assert not det.update(self.saddle() + rng.uniform(-1e-3, 1e-3))

    def test_rejects_degenerate_batch(self):
        with pytest.raises(ValueError):
            CollapseDetector(self.MARGIN, batch_size=1)


def _fit(tmp_path, guard_mode, monkeypatch, fire_after=3):
    """Tiny fit with a stubbed detector that fires after `fire_after` losses."""
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training import collapse
    from peppa_tpu.training.loop import Trainer
    from tests.test_training_loop import tiny_config

    class _Stub(collapse.CollapseDetector):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._n = 0

        def update(self, loss):
            self._n += 1
            self.fired = self.fired or self._n >= fire_after
            return self.fired

    monkeypatch.setattr(collapse, "CollapseDetector", _Stub)
    cfg = tiny_config(tmp_path)
    cfg.training.limit_train_batches = 8
    cfg.tpu.collapse_guard = guard_mode
    data = SyntheticPigData(cfg, n_train=32, n_val=8)
    trainer = Trainer(cfg, log_dir=str(tmp_path / "logs"))
    state = trainer.fit(data)
    return trainer, int(np.asarray(state.step))


@pytest.mark.slow
def test_stop_mode_ends_the_run_gracefully(tmp_path, monkeypatch):
    import os

    trainer, steps = _fit(tmp_path, "stop", monkeypatch)
    assert trainer.collapsed_at is not None
    assert steps < 8  # stopped before the epoch's 8 batches
    # graceful: final validation + checkpoints still happen
    ckpts = os.listdir(os.path.join(trainer.version_dir, "checkpoints"))
    assert "last.ckpt" in ckpts


@pytest.mark.slow
def test_warn_mode_detects_but_trains_on(tmp_path, monkeypatch):
    trainer, steps = _fit(tmp_path, "warn", monkeypatch)
    assert trainer.collapsed_at is not None
    assert steps == 8  # full epoch trained


@pytest.mark.slow
def test_off_mode_installs_no_detector(tmp_path, monkeypatch):
    trainer, steps = _fit(tmp_path, "off", monkeypatch)
    assert trainer.collapsed_at is None and trainer._collapse is None
    assert steps == 8
