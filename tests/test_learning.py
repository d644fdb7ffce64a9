"""Learning smoke test: the train step actually reduces the contrastive loss
on correlated synthetic data (shared latent class drives both modalities)."""

import jax
import numpy as np
import pytest

from peppa_tpu.config import Config
from peppa_tpu.data.dataset import collate
from peppa_tpu.data.synthetic import SyntheticClipDataset
from peppa_tpu.models.dual_encoder import init_model
from peppa_tpu.training.optimization import make_optimizer
from peppa_tpu.training.state import TrainState
from peppa_tpu.training.step import make_train_step


@pytest.mark.slow
def test_train_step_learns_on_correlated_data():
    cfg = Config()
    cfg.data.target_size = (32, 32)
    cfg.data.audio_sample_rate = 1600
    cfg.training.precision = "fp32"
    cfg.audio.full = False
    cfg.video.version = "r3d_18"
    cfg.optimizer.lr = 2e-4
    cfg.optimizer.t_total = 200
    cfg.optimizer.warmup = 0.05

    ds = SyntheticClipDataset([0.5] * 16, target_size=(32, 32),
                              sample_rate=1600, seed=0, correlated=True)
    items = [ds[i] for i in range(len(ds))]
    batches = [collate(items[i:i + 8]) for i in (0, 8)]

    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=1,
                        params=variables["params"])
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, cfg.margin, donate=False)

    rng = jax.random.PRNGKey(1)
    losses = []
    for step in range(30):
        state, metrics = train_step(state, batches[step % 2], rng)
        losses.append(float(metrics["train_loss"]))
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert late < 0.8 * early, f"no learning: early={early:.4f} late={late:.4f}"
