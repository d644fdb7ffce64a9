"""End-to-end quality parity: torch twin vs peppa_tpu, same checkpoint,
same decoded clips, full eval battery (VERDICT r3 #1 / the north star's
"recall within 1%" half).

The torch side is the REFERENCE stack rebuilt faithfully (towers with
torchaudio/torchvision state-dict naming + the metric formulas from
pig/metrics.py and pig/triplet.py, independent of peppa_tpu's jit'd
implementations).  Both consume identical collated batches decoded by the
production data pipeline; both run their own bootstrap sampling stacks.

The committed full-size table (results/torch_twin_parity.csv, 300+ clips,
500 bootstrap rounds) is produced by scripts/torch_twin_parity.py from the
same `run_twin_battery`; this test runs a smaller deterministic instance.
"""

import pytest

torch = pytest.importorskip("torch")

from tests.torch_twin import run_twin_battery  # noqa: E402

TOLERANCE = 0.01  # the north star's own 1% (absolute on [0,1] metrics)


@pytest.mark.slow
def test_torch_twin_full_battery_within_1pct(tmp_path):
    rows = run_twin_battery(str(tmp_path), episodes=3, clips_per_episode=2,
                            num_layers=2, n_samples=100)
    by_name = {r["metric"]: r for r in rows}

    # same checkpoint + same clips => embeddings must be near-identical
    for name, row in by_name.items():
        if name.endswith("_max_abs_diff"):
            assert row["abs_diff"] < 5e-4, (name, row)

    # every headline metric within the north star's 1%
    headline = [n for n in by_name if not n.endswith("_max_abs_diff")]
    assert sorted(headline) == sorted([
        "fixed/recall_at_1", "fixed/recall_at_10",
        "jitter/recall_at_1", "jitter/recall_at_10", "lines/triplet_acc"])
    for name in headline:
        row = by_name[name]
        assert row["abs_diff"] <= TOLERANCE, (name, row)


@pytest.mark.slow
def test_training_dynamics_twin():
    """Torch-vs-JAX TRAINING dynamics (VERDICT r4 #2): same init, same
    batches, dropout off — the composed train step (TripletLoss + BertAdam)
    is the same function in both frameworks.

    Bounds are ~10x the measured CPU values (loss |d| 5e-7..2e-4 over the
    first steps; param |d| 0.0 / 3.3e-5 / 3.5e-4 after steps 1/2/5).  A
    hinge loss makes LONG trajectories chaotic (see run_dynamics_twin), so
    only the early horizon + param-level checks are asserted.
    """
    import numpy as np

    from tests.torch_twin import run_dynamics_twin

    r = run_dynamics_twin(steps=8, lr=1e-4)
    tl = np.asarray(r["torch_losses"])
    jl = np.asarray(r["jax_losses"])
    assert np.isfinite(tl).all() and np.isfinite(jl).all()
    d = np.abs(tl - jl)
    assert d[0] < 1e-5, d
    assert d[:3].max() < 2e-3, d
    pd = r["param_max_abs_diff_after"]
    assert pd[1] < 1e-6, pd       # first update: bit-level agreement
    assert pd[2] < 5e-4, pd
    assert pd[5] < 5e-3, pd


@pytest.mark.slow
def test_targeted_minimal_pairs_twin_agreement(tmp_path):
    """The targeted minimal-pairs path through BOTH frameworks (the shared
    cached triplet dataset feeds torch and jax towers; per-sample results
    must agree exactly — same checkpoint, same clips, discrete metric)."""
    import os

    import jax
    import numpy as np

    from peppa_tpu.config import Config
    from peppa_tpu.evaluation.evaluation import make_predict
    from peppa_tpu.evaluation.targeted import targeted_triplet_score
    from peppa_tpu.models.convert import export_peppa_state_dict
    from peppa_tpu.models.dual_encoder import init_model
    from tests.torch_twin import (KINETICS_MEAN, KINETICS_STD,
                                  TorchPeppaPig, W2V_CONV_LAYERS,
                                  make_correlated_targeted_eval,
                                  t_targeted_score)

    data_dir = str(tmp_path / "data")
    os.makedirs(os.path.join(data_dir, "in"))
    ts, sr = (32, 24), 800
    make_correlated_targeted_eval(data_dir, target_size=ts, sample_rate=sr,
                                  n_pairs=6)
    cfg = Config()
    cfg.data.target_size = ts
    cfg.data.audio_sample_rate = sr
    cfg.training.precision = "fp32"
    cfg.audio.num_layers = 2
    cfg.tpu.use_pallas = False
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    tmodel = TorchPeppaPig(W2V_CONV_LAYERS, mean=KINETICS_MEAN,
                           std=KINETICS_STD, n_layers=2).eval()
    tmodel.load_state_dict(export_peppa_state_dict(variables, cfg),
                           strict=True)
    predict = make_predict(model, variables)
    for scram in (False, True):
        aj = targeted_triplet_score(
            "narration", "NOUN", predict, target_size=ts,
            audio_sample_rate=sr, data_dir=data_dir, scrambled_video=scram)
        at = t_targeted_score(tmodel, "narration", "NOUN", target_size=ts,
                              sample_rate=sr, data_dir=data_dir,
                              scrambled_video=scram)
        assert len(aj) == len(at) == 12
        np.testing.assert_array_equal(aj, at)


def test_trained_parity_artifact_binds_above_chance():
    """The committed trained-twin table (results/torch_twin_parity.csv,
    produced by scripts/torch_twin_parity.py --trained) must carry a
    trained section whose jax-side operating point is far from chance —
    where 1% agreement actually means something (VERDICT r4 Missing #1) —
    and every trained row must agree within the north star's 1%."""
    import csv
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "torch_twin_parity.csv")
    rows = {r["metric"]: r for r in csv.DictReader(open(path))}
    trained = {k: v for k, v in rows.items() if k.startswith("trained/")}
    if not trained:
        pytest.skip("trained section not yet regenerated on this checkout")

    # operating point: far above chance (chance R@10-of-100 = 0.10,
    # minimal-pairs chance = 0.5)
    assert float(rows["trained/fixed/recall_at_10"]["peppa_tpu"]) > 0.4
    assert float(rows["trained/minimal_pairs/acc"]["peppa_tpu"]) > 0.7
    for name, r in trained.items():
        tol = 5e-4 if name.endswith("_max_abs_diff") else 0.01
        assert float(r["abs_diff"]) <= tol, (name, r)
