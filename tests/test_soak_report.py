"""scripts/soak_report.py — the long-run acceptance gate.

Covers the LR-parity check against the REAL schedule source (incl. the
t_total == -1 constant-LR branch the old reimplementation got wrong) and
clean FAIL (no traceback) on degenerate run dirs.
"""
import csv
import importlib.util
import json
import os

import yaml

_SPEC = importlib.util.spec_from_file_location(
    "soak_report", os.path.join(os.path.dirname(__file__), "..", "scripts",
                                "soak_report.py"))
soak_report = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(soak_report)


def _write_run(tmp_path, *, t_total, lr_fn, name="version_0",
               train_rows=6, with_ckpts=True, best=None):
    rd = tmp_path / name
    (rd / "checkpoints").mkdir(parents=True)
    hp = {"optimizer": {"schedule": "warmup_linear", "lr": 1e-4,
                        "warmup": 0.1, "t_total": t_total},
          "training": {"trainer_args": {"accumulate_grad_batches": 2}}}
    (rd / "hparams.yaml").write_text(yaml.safe_dump(hp))
    cols = ["step", "epoch", "time", "train_loss", "lr",
            "perf/items_per_sec", "valnarr_rec_fixed", "valnarr_triplet"]
    rows = []
    for i in range(train_rows):
        rows.append({"step": i, "epoch": 0, "time": 100.0 + i,
                     "train_loss": 0.5 - 0.01 * i, "lr": lr_fn(i // 2),
                     "perf/items_per_sec": 50.0,
                     "valnarr_rec_fixed": "", "valnarr_triplet": ""})
    rows.append({"step": train_rows, "epoch": 0, "time": 100.0 + train_rows,
                 "train_loss": "", "lr": "", "perf/items_per_sec": "",
                 "valnarr_rec_fixed": 0.7, "valnarr_triplet": 0.9})
    with open(rd / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(rows)
    if with_ckpts:
        for mon, score in [("valnarr_rec_fixed", 0.7 if best is None else best),
                           ("valnarr_triplet", 0.9)]:
            p = rd / "checkpoints" / f"epoch=0-{mon}.ckpt"
            p.write_bytes(b"")
            (rd / "checkpoints" / (p.name + ".json")).write_text(json.dumps(
                {"monitor": mon, "mode": "max", "best_model_score": score,
                 "epoch": 0}))
        p = rd / "checkpoints" / "last.ckpt"
        p.write_bytes(b"")
        (rd / "checkpoints" / "last.ckpt.json").write_text(json.dumps(
            {"monitor": None, "best_model_score": None, "epoch": 0}))
    return rd


def test_constant_lr_run_passes(tmp_path):
    """t_total = -1 is a supported config (schedule_fn returns constant lr);
    the gate must PASS a healthy constant-LR run, not divide by -1."""
    rd = _write_run(tmp_path, t_total=-1, lr_fn=lambda s: 1e-4)
    assert soak_report.main([str(rd)]) == 0


def test_warmup_linear_parity(tmp_path):
    def lr(opt_step):
        x = opt_step / 100
        f = x / 0.1 if x < 0.1 else max((x - 1.0) / (0.1 - 1.0), 0.0)
        return 1e-4 * f

    rd = _write_run(tmp_path, t_total=100, lr_fn=lr)
    assert soak_report.main([str(rd)]) == 0
    # a wrong lr column fails the gate
    rd2 = _write_run(tmp_path, t_total=100, lr_fn=lambda s: 1e-4,
                     name="version_1")
    assert soak_report.main([str(rd2)]) == 1


def test_no_train_rows_fails_cleanly(tmp_path, capsys):
    rd = _write_run(tmp_path, t_total=-1, lr_fn=lambda s: 1e-4, train_rows=0,
                    with_ckpts=False)
    assert soak_report.main([str(rd)]) == 1
    assert "no train_loss values" in capsys.readouterr().out


def test_null_best_score_fails_cleanly(tmp_path, capsys):
    rd = _write_run(tmp_path, t_total=-1, lr_fn=lambda s: 1e-4, best=None)
    # corrupt one sidecar to best_model_score: null
    sp = rd / "checkpoints" / "epoch=0-valnarr_rec_fixed.ckpt.json"
    sp.write_text(json.dumps({"monitor": "valnarr_rec_fixed", "mode": "max",
                              "best_model_score": None, "epoch": 0}))
    assert soak_report.main([str(rd)]) == 1
    assert "best_model_score null" in capsys.readouterr().out
