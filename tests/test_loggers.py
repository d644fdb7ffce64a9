"""MetricsLogger: incremental CSV appends, header growth, resume.

Reference behavior being mirrored: Lightning's CSV/TensorBoard logging under
lightning_logs/version_N/ (pig/models.py:264,273,298-318).  The incremental
writer is a perf fix (round-2 VERDICT weak #5): one appended line per log()
instead of a full-file rewrite.
"""

import csv
import os

import pytest

from peppa_tpu.training.loggers import MetricsLogger

pytestmark = pytest.mark.smoke


def read_rows(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_appends_one_line_per_log(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    path = os.path.join(str(tmp_path), "metrics.csv")
    lg.log({"train_loss": 1.0}, step=1, epoch=0)
    size1 = os.path.getsize(path)
    lg.log({"train_loss": 0.9}, step=2, epoch=0)
    size2 = os.path.getsize(path)
    lg.log({"train_loss": 0.8}, step=3, epoch=0)
    size3 = os.path.getsize(path)
    lg.close()
    # steady state: file grows by ~one row per call, never rewrites
    assert 0 < size3 - size2 <= (size2 - size1) + 8
    rows = read_rows(path)
    assert [r["step"] for r in rows] == ["1", "2", "3"]
    assert float(rows[-1]["train_loss"]) == 0.8


def test_new_fields_preserve_old_rows(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log({"train_loss": 1.0}, step=1, epoch=0)
    lg.log({"val_rec_fixed": 0.5, "valnarr_triplet": 0.7}, step=2, epoch=0)
    lg.log({"train_loss": 0.9}, step=3, epoch=0)
    lg.close()
    rows = read_rows(os.path.join(str(tmp_path), "metrics.csv"))
    assert len(rows) == 3
    assert float(rows[0]["train_loss"]) == 1.0
    assert rows[0]["val_rec_fixed"] == ""  # old row, new column empty
    assert float(rows[1]["val_rec_fixed"]) == 0.5
    assert float(rows[2]["train_loss"]) == 0.9


def test_resume_appends_to_existing_file(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log({"train_loss": 1.0, "lr": 1e-4}, step=1, epoch=0)
    lg.close()
    # second run in the same version dir (scheduler requeue / manual resume)
    lg2 = MetricsLogger(str(tmp_path))
    lg2.log({"train_loss": 0.5, "lr": 2e-4}, step=2, epoch=0)
    lg2.close()
    rows = read_rows(os.path.join(str(tmp_path), "metrics.csv"))
    assert [r["step"] for r in rows] == ["1", "2"]
    assert float(rows[0]["train_loss"]) == 1.0
    assert float(rows[1]["lr"]) == 2e-4


def test_resume_with_new_fields(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log({"train_loss": 1.0}, step=1, epoch=0)
    lg.close()
    lg2 = MetricsLogger(str(tmp_path))
    lg2.log({"perf/items_per_sec": 8.0}, step=2, epoch=0)
    lg2.close()
    rows = read_rows(os.path.join(str(tmp_path), "metrics.csv"))
    assert len(rows) == 2
    assert float(rows[0]["train_loss"]) == 1.0
    assert float(rows[1]["perf/items_per_sec"]) == 8.0
