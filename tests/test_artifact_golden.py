"""Golden structural diff of table writers vs the reference's shipped
results/ artifacts (round-3 VERDICT item 5).

Runs scripts/validate_against_reference.py::validate_artifacts against the
reference checkout when present: format_tables/test_table/data_statistics/
correlation_table outputs must structurally match
results/{scores_*.tex, scores.csv, data_statistics.csv,
rsa_dialog_correlations.{csv,tex}} (reference pig/evaluation.py:202-291).
"""

import os
import sys

import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("PEPPA_REFERENCE", "/root/reference")


def test_artifact_structure_matches_reference():
    if not os.path.isdir(os.path.join(REFERENCE, "results")):
        pytest.skip("no reference checkout with shipped results/")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from validate_against_reference import validate_artifacts

    assert validate_artifacts(REFERENCE)


def test_parse_tex_tabular():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from validate_against_reference import parse_tex_tabular

    colspec, header, rows = parse_tex_tabular(
        "\\begin{tabular}{lrr}\n\\toprule\n"
        "{} &  a\\_x &  b \\\\\n\\midrule\n"
        "r1 & 1.00 & 2.00 \\\\\n\\bottomrule\n\\end{tabular}\n")
    assert colspec == "lrr"
    assert header == ["", "a_x", "b"]
    assert rows == [["r1", "1.00", "2.00"]]
