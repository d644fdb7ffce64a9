"""Tests for the analysis layer: OLS vs closed form, stats massaging, grsa
utilities, plotting smoke tests."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from peppa_tpu.analysis.ols import ols, ols_fit
from peppa_tpu.analysis.stats import (
    ablate,
    backprobe,
    massage,
    partial_r2,
    standardize,
    sumcode,
    unpairwise_ols,
)
from peppa_tpu.analysis.grsa import (
    UttData,
    hashing_text_embedder,
    normalized_distance,
    pearson_r,
    triu,
)


def test_ols_recovers_coefficients(rng):
    n = 500
    x1 = rng.normal(size=n)
    x2 = rng.normal(size=n)
    y = 2.0 + 3.0 * x1 - 1.5 * x2 + rng.normal(scale=0.01, size=n)
    df = pd.DataFrame(dict(y=y, x1=x1, x2=x2))
    res = ols("y ~ x1 + x2", df)
    np.testing.assert_allclose(res.params, [2.0, 3.0, -1.5], atol=0.01)
    table = res.summary_table()
    assert list(table["Variable"]) == ["Intercept", "x1", "x2"]
    assert (table["P>|t|"][1:] < 1e-6).all()
    assert (table["[0.025"] < table["Coef."]).all()
    assert (table["0.975]"] > table["Coef."]).all()


def test_ols_pvalue_for_null_predictor(rng):
    n = 400
    x1 = rng.normal(size=n)
    noise = rng.normal(size=n)
    y = 1.0 + 0.0 * x1 + noise
    df = pd.DataFrame(dict(y=y, x1=x1))
    res = ols("y ~ x1", df)
    assert res.summary_table()["P>|t|"][1] > 0.01


def test_sumcode_and_massage(rng):
    assert list(sumcode(pd.Series([True, False, True]))) == [1, -1, 1]
    n = 50
    df = pd.DataFrame(dict(
        samespeaker=rng.integers(0, 2, n).astype(bool),
        sameepisode=rng.integers(0, 2, n).astype(bool),
        sametype=rng.integers(0, 2, n).astype(bool),
        semsim=rng.normal(size=n) + 2,
        duration1=rng.uniform(0.1, 2, n),
        duration2=rng.uniform(0.1, 2, n),
        durationdiff=rng.uniform(0, 1, n),
        sim_1=rng.normal(size=n),
        sim_2=rng.normal(size=n)))
    out = massage(df)
    assert set(out["samespeaker"].unique()) <= {-1, 1}
    np.testing.assert_allclose(out["semsim"].mean(), 0, atol=1e-8)
    out2 = massage(df, scaleall=True)
    np.testing.assert_allclose(np.std(out2["samespeaker"].to_numpy()), 1,
                               atol=1e-6)


def test_unpairwise_ols_and_partial_r2(rng):
    n = 200
    df = pd.DataFrame(dict(
        samespeaker=rng.integers(0, 2, n),
        sameepisode=rng.integers(0, 2, n),
        sametype=rng.integers(0, 2, n),
        semsim=rng.normal(size=n),
        distance=rng.uniform(0, 1, n),
        durationdiff=rng.uniform(0, 1, n),
        durationsum=rng.uniform(0, 2, n),
        sim_1=rng.normal(size=n),
        sim_2=rng.normal(size=n)))
    table = unpairwise_ols(df)
    assert set(table["Dependent Var."]) == {"sim_1", "sim_2"}
    assert "Value" in table.columns
    r2 = partial_r2("sim_2 ~ semsim + distance", standardize(df))
    assert list(r2.index) == ["Intercept", "semsim", "distance"]


def test_backprobe_runs(rng):
    records = [dict(embedding_2=rng.normal(size=8),
                    embedding_1=rng.normal(size=8),
                    embedding_0=rng.normal(size=8),
                    semsim=rng.normal(size=4),
                    speaker=f"spk{i % 3}", episode=i % 2,
                    duration=float(rng.uniform(0.1, 2)))
               for i in range(24)]
    table = backprobe(records)
    assert set(table["outcome"]) == {"embedding_2", "embedding_1",
                                     "embedding_0"}
    assert "rer" in table.columns
    assert set(table["var"]) == {"NONE", "semsim", "speaker", "episode",
                                 "duration"}


def test_uttdata_words(tmp_path):
    align = {
        "speaker": "Peppa",
        "words": [
            {"word": "hello", "case": "success", "start": 0.1, "end": 0.5,
             "phones": [{"phone": "hh_B"}, {"phone": "ah_I"},
                        {"phone": "l_I"}, {"phone": "ow_E"}]},
            {"word": "oops", "case": "not-found-in-audio"},
        ],
    }
    d = tmp_path / "realign" / "dialog" / "ep_3" / "0"
    d.mkdir(parents=True)
    with open(d / "0.json", "w") as f:
        json.dump(align, f)
    data = UttData([str(d / "0.wav")], [str(d / "0.json")])
    utts = list(data.utterances(read_audio=False,
                                embed=hashing_text_embedder()))
    assert len(utts) == 1
    assert utts[0].spelling == "hello"
    assert utts[0].episode == 3
    assert utts[0].phonemes == "hʌloʊ"
    assert utts[0].embedding_t is not None


def test_grsa_utils():
    assert normalized_distance("cat", "bat") == pytest.approx(1 / 3)
    m = np.arange(9, dtype=float).reshape(3, 3)
    np.testing.assert_array_equal(triu(m), [1, 2, 5])
    x = np.arange(10, dtype=float)
    assert pearson_r(x, 2 * x + 1) == pytest.approx(1.0)
    assert pearson_r(x, -x) == pytest.approx(-1.0)


def test_plot_coef_smoke(tmp_path, rng):
    from peppa_tpu.analysis.plotting import plot_coef

    table = pd.DataFrame(dict(
        Variable=["Intercept", "semsim", "sametype"] * 2,
        Coefficient=rng.normal(size=6),
        Lower=rng.normal(size=6) - 1,
        Upper=rng.normal(size=6) + 1,
        multiword=[False] * 6,
        fragment_type=["dialog"] * 6,
        version=[0, 0, 0, 1, 1, 1]))
    plot_coef(table, "dialog", False, results_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "grsa_dialog_word_coef.pdf")


def test_unpairwise_data_records(rng):
    from peppa_tpu.analysis.grsa import Utt, unpairwise_data

    utts = [Utt(spelling=f"word{i % 3}", duration=float(rng.uniform(0.1, 2)),
                speaker=f"spk{i % 2}", episode=i % 4,
                embedding_1=rng.normal(size=8).astype(np.float32),
                embedding_2=rng.normal(size=8).astype(np.float32),
                embedding_t=rng.normal(size=8).astype(np.float32))
            for i in range(10)]
    records = list(unpairwise_data(utts, seed=0))
    assert len(records) == 5
    r = records[0]
    assert {"sametype", "samespeaker", "sameepisode", "durationdiff",
            "durationsum", "distance", "semsim", "sim_1", "sim_2"} <= set(r)
    assert -1.001 <= r["sim_2"] <= 1.001
