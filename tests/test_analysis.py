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


# -------------------------------------------------- corpus word vectors

def test_ppmi_svd_vectors_capture_distribution():
    """Words sharing contexts embed closer than words that never do —
    real distributional semantics, unlike the hashing fallback."""
    from peppa_tpu.analysis.embeddings import train_ppmi_svd

    corpus = []
    for pet in ("cat", "dog"):
        corpus += [[pet, "chases", "the", "ball"],
                   ["the", pet, "eats", "food"],
                   ["a", pet, "sleeps", "here"]] * 5
    corpus += [["the", "table", "stands", "in", "the", "room"],
               ["a", "table", "holds", "plates"],
               ["the", "room", "has", "a", "table"]] * 5
    vecs = train_ppmi_svd(corpus, dim=16, min_count=2)
    cos = lambda a, b: float(np.dot(vecs[a], vecs[b]))
    assert cos("cat", "dog") > cos("cat", "table")
    assert cos("cat", "dog") > cos("dog", "room")
    # deterministic
    vecs2 = train_ppmi_svd(corpus, dim=16, min_count=2)
    np.testing.assert_allclose(vecs["cat"], vecs2["cat"], atol=1e-6)


def test_vectors_save_load_roundtrip(tmp_path):
    from peppa_tpu.analysis.embeddings import (load_vectors, save_vectors,
                                               train_ppmi_svd)

    vecs = train_ppmi_svd([["a", "b", "c"], ["a", "c", "b"]] * 5,
                          dim=4, min_count=1)
    path = str(tmp_path / "v.npz")
    save_vectors(path, vecs)
    back = load_vectors(path)
    assert set(back) == set(vecs)
    np.testing.assert_allclose(back["a"], vecs["a"], atol=1e-7)


@pytest.mark.skipif(not os.path.exists("/root/reference/data/out/realign"),
                    reason="reference checkout not present")
def test_corpus_vectors_on_reference_transcripts(tmp_path):
    """Vectors trained on the reference's shipped transcripts cover the
    eval vocabulary and show non-degenerate semantics (character names
    cluster against random non-name words)."""
    from peppa_tpu.analysis.embeddings import corpus_sentences, train_ppmi_svd

    sentences = corpus_sentences("/root/reference/data")
    assert len(sentences) > 1000
    vecs = train_ppmi_svd(sentences, dim=64)
    eval_words = ["play", "jump", "catch", "love", "big", "little", "muddy",
                  "happy", "peppa", "george", "mummy", "daddy"]
    assert all(w in vecs for w in eval_words)
    names = ["peppa", "george", "suzy", "danny", "rebecca"]
    others = ["puddle", "garden", "ball", "house", "water"]
    cos = lambda a, b: float(np.dot(vecs[a], vecs[b]))
    name_sims = [cos(a, b) for i, a in enumerate(names)
                 for b in names[i + 1:]]
    cross_sims = [cos(a, b) for a in names for b in others]
    assert np.mean(name_sims) > np.mean(cross_sims)


def test_corpus_text_embedder_plugs_into_grsa(tmp_path):
    """make_text_embedder('corpus') returns real vectors when a realign
    corpus exists under data_dir."""
    import shutil

    from peppa_tpu.analysis.grsa import make_text_embedder

    if not os.path.exists("/root/reference/data/out/realign"):
        pytest.skip("reference checkout not present")
    data_dir = str(tmp_path / "data")
    os.makedirs(os.path.join(data_dir, "out"), exist_ok=True)
    shutil.copytree("/root/reference/data/out/realign",
                    os.path.join(data_dir, "out", "realign"))
    embed = make_text_embedder("corpus", data_dir=data_dir)
    a, b = embed("muddy puddle"), embed("muddy puddles")
    assert np.linalg.norm(a) > 0
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.5  # shared word dominates: related phrases are close
    # cache was written for reuse
    assert os.path.exists(os.path.join(data_dir, "out", "word_vectors.npz"))


def test_rsa_correlations_artifact_shape(tmp_path, rng):
    """correlation_table writes rsa_{fragment}_correlations.csv with the
    reference artifact's column family (results/rsa_dialog_correlations.csv)."""
    from peppa_tpu.analysis.stats import correlation_table

    n = 40
    df = pd.DataFrame({
        "fragment_type": ["dialog"] * n,
        "samespeaker": rng.integers(0, 2, n).astype(float),
        "sameepisode": rng.integers(0, 2, n).astype(float),
        "sametype": rng.integers(0, 2, n).astype(float),
        "semsim": rng.normal(size=n),
        "distance": rng.uniform(size=n),
        "durationdiff": rng.uniform(size=n),
        "sim_0": rng.normal(size=n),
        "sim_1": rng.normal(size=n),
        "sim_2": rng.normal(size=n),
    })
    mat = correlation_table(df, "dialog", results_dir=str(tmp_path))
    out = pd.read_csv(tmp_path / "rsa_dialog_correlations.csv", index_col=0)
    assert np.allclose(np.diag(out.to_numpy()), 1.0)
    ref_csv = "/root/reference/results/rsa_dialog_correlations.csv"
    if os.path.exists(ref_csv):
        ref = pd.read_csv(ref_csv, index_col=0)
        assert list(out.columns) == list(ref.columns)
        assert list(out.index) == list(ref.index)
