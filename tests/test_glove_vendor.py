"""The vendor-ready GloVe hook: vocabulary export, drop detection,
validation, and the automatic vendored-vs-corpus RSA delta
(scripts/glove_vendor_validate.py; reference space: pig/grsa.py:208-233)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import glove_vendor_validate as gvv  # noqa: E402

WORDS = ["peppa", "george", "jumps", "in", "muddy", "puddles",
         "loves", "the", "big", "little", "ball", "happy"]


def make_transcripts(root, n_files=8):
    """A small realign tree under <root>/out/realign (grsa.realign_paths)."""
    rng = np.random.default_rng(0)
    for fragment in ("dialog", "narration"):
        for i in range(n_files):
            d = os.path.join(root, "out", "realign", fragment,
                             f"ep_{i % 4 + 1}", str(i))
            os.makedirs(d, exist_ok=True)
            t = 0.1
            words = []
            for w in rng.choice(WORDS, size=5, replace=False):
                words.append({"word": str(w), "case": "success",
                              "start": round(t, 2), "end": round(t + 0.3, 2)})
                t += 0.35
            with open(os.path.join(d, f"{i}.json"), "w") as f:
                json.dump({"speaker": "Narrator", "words": words,
                           "transcript": " ".join(w["word"] for w in words)},
                          f)


def write_fake_840b(path, vocab, dim=50, seed=1):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for w in vocab:
            vec = rng.standard_normal(dim)
            f.write(w + " " + " ".join(f"{x:.4f}" for x in vec) + "\n")


def test_needed_vocab_and_missing_file_path(tmp_path, capsys):
    make_transcripts(str(tmp_path / "ref"))
    rc = gvv.main(["--data_dir", str(tmp_path / "data"),
                   "--transcripts_dir", str(tmp_path / "ref"),
                   "--vocab_out", str(tmp_path / "vocab.txt"),
                   "--out", str(tmp_path / "delta.csv")])
    assert rc == 2  # no vendored file: instructions, not an error
    vocab = open(tmp_path / "vocab.txt").read().split()
    assert set(vocab) == set(WORDS)
    out = capsys.readouterr().out
    assert "grep -Fw" in out and "glove.840B" in out
    assert not os.path.exists(tmp_path / "delta.csv")


def test_vendored_file_validates_and_produces_delta(tmp_path):
    make_transcripts(str(tmp_path / "ref"))
    data_dir = str(tmp_path / "data")
    write_fake_840b(os.path.join(data_dir, "in", "glove",
                                 "glove.840B.subset.txt"), WORDS)
    out = str(tmp_path / "delta.csv")
    rc = gvv.main(["--data_dir", data_dir,
                   "--transcripts_dir", str(tmp_path / "ref"),
                   "--vocab_out", str(tmp_path / "vocab.txt"),
                   "--out", out, "--n-pairs", "200"])
    assert rc == 0
    import pandas as pd

    rep = pd.read_csv(out)
    assert set(rep["embedder"]) == {"vendored", "glove_corpus"}
    vend = rep[rep.embedder == "vendored"].iloc[0]
    base = rep[rep.embedder == "glove_corpus"].iloc[0]
    # self-correlation of the base space is exactly 1; the vendored space is
    # random here, so its delta row must be a real number in [-1, 1]
    assert base["semsim_vs_glove_corpus"] == pytest.approx(1.0)
    assert -1.0 <= vend["semsim_vs_glove_corpus"] <= 1.0
    assert "glove.840B.subset.txt" in vend["source"]


def test_find_vendored_prefers_drop_over_trained(tmp_path):
    data_dir = str(tmp_path / "data")
    gdir = os.path.join(data_dir, "in", "glove")
    os.makedirs(gdir)
    open(os.path.join(gdir, "zz_corpus_glove.100d.txt"), "w").close()
    assert gvv.find_vendored(data_dir) is None
    write_fake_840b(os.path.join(gdir, "glove.840B.subset.txt"), WORDS)
    assert gvv.find_vendored(data_dir).endswith("glove.840B.subset.txt")


def test_validate_format_rejects_ragged(tmp_path):
    p = tmp_path / "bad.txt"
    with open(p, "w") as f:
        f.write("cat 1.0 2.0\n")
        f.write("dog 1.0 2.0 3.0\n")
    with pytest.raises(ValueError, match="inconsistent"):
        gvv.validate_format(str(p), ["cat", "dog"])


def test_validate_format_multiword_and_case(tmp_path, capsys):
    """840B quirks: multiword-token rows parse-skip (not fatal), and rows
    matching the vocabulary only by CASE don't count as coverage — the
    embedder (analysis/grsa.py::glove_text_embedder) stores keys
    case-sensitively and looks up lowercase."""
    p = tmp_path / "sub.txt"
    with open(p, "w") as f:
        f.write("cat 1.0 2.0\n")
        f.write(". . . 0.5 0.5\n")        # multiword token from grep -Fw
        f.write("Dog 1.0 2.0\n")          # case-only match: unusable
    n, dim, cov = gvv.validate_format(str(p), ["cat", "dog"])
    assert (n, dim) == (2, 2)             # the multiword row is skipped
    assert cov == pytest.approx(0.5)      # only 'cat' truly covered
    out = capsys.readouterr().out
    assert "skipped 1 unparseable" in out
    assert "WARNING" in out and "Dog" in out
