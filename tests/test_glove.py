"""GloVe trainer (analysis/glove.py): objective sanity on a synthetic corpus.

Reference role: the GloVe-840B semantic side of pig/grsa.py:208-233 — here
trained with the real GloVe objective on the analysis corpus itself.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from peppa_tpu.analysis.glove import (cooccurrence, save_glove_txt,
                                      train_glove)


def make_corpus(n=400, seed=0):
    """Two topic clusters: words of a topic co-occur within sentences."""
    rng = np.random.default_rng(seed)
    topics = [["cat", "dog", "pet", "fur", "tail"],
              ["car", "road", "wheel", "drive", "fuel"]]
    out = []
    for _ in range(n):
        t = topics[rng.integers(0, 2)]
        out.append(list(rng.choice(t, size=6)) + ["the", "a"])
    return out


def test_cooccurrence_symmetric_and_distance_weighted():
    vocab, co = cooccurrence([["a", "b", "c"]], window=2, min_count=1)
    assert vocab == ["a", "b", "c"]
    ia, ib, ic = 0, 1, 2
    assert co[(ia, ib)] == co[(ib, ia)] == 1.0
    assert co[(ia, ic)] == co[(ic, ia)] == 0.5  # distance 2 -> weight 1/2


def test_glove_learns_topic_structure():
    vecs = train_glove(make_corpus(), dim=16, window=4, min_count=2,
                       epochs=40, seed=0)
    assert set(vecs) >= {"cat", "dog", "car", "road", "the"}
    for v in vecs.values():
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-5)
    cos = lambda a, b: float(vecs[a] @ vecs[b])
    within = np.mean([cos("cat", "dog"), cos("pet", "fur"),
                      cos("car", "road"), cos("wheel", "drive")])
    across = np.mean([cos("cat", "car"), cos("dog", "road"),
                      cos("pet", "wheel"), cos("fur", "drive")])
    assert within > across + 0.2, (within, across)


def test_glove_txt_roundtrip(tmp_path):
    vecs = {"hello": np.array([0.6, 0.8], np.float32),
            "world": np.array([1.0, 0.0], np.float32)}
    path = str(tmp_path / "glove" / "test.txt")
    save_glove_txt(path, vecs)
    from peppa_tpu.analysis.grsa import glove_text_embedder

    embed = glove_text_embedder(path=path)
    np.testing.assert_allclose(embed("hello"), [0.6, 0.8], atol=1e-4)
    np.testing.assert_allclose(embed("hello world"), [1.6, 0.8], atol=1e-4)
    np.testing.assert_allclose(embed("unknown"), [0.0, 0.0])
    # deterministic: retraining reproduces identical vectors
    v2 = train_glove(make_corpus(), dim=8, epochs=3, seed=0)
    v3 = train_glove(make_corpus(), dim=8, epochs=3, seed=0)
    for w in v2:
        np.testing.assert_array_equal(v2[w], v3[w])
