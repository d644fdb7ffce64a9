"""Tests for the CTC Viterbi forced aligner and the IPA mapping."""

import numpy as np
import pytest

from peppa_tpu.preprocess.forced_align import (
    BLANK,
    CTC_CHARS,
    align_ctc,
    clean,
    ctc_forced_align,
    text_to_tokens,
)
from peppa_tpu.preprocess.ipa import arpa2ipa, phones_to_ipa


def synth_logits(tokens, spans, T, V=len(CTC_CHARS), peak=8.0, seed=0):
    """Log-probs strongly favoring `tokens[i]` during frames spans[i]."""
    rng = np.random.default_rng(seed)
    logits = rng.normal(scale=0.1, size=(T, V))
    logits[:, BLANK] += 2.0  # blanks by default
    for tok, (f0, f1) in zip(tokens, spans):
        logits[f0:f1, BLANK] -= 4.0
        logits[f0:f1, tok] += peak
    x = logits - logits.max(axis=1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=1, keepdims=True))


def test_text_to_tokens_roundtrip():
    tokens, spans = text_to_tokens("the cat")
    text = "".join(CTC_CHARS[t] for t in tokens)
    assert text == "THE|CAT"
    assert spans == [(0, 3), (4, 7)]


def test_clean_strips_brackets():
    assert clean("hello [laughs] world") == "hello  world"


def test_ctc_alignment_recovers_spans():
    tokens, word_spans = text_to_tokens("hi mum")  # H I | M U M
    frame_spans = [(5, 9), (10, 14), (15, 17), (20, 24), (25, 28), (30, 34)]
    logits = synth_logits(tokens, frame_spans, T=40)
    labels, score = ctc_forced_align(logits, tokens)
    # every token must be emitted, in order
    emitted = [lab for lab in labels if lab >= 0]
    assert sorted(set(emitted)) == list(range(len(tokens)))
    assert emitted == sorted(emitted)
    # token 0 ('H') should sit inside its synthetic span
    h_frames = np.where(labels == 0)[0]
    assert h_frames.min() >= 4 and h_frames.max() <= 10


def test_align_ctc_word_timings():
    tokens, word_spans = text_to_tokens("hi mum")
    frame_spans = [(5, 9), (10, 14), (15, 17), (20, 24), (25, 28), (30, 34)]
    logits = synth_logits(tokens, frame_spans, T=40)
    result = align_ctc(logits, "hi mum", frame_seconds=0.02)
    assert [w["word"] for w in result["words"]] == ["HI", "MUM"]
    w0, w1 = result["words"]
    assert w0["case"] == "success" and w1["case"] == "success"
    assert w0["start"] == pytest.approx(0.1, abs=0.04)
    assert w0["end"] <= w1["start"]
    assert w1["end"] <= 40 * 0.02


def test_align_too_short_fails_gracefully():
    tokens, _ = text_to_tokens("hello world")
    logits = synth_logits(tokens[:2], [(0, 1), (1, 2)], T=3)
    result = align_ctc(logits, "hello world", frame_seconds=0.02)
    assert all(w["case"] == "not-found-in-audio" for w in result["words"])


def test_native_dp_bit_identical_to_python():
    """The C++ Viterbi DP (native/src/ctc_align.cpp) must be BIT-identical
    to the Python fallback: same IEEE f64 compare/add sequence, same strict
    '>' tie-breaks, same skip-transition gating on repeated tokens."""
    from peppa_tpu.preprocess.forced_align import (_ctc_align_python,
                                                   _native_align_lib,
                                                   _ctc_align_native)

    lib = _native_align_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(7)
    cases = [
        text_to_tokens("hi mum")[0],          # with word separator
        text_to_tokens("mummmy emme")[0],     # repeated tokens: no-skip arcs
        [5] * 6,                              # all-identical tokens
        [6, 6, 7, 7, 6],                      # alternating repeats
        list(rng.integers(5, 27, size=40)),   # long random target
    ]
    for tokens in cases:
        for T in (len(tokens) + 1, 4 * len(tokens) + 3):
            lp = rng.normal(scale=2.0, size=(T, len(CTC_CHARS)))
            lp = lp - np.log(np.exp(lp).sum(axis=1, keepdims=True))
            # exercise both f32 inputs (the model's dtype) and f64
            for dtype in (np.float32, np.float64):
                arr = lp.astype(dtype)
                la_py, sc_py = _ctc_align_python(arr, tokens)
                la_c, sc_c = _ctc_align_native(lib, arr, tokens, BLANK)
                np.testing.assert_array_equal(la_c, la_py)
                assert sc_c == sc_py  # bit-identical, not approx

    # out-of-range token ids are rejected, not read out of bounds
    with pytest.raises(ValueError):
        _ctc_align_native(lib, np.zeros((5, 4)), [1, 99], BLANK)


def test_arpa2ipa():
    assert arpa2ipa("AH0") == "ʌ"
    assert arpa2ipa("ah_I") == "ʌ"  # gentle position-tagged form
    assert arpa2ipa("ZZZ", default="?") == "?"
    assert phones_to_ipa([{"phone": "hh_B"}, {"phone": "ay_E"}]) == "haɪ"
