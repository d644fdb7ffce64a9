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


def test_arpa2ipa():
    assert arpa2ipa("AH0") == "ʌ"
    assert arpa2ipa("ah_I") == "ʌ"  # gentle position-tagged form
    assert arpa2ipa("ZZZ", default="?") == "?"
    assert phones_to_ipa([{"phone": "hh_B"}, {"phone": "ay_E"}]) == "haɪ"
