"""Tests for the CTC Viterbi forced aligner and the IPA mapping."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

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


def _fake_in_tree(root, epid=1, subs=(("0:00:00.5", "0:00:02.5", "hi mum"),
                                      ("0:00:03", "0:00:05", "big fish"))):
    """Minimal data/in tree realign() reads: video list CSV + episode
    annotation JSON + a wav 'episode' (reference pig/forced_align.py:30-67
    input layout)."""
    import json
    import os
    import wave

    os.makedirs(os.path.join(root, "in", "peppa", "episodes"), exist_ok=True)
    title = f"Episode {epid}"
    # path column: realign strips the first 4 chars ("mnt/") before joining
    with open(os.path.join(root, "in", "peppa_pig_dataset-video_list.csv"),
              "w") as f:
        f.write(f"{epid};'{title}';'mnt/ep_{epid}.wav'\n")
    with open(os.path.join(root, "in", "peppa", "episodes",
                           f"ep_{epid}.json"), "w") as f:
        json.dump({"title": title, "narrator_splits": [
            {"context": {"subtitles": [], "tokenized": []},
             "narration": {"subtitles": [
                 {"begin": b, "end": e, "text": t} for b, e, t in subs]}}
        ]}, f)
    sr = 16000
    samples = (np.sin(np.linspace(0, 800, 8 * sr)) * 8000).astype("<i2")
    with wave.open(os.path.join(root, "in", "peppa", f"ep_{epid}.wav"),
                   "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())


@pytest.mark.parametrize("nthreads", [1, 3])
def test_realign_writes_gentle_style_jsons(tmp_path, nthreads):
    """realign() end-to-end over a synthetic episode: per-utterance wav +
    gentle-schema JSON with clip metadata, identical serial vs threaded
    (reference forced_align.py:8 runs gentle with nthreads=cpu_count)."""
    import json
    import os

    from peppa_tpu.preprocess.forced_align import realign

    root = str(tmp_path / f"data{nthreads}")
    _fake_in_tree(root)

    def fake_logits(wav_path):
        # frame count from the cut wav's true duration (0.5 s margins)
        import wave

        with wave.open(wav_path) as w:
            dur = w.getnframes() / w.getframerate()
        T = max(int(dur / 0.02), 8)
        tokens, _ = text_to_tokens("hi mum")
        n = len(tokens)
        span = max(T // (2 * n), 1)
        spans = [(25 + i * span, 25 + i * span + span) for i in range(n)]
        return synth_logits(tokens, spans, T=T)

    realign("narration", data_dir=root, ctc_logits_fn=fake_logits,
            splits=("val",), nthreads=nthreads)

    outdir = os.path.join(root, "out", "realign", "narration", "ep_1", "0")
    assert sorted(os.listdir(outdir)) == ["0.json", "0.wav", "1.json",
                                          "1.wav"]
    with open(os.path.join(outdir, "0.json")) as f:
        r = json.load(f)
    assert [w["word"] for w in r["words"]] == ["HI", "MUM"]
    assert r["speaker"] == "Narrator"
    assert r["episode_title"] == "Episode 1"
    assert r["clipStart"] == 0.0 and r["clipEnd"] == pytest.approx(3.0)
    assert r["partIndex"] == 0 and r["clipIndex"] == 0
    assert all(w["case"] == "success" for w in r["words"])


def test_make_ctc_logits_fn_buckets_and_slices(tmp_path):
    """make_ctc_logits_fn: a real wav2vec2 acoustic forward behind the
    ctc_logits_fn contract — wavs pad to duration buckets (one XLA program
    each), output is (true_frames, 28) log-probs (frame = 320 samples)."""
    import wave

    from tests.test_models import TINY_W2V
    from peppa_tpu.models.wav2vec2 import Wav2Vec2
    from peppa_tpu.preprocess.forced_align import make_ctc_logits_fn

    import jax

    model = Wav2Vec2(TINY_W2V)
    sr = 16000
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, sr), np.float32))
    fn = make_ctc_logits_fn(variables=variables, cfg=TINY_W2V,
                            bucket_seconds=(1.0, 2.0), sample_rate=sr)

    for seconds in (0.5, 1.7):
        path = str(tmp_path / f"{seconds}.wav")
        n = int(seconds * sr)
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((np.sin(np.arange(n) * 0.05) * 8000)
                          .astype("<i2").tobytes())
        lp = fn(path)
        assert lp.shape[1] == len(CTC_CHARS)
        # frames follow the TRUE length, not the bucket
        from peppa_tpu.models.wav2vec2 import conv_output_length

        assert lp.shape[0] == int(conv_output_length(np.asarray(n)))
        # rows are log-distributions
        np.testing.assert_allclose(np.exp(lp).sum(axis=1), 1.0, atol=1e-4)

    # missing both sources is an error
    with pytest.raises(ValueError):
        make_ctc_logits_fn()


def test_arpa2ipa():
    assert arpa2ipa("AH0") == "ʌ"
    assert arpa2ipa("ah_I") == "ʌ"  # gentle position-tagged form
    assert arpa2ipa("ZZZ", default="?") == "?"
    assert phones_to_ipa([{"phone": "hh_B"}, {"phone": "ay_E"}]) == "haɪ"
