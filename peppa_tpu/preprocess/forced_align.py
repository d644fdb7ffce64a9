"""Forced alignment of subtitle text to audio.

Capability parity: reference pig/forced_align.py, which shells into gentle
(a Kaldi HMM wrapper) to time-align each subtitle line and writes per-utterance
JSONs consumed by the targeted-triplets eval-set generation
(generate_targeted_triplets_eval_sets.py) and the GRSA analysis.

TPU-native design: the native dependency (Kaldi decoding) is replaced by CTC
Viterbi forced alignment over character log-probabilities from a CTC acoustic
model — e.g. a wav2vec2 + char head checkpoint loaded through
models/convert.py.  The alignment itself (`ctc_forced_align`) is a pure
dynamic program over (frames, tokens), independent of any model, and the JSON
output schema matches the reference's gentle output
(`words[].{word, alignedWord, case, start, end, phones[]}` plus clip metadata
— see /root/reference/data/out/realign/dialog/ep_197/3/3.json) so downstream
tooling is interchangeable.  When the `gentle` package is importable it is
used as a drop-in backend instead.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

# the torchaudio/fairseq 28-token char vocabulary for wav2vec2 CTC heads
CTC_CHARS = ["<s>", "<pad>", "</s>", "<unk>", "|", "E", "T", "A", "O", "N",
             "I", "H", "S", "R", "D", "L", "U", "M", "W", "C", "F", "G", "Y",
             "P", "B", "V", "K", "'", ]
BLANK = 1  # <pad> is the CTC blank in the fairseq convention
WORD_SEP = 4  # '|'


def clean(text: str) -> str:
    """Strip bracketed annotations (reference pig/forced_align.py:69-72)."""
    return re.sub(r"\[[^()]*\]", "", text)


def text_to_tokens(text: str) -> Tuple[List[int], List[Tuple[int, int]]]:
    """Uppercase text -> CTC token ids + per-word (start, end) token spans."""
    vocab = {c: i for i, c in enumerate(CTC_CHARS)}
    tokens: List[int] = []
    word_spans: List[Tuple[int, int]] = []
    words = [w for w in re.split(r"\s+", clean(text).upper().strip()) if w]
    for wi, word in enumerate(words):
        start = len(tokens)
        for ch in word:
            tokens.append(vocab.get(ch, 3))  # unknown chars -> <unk>
        word_spans.append((start, len(tokens)))
        if wi != len(words) - 1:
            tokens.append(WORD_SEP)
    return tokens, word_spans


@functools.lru_cache(maxsize=1)
def _native_align_lib():
    """The C++ Viterbi DP (native/src/ctc_align.cpp), or None.

    Same role as Kaldi's C++ decoder in the reference's gentle backend: the
    per-utterance O(T*S) DP is the aligner's host hot loop (~40 ms/utterance
    in Python, ~0.1 ms native).  ctypes releases the GIL during the call, so
    utterance-level thread pools parallelize across cores.
    """
    import ctypes

    from peppa_tpu.native.build import build

    path = build(target="ctc_align")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ppk_ctc_align.restype = ctypes.c_int
    lib.ppk_ctc_align.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double)]
    return lib


def _ctc_align_native(lib, log_probs: np.ndarray, tokens: Sequence[int],
                      blank: int) -> Tuple[np.ndarray, float]:
    import ctypes

    lp = np.ascontiguousarray(log_probs, np.float64)
    tok = np.ascontiguousarray(tokens, np.int32)
    T, V = lp.shape
    labels = np.empty((T,), np.int32)
    score = ctypes.c_double()
    rc = lib.ppk_ctc_align(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), T, V,
        tok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tok),
        blank, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(score))
    if rc == 2:
        raise ValueError(f"token id out of range for vocab {V}")
    assert rc == 0, rc  # rc==1 (unalignable) is pre-checked by the caller
    return labels, float(score.value)


def ctc_forced_align(log_probs: np.ndarray, tokens: Sequence[int],
                     blank: int = BLANK) -> Tuple[np.ndarray, float]:
    """Viterbi forced alignment through the standard CTC graph.

    log_probs: (T, V) log softmax frames; tokens: target ids (no blanks).
    Returns (frame_labels, score): frame_labels[t] = index into `tokens` of
    the token emitted at frame t, or -1 for blank; score = best path
    log-likelihood.  The CTC graph interleaves blanks:
    states s = 0..2N, even = blank, odd = token (s-1)//2; skip transitions
    allowed between different consecutive tokens.

    Dispatches to the C++ DP (native/src/ctc_align.cpp) when the toolchain
    allows — bit-identical to this Python fallback (both run the same IEEE
    f64 compare/add sequence; tests/test_forced_align.py asserts it).
    """
    T, V = log_probs.shape
    N = len(tokens)
    if N == 0 or T < N:
        raise ValueError(f"cannot align {N} tokens into {T} frames")
    lib = _native_align_lib()
    if lib is not None:
        return _ctc_align_native(lib, log_probs, tokens, blank)
    return _ctc_align_python(log_probs, tokens, blank)


def _ctc_align_python(log_probs: np.ndarray, tokens: Sequence[int],
                      blank: int = BLANK) -> Tuple[np.ndarray, float]:
    """Portable fallback DP (also the native kernel's parity reference)."""
    T, V = log_probs.shape
    N = len(tokens)
    S = 2 * N + 1
    NEG = -1e30

    def emit(s: int) -> int:
        return blank if s % 2 == 0 else tokens[(s - 1) // 2]

    alpha = np.full((T, S), NEG, np.float64)
    back = np.zeros((T, S), np.int32)
    alpha[0, 0] = log_probs[0, blank]
    alpha[0, 1] = log_probs[0, tokens[0]]
    for t in range(1, T):
        lp = log_probs[t]
        prev = alpha[t - 1]
        for s in range(S):
            best, arg = prev[s], s
            if s >= 1 and prev[s - 1] > best:
                best, arg = prev[s - 1], s - 1
            if (s >= 2 and s % 2 == 1
                    and tokens[(s - 1) // 2] != tokens[(s - 3) // 2]
                    and prev[s - 2] > best):
                best, arg = prev[s - 2], s - 2
            alpha[t, s] = best + lp[emit(s)]
            back[t, s] = arg
    end = S - 1 if alpha[T - 1, S - 1] >= alpha[T - 1, S - 2] else S - 2
    score = float(alpha[T - 1, end])
    labels = np.full((T,), -1, np.int32)
    s = end
    for t in range(T - 1, -1, -1):
        labels[t] = -1 if s % 2 == 0 else (s - 1) // 2
        s = back[t, s]
    return labels, score


def word_timings(labels: np.ndarray, tokens: Sequence[int],
                 word_spans: Sequence[Tuple[int, int]],
                 frame_seconds: float,
                 words: Sequence[str]) -> List[Dict]:
    """Frame labels -> gentle-style `words` entries with start/end seconds."""
    first = np.full((len(tokens),), -1, np.int64)
    last = np.full((len(tokens),), -1, np.int64)
    for t, lab in enumerate(labels):
        if lab >= 0:
            if first[lab] < 0:
                first[lab] = t
            last[lab] = t
    out = []
    for (t0, t1), word in zip(word_spans, words):
        tok_firsts = first[t0:t1]
        tok_lasts = last[t0:t1]
        ok = (tok_firsts >= 0).all()
        entry = {"word": word, "alignedWord": word.lower(),
                 "case": "success" if ok else "not-found-in-audio"}
        if ok:
            entry["start"] = float(tok_firsts.min() * frame_seconds)
            entry["end"] = float((tok_lasts.max() + 1) * frame_seconds)
            entry["phones"] = [
                {"phone": CTC_CHARS[tokens[ti]].lower(),
                 "duration": float((last[ti] - first[ti] + 1) * frame_seconds)}
                for ti in range(t0, t1)]
        out.append(entry)
    return out


def align_ctc(log_probs: np.ndarray, transcript: str,
              frame_seconds: float) -> Dict:
    """Align a transcript against CTC char log-probs -> gentle-style dict."""
    tokens, word_spans = text_to_tokens(transcript)
    words = [w for w in re.split(r"\s+", clean(transcript).upper().strip()) if w]
    if not tokens:
        return {"transcript": transcript, "words": []}
    try:
        labels, score = ctc_forced_align(log_probs, tokens)
    except ValueError as e:
        logging.warning("alignment failed: %s", e)
        return {"transcript": transcript,
                "words": [{"word": w, "case": "not-found-in-audio"}
                          for w in words]}
    entries = word_timings(labels, tokens, word_spans, frame_seconds, words)
    return {"transcript": transcript, "words": entries,
            "log_likelihood": score}


def make_ctc_logits_fn(checkpoint_path: Optional[str] = None,
                       variables: Optional[Dict] = None,
                       bucket_seconds: Sequence[float] = (2.0, 4.0, 8.0, 16.0),
                       sample_rate: int = 16000,
                       cfg=None) -> Callable:
    """Build a real `ctc_logits_fn` from a wav2vec2 CTC checkpoint.

    The aligner's acoustic model is wav2vec2-base with the 28-token char aux
    head — CTC_CHARS is exactly the fairseq/torchaudio char vocabulary — so
    any fine-tuned wav2vec2 ASR checkpoint works: fairseq naming
    (convert.py::convert_wav2vec2_fairseq) and torchaudio naming
    (convert_wav2vec2_torchaudio) are both dispatched by key probe.
    `variables` short-circuits loading (e.g. a tree already imported through
    models/convert.py).

    Wav lengths are padded to `bucket_seconds` buckets so XLA compiles one
    program per bucket, with attention masked past the true length; the
    returned (T, 28) log-probs are sliced to the true frame count
    (frame_seconds = 320 / sample_rate, wav2vec2's conv downsampling).
    """
    import jax
    import jax.numpy as jnp

    from peppa_tpu.data import decode as D
    from peppa_tpu.models.wav2vec2 import Wav2Vec2, Wav2Vec2Config

    model = Wav2Vec2(cfg if cfg is not None else Wav2Vec2Config())
    if variables is None:
        if checkpoint_path is None:
            raise ValueError("pass checkpoint_path or variables")
        from peppa_tpu.models import convert as C

        state = C.load_torch_checkpoint(checkpoint_path)
        for wrapper in ("model", "state_dict"):  # fairseq / Lightning blobs
            if isinstance(state, dict) and wrapper in state:
                state = state[wrapper]
                break
        if any(k.startswith("encoder.transformer.") for k in state):
            trunk = C.convert_wav2vec2_torchaudio(state)
        else:
            trunk = C.convert_wav2vec2_fairseq(state)
        if "aux" not in trunk:
            logging.warning(
                "%s has no 28-d aux head (a pretraining-only checkpoint?) — "
                "the char head stays randomly initialized and alignments "
                "will be poor; use a CTC fine-tuned ASR checkpoint",
                checkpoint_path)
        dummy = jnp.zeros((1, int(bucket_seconds[0] * sample_rate)),
                          jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy)
        params = dict(variables["params"])
        unknown = set(trunk) - set(params)
        if unknown:
            raise ValueError(f"converted tree has unknown modules {unknown}")
        params.update(trunk)
        variables = {"params": params}

    @jax.jit
    def fwd(wave, n):
        logits, frames = model.apply(
            variables, wave[None], sample_lengths=jnp.asarray([n]),
            deterministic=True, tap="logits", mask_padding=True)
        return (jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1),
                frames[0])

    def fn(path: str) -> np.ndarray:
        samples = D.decode_audio(path, 0.0, bucket_seconds[-1], sample_rate)
        n = len(samples)
        size = int(round(bucket_seconds[-1] * sample_rate))
        for b in bucket_seconds:
            if n <= int(round(b * sample_rate)):
                size = int(round(b * sample_rate))
                break
        wave = np.zeros((size,), np.float32)
        wave[:min(n, size)] = samples[:size]
        log_probs, frames = fwd(jnp.asarray(wave), min(n, size))
        return np.asarray(log_probs)[:int(frames)]

    return fn


def have_gentle() -> bool:
    try:
        import gentle  # noqa: F401

        return True
    except Exception:
        return False


def align(audiopath: str, transcript: str,
          ctc_logits_fn: Optional[Callable] = None,
          frame_seconds: float = 320.0 / 16000.0) -> Dict:
    """Align one audio file; gentle backend when available, else CTC.

    Parity: reference pig/forced_align.py:17-24.  `ctc_logits_fn` maps an
    audio path to (T, 28) log-probs (e.g. a jit'd wav2vec2-CTC forward).
    """
    if have_gentle():
        import gentle

        resources = gentle.Resources()
        with gentle.resampled(audiopath) as wavfile:
            aligner = gentle.ForcedAligner(resources, transcript,
                                           disfluency=False,
                                           conservative=False)
            return json.loads(aligner.transcribe(wavfile).to_json())
    if ctc_logits_fn is None:
        raise RuntimeError("no alignment backend: install gentle or pass "
                           "ctc_logits_fn (a wav2vec2-CTC forward)")
    return align_ctc(np.asarray(ctc_logits_fn(audiopath)), transcript,
                     frame_seconds)


def realign(fragment_type: str = "dialog", data_dir: str = "data",
            ctc_logits_fn: Optional[Callable] = None,
            splits: Sequence[str] = ("val",),
            nthreads: Optional[int] = None) -> None:
    """Re-align every subtitle line of the split's episodes.

    Parity: reference pig/forced_align.py:30-67 — reads the episode
    annotations, cuts each subtitle's audio (with 0.5 s margins), aligns, and
    writes data/out/realign/{fragment}/ep_{N}/{part}/{sub}.json with speaker
    and clip metadata.

    `nthreads` (default: cpu count, reference forced_align.py:8) runs the
    per-utterance pipeline — audio cut (ffmpeg subprocess), CTC forward,
    native Viterbi DP — in a thread pool; the subprocess and the C++ DP both
    release the GIL, and jitted JAX forwards are thread-safe, so utterances
    overlap across cores.  Each utterance writes its own wav/json, so order
    is irrelevant.
    """
    import pandas as pd

    from peppa_tpu.data import decode as D
    from peppa_tpu.data.dataset import SPLIT_SPEC

    names = dict(narration="narration", dialog="context")
    listing = pd.read_csv(
        os.path.join(data_dir, "in", "peppa_pig_dataset-video_list.csv"),
        sep=";", quotechar="'", names=["id", "title", "path"], index_col=0)
    titles = dict(zip(listing["title"],
                      listing["path"].map(
                          lambda x: os.path.join(data_dir, "in", "peppa",
                                                 x[4:]))))
    for split in splits:
        episodes = SPLIT_SPEC[fragment_type][split]
        if episodes is None:
            continue
        for epid in episodes:
            ann_path = os.path.join(data_dir, "in", "peppa", "episodes",
                                    f"ep_{epid}.json")
            if fragment_type == "dialog":
                speaker_path = os.path.join(data_dir, "out", "speaker_id",
                                            f"ep_{epid}.yaml")
                if os.path.exists(speaker_path):
                    import yaml

                    with open(speaker_path) as f:
                        annotation = yaml.safe_load(f)
                    ann_path = speaker_path
                elif os.path.exists(ann_path):
                    with open(ann_path) as f:
                        annotation = json.load(f)
                else:
                    continue
            else:
                if not os.path.exists(ann_path):
                    continue
                with open(ann_path) as f:
                    annotation = json.load(f)
            episode_file = titles.get(annotation["title"])
            if episode_file is None or not os.path.exists(episode_file):
                logging.warning("missing episode media for %s",
                                annotation["title"])
                continue
            def one_utterance(i: int, j: int, sub: Dict, episode_file: str,
                              ann_path: str, title: str, epid: int) -> None:
                transcript = clean(sub["text"])
                if not transcript:
                    return
                start = max(pd.Timedelta(sub["begin"]).total_seconds()
                            - 0.5, 0.0)
                end = pd.Timedelta(sub["end"]).total_seconds() + 0.5
                outdir = os.path.join(data_dir, "out", "realign",
                                      fragment_type, f"ep_{epid}", str(i))
                os.makedirs(outdir, exist_ok=True)
                wav = os.path.join(outdir, f"{j}.wav")
                _write_wav(wav, D.decode_audio(episode_file, start, end,
                                               16000), 16000)
                result = align(wav, transcript, ctc_logits_fn=ctc_logits_fn)
                result["speaker"] = (sub.get("speaker")
                                     if fragment_type == "dialog"
                                     else "Narrator")
                result["episode_filepath"] = episode_file
                result["episode_metadata_path"] = ann_path
                result["episode_title"] = title
                result["clipStart"] = start
                result["clipEnd"] = end
                result["partIndex"] = i
                result["clipIndex"] = j
                with open(os.path.join(outdir, f"{j}.json"), "w") as f:
                    json.dump(result, f, indent=2)

            jobs = [(i, j, sub, episode_file, ann_path, annotation["title"],
                     epid)
                    for i, part in enumerate(annotation["narrator_splits"])
                    for j, sub in enumerate(
                        part[names[fragment_type]].get("subtitles", []))]
            n = nthreads if nthreads is not None else (os.cpu_count() or 1)
            if n <= 1 or len(jobs) <= 1:
                for job in jobs:
                    one_utterance(*job)
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=n) as pool:
                    # list() re-raises the first worker exception, matching
                    # the serial path's fail-fast behavior
                    list(pool.map(lambda job: one_utterance(*job), jobs))


def _write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
