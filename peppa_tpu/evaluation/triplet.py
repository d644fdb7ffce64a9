"""Duration-matched triplet scoring.

Capability parity: reference pig/triplet.py.  Clips are grouped by *exact*
duration; within each group they are shuffled and paired, and for each pair a
target/distractor assignment is drawn — the model must rank the target video
above the duration-matched distractor for the anchor audio
(reference pig/triplet.py:99-121).

TPU-first: the reference loops `n_samples` rounds of host-side sampling with a
device call each (pig/triplet.py:82-96); here all rounds' index arrays are
sampled on the host at once (cheap integers) and a single jit'd gather+cosine
program scores every round in one go.  The number of pairs per round is
invariant (sum of floor(group/2)), so the stacked index tensor is rectangular
and the program compiles once.

Note: reference score_triplets has a NameError at HEAD (pig/triplet.py:93
`success.append(success)`); we implement the documented intent (accuracy per
round + durations), as the comparative variant does.
"""

from __future__ import annotations

import random
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from peppa_tpu.ops.metrics import triplet_accuracy


def _triplets(indices: Sequence[int], durations: Sequence[float],
              rng: random.Random) -> List[Tuple[int, int]]:
    """One round of duration-matched (target, distractor) pairs.

    Parity: reference pig/triplet.py:99-121 (_triplets / pairs / shuffled).
    """
    groups: Dict[float, List[int]] = defaultdict(list)
    for i in indices:
        groups[float(durations[i])].append(i)
    out = []
    for dur in sorted(groups):
        items = list(groups[dur])
        rng.shuffle(items)
        for j in range(0, len(items) - 1, 2):
            pair = items[j:j + 2]
            target, distractor = rng.sample(pair, 2)
            out.append((target, distractor))
    return out


@jax.jit
def _score_rounds(video: jnp.ndarray, audio: jnp.ndarray,
                  pos_idx: jnp.ndarray, neg_idx: jnp.ndarray) -> jnp.ndarray:
    """(rounds, P) indices -> per-round mean triplet accuracy."""
    anchor = audio[pos_idx]  # (R, P, D)
    pos = video[pos_idx]
    neg = video[neg_idx]
    acc = triplet_accuracy(anchor, pos, neg, axis=2)
    return jnp.mean(acc, axis=1)


def score_triplets(video: np.ndarray, audio: np.ndarray, duration: np.ndarray,
                   n_samples: int = 100, seed: Optional[int] = None
                   ) -> Dict[str, np.ndarray]:
    """Resampled duration-matched triplet accuracy over precomputed embeddings.

    Returns {'accuracy': (n_samples,), 'duration': (n_samples * P,)} —
    the intent of reference pig/triplet.py:82-96.
    """
    rng = random.Random(seed)
    durations = np.asarray(duration, np.float64)
    idx = list(range(len(durations)))
    pos_rounds, neg_rounds, dur_rounds = [], [], []
    for _ in range(n_samples):
        pairs = _triplets(idx, durations, rng)
        if not pairs:
            raise ValueError("No duration-matched pairs could be formed")
        p, n = zip(*pairs)
        pos_rounds.append(p)
        neg_rounds.append(n)
        dur_rounds.append(durations[list(p)])
    pos_idx = jnp.asarray(np.asarray(pos_rounds, np.int32))
    neg_idx = jnp.asarray(np.asarray(neg_rounds, np.int32))
    acc = _score_rounds(jnp.asarray(video), jnp.asarray(audio), pos_idx, neg_idx)
    return {"accuracy": np.asarray(acc),
            "duration": np.concatenate(dur_rounds)}


def comparative_score_triplets(video_set: Sequence[np.ndarray],
                               audio_set: Sequence[np.ndarray],
                               duration: np.ndarray,
                               n_samples: int = 100,
                               seed: Optional[int] = None) -> Dict[str, list]:
    """Same triplet samples applied to several models' embeddings.

    Parity: reference pig/triplet.py:63-79 — returns continuous success
    diffs per model over identical samples (paired comparison).
    """
    rng = random.Random(seed)
    durations = np.asarray(duration, np.float64)
    idx = list(range(len(durations)))
    pos_rounds, neg_rounds, dur_rounds = [], [], []
    for _ in range(n_samples):
        pairs = _triplets(idx, durations, rng)
        p, n = zip(*pairs)
        pos_rounds.append(p)
        neg_rounds.append(n)
        dur_rounds.append(durations[list(p)])
    pos_idx = jnp.asarray(np.asarray(pos_rounds, np.int32))
    neg_idx = jnp.asarray(np.asarray(neg_rounds, np.int32))

    @jax.jit
    def diffs(video, audio):
        anchor = audio[pos_idx]
        return triplet_accuracy(anchor, video[pos_idx], video[neg_idx],
                                axis=2, discrete=False)

    success = [np.asarray(diffs(jnp.asarray(v), jnp.asarray(a))).reshape(-1)
               for v, a in zip(video_set, audio_set)]
    return {"success": success, "duration": np.concatenate(dur_rounds)}


class TripletScorer:
    """Encode a duration=None (subtitle-line) dataset and score triplets.

    Parity: reference pig/triplet.py:31-61.
    """

    def __init__(self, fragment_type: str, split: Sequence[str] = ("val",),
                 target_size: Tuple[int, int] = (180, 100),
                 audio_sample_rate: int = 44100, scrambled_video: bool = False,
                 data_dir: str = "data"):
        from peppa_tpu.data.dataset import PeppaPigDataset

        self.dataset = PeppaPigDataset(
            target_size=target_size,
            split=list(split),
            fragment_type=fragment_type,
            duration=None,
            audio_sample_rate=audio_sample_rate,
            scrambled_video=scrambled_video,
            data_dir=data_dir,
        )

    def _encode(self, predict_fn, batch_size: int) -> None:
        from peppa_tpu.data.dataset import grouped_batches

        audio, video, duration = [], [], []
        for batch in grouped_batches(self.dataset,
                                     key=lambda x: x.audio_duration,
                                     batch_size=batch_size):
            out = predict_fn(batch)
            video.append(np.asarray(out.video))
            audio.append(np.asarray(out.audio))
            duration.append(np.asarray(batch.audio_duration))
        self._video = np.concatenate(video)
        self._audio = np.concatenate(audio)
        self._duration = np.concatenate(duration)

    def _score(self, n_samples: int = 100, seed: Optional[int] = None):
        return score_triplets(self._video, self._audio, self._duration,
                              n_samples=n_samples, seed=seed)

    def evaluate(self, predict_fn, batch_size: int, n_samples: int = 100,
                 seed: Optional[int] = None):
        self._encode(predict_fn, batch_size)
        return self._score(n_samples=n_samples, seed=seed)
