"""The 4-loader validation protocol producing the checkpoint-monitor metrics.

Capability parity: reference pig/models.py:267-318 (validation_step +
validation_epoch_end):
- loaders 0/1 (val dialog / narration, fixed duration): encode, loss, then
  bootstrap recall@10 over 500 subsets of 100 -> val_rec_fixed /
  valnarr_rec_fixed;
- loaders 2/3 (subtitle-line sets, duration-grouped): encode with durations,
  then duration-matched triplet accuracy over 500 rounds -> val_triplet /
  valnarr_triplet.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Iterable, List, Optional

import jax
import numpy as np

from peppa_tpu.evaluation.triplet import score_triplets
from peppa_tpu.ops.metrics import resampled_recall


def encode_loader(eval_step: Callable, variables, loader: Iterable,
                  shard_fn: Optional[Callable] = None,
                  limit_batches: Optional[int] = None,
                  collect_duration: bool = False,
                  collect_loss: bool = False):
    """Run the jit'd eval step over a loader, collecting embeddings on host.

    The host input chain (decode/collate/device transfer) runs on a prefetch
    thread (utils/prefetch.py) so it overlaps the device-side encodes — the
    same mechanism that doubled the training loop's throughput (PERF.md).
    """
    import itertools

    from peppa_tpu.utils.prefetch import Prefetcher

    vs, as_, durs, losses = [], [], [], []
    stream = (loader if limit_batches is None
              else itertools.islice(iter(loader), limit_batches))
    prefetcher = Prefetcher(stream, shard_fn or (lambda b: b), depth=2)
    try:
        for batch in prefetcher:
            v, a, loss = eval_step(variables, batch)
            vs.append(np.asarray(v))
            as_.append(np.asarray(a))
            if collect_duration:
                durs.append(np.asarray(batch.audio_duration))
            if collect_loss:
                losses.append(float(loss))
    finally:
        # abandoning the iteration (eval_step raised) must not leave the
        # worker thread spinning on its full-queue put retries forever
        prefetcher.close()
    out = {
        "video": np.concatenate(vs) if vs else np.zeros((0, 512), np.float32),
        "audio": np.concatenate(as_) if as_ else np.zeros((0, 512), np.float32),
    }
    if collect_duration:
        out["duration"] = np.concatenate(durs) if durs else np.zeros((0,))
    if collect_loss:
        out["loss"] = float(np.mean(losses)) if losses else float("nan")
    return out


def run_validation(eval_step: Callable, variables, val_loaders: List[Iterable],
                   shard_fn: Optional[Callable] = None,
                   n_samples: int = 500, size: int = 100,
                   limit_batches: Optional[int] = None,
                   seed: int = 0) -> Dict[str, float]:
    """Compute the four monitor metrics (reference pig/models.py:291-318)."""
    dia, narr, dia3, narr3 = val_loaders
    metrics: Dict[str, float] = {}
    key = jax.random.PRNGKey(seed)

    for name, loader in (("val", dia), ("valnarr", narr)):
        enc = encode_loader(eval_step, variables, loader, shard_fn,
                            limit_batches, collect_loss=True)
        metrics[f"{name}_loss"] = enc["loss"]
        n = len(enc["video"])
        eff_size = min(size, n)
        if n == 0:
            continue
        if eff_size < size:
            # the reference's val_rec_fixed is recall@10 over resampled sets
            # of EXACTLY `size`=100 (pig/models.py:297); with a smaller val
            # set the number under the same name has a different chance level
            # (10/eff_size) — say so rather than silently changing meaning
            logging.warning(
                "%s_rec_fixed: only %d val clips (<%d); metric is "
                "recall@10-of-%d (chance %.2f), not the reference's "
                "recall@10-of-%d", name, n, size, eff_size,
                min(10 / eff_size, 1.0), size)
        rec = resampled_recall(enc["video"], enc["audio"], key,
                               size=eff_size, n_samples=n_samples, n=10)
        metrics[f"{name}_rec_fixed"] = float(np.mean(np.asarray(rec)))

    for name, loader in (("val_triplet", dia3), ("valnarr_triplet", narr3)):
        enc = encode_loader(eval_step, variables, loader, shard_fn,
                            limit_batches, collect_duration=True)
        if len(enc["video"]) < 2:
            continue
        try:
            tri = score_triplets(enc["video"], enc["audio"], enc["duration"],
                                 n_samples=n_samples, seed=seed)
            metrics[name] = float(np.mean(tri["accuracy"]))
        except ValueError as e:
            logging.warning("Triplet scoring failed: %s", e)
    return metrics
