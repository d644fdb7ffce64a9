"""Channel-normalization stat resolution for the video branches.

Capability parity: reference pig/models.py:327-342 (build_transform): the
video encoder normalizes with 'kinetics' stats when pretrained, 'peppa' stats
(computed from the training data, pig/data.py:318-342) otherwise; the static
image encoder uses 'imagenet' stats when pretrained.  Instead of a transform
module the stats are folded into the encoder's first op (one fused
subtract/multiply, bandwidth-free after XLA fusion).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

# Fallbacks when no stats file has been computed/shipped.
KINETICS_MEAN = (0.43216, 0.394666, 0.37645)
KINETICS_STD = (0.22803, 0.22145, 0.216989)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# Peppa training-set stats (reference data/out/stats.pt, cf. SURVEY.md §2.2)
PEPPA_MEAN = (0.6275, 0.6627, 0.6687)
PEPPA_STD = (0.2417, 0.2088, 0.2749)


def _load_stats_file(path: str):
    """Read a stats file: ours (.npz) or the reference's torch-saved Stats."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return tuple(z["video_mean"].tolist()), tuple(z["video_std"].tolist())
    # reference data/out/stats.pt: torch.save'd pig.data.Stats dataclass
    import torch  # CPU torch, used purely as an IO library

    stats = torch.load(path, map_location="cpu", weights_only=False)
    return (tuple(np.asarray(stats.video_mean).reshape(-1).tolist()),
            tuple(np.asarray(stats.video_std).reshape(-1).tolist()))


def resolve_stats(normalization: str, data_dir: str = "data"
                  ) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Return (mean, std) for 'peppa' | 'kinetics' | 'imagenet'."""
    if normalization == "imagenet":
        return IMAGENET_MEAN, IMAGENET_STD
    if normalization == "kinetics":
        for name in ("kinetics-stats.npz", "kinetics-stats.pt"):
            path = os.path.join(data_dir, "out", name)
            if os.path.exists(path):
                try:
                    return _load_stats_file(path)
                except Exception:
                    pass
        return KINETICS_MEAN, KINETICS_STD
    if normalization == "peppa":
        for name in ("stats.npz", "stats.pt"):
            path = os.path.join(data_dir, "out", name)
            if os.path.exists(path):
                try:
                    return _load_stats_file(path)
                except Exception:
                    pass
        return PEPPA_MEAN, PEPPA_STD
    raise ValueError(f"Unsupported normalization type {normalization}")
