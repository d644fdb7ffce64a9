from peppa_tpu.ops.similarity import l2_normalize, cosine_matrix, cosine_similarity
from peppa_tpu.ops.loss import contrastive, triplet_loss, milnce_loss
from peppa_tpu.ops.metrics import (
    recall_at_n,
    recall_at_1_to_n,
    triplet_accuracy,
    resampled_recall,
    resampled_recall_at_1_to_n,
)

__all__ = [
    "l2_normalize",
    "cosine_matrix",
    "cosine_similarity",
    "contrastive",
    "triplet_loss",
    "milnce_loss",
    "recall_at_n",
    "recall_at_1_to_n",
    "triplet_accuracy",
    "resampled_recall",
    "resampled_recall_at_1_to_n",
]
