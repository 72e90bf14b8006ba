from .maxsim import (
    colbert_score,
    colbert_score_reduce,
    in_batch_maxsim_scores,
    segmented_maxsim,
    padded_maxsim,
    MASK_FILL_VALUE,
)
from .topk import top_k_scores

__all__ = [
    "colbert_score",
    "colbert_score_reduce",
    "in_batch_maxsim_scores",
    "segmented_maxsim",
    "padded_maxsim",
    "top_k_scores",
    "MASK_FILL_VALUE",
]
