"""On-device metric/compute kernels (distance, ranking, accuracy, re-ranking).

Plays the role of the reference's ``torchreid/metrics`` namespace package —
with a real ``__init__`` (the reference had none; SURVEY §2.6).
"""

from .accuracy import accuracy
from .distance import (
    compute_distance_matrix,
    cosine_distance,
    euclidean_squared_distance,
)
from .ranking import eval_regdb, evaluate_rank

__all__ = [
    "accuracy",
    "compute_distance_matrix",
    "cosine_distance",
    "euclidean_squared_distance",
    "eval_regdb",
    "evaluate_rank",
]
