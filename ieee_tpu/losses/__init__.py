"""Loss functions — pure jnp, jit-compatible, static shapes.

Reference analog: ``torchreid/losses`` (``losses/__init__.py:3-9``). Dynamic
constructs in the reference (per-anchor Python loops in the triplet loss,
``chunk(label_num)`` in the 3M/hetero losses) are re-expressed as masked
fixed-shape computations so the whole train step compiles to one XLA program.
"""

from .cross_entropy import CrossEntropyLoss, cross_entropy_loss
from .triplet import TripletLoss, hard_mine_triplet_loss
from .margin import MultiModalMarginLoss, multi_modal_margin_loss
from .hetero import HeteroLoss, hetero_loss
from .time import TimeLoss, time_loss

__all__ = [
    "TimeLoss",
    "time_loss",
    "CrossEntropyLoss",
    "cross_entropy_loss",
    "TripletLoss",
    "hard_mine_triplet_loss",
    "MultiModalMarginLoss",
    "multi_modal_margin_loss",
    "HeteroLoss",
    "hetero_loss",
    "DeepSupervision",
]


def DeepSupervision(criterion, xs, y):
    """Sum a criterion over a list of outputs (per-part logits).

    Reference: ``losses/__init__.py:9-44``.
    """
    loss = 0.0
    for x in xs:
        loss = loss + criterion(x, y)
    return loss
