from .pallas_leapfrog import make_gaussian_fused_leapfrog
from .pallas_logreg import make_logreg_fused_leaf_batched

__all__ = [
    "make_gaussian_fused_leapfrog",
    "make_logreg_fused_leaf_batched",
]
