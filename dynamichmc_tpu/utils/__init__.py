from .pytree import pytree_dataclass, tree_where, tree_index, tree_update_index
from .welford import (
    WelfordState,
    welford_init,
    welford_update,
    welford_variance,
    welford_covariance,
)

__all__ = [
    "pytree_dataclass",
    "tree_where",
    "tree_index",
    "tree_update_index",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_variance",
    "welford_covariance",
]
