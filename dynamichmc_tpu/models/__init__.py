from .base import TestModel
from .gaussian import (
    correlated_gaussian,
    extreme_variance_gaussian,
    ill_conditioned_gaussian,
    mvnormal,
    std_normal,
)
from .funnel import funnel
from .mixture import mixture
from .transforms import elongate
from .logreg import logistic_regression

__all__ = [
    "TestModel",
    "extreme_variance_gaussian",
    "std_normal",
    "mvnormal",
    "correlated_gaussian",
    "ill_conditioned_gaussian",
    "funnel",
    "mixture",
    "elongate",
    "logistic_regression",
]
