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
from .hierarchical import (
    eight_schools_centered,
    eight_schools_noncentered,
    rosenbrock,
)

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
    "eight_schools_noncentered",
    "eight_schools_centered",
    "rosenbrock",
]
