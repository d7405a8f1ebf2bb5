"""Test/benchmark model targets with exactly characterized distributions.

The reference's statistical acceptance tests draw ground truth from
LogDensityTestSuite (exactly characterized targets built by transforming a
standard normal; /root/reference/test/utilities.jl:63-67). This module provides
the TPU-native equivalent: each model is a ``LogDensity`` plus, where the
distribution is exactly characterized, an exact i.i.d. sampler used by the
Anderson-Darling two-sample gates.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

from ..logdensity import LogDensity


@dataclasses.dataclass(frozen=True)
class TestModel(LogDensity):
    """A LogDensity with an optional exact sampler ``sample(key, n) -> (n, dim)``
    and optional known moments."""

    sample_fn: Optional[Callable] = None
    mean_fn: Optional[Callable] = None  # () -> (dim,)
    cov_fn: Optional[Callable] = None  # () -> (dim, dim)
    # Additive constant c such that logdensity_fn(q) + c is a NORMALIZED log
    # pdf. Required by mixture(): mixing unnormalized components with unequal
    # constants silently reweights the mixture.
    log_normalization: Optional[float] = None

    def sample(self, key, n: int):
        if self.sample_fn is None:
            raise NotImplementedError("no exact sampler for this model")
        return self.sample_fn(key, n)

    @property
    def has_exact_sampler(self) -> bool:
        return self.sample_fn is not None
