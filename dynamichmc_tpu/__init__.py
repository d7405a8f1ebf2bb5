"""dynamichmc_tpu: a TPU-native No-U-Turn Sampler framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
tpapp/DynamicHMC.jl (reference studied at /root/reference): given a
log density ``q -> log p(q)``, draw samples from ``p`` with dynamic
Hamiltonian Monte Carlo (NUTS), including staged warmup (initial stepsize
search, dual-averaging stepsize adaptation, diagonal/dense metric tuning),
full per-transition diagnostics, and first-class batched/sharded chains:
``vmap`` over thousands of chains on one chip, ``shard_map`` over a TPU mesh.

Layer map (bottom-up, mirroring the reference's architecture, SURVEY.md §1):

  L0  logdensity   — the model contract (gradient oracle)
  L1  metric, hamiltonian — kinetic energy, phase points, leapfrog
  L2  tree         — sampler-agnostic iterative trajectory-tree algebra
  L3  nuts         — NUTS transition (generalized U-turn, multinomial)
  L4  stepsize, warmup — adaptation stages
  L5  mcmc         — user API
  L6  diagnostics  — post-hoc analysis
      parallel     — vmapped / mesh-sharded chains (TPU-native addition)
"""

from .errors import DynamicHMCError
from .logdensity import LogDensity, from_logdensity_fn
from .metric import (
    DenseMetric,
    DiagonalMetric,
    dense_metric,
    diagonal_metric,
    identity_metric,
)
from .hamiltonian import EvaluatedPoint, PhasePoint, evaluate, evaluate_strict
from .nuts import NUTS, TreeStatistics, sample_tree
from .stepsize import (
    DualAveraging,
    FixedStepsize,
    InitialStepsizeSearch,
    PooledStepsize,
)
from .warmup import (
    TuningNUTS,
    WarmupState,
    default_warmup_stages,
    fixed_stepsize_warmup_stages,
    initialize_warmup_state,
)
from .diagnostics import EBFMI, straggler_waste, summarize_tree_statistics
from .reporting import (
    LogProgressReport,
    NoProgressReport,
    TqdmProgressReport,
    default_reporter,
)
from .engine import WarmupCheckpoint
from .stats import ess_rhat
from .stats_device import ess_rhat_device
from .mcmc import (
    InferenceResult,
    MCMCResult,
    StepwiseChunk,
    mcmc,
    mcmc_keep_warmup,
    mcmc_steps,
    mcmc_steps_from_state,
    mcmc_with_warmup,
    pool_posterior_matrices,
    stack_posterior_matrices,
)

__version__ = "0.1.0"

__all__ = [
    "DynamicHMCError",
    "LogDensity",
    "from_logdensity_fn",
    "DiagonalMetric",
    "DenseMetric",
    "diagonal_metric",
    "dense_metric",
    "identity_metric",
    "EvaluatedPoint",
    "PhasePoint",
    "evaluate",
    "evaluate_strict",
    "NUTS",
    "TreeStatistics",
    "sample_tree",
    "DualAveraging",
    "FixedStepsize",
    "PooledStepsize",
    "InitialStepsizeSearch",
    "TuningNUTS",
    "WarmupCheckpoint",
    "WarmupState",
    "default_warmup_stages",
    "fixed_stepsize_warmup_stages",
    "initialize_warmup_state",
    "InferenceResult",
    "MCMCResult",
    "mcmc",
    "mcmc_keep_warmup",
    "StepwiseChunk",
    "mcmc_steps",
    "mcmc_steps_from_state",
    "mcmc_with_warmup",
    "pool_posterior_matrices",
    "stack_posterior_matrices",
    "EBFMI",
    "straggler_waste",
    "summarize_tree_statistics",
    "ess_rhat",
    "NoProgressReport",
    "LogProgressReport",
    "TqdmProgressReport",
    "default_reporter",
    "__version__",
]
