"""Bayesian logistic regression posterior (BASELINE config 3).

The log density is data-parallel over observations: one (n_obs, dim) matvec
per evaluation, which XLA maps onto the MXU and fuses with the leapfrog
elementwise updates — the gradient comes from ``jax.value_and_grad`` through
the same matmul (the reference's AD-user-side contract, SURVEY.md L0).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import TestModel


def logistic_regression(
    n_obs: int = 1000,
    dim: int = 25,
    seed: int = 0,
    prior_scale: float = 10.0,
    dtype=jnp.float64,
    fused=False,
    tree_kernel=False,
) -> TestModel:
    """Synthetic logistic regression: X ~ N(0, I), true beta ~ N(0, 1),
    y ~ Bernoulli(sigmoid(X beta)); weakly-informative normal prior.

    ``fused=True`` attaches the Pallas fused-leaf hook
    (ops/pallas_logreg.py): the batch drivers then run the whole leaf —
    leapfrog + both likelihood matmuls + joint energy — as one kernel with
    X resident in VMEM. ``fused=False`` keeps the reference's AD-user-side
    contract (gradient via jax.value_and_grad through the matmul).
    ``fused="auto"`` attaches the kernel only where it is measured to win:
    MXU-lane-filling dims (kp/dim <= ops.pallas_logreg.FUSED_MAX_PAD_RATIO;
    at dim 25 the 5.1x lane padding made it 0.87x vs XLA AD), a
    VMEM-resident design matrix, and the TPU backend at trace time.

    ``tree_kernel`` (False | True | "auto") attaches the whole-transition
    Pallas kernel (ops/pallas_tree.py) instead: the entire NUTS transition
    VMEM-resident INCLUDING X — it supersedes the fused leaf when both are
    set ("auto" applies the same lane-padding regime gate)."""
    rng = np.random.RandomState(seed)
    x_np = rng.randn(n_obs, dim)
    beta_true = rng.randn(dim)
    probs = 1 / (1 + np.exp(-(x_np @ beta_true)))
    y_np = (rng.uniform(size=n_obs) < probs).astype(np.float64)

    x = jnp.asarray(x_np, dtype)
    y = jnp.asarray(y_np, dtype)

    fused_leaf_batched_fn = None
    auto = fused == "auto"
    if auto:
        from ..ops.pallas_logreg import fused_leaf_pays

        fused = fused_leaf_pays(n_obs, dim)
    if fused:
        from ..ops.pallas_logreg import make_logreg_fused_leaf_batched

        fused_leaf_batched_fn = make_logreg_fused_leaf_batched(
            x_np, y_np, prior_scale=prior_scale, tpu_only=auto
        )

    tree_transition_fn = None
    if tree_kernel == "auto":
        from ..ops.pallas_logreg import fused_leaf_pays

        tree_kernel = fused_leaf_pays(n_obs, dim)
    if tree_kernel:
        from ..ops.pallas_tree import make_logreg_tree_transition

        tree_transition_fn = make_logreg_tree_transition(
            x_np, y_np, prior_scale=prior_scale
        )

    def logdensity_fn(beta):
        logits = x.astype(beta.dtype) @ beta
        # sum of y*logits - log(1 + e^logits), numerically stable
        loglik = jnp.sum(y.astype(beta.dtype) * logits) - jnp.sum(
            jnp.logaddexp(0.0, logits)
        )
        log_prior = -0.5 * jnp.sum((beta / prior_scale) ** 2)
        return loglik + log_prior

    return TestModel(
        dim=dim,
        logdensity_fn=logdensity_fn,
        fused_leaf_batched_fn=fused_leaf_batched_fn,
        tree_transition_fn=tree_transition_fn,
    )
