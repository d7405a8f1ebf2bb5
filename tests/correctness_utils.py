"""Statistical acceptance-gate protocol for sampler correctness.

Port of /root/reference/test/sample-correctness_utilities.jl:65-127: run K
independently-warmed chains, then gate on

- split rank-normalized R-hat        (alert > 1.01, fail > 1.02)
- ESS per draw tau = ESS / draws     (alert < 1.0, fail < 0.5)
  NOTE: ``draws`` here is the TOTAL pooled draw count (n_chains * n_samples).
  The reference divides total ESS by draws PER CHAIN
  (sample-correctness_utilities.jl:40-43), so at the default 5 chains this
  protocol's tau gate is 5x STRICTER than the reference's at equal
  thresholds; workloads that need exactly reference-strength gating pass
  thresholds scaled by 1/n_chains.
- per-coordinate two-sample Anderson-Darling p vs exact i.i.d. samples,
  Bonferroni-corrected by dimension   (alert < 0.1, fail < 0.01)
- EBFMI per chain                     (alert < 0.5, fail < 0.25)

Alerts print; failures assert. Thresholds are per-workload-overridable exactly
like the reference (relaxed for funnel / heavy tails).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from scipy.stats import anderson_ksamp

from dynamichmc_tpu.diagnostics import EBFMI
from dynamichmc_tpu.parallel import run_chains
from dynamichmc_tpu.stats import ess_rhat


@dataclasses.dataclass
class Thresholds:
    rhat_alert: float = 1.01
    rhat_fail: float = 1.02
    tau_alert: float = 1.0
    tau_fail: float = 0.5
    ad_alert: float = 0.1
    ad_fail: float = 0.01
    ebfmi_alert: float = 0.5
    ebfmi_fail: float = 0.25


def run_and_check(
    model,
    key,
    label: str,
    n_chains: int = 5,
    n_samples: int = 2000,
    warmup_stages=None,
    thresholds: Thresholds = Thresholds(),
    dtype=None,
    check_ad: bool = True,
    **run_kwargs,
):
    """Extra ``run_kwargs`` pass through to :func:`run_chains` verbatim
    (e.g. ``algorithm=NUTS(max_depth=4)``, ``warmup_depth_clamp=2``) so
    non-default kernel configurations face the same acceptance gates."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float64
    res = run_chains(
        key,
        model,
        n_chains=n_chains,
        n_samples=n_samples,
        warmup_stages=warmup_stages,
        dtype=dtype,
        **run_kwargs,
    )
    positions = np.asarray(res.positions, np.float64)  # (C, N, K)
    c, n, k = positions.shape
    t = thresholds

    stats = ess_rhat(positions)
    rhat_max = stats["rhat"].max()
    tau_min = stats["ess_bulk"].min() / (c * n)
    assert rhat_max <= t.rhat_fail, f"{label}: R-hat {rhat_max:.4f} > {t.rhat_fail}"
    if rhat_max > t.rhat_alert:
        print(f"[alert] {label}: R-hat {rhat_max:.4f} > {t.rhat_alert}")
    assert tau_min >= t.tau_fail, f"{label}: tau {tau_min:.3f} < {t.tau_fail}"
    if tau_min < t.tau_alert:
        print(f"[alert] {label}: tau {tau_min:.3f} < {t.tau_alert}")

    ebfmi = np.asarray(EBFMI(res.tree_statistics))
    assert ebfmi.min() >= t.ebfmi_fail, f"{label}: EBFMI {ebfmi.min():.3f}"
    if ebfmi.min() < t.ebfmi_alert:
        print(f"[alert] {label}: EBFMI {ebfmi.min():.3f} < {t.ebfmi_alert}")

    if check_ad and model.has_exact_sampler:
        # anderson_ksamp assumes i.i.d. samples; MCMC draws are
        # autocorrelated, and on slow-mixing targets (tau_fail down to 0.1)
        # the statistic computed at the nominal draw count is inflated by
        # ~1/tau — a false positive, not a sampler bias (verified: mixture
        # weight/moments recover to Monte-Carlo noise while raw-draw AD
        # fails). Thin to effective independence by the measured bulk ESS.
        stride = max(1, int(np.ceil((c * n) / max(stats["ess_bulk"].min(), 1.0))))
        thinned = positions[:, ::stride, :]
        pooled = thinned.reshape(-1, k)
        exact = np.asarray(
            model.sample(jax.random.fold_in(key, 999), len(pooled)), np.float64
        )
        # Bonferroni d-correction (sample-correctness_utilities.jl:119-126).
        # scipy floors significance_level at 0.001 (and caps at 0.25): when
        # the Bonferroni-corrected fail threshold is at/below that floor,
        # `p >= thr` would be vacuously true for ANY samples — gate on the
        # AD statistic against the 0.1% critical value instead.
        for j in range(k):
            r = anderson_ksamp([pooled[:, j], exact[:, j]])
            p = r.significance_level
            thr = t.ad_fail / k
            if thr <= 0.001:
                crit_001 = r.critical_values[-1]  # 0.1% level
                assert r.statistic < crit_001, (
                    f"{label}: AD stat={r.statistic:.3f} coord {j} exceeds "
                    f"0.1% critical value {crit_001:.3f} (p floored at {p:.4g})"
                )
            else:
                assert p >= thr, (
                    f"{label}: AD p={p:.4g} coord {j} < {thr:.4g}"
                )
            if p < t.ad_alert / k:
                print(f"[alert] {label}: AD p={p:.4g} coord {j}")
    return res
