"""Headline benchmark: ESS/sec on the 100-d correlated Gaussian.

North star (BASELINE.json): 4096 vmapped NUTS chains with batched staged
warmup (Welford variance metric) at > 10x single-core DynamicHMC.jl ESS/sec on
one TPU chip. The reference publishes no numbers (BASELINE.md), so the
baseline is measured here: one chain of the same sampler on one CPU core —
an optimized-native-code proxy for single-core DynamicHMC.jl.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ESS/s", "vs_baseline": N}
plus human-readable details on stderr.
"""

import json
import os
import sys
import time

import jax

# Persistent XLA compilation cache: every fresh process otherwise pays the
# full program compiles (minutes for the monolithic warmup through the
# tunneled chip); cached binaries cut reruns to seconds. The directory is
# keyed by a host-CPU fingerprint — a shared /tmp cache reused across
# heterogeneous hosts loads CPU AOT binaries compiled for other machines'
# feature sets (XLA: "could lead to execution errors such as SIGILL").
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dynamichmc_tpu.utils.cache import host_keyed_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", host_keyed_cache_dir("/tmp/jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _ess_per_sec(positions, seconds: float) -> tuple:
    """Min/mean pooled bulk-ESS across parameters, per second (native
    fastdiag batch engine when available; numpy parity fallback).

    BENCH_ESS_DEVICE=1 computes the ESS ON the TPU (stats_device.py, f32) —
    the only path that scales past ~8k chains: the host-side f64 evaluation
    of a 16384x512x100 run (6.7 GB, 1 core) exceeds a 25-minute budget while
    the draws already live on the chip. Default remains the host f64 path
    (metric continuity across rounds)."""
    if int(os.environ.get("BENCH_ESS_DEVICE", "0")):
        from dynamichmc_tpu.stats_device import ess_rhat_device

        out = ess_rhat_device(jnp.asarray(positions))
        ess = np.asarray(out["ess_bulk"], np.float64)
        return float(ess.min() / seconds), float(ess.mean() / seconds)
    from dynamichmc_tpu.stats import ess_bulk, ess_rhat

    positions = np.asarray(positions, np.float64)
    try:
        ess = np.asarray(ess_rhat(positions)["ess_bulk"])
    except Exception:
        c, n, k = positions.shape
        ess = np.array([ess_bulk(positions[:, :, j]) for j in range(k)])
    return float(ess.min() / seconds), float(ess.mean() / seconds)


POOLED = bool(int(os.environ.get("BENCH_POOLED", "1")))


def _stages(metric_kind: str, warm: bool):
    from dynamichmc_tpu.warmup import default_warmup_stages

    # the warm (untimed) run MUST use the same stage tuple: the compiled
    # program bundle is cached per (model, algorithm, schedule), so a
    # different warm schedule would leave the real run compiling its
    # sampling program inside the timed region (~10 s on this chip).
    del warm
    # PER-CHAIN dual-averaging stepsize is the default (BENCH_POOLED_EPS=0):
    # it is the reference's own adaptation semantics AND, with the warmup
    # depth clamp, the fastest measured config — per-chain DA lands each
    # chain at its own acceptance optimum where NUTS draws anti-correlate
    # (~2.26 ESS/draw vs ~1.07 pooled), which beats pooled eps's smaller
    # wall clock. Measured round 3: 1.24M vs 858k min-param ESS/s.
    pooled_eps = bool(int(os.environ.get("BENCH_POOLED_EPS", "0")))
    return default_warmup_stages(
        metric_kind=metric_kind, pooled=POOLED, pooled_stepsize=pooled_eps
    )


def _model(dim: int, fused: bool, tree_kernel=None):
    """BENCH_MODEL: 'gaussian' (default; BASELINE configs 2/5),
    'stdnormal' (config 1: standard MVN, pair with BENCH_METRIC=diagonal),
    'logreg' (config 3: n_obs=1000 synthetic logistic regression, AD
    gradient through the likelihood matmul), or 'funnel' (config 4: Neal's
    funnel, sigma_v=3 — pair with BENCH_METRIC=diagonal; the row reports
    wall/ESS alongside the correctness gates in
    tests/test_sample_correctness.py)."""
    name = os.environ.get("BENCH_MODEL", "gaussian")
    if tree_kernel is None:
        tree_kernel = bool(int(os.environ.get("BENCH_TREE_KERNEL", "1")))
    if name == "funnel":
        from dynamichmc_tpu.models import funnel

        # funnel default: NO tree kernel — measured a tie/slight loss
        # (1.62 s vs 1.52 s XLA at the funnel config): at dim 25 the XLA
        # slot moves only ~400 KB/array, so it is not HBM-bound and VMEM
        # residency buys nothing. BENCH_FUNNEL_TREE_KERNEL=1 to A/B.
        return funnel(
            dim, dtype=jnp.float32,
            tree_kernel=bool(
                int(os.environ.get("BENCH_FUNNEL_TREE_KERNEL", "0"))
            ),
        )
    if name == "logreg":
        from dynamichmc_tpu.models import logistic_regression

        # logreg default: NO tree kernel — measured a LOSS at the winning
        # fused-leaf config (K=128, n_obs=4000, 2048 chains: tree kernel
        # 1.87 s vs fused leaf 1.03 s vs AD 1.81 s). The logreg leaf is
        # MXU-compute-bound (4.2 GFLOP/fleet-leaf), so tree-state VMEM
        # residency buys nothing and the in-kernel serialization loses the
        # fused leaf's cross-leaf pipelining. BENCH_LOGREG_TREE_KERNEL=1
        # to A/B; BENCH_FUSED selects the winning fused-leaf kernel.
        return logistic_regression(
            n_obs=int(os.environ.get("BENCH_NOBS", "1000")),
            dim=dim, dtype=jnp.float32, fused=fused,
            tree_kernel="auto" if int(
                os.environ.get("BENCH_LOGREG_TREE_KERNEL", "0")
            ) else False,
        )
    if name == "stdnormal":
        from dynamichmc_tpu.models import std_normal

        return std_normal(dim, dtype=jnp.float32)
    from dynamichmc_tpu.models import correlated_gaussian

    # BENCH_TREE_KERNEL (default 1): whole-transition Pallas tree kernel
    # (ops/pallas_tree.py) — the entire NUTS transition VMEM-resident, one
    # kernel per chain block. Measured same-session (round 5): 3.47x the
    # XLA driver on the sampling scan and 2.93M -> 5.70M end-to-end
    # min-param ESS/s at IDENTICAL total min ESS (4.732M; the kernel is
    # pinned transition-for-transition to the XLA driver in
    # tests/test_pallas_tree.py). main() retries without it on any failure.
    return correlated_gaussian(
        dim, dtype=jnp.float32, fused=fused, tree_kernel=tree_kernel
    )


def run_auto(n_chains: int, dim: int, n_samples: int):
    """BENCH_AUTO=1: measure the PLAIN library call — run_chains(key, ld,
    C, N) with zero tuning arguments — so the autopilot's claim (within
    ~15% of the hand-tuned headline, VERDICT round-4 item 2) is
    measurable. The autopilot picks stages/pooling/clamps/depth itself;
    its choices are printed via the log hook."""
    from dynamichmc_tpu.parallel import run_chains

    ld = _model(dim, False)
    log = (
        (lambda m: print(f"[bench] {m}", file=sys.stderr))
        if os.environ.get("BENCH_VERBOSE")
        else None
    )
    if int(os.environ.get("BENCH_WARM", "1")):
        run_chains(
            jax.random.PRNGKey(9), ld, n_chains, n_samples,
            dtype=jnp.float32,
        ).positions.block_until_ready()
    t0 = time.perf_counter()
    res = run_chains(
        jax.random.PRNGKey(0), ld, n_chains, n_samples, dtype=jnp.float32,
        log=log,
    )
    res.positions.block_until_ready()
    seconds = time.perf_counter() - t0
    positions = (
        res.positions
        if int(os.environ.get("BENCH_ESS_DEVICE", "0"))
        else np.asarray(res.positions, np.float64)
    )
    div = int(np.asarray(res.tree_statistics.is_divergent).sum())
    steps = int(np.asarray(res.tree_statistics.steps, np.int64).sum())
    return positions, seconds, div, steps


def run_tpu(n_chains: int, dim: int, n_samples: int, metric_kind: str,
            fused: bool):
    from dynamichmc_tpu.parallel import run_chains

    if int(os.environ.get("BENCH_AUTO", "0")):
        return run_auto(n_chains, dim, n_samples)
    driver = "wavefront" if int(os.environ.get("BENCH_WAVEFRONT", "0")) else "sync"
    # BENCH_SAMPLING_DRIVER: sync (lockstep chunks) | epoch (desynchronized
    # epoch wavefront, tree_wavefront_epoch.py)
    sampling_driver = os.environ.get("BENCH_SAMPLING_DRIVER", "sync")
    stratify = int(os.environ.get("BENCH_STRATIFY", "0"))
    # warmup depth clamp (default 2; round-3 sweep with the tail clamp at
    # IDENTICAL total ESS and zero divergences: clamp 3 = 1.89M, clamp 2 =
    # 2.09M, clamp 1 = 1.62M ESS/s — clamp 1's poorly-settled eps spread
    # degrades SAMPLING, 1.2 -> 2.0 s at 77% waste; see BENCH_NOTES.md).
    # Set BENCH_DEPTH_CLAMP=0 for unclamped reference-schedule semantics.
    clamp = int(os.environ.get("BENCH_DEPTH_CLAMP", "2")) or None
    # default depth cap 4 for the well-conditioned targets (their adapted
    # trees terminate by depth ~4); the funnel genuinely needs deep trees
    # (depth histograms reach the cap), so its default stays uncapped.
    _md_default = "0" if os.environ.get("BENCH_MODEL") == "funnel" else "4"
    max_depth = int(os.environ.get("BENCH_MAX_DEPTH", _md_default))
    if clamp is not None and max_depth:
        # a swept max_depth below the default clamp would otherwise fail
        # run_chains' clamp <= max_depth validation
        clamp = min(clamp, max_depth)
    # BENCH_CLAMP_TAIL (default 25 = half the 50-step final block): clamp
    # the first N steps of the final eps-only block too. The DA restart
    # against the just-updated metric builds the deepest trees of the whole
    # warmup (~270 slots/step measured); clamping the transient's head cut
    # the headline wall 3.49 -> 2.50 s at IDENTICAL total ESS and zero
    # divergences — the unclamped tail still re-adapts eps before sampling.
    # both drivers honor it (round 4): the wavefront applies it per lane
    # via the tail_steps runtime operand
    clamp_tail = (
        int(os.environ.get("BENCH_CLAMP_TAIL", "25")) if clamp else 0
    )
    # BENCH_MAX_DEPTH (default 4; 0 = reference default 10): cap the
    # sampler's tree depth outright — max_depth is an ordinary NUTS
    # parameter (any cap is a valid kernel — Stan's treedepth), and the
    # sampling phase pays the same lockstep straggler tax the warmup clamp
    # reclaimed. Round-4 same-session sweep on the headline config (total
    # min ESS in parens): md=10 2.20 s (4.739M), md=6 1.90 s (4.738M),
    # md=5 1.91 s (4.739M), md=4 1.65 s (4.732M) — the adapted dense
    # metric terminates almost every trajectory by depth 4, so the cap
    # only reclaims straggler slots. ESS is MEASURED on the draws, so any
    # quality loss from truncation shows up in the metric itself;
    # tests/test_sample_correctness.py::test_bench_kernel_semantics pins
    # this exact kernel to the full acceptance protocol. Sweep wall AND
    # total ESS before adopting a different value.
    algo_kw = {}
    if max_depth:
        from dynamichmc_tpu.nuts import NUTS

        algo_kw["algorithm"] = NUTS(max_depth=max_depth)
    ld = _model(dim, fused)
    # warm-up compile run (not timed): same schedule => same cached programs
    if int(os.environ.get("BENCH_WARM", "1")):
        # SAME n_samples: the chunk-assembly program's shapes are static in
        # (n_chunks, n_samples); a short warm run would leave its compile
        # inside the timed window (~0.5 s)
        run_chains(
            jax.random.PRNGKey(9), ld, n_chains, n_samples,
            tune="reference",
            warmup_stages=_stages(metric_kind, warm=True), dtype=jnp.float32,
            warmup_driver=driver, sampling_driver=sampling_driver,
            stratify_sampling=stratify,
            warmup_depth_clamp=clamp, warmup_depth_clamp_tail=clamp_tail,
            **algo_kw,
        ).positions.block_until_ready()
    log = (
        (lambda m: print(f"[bench] {m}", file=sys.stderr))
        if os.environ.get("BENCH_VERBOSE")
        else None
    )
    t0 = time.perf_counter()
    res = run_chains(
        jax.random.PRNGKey(0), ld, n_chains, n_samples, dtype=jnp.float32,
        tune="reference",
        warmup_stages=_stages(metric_kind, warm=False), log=log,
        warmup_driver=driver, sampling_driver=sampling_driver,
        stratify_sampling=stratify,
        warmup_depth_clamp=clamp, warmup_depth_clamp_tail=clamp_tail,
        **algo_kw,
    )
    if log is not None:
        log(f"run_chains returned at {time.perf_counter() - t0:.2f}s")
    res.positions.block_until_ready()
    seconds = time.perf_counter() - t0
    if int(os.environ.get("BENCH_ESS_DEVICE", "0")):
        # keep the draws on device for the on-chip ESS path (transferring
        # 16384x512x100 f32 through the tunnel costs minutes by itself)
        positions = res.positions
    else:
        positions = np.asarray(res.positions, np.float64)
    div = int(np.asarray(res.tree_statistics.is_divergent).sum())
    steps = int(np.asarray(res.tree_statistics.steps, np.int64).sum())
    if res.tree_statistics.work is not None:
        from dynamichmc_tpu.diagnostics import straggler_waste

        print(
            f"[bench] sampling-phase straggler waste: "
            f"{straggler_waste(res.tree_statistics):.1%} "
            "(leaf slots spent on terminated lanes)",
            file=sys.stderr,
        )
    return positions, seconds, div, steps


def run_cpu_baseline(dim: int, n_samples: int, metric_kind: str):
    """Single chain of the same sampler on one CPU core: the proxy for
    single-core DynamicHMC.jl (the reference publishes no numbers)."""
    from dynamichmc_tpu.parallel import run_chains
    from dynamichmc_tpu.stepsize import InitialStepsizeSearch
    from dynamichmc_tpu.warmup import TuningNUTS

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # the whole-transition Pallas kernel cannot lower for CPU — the
        # baseline is the plain XLA model by definition anyway
        ld = _model(dim, False, tree_kernel=False)
        run_chains(
            jax.random.PRNGKey(9), ld, 1, 8, tune="reference",
            warmup_stages=_stages(metric_kind, warm=True), dtype=jnp.float32,
        ).positions.block_until_ready()
        t0 = time.perf_counter()
        res = run_chains(
            jax.random.PRNGKey(1), ld, 1, n_samples, tune="reference",
            warmup_stages=_stages(metric_kind, warm=False), dtype=jnp.float32,
        )
        res.positions.block_until_ready()
        seconds = time.perf_counter() - t0
    return np.asarray(res.positions, np.float64), seconds


def _arm_watchdog():
    """A wedged axon tunnel makes the first device op hang indefinitely
    (observed: multi-hour outages where even a 128x128 matmul never
    returns). Convert that into a bounded, diagnosable failure: a daemon
    thread hard-exits after BENCH_WATCHDOG_MINS (default 40 — a fully cold
    compile of the headline programs through the tunnel takes ~15-25 min;
    0 disables)."""
    minutes = float(os.environ.get("BENCH_WATCHDOG_MINS", "40"))
    if minutes <= 0:
        return
    import threading

    def kill():
        print(
            f"[bench] WATCHDOG: no result after {minutes:.0f} min — the "
            "TPU tunnel is likely wedged (device ops hang). Exiting.",
            file=sys.stderr,
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(minutes * 60.0, kill)
    t.daemon = True
    t.start()


def run_funnel_row():
    """BASELINE config 4 as a driver-captured row (VERDICT round-4 item 1).

    Runs the funnel benchmark configuration inside the same process (env
    overridden, then restored) and returns a dict embedded under the
    ``"funnel"`` key of the single JSON line.

    Config (round-5 measured, same-session sweep at 4096 chains, dim 25,
    per-chain eps, clamp 2/25, device ESS): md=10 8.60s / 1040 ESS/s
    (total min ESS 8943, 24 div), md=8 2.55s / 3451 (8811, 19), md=7
    1.50s / 5682 (8538, 24), md=6 0.98s / 8220 (8029 = -10% total ESS,
    rejected). Pooled eps at md=10 measured 8.44s / 1115 with divergences
    24 -> 165 (the shared eps overruns the neck chains) — rejected.
    Default: max_depth 7, PER-CHAIN eps — 4.5% total-ESS cost for 5.5x
    rate; every scheduler alternative measured in round 4 lost outright
    (epoch 13.9s, wavefront+epoch 15.7s vs sync 8.8s). Kernel gate:
    tests/test_sample_correctness.py::test_funnel_bench_kernel_semantics.
    """
    overrides = {
        "BENCH_MODEL": "funnel",
        "BENCH_MAX_DEPTH": os.environ.get("BENCH_FUNNEL_MD", "7"),
        "BENCH_POOLED_EPS": os.environ.get("BENCH_FUNNEL_POOLED_EPS", "0"),
        # keep the standard warmup clamp (funnel-gated in round 4)
        "BENCH_DEPTH_CLAMP": os.environ.get("BENCH_DEPTH_CLAMP", "2"),
    }
    saved = {k: os.environ.get(k) for k in overrides}
    os.environ.update(overrides)
    try:
        n_chains = int(os.environ.get("BENCH_FUNNEL_CHAINS", "4096"))
        dim = int(os.environ.get("BENCH_FUNNEL_DIM", "25"))
        n_samples = int(os.environ.get("BENCH_FUNNEL_SAMPLES", "512"))
        positions, seconds, divergences, steps = run_tpu(
            n_chains, dim, n_samples, "diagonal", False
        )
        ess_min_rate, ess_mean_rate = _ess_per_sec(positions, seconds)
        if int(os.environ.get("BENCH_BASELINE", "1")):
            base_positions, base_seconds = run_cpu_baseline(
                dim, max(n_samples, 512), "diagonal"
            )
            base_min_rate, _ = _ess_per_sec(base_positions, base_seconds)
        else:
            base_min_rate = 0.0
        row = {
            "metric": (
                f"min_pooled_bulk_ESS_per_sec_funnel{dim}d_"
                f"{n_chains}chains_diagonalmetric"
            ),
            "value": round(ess_min_rate, 3),
            "unit": "ESS/s",
            "vs_baseline": round(
                ess_min_rate / base_min_rate if base_min_rate else 0.0, 3
            ),
            "wall_seconds": round(seconds, 2),
            "divergences": divergences,
            "total_min_ess": round(ess_min_rate * seconds, 1),
            "max_depth": int(overrides["BENCH_MAX_DEPTH"]) or 10,
            "pooled_eps": bool(int(overrides["BENCH_POOLED_EPS"])),
        }
        print(f"[bench] funnel row: {row}", file=sys.stderr)
        return row
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    _arm_watchdog()
    n_chains = int(os.environ.get("BENCH_CHAINS", 4096))
    dim = int(os.environ.get("BENCH_DIM", 100))
    n_samples = int(os.environ.get("BENCH_SAMPLES", 512))
    metric_kind = os.environ.get("BENCH_METRIC", "dense")
    backend = jax.default_backend()

    fused = bool(int(os.environ.get("BENCH_FUSED", "0")))
    try:
        positions, seconds, divergences, steps = run_tpu(
            n_chains, dim, n_samples, metric_kind, fused
        )
    except Exception as exc:  # Pallas paths are optimizations, not deps
        kernel_on = os.environ.get("BENCH_TREE_KERNEL", "1") != "0"
        if not (fused or kernel_on):
            raise
        print(
            f"[bench] Pallas path failed ({exc!r}); retrying with "
            "tree kernel + fused leaf off",
            file=sys.stderr,
        )
        os.environ["BENCH_TREE_KERNEL"] = "0"
        positions, seconds, divergences, steps = run_tpu(
            n_chains, dim, n_samples, metric_kind, False
        )
    ess_min_rate, ess_mean_rate = _ess_per_sec(positions, seconds)
    grad_evals_per_sec = steps / seconds

    if int(os.environ.get("BENCH_BASELINE", "1")):
        base_positions, base_seconds = run_cpu_baseline(
            dim, max(n_samples, 512), metric_kind
        )
        base_min_rate, base_mean_rate = _ess_per_sec(base_positions, base_seconds)
    else:  # ad-hoc measurement runs: skip the (slow) 1-core baseline
        base_min_rate = base_mean_rate = 0.0
        base_seconds = 0.0

    print(
        f"[bench] backend={backend} chains={n_chains} dim={dim} "
        f"samples={n_samples} wall={seconds:.2f}s (incl. warmup) "
        f"divergences={divergences} leapfrog_grad_evals/s={grad_evals_per_sec:.3g}\n"
        f"[bench] pooled ESS/s: min={ess_min_rate:.4g} mean={ess_mean_rate:.4g} "
        f"(total min ESS={ess_min_rate * seconds:.4g})\n"
        f"[bench] cpu 1-chain baseline ESS/s: min={base_min_rate:.4g} "
        f"mean={base_mean_rate:.4g} (wall {base_seconds:.2f}s)",
        file=sys.stderr,
    )
    record = {
        "metric": (
            "min_pooled_bulk_ESS_per_sec_"
            + {
                "logreg": f"logreg{dim}d_",
                "stdnormal": f"{dim}d_std_normal_",
                "funnel": f"funnel{dim}d_",
            }.get(
                os.environ.get("BENCH_MODEL", "gaussian"),
                f"{dim}d_corr_gaussian_",
            )
            + f"{n_chains}chains_{metric_kind}metric"
        ),
        "value": round(ess_min_rate, 3),
        "unit": "ESS/s",
        "vs_baseline": round(
            ess_min_rate / base_min_rate if base_min_rate else 0.0, 3
        ),
    }
    # BASELINE config 4 (Neal's funnel) rides the same driver-captured JSON
    # line (one line total) — default on for the standard headline
    # invocation only, so sweeps/ad-hoc runs aren't doubled
    if int(os.environ.get(
        "BENCH_FUNNEL_ROW",
        "1" if os.environ.get("BENCH_MODEL", "gaussian") == "gaussian"
        and not os.environ.get("BENCH_CHAINS")
        else "0",
    )):
        record["funnel"] = run_funnel_row()
    print(json.dumps(record))


if __name__ == "__main__":
    main()
