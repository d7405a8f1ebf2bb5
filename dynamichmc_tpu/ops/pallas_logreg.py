"""Batched Pallas leaf kernel for Bayesian logistic regression (BASELINE
config 3) — the first fused leaf beyond quadratic targets.

One NUTS leaf = leapfrog + log density + joint energy. For logistic
regression the log density is two MXU matmuls around a logistic
nonlinearity:

    logits = q' X^T                       (C, n) matmul
    ld     = sum(mask * (y*logits - softplus(logits))) - ||q'/s||^2 / 2
    grad   = (mask * (y - sigmoid(logits))) X - q'/s^2

The whole leaf — both half-kicks, the drift, both likelihood matmuls, the
log density AND the joint energy pi = ld - K(p') — runs as ONE Pallas
kernel: X stays resident in VMEM across both matmuls (the XLA path reads it
from HBM twice per leaf, once for the forward and once for the VJP matmul),
and every (C, K) array is read from HBM exactly once per leaf.

Semantics mirror ops/pallas_leaf.py: the hook signature is
``(metric, q, p, g, eps_signed) -> (q', p', g', ld', pi')`` with the same
-inf poisoning as hamiltonian.evaluate / joint_logdensity
(/root/reference/src/hamiltonian.jl:273-282 is the evaluation contract being
fused). Supports shared dense (K, K), shared diagonal (K,), and per-chain
diagonal (C, K) metrics in-kernel; non-f32 dtypes fall back to a pure-JAX
path integrating the identical target.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..metric import DenseMetric, DiagonalMetric


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _softplus(x):
    # log(1 + e^x) = max(x, 0) + log1p(e^-|x|): overflow-free for |x| ~ 1e38
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _sigmoid(x):
    # tanh form: stable at both tails, single transcendental on the VPU
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)


def _make_kernel(inv_ps2: float, dense: bool):
    """Generate the leaf kernel; ``dense`` statically selects the metric
    application (matrix vs elementwise) so each variant compiles its own
    minimal program."""

    def kernel(q_ref, p_ref, g_ref, m_ref, eps_ref, x_ref, xt_ref, y_ref,
               mask_ref, qn_ref, pn_ref, gn_ref, ldn_ref, pin_ref):
        q = q_ref[:]
        p = p_ref[:]
        g = g_ref[:]
        eps = eps_ref[:]  # (BLOCK_C, 1) signed
        half = 0.5 * eps
        p_mid = p + half * g
        if dense:
            mi = m_ref[:]  # (KP, KP)
            q_new = q + eps * jnp.dot(
                p_mid, mi, preferred_element_type=jnp.float32
            )
        else:
            minv = m_ref[:]  # (BLOCK_C, KP) diag rows
            q_new = q + eps * (minv * p_mid)
        # likelihood forward: logits_c = X q_c
        logits = jnp.dot(q_new, xt_ref[:], preferred_element_type=jnp.float32)
        y = y_ref[:]      # (1, NP)
        mask = mask_ref[:]  # (1, NP): 1 for real observations, 0 for padding
        terms = mask * (y * logits - _softplus(logits))
        prior = -0.5 * inv_ps2 * jnp.sum(q_new * q_new, axis=1, keepdims=True)
        ld = jnp.sum(terms, axis=1, keepdims=True) + prior
        # likelihood gradient: X^T (y - sigmoid(logits)), masked
        resid = mask * (y - _sigmoid(logits))
        g_new = (
            jnp.dot(resid, x_ref[:], preferred_element_type=jnp.float32)
            - inv_ps2 * q_new
        )
        p_new = p_mid + half * g_new
        if dense:
            kin = 0.5 * jnp.sum(
                p_new * jnp.dot(p_new, mi, preferred_element_type=jnp.float32),
                axis=1, keepdims=True,
            )
        else:
            kin = 0.5 * jnp.sum(minv * p_new * p_new, axis=1, keepdims=True)
        qn_ref[:] = q_new
        pn_ref[:] = p_new
        gn_ref[:] = g_new
        ldn_ref[:] = ld
        pin_ref[:] = ld - kin

    return kernel


#: max MXU lane-padding waste at which the fused kernel still wins. Measured
#: (round 4): K=25 pads to 128 lanes — 5.1x wasted FLOPs/bytes on every
#: (C, K) array and both matmuls — and loses 0.87x vs XLA AD; lane-filling
#: dims win (the regime the quadratic fused leaf demonstrated). 1.5 admits
#: K >= ~86.
FUSED_MAX_PAD_RATIO = 1.5


def fused_leaf_pays(n_obs: int, dim: int) -> bool:
    """Shape-economics dispatch heuristic for ``logistic_regression(
    fused="auto")``: attach the fused kernel only when (a) the MXU
    lane-padding waste kp/dim is small and (b) the design matrix fits the
    kernel's VMEM budget (otherwise every call would take the pure-JAX
    fallback anyway)."""
    kp = _round_up(dim, 128)
    if kp / dim > FUSED_MAX_PAD_RATIO:
        return False
    np_ = _round_up(n_obs, 128)
    return 4 * 2 * np_ * kp <= 11 * 1024 * 1024  # X + X^T, with headroom


def make_logreg_fused_leaf_batched(
    x: jnp.ndarray,  # (n_obs, dim) design matrix
    y: jnp.ndarray,  # (n_obs,) 0/1 responses
    prior_scale: float = 10.0,
    block_c: int = 256,
    interpret: Optional[bool] = None,
    tpu_only: bool = False,
):
    """Hook for ``LogDensity.fused_leaf_batched_fn`` on the logistic
    regression posterior of models/logreg.py (identical target: stable
    softplus likelihood + N(0, prior_scale^2 I) prior)."""
    import numpy as _np

    x_full = jnp.asarray(x)
    y_full = jnp.asarray(y)
    n_obs, k = x_full.shape
    inv_ps2 = float(1.0 / (prior_scale * prior_scale))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kp = _round_up(k, 128)
    np_ = _round_up(n_obs, 128)
    x32 = _np.zeros((np_, kp), _np.float32)
    x32[:n_obs, :k] = _np.asarray(x_full, _np.float32)
    x_p = jnp.asarray(x32)
    xt_p = jnp.asarray(x32.T.copy())
    y32 = _np.zeros((1, np_), _np.float32)
    y32[0, :n_obs] = _np.asarray(y_full, _np.float32)
    y_p = jnp.asarray(y32)
    m32 = _np.zeros((1, np_), _np.float32)
    m32[0, :n_obs] = 1.0
    mask_p = jnp.asarray(m32)

    def _val_grad_ref(qq):
        """Fallback oracle in the operand dtype — the same target the f32
        kernel integrates (used for f64 QA runs)."""
        logits = x_full.astype(qq.dtype) @ qq
        yv = y_full.astype(qq.dtype)
        val = (
            jnp.sum(yv * logits - _softplus(logits))
            - 0.5 * inv_ps2 * jnp.sum(qq * qq)
        )
        grad = x_full.astype(qq.dtype).T @ (yv - _sigmoid(logits)) - inv_ps2 * qq
        return val, grad

    # VMEM ceiling for the kernel's resident operands. A too-big design
    # matrix fails at Mosaic compile with an opaque error; route those
    # configurations to the pure-JAX fallback instead. ~12 MB of the
    # ~16 MB/core leaves headroom for Mosaic's own scratch.
    _VMEM_BUDGET_BYTES = 12 * 1024 * 1024

    def fused(metric, q, p, g, eps_signed):
        dense = isinstance(metric, DenseMetric)

        def _fallback():
            # pure-JAX path, same poisoning semantics as the kernel
            from ..logdensity import LogDensity
            from ..tree_batched import _Edge, _joint_b, _leapfrog_b as _lf

            ref_ld = LogDensity(
                dim=k,
                logdensity_fn=lambda qq: _val_grad_ref(qq)[0],
                logdensity_and_gradient_fn=_val_grad_ref,
            )
            z = _lf(ref_ld, metric,
                    _Edge(q=q, p=p, grad=g, ld=jnp.zeros(q.shape[0], q.dtype)),
                    eps_signed)
            pi = _joint_b(metric, z.ld, z.p)
            return z.q, z.p, z.grad, z.ld, pi

        # configurations the kernel doesn't cover: f64 QA runs, and
        # PER-CHAIN dense metrics — a (C, K, K) m_inv doesn't fit the
        # single shared VMEM block (mirrors ops/pallas_leaf.py)
        if q.dtype != jnp.float32 or (dense and metric.m_inv.ndim == 3):
            return _fallback()
        # auto-attached hooks (fused="auto") only engage the kernel on TPU:
        # elsewhere it would run in (slow) interpret mode — the pure-JAX
        # path is the right default off-TPU. Explicit fused=True keeps the
        # interpret path (the CPU parity tests exercise the kernel itself).
        if tpu_only and jax.default_backend() != "tpu":
            return _fallback()
        c = q.shape[0]
        bc = min(block_c, _round_up(c, 8))
        # VMEM residency estimate per grid step: X + X^T stay resident
        # across both matmuls, plus the per-block (bc, kp) operands
        # (q/p/g[/diag-metric] in, q'/p'/g' out) and the dense metric.
        vmem_bytes = 4 * (
            2 * np_ * kp                      # X, X^T
            + (6 + (0 if dense else 1)) * bc * kp  # row blocks in/out
            + (kp * kp if dense else 0)       # shared dense metric
            + 2 * np_ + 5 * bc                # y, mask, eps, ld, pi
        )
        if vmem_bytes > _VMEM_BUDGET_BYTES:
            return _fallback()
        cp = _round_up(c, bc)

        def pad2(arr):
            return jnp.pad(arr, ((0, cp - c), (0, kp - k)))

        qp, pp, gp = pad2(q), pad2(p), pad2(g)
        ep = jnp.pad(eps_signed[:, None], ((0, cp - c), (0, 0)))
        row = pl.BlockSpec((bc, kp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        col = pl.BlockSpec((bc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((np_, kp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        xtspec = pl.BlockSpec((kp, np_), lambda i: (0, 0), memory_space=pltpu.VMEM)
        obs = pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM)
        if dense:
            mi = jnp.pad(metric.m_inv.astype(jnp.float32),
                         ((0, kp - k), (0, kp - k)))
            mspec = pl.BlockSpec((kp, kp), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        else:
            mi = pad2(jnp.broadcast_to(
                metric.m_inv.astype(jnp.float32), (c, k)))
            mspec = row
        kernel = _make_kernel(inv_ps2, dense)
        out = pl.pallas_call(
            kernel,
            grid=(cp // bc,),
            in_specs=[row, row, row, mspec, col, xspec, xtspec, obs, obs],
            out_specs=[row, row, row, col, col],
            out_shape=[
                jax.ShapeDtypeStruct((cp, kp), jnp.float32),
                jax.ShapeDtypeStruct((cp, kp), jnp.float32),
                jax.ShapeDtypeStruct((cp, kp), jnp.float32),
                jax.ShapeDtypeStruct((cp, 1), jnp.float32),
                jax.ShapeDtypeStruct((cp, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * cp * kp * np_ + (4 * cp * kp * kp if dense else 0)
                + 24 * cp * kp,
                bytes_accessed=(9 * cp * kp + 2 * np_ * kp) * 4,
                transcendentals=3 * cp * np_,
            ),
            interpret=interpret,
        )(qp, pp, gp, mi, ep, x_p, xt_p, y_p, mask_p)
        q_new, p_new, g_new, ld, pi = out
        q_new = q_new[:c, :k]
        p_new = p_new[:c, :k]
        g_new = g_new[:c, :k]
        ld = ld[:c, 0]
        pi = pi[:c, 0]
        # -inf poisoning, identical to evaluate + joint_logdensity
        ok = jnp.isfinite(ld) & jnp.all(jnp.isfinite(g_new), axis=-1)
        ld = jnp.where(ok | (ld == -jnp.inf), ld, -jnp.inf)
        pi = jnp.where(jnp.isfinite(pi), pi, -jnp.inf)
        pi = jnp.where(jnp.isfinite(ld), pi, -jnp.inf)
        return q_new, p_new, g_new, ld, pi

    return fused
