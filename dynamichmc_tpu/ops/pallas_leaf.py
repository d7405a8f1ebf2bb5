"""Batched Pallas leaf kernel for quadratic targets in the batch-native driver.

One leaf of the NUTS tree = leapfrog step + log density + joint energy
(hamiltonian.py + tree_batched.py). For a Gaussian log density the whole leaf
is a single Pallas kernel: both half-kicks, the drift, the MXU gradient
matmul, the new log density AND the joint energy pi = ld - p'M^-1p'/2 — about
a dozen XLA fusions collapse into one kernel launch, and every (C, K) array
is read from HBM exactly once per leaf.

Unlike ops/pallas_leapfrog.py (which serves the per-chain vmapped drivers via
custom_vmap), this kernel is called directly with batched (C, K) operands by
tree_batched._leapfrog_b through the ``fused_leaf_batched_fn`` hook.
Supports shared (K,) and per-chain (C, K) diagonal metrics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..metric import DiagonalMetric


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, p_ref, g_ref, minv_ref, eps_ref, prec_ref, lchol_ref,
            mu_ref, qn_ref, pn_ref, gn_ref, ldn_ref, pin_ref):
    q = q_ref[:]
    p = p_ref[:]
    g = g_ref[:]
    minv = minv_ref[:]
    eps = eps_ref[:]  # (BLOCK_C, 1) signed
    half = 0.5 * eps
    p_mid = p + half * g
    q_new = q + eps * (minv * p_mid)
    d = q_new - mu_ref[:]
    pd = jnp.dot(d, prec_ref[:], preferred_element_type=jnp.float32)
    g_new = -pd
    # value via the whitened sum of squares ||L^T d||^2 (cancellation-free
    # in float32; prec = L L^T); d @ L gives rows (L^T d_c)
    w = jnp.dot(d, lchol_ref[:], preferred_element_type=jnp.float32)
    ld = -0.5 * jnp.sum(w * w, axis=1, keepdims=True)
    p_new = p_mid + half * g_new
    kin = 0.5 * jnp.sum(minv * p_new * p_new, axis=1, keepdims=True)
    qn_ref[:] = q_new
    pn_ref[:] = p_new
    gn_ref[:] = g_new
    ldn_ref[:] = ld
    pin_ref[:] = ld - kin


def make_gaussian_fused_leaf_batched(
    prec: jnp.ndarray,
    mu: Optional[jnp.ndarray] = None,
    block_c: int = 512,
    interpret: Optional[bool] = None,
    prec_chol_t: Optional[jnp.ndarray] = None,
):
    """Hook for ``LogDensity.fused_leaf_batched_fn``:

    (metric, q, p, g, eps_signed (C,)) -> (q', p', g', ld', pi')

    ld' is -inf-poisoned exactly like hamiltonian.evaluate; pi' is the joint
    density with the same poisoning as joint_logdensity.
    """
    import numpy as _np

    # full-precision copies serve the non-f32/dense fallback (an f64 run
    # must integrate the SAME target the model's f64 logdensity defines —
    # truncating to f32 first would mix two targets across pi0 and leaves)
    prec_full = jnp.asarray(prec)
    k = prec_full.shape[0]
    mu_full = (
        jnp.zeros((k,), prec_full.dtype) if mu is None else jnp.asarray(mu)
    )
    if prec_chol_t is None:
        prec_chol_t = jnp.asarray(
            _np.linalg.cholesky(
                _np.asarray(prec_full, _np.float64)
            ).T.astype(_np.asarray(prec_full).dtype)
        )
    lchol_full = jnp.asarray(prec_chol_t).T  # lower L: prec = L L^T
    prec = prec_full.astype(jnp.float32)
    mu = mu_full.astype(jnp.float32)
    lchol = lchol_full.astype(jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kp = _round_up(k, 128)
    prec_p = jnp.pad(prec, ((0, kp - k), (0, kp - k)))
    lchol_p = jnp.pad(lchol, ((0, kp - k), (0, kp - k)))
    mu_p = jnp.pad(mu[None, :], ((0, 0), (0, kp - k)))

    def fused(metric, q, p, g, eps_signed):
        if not isinstance(metric, DiagonalMetric) or q.dtype != jnp.float32:
            # pure-JAX fallback (non-f32 or dense metric): same math
            from ..tree_batched import _Edge, _joint_b, _leapfrog_b as _lf
            from ..logdensity import LogDensity

            def _val_grad(qq):
                d = qq - mu_full.astype(qq.dtype)
                w = lchol_full.T.astype(qq.dtype) @ d
                return -0.5 * jnp.sum(w * w), -(prec_full.astype(qq.dtype) @ d)

            ref_ld = LogDensity(
                dim=k,
                logdensity_fn=lambda qq: _val_grad(qq)[0],
                logdensity_and_gradient_fn=_val_grad,
            )
            z = _lf(ref_ld, metric, _Edge(q=q, p=p, grad=g, ld=jnp.zeros(q.shape[0], q.dtype)), eps_signed)
            pi = _joint_b(metric, z.ld, z.p)
            return z.q, z.p, z.grad, z.ld, pi
        c = q.shape[0]
        m_inv = jnp.broadcast_to(metric.m_inv, (c, k))
        bc = min(block_c, _round_up(c, 8))
        cp = _round_up(c, bc)

        def pad2(x):
            return jnp.pad(x, ((0, cp - c), (0, kp - k)))

        qp, pp, gp, mp = pad2(q), pad2(p), pad2(g), pad2(m_inv)
        ep = jnp.pad(eps_signed[:, None], ((0, cp - c), (0, 0)))

        row = pl.BlockSpec((bc, kp), lambda i: (i, 0), memory_space=pltpu.VMEM)
        col = pl.BlockSpec((bc, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        full = pl.BlockSpec((kp, kp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        mu_spec = pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            _kernel,
            grid=(cp // bc,),
            in_specs=[row, row, row, row, col, full, full, mu_spec],
            out_specs=[row, row, row, col, col],
            out_shape=[
                jax.ShapeDtypeStruct((cp, kp), jnp.float32),
                jax.ShapeDtypeStruct((cp, kp), jnp.float32),
                jax.ShapeDtypeStruct((cp, kp), jnp.float32),
                jax.ShapeDtypeStruct((cp, 1), jnp.float32),
                jax.ShapeDtypeStruct((cp, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * cp * kp * kp + 16 * cp * kp,
                bytes_accessed=(9 * cp * kp + 2 * kp * kp) * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(qp, pp, gp, mp, ep, prec_p, lchol_p, mu_p)
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
