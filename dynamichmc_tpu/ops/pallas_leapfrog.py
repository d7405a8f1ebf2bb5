"""Fused Pallas leapfrog for quadratic (Gaussian) targets.

The BASELINE north star names the leapfrog integrator as the op to fuse: one
velocity-Verlet step = momentum half-step -> position update -> gradient ->
half-step (hamiltonian.jl:273-282 in the reference, hamiltonian.py here).
For a quadratic log density  log p(q) = -0.5 (q - mu)^T Prec (q - mu)  the
gradient is one matmul, so the WHOLE step — both half-kicks, the drift, the
gradient (MXU) and the new log density — fits in a single Pallas kernel:
every (chains, K) array is read from HBM exactly once per leapfrog instead
of once per XLA fusion.

Batching design: the NUTS transition is written per-chain and vmapped
(parallel/chains.py). A naive pallas_call inside that function would be
vmapped into per-chain (1, K) matvecs — useless MXU shapes. Instead the op is
a ``jax.custom_batching.custom_vmap``: unbatched calls take the pure-JAX
path (also the test oracle), and the vmap rule dispatches the batched
(C, K) Pallas kernel, so the kernel sees the full chain batch even though
the surrounding algorithm is written for one chain.

Numerical-fault semantics are preserved exactly: the returned log density is
poisoned to -inf outside the kernel under the same rule as ``evaluate``
(non-finite value or gradient, except a clean -inf).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hamiltonian import EvaluatedPoint, PhasePoint
from ..metric import DiagonalMetric


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, p_ref, g_ref, minv_ref, eps_ref, prec_ref, lchol_ref,
            mu_ref, qn_ref, pn_ref, gn_ref, ld_ref):
    """One fused leapfrog for a (BLOCK_C, KP) tile of chains.

    eps is per-chain signed stepsize (BLOCK_C, 1); minv is the per-chain
    diagonal inverse mass (BLOCK_C, KP); prec is (KP, KP); mu is (1, KP).
    """
    q = q_ref[:]
    p = p_ref[:]
    g = g_ref[:]
    eps = eps_ref[:]  # (BLOCK_C, 1)
    half = 0.5 * eps
    p_mid = p + half * g
    q_new = q + eps * (minv_ref[:] * p_mid)
    d = q_new - mu_ref[:]
    # gradient of the quadratic log density: -(Prec @ d); Prec symmetric so
    # row-major (C,K) @ (K,K) hits the MXU directly.
    pd = jnp.dot(d, prec_ref[:], preferred_element_type=jnp.float32)
    g_new = -pd
    w = jnp.dot(d, lchol_ref[:], preferred_element_type=jnp.float32)
    ld_ref[:] = -0.5 * jnp.sum(w * w, axis=1, keepdims=True)
    gn_ref[:] = g_new
    qn_ref[:] = q_new
    pn_ref[:] = p_mid + half * g_new


def _batched_pallas_leapfrog(q, p, g, m_inv, eps, prec, lchol, mu,
                             block_c: int, interpret: bool):
    c, k = q.shape
    kp = _round_up(k, 128)
    cp = _round_up(c, block_c)

    def pad2(x, rows, cols):
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))

    qp = pad2(q, cp, kp)
    pp = pad2(p, cp, kp)
    gp = pad2(g, cp, kp)
    mp = pad2(m_inv, cp, kp)
    ep = jnp.pad(eps[:, None], ((0, cp - c), (0, 0)))
    prec_p = pad2(prec, kp, kp)
    lchol_p = pad2(lchol, kp, kp)
    mu_p = jnp.pad(mu[None, :], ((0, 0), (0, kp - k)))

    grid = (cp // block_c,)
    row_spec = pl.BlockSpec((block_c, kp), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    eps_spec = pl.BlockSpec((block_c, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((kp, kp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, row_spec, eps_spec, full_spec,
                  full_spec, mu_spec],
        out_specs=[row_spec, row_spec, row_spec, eps_spec],
        out_shape=[
            jax.ShapeDtypeStruct((cp, kp), q.dtype),
            jax.ShapeDtypeStruct((cp, kp), q.dtype),
            jax.ShapeDtypeStruct((cp, kp), q.dtype),
            jax.ShapeDtypeStruct((cp, 1), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * cp * kp * kp + 10 * cp * kp,
            bytes_accessed=(7 * cp * kp + kp * kp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, pp, gp, mp, ep, prec_p, lchol_p, mu_p)
    q_new, p_new, g_new, ld = out
    return (
        q_new[:c, :k],
        p_new[:c, :k],
        g_new[:c, :k],
        ld[:c, 0],
    )


def make_gaussian_fused_leapfrog(
    prec: jnp.ndarray,
    mu: Optional[jnp.ndarray] = None,
    block_c: int = 256,
    interpret: Optional[bool] = None,
    prec_chol_t: Optional[jnp.ndarray] = None,
):
    """Build a fused-leapfrog hook for ``LogDensity.fused_leapfrog_fn``.

    ``prec``/``mu`` define log p(q) = -0.5 (q-mu)^T prec (q-mu). Supports
    per-chain :class:`DiagonalMetric`. Unbatched calls use pure JAX; under
    ``vmap`` the batched Pallas kernel runs (``interpret=True`` forces the
    Pallas interpreter — used for CPU tests; default: interpret off-TPU).

    ``prec_chol_t``: the model's exact L^T (from the f64 construction) so
    the whitened log density matches the model's ``logdensity`` bitwise at
    matching precision — pass the SAME array the model itself uses (the
    fused-leaf hook takes it too); re-deriving it here from an
    f32-truncated ``prec`` would make the kernel integrate a slightly
    different target than the model evaluated pi0 on.
    """
    import numpy as _np

    # full-precision copies serve the non-f32 / dense-metric fallbacks; the
    # kernel operands are rounded to f32 separately
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

    def reference(q, p, g, m_inv, eps):
        half = 0.5 * eps
        p_mid = p + half * g
        q_new = q + eps * (m_inv * p_mid)
        d = q_new - mu
        pd = prec @ d
        g_new = -pd
        w = lchol.T @ d
        ld = -0.5 * jnp.sum(w * w)
        p_new = p_mid + half * g_new
        return q_new, p_new, g_new, ld

    @jax.custom_batching.custom_vmap
    def core(q, p, g, m_inv, eps):
        return reference(q, p, g, m_inv, eps)

    @core.def_vmap
    def core_vmap(axis_size, in_batched, q, p, g, m_inv, eps):
        qb, pb, gb, mb, eb = in_batched
        # broadcast any unbatched operands to the chain axis
        if not qb:
            q = jnp.broadcast_to(q, (axis_size,) + q.shape)
        if not pb:
            p = jnp.broadcast_to(p, (axis_size,) + p.shape)
        if not gb:
            g = jnp.broadcast_to(g, (axis_size,) + g.shape)
        if not mb:
            m_inv = jnp.broadcast_to(m_inv, (axis_size,) + m_inv.shape)
        if not eb:
            eps = jnp.broadcast_to(eps, (axis_size,))
        bc = min(block_c, _round_up(axis_size, 8))
        out = _batched_pallas_leapfrog(
            q, p, g, m_inv, eps, prec, lchol, mu, bc, interpret
        )
        return out, (True, True, True, True)

    def fused_leapfrog(metric, z: PhasePoint, eps_signed) -> PhasePoint:
        if not isinstance(metric, DiagonalMetric) or z.Q.q.dtype != jnp.float32:
            # Dense metric (after a dense-metric warmup update) or a non-f32
            # run (CPU x64 numerical tests): the kernel handles only a
            # diagonal inverse mass at f32, so fall back to the pure-JAX
            # leapfrog at the CALLER's precision using the full-precision
            # target arrays (the batched fused leaf does the same).
            from ..metric import psharp

            dt = z.Q.q.dtype
            half = 0.5 * eps_signed
            p_mid = z.p + half * z.Q.grad
            q_new = z.Q.q + eps_signed * psharp(metric, p_mid)
            d = q_new - mu_full.astype(dt)
            g_new = -(prec_full.astype(dt) @ d)
            w = lchol_full.T.astype(dt) @ d
            ld = -0.5 * jnp.sum(w * w)
            p_new = p_mid + half * g_new
            ok = jnp.isfinite(ld) & jnp.all(jnp.isfinite(g_new))
            ld = jnp.where(ok | (ld == -jnp.inf), ld, -jnp.inf)
            return PhasePoint(
                Q=EvaluatedPoint(q=q_new, logdensity=ld, grad=g_new), p=p_new
            )
        q_new, p_new, g_new, ld = core(
            z.Q.q, z.p, z.Q.grad, metric.m_inv, eps_signed
        )
        # -inf poisoning, identical to hamiltonian.evaluate
        ok = jnp.isfinite(ld) & jnp.all(jnp.isfinite(g_new))
        ld = jnp.where(ok | (ld == -jnp.inf), ld, -jnp.inf)
        return PhasePoint(
            Q=EvaluatedPoint(q=q_new, logdensity=ld, grad=g_new), p=p_new
        )

    return fused_leapfrog
