"""Pytree utilities: frozen dataclasses registered with JAX, masked selects.

The reference implements its sampler state as small immutable Julia structs
(e.g. ``PhasePoint``, /root/reference/src/hamiltonian.jl:225-234). The TPU-native
equivalent is frozen dataclasses registered as pytrees so that every piece of
sampler state flows through ``jit``/``vmap``/``lax`` transparently.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def pytree_dataclass(cls=None, *, static=()):
    """Register a frozen dataclass as a JAX pytree.

    Fields listed in ``static`` are treated as auxiliary (hashable, compile-time)
    data; everything else is a traced leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        fields = [f.name for f in dataclasses.fields(c)]
        data = tuple(f for f in fields if f not in static)
        jax.tree_util.register_dataclass(
            c, data_fields=list(data), meta_fields=list(static)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def tree_where(pred, a, b):
    """``jnp.where`` broadcast over two pytrees with identical structure.

    ``pred`` must be a scalar (or broadcastable) boolean. Used for masked
    state updates inside ``lax.while_loop`` bodies, replacing the reference's
    early ``return``s (e.g. /root/reference/src/trees.jl:244,250,255) which do
    not exist under XLA tracing.
    """
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def tree_index(tree, i):
    """Read index ``i`` (possibly traced) of the leading axis of every leaf."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_index_in_dim(x, i, axis=0, keepdims=False), tree
    )


def tree_update_index(tree, i, value):
    """Write ``value`` at index ``i`` of the leading axis of every leaf."""
    return jax.tree_util.tree_map(
        lambda x, v: jax.lax.dynamic_update_index_in_dim(
            x, v.astype(x.dtype) if hasattr(v, "astype") else v, i, axis=0
        ),
        tree,
        value,
    )


def tree_select_level(tree, level, n_levels: int):
    """Read slot ``level`` of a fixed-size stack via masked selects.

    Equivalent to ``tree_index`` but lowers to dense vector ops instead of a
    gather: under ``vmap`` the per-lane ``level`` turns dynamic indexing into
    a scatter/gather, which is a slow path on TPU; an explicit select over the
    (small, static) level axis keeps the tree hot loop on the VPU.
    """

    def read(x):
        out = x[0]
        for l in range(1, n_levels):
            out = jnp.where(level == l, x[l], out)
        return out

    return jax.tree_util.tree_map(read, tree)


def tree_update_level(tree, level, value, n_levels: int):
    """Write ``value`` into stack slot ``level`` via masked selects (see
    :func:`tree_select_level`)."""

    def write(x, v):
        v = v.astype(x.dtype) if hasattr(v, "astype") else v
        rows = [jnp.where(level == l, v, x[l]) for l in range(n_levels)]
        return jnp.stack(rows, axis=0)

    return jax.tree_util.tree_map(write, tree, value)
