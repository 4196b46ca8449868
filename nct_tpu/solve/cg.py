"""Fixed-trip-count (preconditioned) conjugate gradient.

Replaces both of the reference's linear-algebra backends — the cuSPARSE CG
(reference: SparseSolver_GPU.cu:3-198, Golub & Van Loan 10.2.6 without
preconditioning) and the MKL PARDISO direct solver (SparseSolver_CPU.cpp:
104-286) — with one matrix-free PCG whose operator is a fused XLA
computation (stencil + gather/scatter), so no CSR assembly or host<->device
crossing exists at all.

The loop is a ``lax.scan`` with a *fixed* iteration count (XLA-friendly;
the reference also fixes iters at 50/100) and convergence masking: once
``||r||^2 <= tol^2 * ||b||^2`` every later update is a no-op, which
reproduces the early-exit semantics deterministically.

Operands are pytrees (matching ``jax.scipy.sparse.linalg.cg``'s contract),
letting callers stack (a, b) unknown fields without flattening.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def _dot(x, y):
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda a, b: jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32)),
            x, y,
        )
    )
    return functools.reduce(jnp.add, leaves)


def _axpy(alpha, x, y):
    """y + alpha * x over pytrees."""
    return jax.tree_util.tree_map(lambda xi, yi: yi + alpha * xi, x, y)


def cg_solve(
    operator: Callable,
    b,
    x0,
    iters: int,
    tol: float = 1e-6,
    preconditioner: Callable | None = None,
    dynamic: bool = True,
    return_info: bool = False,
):
    """Solve operator(x) = b.  Returns (x, final ||r||^2).

    operator/preconditioner: pytree -> pytree linear maps (operator must be
    SPD, preconditioner an approximation of its inverse).

    ``dynamic=True`` runs a ``lax.while_loop`` that genuinely stops at
    convergence (``||r||^2 <= tol^2 ||b||^2``) or at ``iters`` — the
    reference CG also early-exits (SparseSolver_GPU.cu:119-159).
    ``dynamic=False`` uses a fixed-trip ``lax.scan`` with masked updates
    (identical result, deterministic cost — useful under reverse-mode AD,
    which cannot differentiate through while_loop).

    ``return_info=True`` additionally returns the number of iterations
    actually run (the while_loop's trip count, or the count of live scan
    steps) — the conditioning diagnostic behind the per-level budgets.
    """
    if preconditioner is None:
        preconditioner = lambda r: r  # noqa: E731

    r0 = jax.tree_util.tree_map(
        lambda bi, axi: bi - axi, b, operator(x0)
    )
    z0 = preconditioner(r0)
    rz0 = _dot(r0, z0)
    b_norm2 = _dot(b, b)
    threshold = jnp.asarray(tol, jnp.float32) ** 2 * b_norm2

    def step(x, r, p, rz):
        ap = operator(p)
        pap = _dot(p, ap)
        alpha = rz / jnp.where(pap != 0.0, pap, 1.0)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, ap, r)
        z = preconditioner(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(rz != 0.0, rz, 1.0)
        p = jax.tree_util.tree_map(lambda zi, pi: zi + beta * pi, z, p)
        return x, r, p, rz_new

    if dynamic:
        def cond(state):
            i, x, r, p, rz = state
            return (i < iters) & (_dot(r, r) > threshold)

        def body(state):
            i, x, r, p, rz = state
            x, r, p, rz = step(x, r, p, rz)
            return (i + 1, x, r, p, rz)

        n_it, x, r, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x0, r0, z0, rz0)
        )
        if return_info:
            return x, _dot(r, r), n_it
        return x, _dot(r, r)

    def scan_body(state, _):
        x, r, p, rz, n_it = state
        live = _dot(r, r) > threshold
        xn, rn, pn, rzn = step(x, r, p, rz)
        sel = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda a_, b_: jnp.where(live, a_, b_), new, old
        )
        return (sel(xn, x), sel(rn, r), sel(pn, p),
                jnp.where(live, rzn, rz),
                n_it + live.astype(jnp.int32)), None

    state0 = (x0, r0, z0, rz0, jnp.int32(0))
    (x, r, _, _, n_it), _ = jax.lax.scan(scan_body, state0, None, length=iters)
    if return_info:
        return x, _dot(r, r), n_it
    return x, _dot(r, r)


def _dot_grouped(x, y, groups: int):
    """Per-group dot: every leaf's trailing axis is [groups * m]; reduce
    everything except the group factor.  Returns [groups]."""
    def leaf(a, b):
        prod = a.astype(jnp.float32) * b.astype(jnp.float32)
        m = prod.shape[-1] // groups
        r = prod.reshape(prod.shape[:-1] + (groups, m))
        axes = tuple(i for i in range(r.ndim) if i != r.ndim - 2)
        return r.sum(axis=axes)

    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(leaf, x, y))
    return functools.reduce(jnp.add, leaves)


def cg_solve_grouped(
    operator: Callable,
    b,
    x0,
    iters: int,
    groups: int,
    tol: float = 1e-6,
    preconditioner: Callable | None = None,
):
    """PCG over ``groups`` INDEPENDENT systems folded into the trailing
    axis of every leaf (leaf shape [..., groups * m]).

    The operator must be block-diagonal across groups (no trailing-axis
    mixing); alpha/beta are then computed PER GROUP, so each group runs
    its own exact CG — bitwise the per-system iteration up to reduction
    order — while the arithmetic executes as one wide fused program.
    This is the batch-in-channels serving path (solve_wls's custom-vmap
    rule): B narrow [H, W, 3] stencil programs become one [H, W, B*3]
    program whose marginal batch cost is lane occupancy, not dispatches.

    Fixed-trip scan with per-group convergence masking (the vmapped
    while_loop would serialize the batch on its slowest member).
    Returns (x, r2 [groups], n_it [groups]).
    """
    if preconditioner is None:
        preconditioner = lambda r: r  # noqa: E731

    def expand(v, leaf):
        """[groups] -> broadcastable against leaf's trailing axis."""
        m = leaf.shape[-1] // groups
        return jnp.repeat(v, m)

    def gaxpy(alpha, x_, y_):
        return jax.tree_util.tree_map(
            lambda xi, yi: yi + expand(alpha, xi) * xi, x_, y_)

    r0 = jax.tree_util.tree_map(
        lambda bi, axi: bi - axi, b, operator(x0))
    z0 = preconditioner(r0)
    rz0 = _dot_grouped(r0, z0, groups)
    b_norm2 = _dot_grouped(b, b, groups)
    threshold = jnp.asarray(tol, jnp.float32) ** 2 * b_norm2

    def step(x, r, p, rz):
        ap = operator(p)
        pap = _dot_grouped(p, ap, groups)
        alpha = rz / jnp.where(pap != 0.0, pap, 1.0)
        x = gaxpy(alpha, p, x)
        r = gaxpy(-alpha, ap, r)
        z = preconditioner(r)
        rz_new = _dot_grouped(r, z, groups)
        beta = rz_new / jnp.where(rz != 0.0, rz, 1.0)
        p = jax.tree_util.tree_map(
            lambda zi, pi: zi + expand(beta, zi) * pi, z, p)
        return x, r, p, rz_new

    def scan_body(state, _):
        x, r, p, rz, n_it = state
        live = _dot_grouped(r, r, groups) > threshold          # [G]
        xn, rn, pn, rzn = step(x, r, p, rz)
        sel = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda a_, b_: jnp.where(expand(live, a_), a_, b_), new, old
        )
        return (sel(xn, x), sel(rn, r), sel(pn, p),
                jnp.where(live, rzn, rz),
                n_it + live.astype(jnp.int32)), None

    state0 = (x0, r0, z0, rz0, jnp.zeros((groups,), jnp.int32))
    (x, r, _, _, n_it), _ = jax.lax.scan(
        scan_body, state0, None, length=iters)
    return x, _dot_grouped(r, r, groups), n_it
