"""Edge-aware WLS smoothing of the upsampled (a, b) coefficient maps.

TPU-native replacement for the reference's full-resolution direct solve
(reference: ColorTransfer.cpp:951-1125 ``solve_WLS_roughness_cpu`` + MKL
PARDISO, SparseSolver_CPU.cpp:104-286): the normal matrix there is assembled
explicitly as

    N = diag(roughness) + L,   L = 5-point Laplacian with edge weight
    g_e^2 = lamda / (|dL|^alpha + 1e-4)      (:1045-1070, :519-546)

with right-hand sides roughness * {a, b} per Lab channel (6 RHS) and solved
by a sparse Cholesky-type factorization.  Because XLA has no sparse direct
solver (and factorization would serialize badly on TPU anyway), we solve the
same SPD system with Jacobi-preconditioned CG started from the bilinear-
upsampled coefficients — an excellent initial guess, since the WLS solution
deviates from it only near gamut-clipped (roughness = 1e-6) or high-contrast
regions.  Fidelity is validated end-to-end by SSIM against the reference's
golden outputs (SURVEY §7 risk list).

The roughness gate (ref :457-490): a pixel keeps data weight 1.0 only if the
transformed colour a*src+b stays inside [0, 1] in every channel, else 1e-6 —
freeing the solver to inpaint out-of-gamut coefficients from their
neighbourhood.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nct_tpu.solve.cg import cg_solve, cg_solve_grouped
from nct_tpu.solve.nonlocal_solve import (
    gradient_weights,
    laplacian_apply,
    laplacian_degree,
    make_mg_preconditioner,
)


def roughness_gate(
    a_up: jnp.ndarray, b_up: jnp.ndarray, cnt_lab_unit: jnp.ndarray
) -> jnp.ndarray:
    """Data-weight gate: 1.0 if a*src+b stays in [0,1] per channel else 1e-6
    (ref upsample_color_coefficients_bilinear :466-489; note the reference
    overwrites the flag per channel, so the LAST channel — Lab b — decides)."""
    nc = cnt_lab_unit.astype(jnp.float32) * a_up + b_up
    last = nc[..., 2]
    ok = (last >= 0.0) & (last <= 1.0)
    return jnp.where(ok, 1.0, 1e-6)


def _solve_wls_single(
    a_up, b_up, cnt_lab_unit, lam,
    alpha, iters, tol, dynamic, precond_kind,
):
    """The unbatched solve body (see solve_wls)."""
    rough = roughness_gate(a_up, b_up, cnt_lab_unit)[..., None]
    gx, gy = gradient_weights(cnt_lab_unit[..., 0], 1.0, alpha)
    # gradient_weights returns sqrt(lam/(.)); fold the true lam in squared.
    gx2 = gx * gx * jnp.float32(lam)
    gy2 = gy * gy * jnp.float32(lam)

    def operator(x):
        a, b = x
        return (
            rough * a + laplacian_apply(a, gx2, gy2),
            rough * b + laplacian_apply(b, gx2, gy2),
        )

    a0 = a_up.astype(jnp.float32)
    b0 = b_up.astype(jnp.float32)
    rhs = (rough * a0, rough * b0)

    if precond_kind == "mg":
        zero = jnp.zeros_like(rough)
        precond = make_mg_preconditioner(
            rough, zero, rough, gx2, gy2, barrier=True
        )
    else:
        diag = (rough[..., 0] + laplacian_degree(gx2, gy2))[..., None]

        def precond(res):
            ra, rb = res
            return (ra / diag, rb / diag)

    (a, b), r2, n_it = cg_solve(
        operator, rhs, (a0, b0), iters=iters, tol=tol,
        preconditioner=precond, dynamic=dynamic, return_info=True,
    )
    return a, b, n_it, r2


def _solve_wls_folded(
    a_up, b_up, cnt_lab_unit, lam,
    alpha, iters, tol, precond_kind,
):
    """Batch-in-channels WLS: [B, H, W, 3] operands fold to [H, W, B*3].

    The WLS system is block-diagonal across pairs AND has no gathers, so
    a batch of B narrow-channel stencil programs (the vmap lowering —
    measured 1.92x per-item cost at batch 4, the round-4 worst serving
    scaler) collapses into ONE wide-channel program: every stencil /
    V-cycle op does B times the arithmetic per op at the same op count,
    and grouped-dot CG (cg_solve_grouped) keeps each pair's exact
    per-pair alpha/beta — the iterate equals the unbatched solve's up to
    reduction order.  Per-pair edge weights ride the per-channel weight
    support in laplacian_apply/make_mg_preconditioner.
    """
    bsz, h, w, _ = a_up.shape

    def fold(x):
        return jnp.moveaxis(x.astype(jnp.float32), 0, 2
                            ).reshape(h, w, bsz * 3)

    def unfold(x):
        return jnp.moveaxis(x.reshape(h, w, bsz, 3), 2, 0)

    a0 = fold(a_up)
    b0 = fold(b_up)
    cntf = fold(cnt_lab_unit)
    # roughness gate per pair: the LAST channel of each pair's predicted
    # color decides (reference last-channel-wins quirk, roughness_gate)
    nc = cntf * a0 + b0
    last = nc.reshape(h, w, bsz, 3)[..., 2]
    rough = jnp.repeat(
        jnp.where((last >= 0.0) & (last <= 1.0), 1.0, 1e-6), 3, axis=2)
    # per-pair gradient weights, folded to per-channel [H, W, B*3]
    gx, gy = jax.vmap(
        lambda l: gradient_weights(l, 1.0, alpha)
    )(cnt_lab_unit[..., 0].astype(jnp.float32))
    gxk = jnp.repeat(jnp.moveaxis(gx, 0, 2), 3, axis=2)
    gyk = jnp.repeat(jnp.moveaxis(gy, 0, 2), 3, axis=2)
    lam_arr = jnp.asarray(lam, jnp.float32)
    lam_k = (jnp.repeat(lam_arr, 3) if lam_arr.ndim == 1 else lam_arr)
    gx2 = gxk * gxk * lam_k
    gy2 = gyk * gyk * lam_k

    def operator(x):
        a, b = x
        return (
            rough * a + laplacian_apply(a, gx2, gy2),
            rough * b + laplacian_apply(b, gx2, gy2),
        )

    rhs = (rough * a0, rough * b0)
    if precond_kind == "mg":
        zero = jnp.zeros_like(rough)
        precond = make_mg_preconditioner(
            rough, zero, rough, gx2, gy2, barrier=True)
    else:
        diag = rough + laplacian_degree(gx2, gy2)

        def precond(res):
            ra, rb = res
            return (ra / diag, rb / diag)

    (a, b), r2, n_it = cg_solve_grouped(
        operator, rhs, (a0, b0), iters=iters, groups=bsz, tol=tol,
        preconditioner=precond,
    )
    return unfold(a), unfold(b), n_it, r2


@functools.lru_cache(maxsize=None)
def _wls_custom_vmap(iters, dynamic, precond_kind):
    """A custom_vmap-wrapped solve for one static-knob combination:
    unbatched calls run the proven single program; a vmapped call folds
    the batch into channels instead of lowering B-wide stencils.
    lam/alpha/tol ride as traced operands (callers share one compile
    across tol sweeps, tools/wls_convergence.py)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(a_up, b_up, cnt_lab_unit, lam, alpha, tol):
        return _solve_wls_single(
            a_up, b_up, cnt_lab_unit, lam,
            alpha, iters, tol, dynamic, precond_kind)

    @f.def_vmap
    def _rule(axis_size, in_batched, a_up, b_up, cnt_lab_unit, lam,
              alpha, tol):
        ab, bb, cb = in_batched[:3]

        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        # alpha/tol are per-call scalars; a batched alpha/tol would mean
        # per-pair exponents, which the folded build does not support —
        # take pair 0's (serving buckets share the config scalars)
        alpha_s = alpha[0] if in_batched[4] else alpha
        tol_s = tol[0] if in_batched[5] else tol
        a, b, n_it, r2 = _solve_wls_folded(
            bcast(a_up, ab), bcast(b_up, bb), bcast(cnt_lab_unit, cb),
            lam if not in_batched[3] else jnp.asarray(lam),
            alpha_s, iters, tol_s, precond_kind)
        return (a, b, n_it, r2), (True, True, True, True)

    return f


@functools.partial(
    jax.jit,
    static_argnames=("iters", "dynamic", "return_iters", "precond_kind"),
)
def solve_wls(
    a_up: jnp.ndarray,
    b_up: jnp.ndarray,
    cnt_lab_unit: jnp.ndarray,
    lam: float | jnp.ndarray,
    alpha: float = 1.2,
    iters: int = 400,
    tol: float = 1e-6,
    dynamic: bool = True,
    return_iters: bool = False,
    precond_kind: str = "mg",
):
    """Smooth (a, b) maps at full resolution.  Returns (a, b) [H, W, 3].

    cnt_lab_unit: [H, W, 3] the ORIGINAL full-res content Lab in [0, 1]
    (the reference's m_cntLabD, fixed across levels); lam already includes
    the normFactor scaling (and the x4 final-level boost, ref :1418-1424).

    precond_kind: "mg" (default) = the same geometric-multigrid V-cycle
    used by the nonlocal solve, applied with zero cross-blocks (the WLS
    normal matrix couples nothing across a/b or channels).  The coarse
    levels' systems are strongly Laplacian-dominated (lam scales with
    fullArea/downArea, ref :1359-1361), where plain Jacobi-PCG burns its
    whole 200-iteration budget without reaching tolerance — the V-cycle
    reaches a LOWER residual in ~1/20 the iterations (tools/
    wls_convergence.py table in PERFORMANCE.md).  "jacobi" = the diagonal
    preconditioner (round-1 behaviour, kept for comparison).

    Under ``jax.vmap`` (the multi-chip serving program) the solve does
    NOT lower as B parallel narrow-channel programs: a custom batching
    rule folds the batch into the channel axis and runs grouped-dot CG
    (see _solve_wls_folded) — same per-pair math, ~flat marginal cost.
    """
    a, b, n_it, r2 = _wls_custom_vmap(
        int(iters), bool(dynamic), str(precond_kind),
    )(a_up, b_up, cnt_lab_unit, jnp.asarray(lam, jnp.float32),
      jnp.asarray(alpha, jnp.float32), jnp.asarray(tol, jnp.float32))
    if return_iters:
        return a, b, n_it, r2
    return a, b


def apply_transform(
    a: jnp.ndarray, b: jnp.ndarray, cnt_lab_unit: jnp.ndarray
) -> jnp.ndarray:
    """out = clamp(a * lab + b, 0, 1) (ref :1436-1449)."""
    return jnp.clip(cnt_lab_unit.astype(jnp.float32) * a + b, 0.0, 1.0)
