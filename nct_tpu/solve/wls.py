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

from nct_tpu.solve.cg import cg_solve
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
    """
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
    if return_iters:
        return a, b, n_it, r2
    return a, b


def apply_transform(
    a: jnp.ndarray, b: jnp.ndarray, cnt_lab_unit: jnp.ndarray
) -> jnp.ndarray:
    """out = clamp(a * lab + b, 0, 1) (ref :1436-1449)."""
    return jnp.clip(cnt_lab_unit.astype(jnp.float32) * a + b, 0.0, 1.0)
