"""Residual-targeted re-derivation of the solver iteration caps.

The default budgets (``cg_iters_mg=10``, ``cg_iters_final_mg=6``,
``wls_cg_iters_mg=8``) were selected in round 4 against the random
backbone's closure metric — a quality *proxy* that may miscalibrate the
day real VGG weights appear (VERDICT r04 weak #2).  The reference's
contract is unconditional: PARDISO factorizes the WLS system exactly
(reference: SparseSolver_CPU.cpp:104-286) and the nonlocal CG runs to an
absolute residual target (ColorTransfer.cpp:913-921).  This module makes
the rebuild's contract "bounded, measured distance from the converged
solution" instead of "looks good on the proxy":

  * :func:`residual_curve` — run a capped solver at each candidate cap
    plus a converged reference, returning per-cap residual reductions
    and solution errors;
  * :func:`recommend_cap` — smallest cap meeting a residual-reduction
    target;
  * loaders for captured nonlocal systems (tools/capture_nl.py npz) and
    matcher-free WLS systems built from a demo image.

``tools/retune_caps.py`` drives this end to end and is step 2 of the
weight-arrival procedure (README "When pretrained weights appear");
``tests/test_retune.py`` fences the DEFAULT caps against committed
captured systems so a regression in preconditioner strength (or a
backbone swap that degrades conditioning) fails loudly instead of
silently shipping under-converged coefficient maps.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nct_tpu.config import Config
from nct_tpu.solve.nonlocal_solve import solve_nonlocal
from nct_tpu.solve.wls import solve_wls

# Converged-reference budget: far past every measured knee (the real
# 680 px systems converge to the f32 floor well under 200 mg-PCG
# iterations; tools/wls_convergence.py measured mg reaching 1.5e-1 from
# 6.8e8 at 131 iterations on the WLS L0 system).
CONVERGED_ITERS = 200


def load_nl_system(npz_path: str) -> dict:
    """Load one captured nonlocal system (tools/capture_nl.py layout)."""
    d = np.load(npz_path)
    return {k: d[k] for k in d.files}


def nl_solve_at_cap(system: dict, cap: int, config: Config | None = None):
    """Run the pipeline-shaped nonlocal solve capped at ``cap``.

    Returns (a, b, r2) with r2 the preconditioned-residual norm the CG
    loop tracks.  tol=0 disables the early exit so the cap is exact.
    """
    config = config or Config()
    a, b, _it, r2 = solve_nonlocal(
        jnp.asarray(system["a0"]), jnp.asarray(system["b0"]),
        jnp.asarray(system["src_lab"]), jnp.asarray(system["ref_lab"]),
        jnp.asarray(system["confidence"]),
        jnp.asarray(system["nbr_ids"]), jnp.asarray(system["nbr_w"]),
        float(system["norm_factor"]),
        config.local_weight, config.wls_alpha, config.nonlocal_weight,
        iters=cap, tol=0.0,
        candidates=jnp.asarray(system["candidates"]),
        nbr_slots=jnp.asarray(system["nbr_slots"]),
        precond_kind=config.nl_precond, dynamic=False,
        in_cap=config.nl_in_cap, transpose=config.nl_transpose,
        return_iters=True,
    )
    return np.asarray(a), np.asarray(b), float(r2)


def wls_system_from_image(cnt_bgr: np.ndarray, stl_bgr: np.ndarray,
                          level: int, config: Config | None = None):
    """Build the REAL WLS operator + a distribution-realistic start for a
    demo pair at pyramid ``level`` — matcher-free (the operator depends
    only on the content image and the lam schedule; the start uses
    patch-stat init against the style resized onto the level grid), the
    same construction tools/wls_convergence.py measures."""
    from nct_tpu.models import vgg19
    from nct_tpu.ops.color import bgr_u8_to_lab_u8
    from nct_tpu.ops.resize import resize_bilinear
    from nct_tpu.solve import stats

    config = config or Config()
    h, w = cnt_bgr.shape[:2]
    dims = vgg19.feature_dims(h, w)
    ah, aw = dims[config.vgg_layers()[level]]
    cnt_lab_unit = bgr_u8_to_lab_u8(jnp.asarray(cnt_bgr)
                                    ).astype(jnp.float32) / 255.0
    down_cnt = resize_bilinear(jnp.asarray(cnt_bgr), ah, aw)
    down_stl = resize_bilinear(jnp.asarray(stl_bgr), ah, aw)
    a_d, b_d = stats.init_ab(
        bgr_u8_to_lab_u8(down_cnt), bgr_u8_to_lab_u8(down_stl),
        config.patch_size, config.var_epsilon,
    )
    a_up = resize_bilinear(a_d, h, w)
    b_up = resize_bilinear(b_d, h, w)
    norm_factor = float(h * w) / float(ah * aw)
    lam = config.wls_lambda_init * norm_factor
    if (ah, aw) == (h, w):
        lam *= 4.0
    return a_up, b_up, cnt_lab_unit, lam


def wls_solve_at_cap(system, cap: int, config: Config | None = None):
    """Capped pipeline-shaped WLS solve; returns (a, b, r2)."""
    config = config or Config()
    a_up, b_up, cnt_lab_unit, lam = system
    a, b, _it, r2 = solve_wls(
        a_up, b_up, cnt_lab_unit, lam, config.wls_alpha,
        iters=cap, tol=0.0, dynamic=False, return_iters=True,
        precond_kind=config.wls_precond,
    )
    return np.asarray(a), np.asarray(b), float(r2)


def residual_curve(solve_at_cap, caps,
                   converged_iters: int = CONVERGED_ITERS) -> dict:
    """Measure each cap against the converged solution.

    solve_at_cap: cap -> (a, b, r2).  Returns::

        {"converged": {"iters", "r2"},
         "caps": {cap: {"r2", "reduction", "sol_err"}}}

    ``reduction`` = r2(cap) / r2(cap=0) — the residual-norm-squared
    reduction factor the cap achieves; ``sol_err`` = max-norm error of
    the a-map against the converged solution, relative to the converged
    a-map's max-norm (the coefficient-space distance that showed up as
    garish contrast in the round-3/4 in1 incident).
    """
    _a0, _b0, r2_init = solve_at_cap(0)
    a_star, b_star, r2_star = solve_at_cap(converged_iters)
    scale = max(float(np.abs(a_star).max()), 1e-12)
    out = {
        "converged": {"iters": converged_iters, "r2": r2_star,
                      "r2_init": r2_init},
        "caps": {},
    }
    for cap in caps:
        a, _b, r2 = solve_at_cap(cap)
        out["caps"][int(cap)] = {
            "r2": r2,
            "reduction": r2 / max(r2_init, 1e-300),
            "sol_err": float(np.abs(a - a_star).max()) / scale,
        }
    return out


def recommend_cap(curve: dict, target_reduction: float) -> int | None:
    """Smallest measured cap whose residual reduction meets the target
    (None if none does — raise the sweep)."""
    for cap in sorted(curve["caps"]):
        if curve["caps"][cap]["reduction"] <= target_reduction:
            return cap
    return None
