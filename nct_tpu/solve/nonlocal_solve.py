"""Non-local + local regularized least-squares on the (a, b) coefficient maps.

Matrix-free TPU reformulation of the reference's down-res solve (reference:
ColorTransfer.cpp:548-949 ``solve_nonlocal_downsample_gpu_gradient`` +
SparseSolver_GPU.cu:3-198): the reference assembles CSR rows for

  * data:      sqrt(w_i * normFactor) * (a_i * s_i + b_i  =  r_i)   (:612-658)
  * local:     g_e * (u_j - u_i) = 0 for each of the 4 neighbour
               directions of every pixel, separately on a and b, with
               g_e = sqrt(lambda_l / (|dL|^alpha + 1e-4)) taken from the
               edge's left/top pixel (:519-546, :661-847) — each undirected
               edge therefore contributes TWO identical rows, i.e. weight
               2*g_e^2 in the normal matrix;
  * nonlocal:  sqrt(w_ij * w_nl / k) * (u_i - u_j) = 0 over the k-NN graph,
               one row per *directed* pair, on a and b (:850-911);

then solves the normal equations A^T A x = A^T b with unpreconditioned CG on
GPU.  Here the operator x -> A^T A x is applied directly as a fused stencil
+ gather/scatter expression — no CSR, no assembly, no host round-trip — and
solved by Jacobi-PCG with the reference's iteration budget (100, or 50 at
the finest level) and tolerance 1e-6.

All three Lab channels share the same normal matrix structure (weights are
channel-independent), so (a, b) carry a trailing channel axis of 3 and the
whole solve runs once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nct_tpu.solve.cg import cg_solve


def gradient_weights(lab_unit_l: jnp.ndarray, lam: float, alpha: float):
    """Edge weights g = sqrt(lam / (|dL|^alpha + 1e-4)) (ref :519-546).

    lab_unit_l: [H, W] luminance in [0, 1].  Returns (gx [H, W], gy [H, W])
    where gx[y, x] weighs edge (x,y)-(x+1,y) (zero on the last column) and
    gy[y, x] weighs edge (x,y)-(x,y+1) (zero on the last row).
    """
    eps = 1e-4
    l = lab_unit_l.astype(jnp.float32)
    dx = jnp.abs(l[:, 1:] - l[:, :-1])
    dy = jnp.abs(l[1:, :] - l[:-1, :])
    gx = jnp.sqrt(lam / (dx ** alpha + eps))
    gy = jnp.sqrt(lam / (dy ** alpha + eps))
    gx = jnp.pad(gx, ((0, 0), (0, 1)))
    gy = jnp.pad(gy, ((0, 1), (0, 0)))
    return gx, gy


def _edge_w(w: jnp.ndarray) -> jnp.ndarray:
    """Edge weights broadcastable against [H, W, C] values: a [H, W]
    map gains a channel axis; a per-channel [H, W, C] map (the
    batch-folded layout, solve_wls_batched) passes through."""
    return w[:, :, None] if w.ndim == 2 else w


def laplacian_apply(u: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray):
    """Graph Laplacian of the 4-neighbour grid with per-edge weights.

    u: [H, W, C]; wx[y, x] weighs edge to (x+1, y); wy to (x, y+1).
    wx/wy may be [H, W] (shared across channels) or [H, W, C]
    (per-channel — the batch-in-channels serving layout).
    Returns sum_j w_ij * (u_i - u_j) at each pixel.
    """
    wx3, wy3 = _edge_w(wx), _edge_w(wy)
    out = jnp.zeros_like(u)
    dxe = (u[:, :-1] - u[:, 1:]) * wx3[:, :-1]
    out = out.at[:, :-1].add(dxe)
    out = out.at[:, 1:].add(-dxe)
    dye = (u[:-1, :] - u[1:, :]) * wy3[:-1, :]
    out = out.at[:-1, :].add(dye)
    out = out.at[1:, :].add(-dye)
    return out


def laplacian_degree(wx: jnp.ndarray, wy: jnp.ndarray):
    """Diagonal of the grid Laplacian: sum of incident edge weights.
    Shape follows the inputs ([H, W] or per-channel [H, W, C])."""
    deg = jnp.zeros_like(wx)
    deg = deg.at[:, :-1].add(wx[:, :-1])
    deg = deg.at[:, 1:].add(wx[:, :-1])
    deg = deg.at[:-1, :].add(wy[:-1, :])
    deg = deg.at[1:, :].add(wy[:-1, :])
    return deg


def nonlocal_apply(
    u: jnp.ndarray, nbr_ids: jnp.ndarray, nbr_w: jnp.ndarray
):
    """k-NN graph Laplacian over directed pairs (ref rows :850-911).

    u: [N, C]; nbr_ids: [N, k] int32; nbr_w: [N, k] per-pair weight
    (already squared, i.e. w_ij * w_nl / k).  Each directed pair (i -> j)
    contributes w*(u_i - u_j) at i and w*(u_j - u_i) at j.
    """
    n, c = u.shape
    k = nbr_ids.shape[1]
    uj = u[nbr_ids]                                  # [N, k, C]
    diff = (u[:, None, :] - uj) * nbr_w[..., None]   # [N, k, C]
    out = jnp.sum(diff, axis=1)
    out = out.at[nbr_ids.reshape(-1)].add(-diff.reshape(n * k, c))
    return out


def nonlocal_degree(nbr_ids: jnp.ndarray, nbr_w: jnp.ndarray, n: int):
    """Diagonal of the directed-pair k-NN Laplacian."""
    deg = jnp.sum(nbr_w, axis=1)
    deg = deg.at[nbr_ids.reshape(-1)].add(nbr_w.reshape(-1))
    return deg


def _coarsen_cellsum(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 cell sum with zero padding to even dims: [H, W, ...] -> [ceil(H/2),
    ceil(W/2), ...]."""
    h, w = x.shape[0], x.shape[1]
    ph, pw = (-h) % 2, (-w) % 2
    x = jnp.pad(x, ((0, ph), (0, pw)) + ((0, 0),) * (x.ndim - 2))
    h2, w2 = (h + ph) // 2, (w + pw) // 2
    x = x.reshape((h2, 2, w2, 2) + x.shape[2:])
    return x.sum(axis=(1, 3))


def _prolong_const(xc: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Piecewise-constant prolongation (adjoint of _coarsen_cellsum)."""
    x = jnp.repeat(jnp.repeat(xc, 2, axis=0), 2, axis=1)
    return x[:h, :w]


def make_mg_preconditioner(
    blk_aa: jnp.ndarray,
    blk_ab: jnp.ndarray,
    blk_bb: jnp.ndarray,
    wx2: jnp.ndarray,
    wy2: jnp.ndarray,
    omega: float = 0.8,
    coarsest: int = 8,
    coarse_sweeps: int = 8,
    max_levels: int = 8,
    barrier: bool = False,
):
    """Geometric-multigrid V-cycle preconditioner for the nonlocal system.

    Approximates the inverse of  M = [[blk_aa, blk_ab], [blk_ab, blk_bb]]
    (per-pixel 2x2 data+degree blocks, [H, W, 3]) + the weighted grid
    Laplacian with edge weights wx2/wy2 applied to a and b independently.
    The k-NN graph term enters only through its degree (folded into the
    diagonal blocks by the caller) — the off-diagonal graph coupling is
    left to the outer CG, which keeps the preconditioner free of gathers.

    Construction keeps symmetry so PCG stays valid: piecewise-constant
    prolongation P, restriction R = (1/4) P^T, Galerkin-exact coarse
    coefficients for that P (cell-summed diagonal blocks scaled by 1/4;
    coarse edge weight = 1/4 of the summed fine edges crossing the coarse
    cell boundary — interior fine edges vanish in P^T L P), and equal
    symmetric damped block-Jacobi sweeps before and after each coarse
    visit.  The V-cycle is therefore a fixed SPD linear operator.

    The reference has no analogue — it buys conditioning with an exact
    direct solver (PARDISO, SparseSolver_CPU.cpp:104-286) and brute-force
    CG iterations on GPU; on TPU the V-cycle is a handful of dense
    stencils, so it replaces ~5-10x the CG iterations at ~0.3x the cost
    of one k-NN gather pass.
    """
    levels = []
    caa, cab, cbb = blk_aa, blk_ab, blk_bb
    cwx, cwy = wx2, wy2
    while True:
        h, w = caa.shape[0], caa.shape[1]
        deg = _edge_w(laplacian_degree(cwx, cwy))
        daa = caa + deg
        dbb = cbb + deg
        inv_det = 1.0 / (daa * dbb - cab * cab)
        levels.append((caa, cab, cbb, cwx, cwy, daa, dbb, inv_det))
        if min(h, w) <= coarsest or len(levels) >= max_levels:
            break
        # Galerkin coefficients for piecewise-constant P (see docstring).
        caa = 0.25 * _coarsen_cellsum(caa)
        cab = 0.25 * _coarsen_cellsum(cab)
        cbb = 0.25 * _coarsen_cellsum(cbb)
        # fine x-edges crossing a coarse column boundary sit at odd x;
        # the two fine rows feeding one coarse row pair-sum along y
        # (and vice versa for y-edges).  Weight maps may carry a
        # trailing channel axis (per-channel weights, _edge_w).
        ph = (-h) % 2
        pw = (-w) % 2
        pad_tail = ((0, 0),) * (cwx.ndim - 2)
        fx = jnp.pad(cwx, ((0, ph), (0, pw)) + pad_tail)[:, 1::2]
        cwx = 0.25 * fx.reshape(
            ((h + ph) // 2, 2) + fx.shape[1:]).sum(axis=1)
        fy = jnp.pad(cwy, ((0, ph), (0, pw)) + pad_tail)[1::2, :]
        cwy = 0.25 * fy.reshape(
            (fy.shape[0], (w + pw) // 2, 2) + fy.shape[2:]).sum(axis=2)

    if barrier:
        # Materialize the coarsening chain before the V-cycle consumes
        # it: the vmapped full-resolution WLS program (batch 4 x 452 px)
        # kernel-faults the relayed TPU worker when XLA fuses the
        # Galerkin hierarchy build into the smoothing sweeps, while the
        # same math with the hierarchy materialized runs fine — the
        # round-4 composition-fault class (see ops/pallas_nn.py and
        # PERFORMANCE.md).  Negligible cost: the hierarchy is built once
        # per solve and is a few full-res arrays.
        levels = jax.lax.optimization_barrier(levels)

    # red/black checkerboard masks per level (the 5-point grid Laplacian
    # is bipartite, so updating one color with the current residual IS an
    # exact Gauss-Seidel half-sweep — far stronger smoothing than damped
    # Jacobi at the same stencil cost, and still branch-free VPU work)
    masks = []
    for (caa, *_rest) in levels:
        h, w = caa.shape[0], caa.shape[1]
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        masks.append((((yy + xx) % 2 == 0).astype(jnp.float32))[..., None])

    def level_apply(lev, xa, xb):
        caa, cab, cbb, cwx, cwy, _, _, _ = levels[lev]
        return (
            caa * xa + cab * xb + laplacian_apply(xa, cwx, cwy),
            cab * xa + cbb * xb + laplacian_apply(xb, cwx, cwy),
        )

    def half_sweep(lev, xa, xb, fa, fb, mask):
        """Exact block-GS update of one checkerboard color."""
        _, cab, _, _, _, daa, dbb, inv_det = levels[lev]
        ma, mb = level_apply(lev, xa, xb)
        ra, rb = fa - ma, fb - mb
        return (
            xa + mask * inv_det * (dbb * ra - cab * rb),
            xb + mask * inv_det * (daa * rb - cab * ra),
        )

    def smooth(lev, xa, xb, fa, fb, reverse):
        m = masks[lev]
        first, second = (1.0 - m, m) if reverse else (m, 1.0 - m)
        xa, xb = half_sweep(lev, xa, xb, fa, fb, first)
        return half_sweep(lev, xa, xb, fa, fb, second)

    def vcycle(lev, fa, fb):
        _, cab, _, _, _, daa, dbb, inv_det = levels[lev]
        if lev == len(levels) - 1:
            xa = jnp.zeros_like(fa)
            xb = jnp.zeros_like(fb)
            for i in range(coarse_sweeps):
                xa, xb = smooth(lev, xa, xb, fa, fb, reverse=bool(i % 2))
            return xa, xb
        # pre-smooth from zero start: red half-sweep degenerates to a
        # masked block solve of f, then the black half-sweep
        m = masks[lev]
        xa = m * inv_det * (dbb * fa - cab * fb)
        xb = m * inv_det * (daa * fb - cab * fa)
        xa, xb = half_sweep(lev, xa, xb, fa, fb, 1.0 - m)
        ma, mb = level_apply(lev, xa, xb)
        rca = 0.25 * _coarsen_cellsum(fa - ma)
        rcb = 0.25 * _coarsen_cellsum(fb - mb)
        ea, eb = vcycle(lev + 1, rca, rcb)
        h, w = fa.shape[0], fa.shape[1]
        xa = xa + _prolong_const(ea, h, w)
        xb = xb + _prolong_const(eb, h, w)
        # post-smooth in reversed color order (adjoint of the pre-smooth,
        # keeping the whole cycle symmetric)
        return smooth(lev, xa, xb, fa, fb, reverse=True)

    def precond(res):
        ra, rb = res
        return vcycle(0, ra, rb)

    return precond


# Pair-axis size above which the in-edge table build computes segment
# ranks via searchsorted instead of associative_scan: the global scan
# over the [N*k] pair axis stalls the remote TPU compile service above
# ~3M pairs (round-3 bisection — the 465x700 L4 graph at 2.6M compiles
# in minutes; 665x1000 at 5.3M never returns), while argsort +
# searchsorted at 5.3M compile in ~40 s and the full tables _solve_nl
# in 70 s (round-4 probes, tools/bisect_nl_compile.py).  Below the
# threshold the scan is kept: it is O(N*k) work at run time vs
# searchsorted's O(N*k log N*k) gather rounds, and it leaves the
# proven sub-3M programs' HLO untouched (compile-cache hits).
_SCAN_MAX_PAIRS = 3_000_000

# Auto-transpose threshold: "tables" at every real size since round 4
# (the searchsorted build above removed the compile stall that round 3's
# transpose="scatter" worked around; the scatter's per-iteration
# unsorted 5.3M-row scatter-add measured ~450 ms — duplicate unsorted
# scatter indices serialize on TPU — making the L4 nonlocal solve the
# single largest cost of the 1000 px run, 2.7 s of 5.8).  The scatter
# path remains the exact-uncapped-operator option and the fallback;
# tests monkeypatch this to 0 to force it through "auto".
_TABLES_MAX_PAIRS = 1 << 62


def make_nonlocal_system(
    src_lab: jnp.ndarray,
    ref_lab: jnp.ndarray,
    confidence: jnp.ndarray,
    nbr_ids: jnp.ndarray,
    nbr_w: jnp.ndarray,
    norm_factor: float | jnp.ndarray,
    local_weight: float = 0.125,
    alpha: float = 1.2,
    nonlocal_weight: float = 2.0,
    candidates: jnp.ndarray | None = None,
    nbr_slots: jnp.ndarray | None = None,
    precond_kind: str = "block_jacobi",
    in_cap: int = 128,
    transpose: str = "auto",
):
    """Build (operator, rhs, preconditioner) for the normal equations.

    Exposed separately so tests can probe the operator against a dense
    A^T A reconstruction of the reference's LS rows.

    precond_kind: "block_jacobi" (exact per-pixel 2x2 inverse) or "mg"
    (multigrid V-cycle over the data+local part, see
    make_mg_preconditioner — far fewer CG iterations on the
    Laplacian-dominated fine levels).

    in_cap: per-target in-edge cap when candidates/nbr_slots are given
    (see the transpose-table comment below).

    transpose: how the W^T half of the graph Laplacian is applied.
      "tables"  — precomputed fixed-width in-edge tables (gather-only CG
                  iterations; edges beyond in_cap dropped symmetrically).
      "scatter" — per-iteration scatter-add of each directed edge to its
                  target (nonlocal_apply's schedule).  NO edge capping —
                  the exact uncapped operator — at ~the cost of one
                  unsorted [N*k]-row scatter per iteration.  Exists
                  because the table build's global sort-and-rank chain
                  over the [N*k] pair axis stalls the remote TPU compile
                  service above ~3M pairs (>=1000 px-class L4; round-3
                  bisection, tools/bisect_nl_compile.py) while scatters
                  at the same shape compile in seconds.
      "auto"    — "tables" below _TABLES_MAX_PAIRS pairs, else "scatter".
    """
    h, w, _ = src_lab.shape
    n = h * w
    s = src_lab.astype(jnp.float32)
    r = ref_lab.astype(jnp.float32)
    d2 = (confidence.astype(jnp.float32) * jnp.float32(norm_factor))[..., None]

    gx, gy = gradient_weights(s[..., 0], local_weight, alpha)
    gx2, gy2 = gx * gx, gy * gy

    k = nbr_ids.shape[1]
    pair_w = nbr_w.astype(jnp.float32) * (nonlocal_weight / k)

    # Gather-only symmetric apply.  Scatter-adds dominate the CG iteration
    # on TPU even with sorted indices, so the directed-pair transpose is
    # precomputed ONCE as fixed-width in-edge tables listing each target's
    # incoming (source pixel, weight) pairs; overflow beyond the cap is
    # zeroed on BOTH sides, keeping the operator symmetric PSD.  Every CG
    # iteration is then pure weighted-sum gathers against u — no scatters,
    # no [N*k]-row intermediate table (gather latency grows with the
    # source table's row count, so gathering u [N] beats gathering a diff
    # table [N*k]).
    #
    # The tables are keyed by CANDIDATE SLOT when the graph came from a
    # candidate table (the pipeline path): every directed pair targets a
    # candidate pixel by construction, so pixel-keyed tables would spend
    # N rows on targets of which only K*M can ever be hit — at 700 px
    # that is ~15x the gather rows AND an in-degree cap of 2k per pixel
    # where the average in-degree per *candidate* is ~N*k/(K*M) ~ 120,
    # silently dropping most of the graph (round-1 VERDICT weak #4).
    # Slot-keyed tables hold in_cap entries per slot, keeping the
    # STRONGEST edges under the cap (sort key slot*16 - w; weights are
    # bounded by e^1), and resolve to pixels with one sorted build-time
    # scatter of the K*M candidate ids.
    if transpose == "auto":
        transpose = (
            "scatter" if n * k > _TABLES_MAX_PAIRS else "tables"
        )
    use_slots = candidates is not None and nbr_slots is not None
    if transpose == "scatter":
        # Exact uncapped W^T via per-iteration scatter-add (see docstring).
        out_deg = jnp.sum(pair_w, axis=1)
        in_deg = jnp.zeros((n,), jnp.float32).at[
            nbr_ids.reshape(-1)
        ].add(pair_w.reshape(-1))
        both_deg_sc = (out_deg + in_deg)[:, None]
        if use_slots:
            cand_flat = candidates.reshape(-1).astype(jnp.int32)

        def nl_apply_scatter(u):
            if use_slots:
                uj = u[cand_flat][nbr_slots]               # [N, k, C]
            else:
                uj = u[nbr_ids]
            wu = pair_w[..., None] * uj
            out_sum = jnp.sum(wu, axis=1)
            # each directed edge also deposits w*u_source at its target
            src_c = pair_w[..., None] * u[:, None, :]      # [N, k, C]
            in_sum = jnp.zeros_like(u).at[nbr_ids.reshape(-1)].add(
                src_c.reshape(n * k, -1)
            )
            return both_deg_sc * u - out_sum - in_sum

        nl_apply = nl_apply_scatter
    elif use_slots:
        cand_flat = candidates.reshape(-1).astype(jnp.int32)
        n_slots = cand_flat.shape[0]
        # table width scales with the MEAN in-degree n*k/S (x1.5 headroom
        # for hubs, which additionally keep their strongest edges first);
        # a fixed width would waste gather rows wherever images are small
        # relative to the candidate table.
        mean_in = -(-(n * k) // n_slots)
        if in_cap >= n * k:
            # ample cap = exactness requested: no hub can overflow a
            # width of n*k, so the operator equals the dense A^T A
            # (the contract tests/test_solvers.py probes)
            in_max = n * k
        else:
            # The configured cap must never clamp below the mean
            # in-degree: at the MAX_SIZE L4 geometry (5.3M pairs over
            # ~20k slots, mean_in ~260 > nl_in_cap 128) a hard clamp
            # silently zeroes roughly half the nonlocal edges (ADVICE
            # r04).  Keep the 3*mean_in/2 hub headroom as the width and
            # let in_cap bound it only from above the headroom.
            headroom = (3 * mean_in + 1) // 2
            eff_cap = max(in_cap, headroom)
            in_max = min(max(8, headroom), eff_cap, n * k)
            if eff_cap > in_cap:
                from nct_tpu.utils import glog
                glog.warning(
                    f"nonlocal in-edge tables: 1.5x-mean headroom "
                    f"{headroom} (mean in-degree {mean_in}, "
                    f"pairs={n * k}, slots={n_slots}) exceeds the "
                    f"configured cap {in_cap}; widening tables to "
                    f"{in_max} so only hub overflow beyond 1.5x the "
                    f"mean is dropped")
        flat_t = nbr_slots.reshape(-1).astype(jnp.int32)  # pair -> slot
        sort_key = flat_t.astype(jnp.float32) * 16.0 - jnp.clip(
            pair_w.reshape(-1), 0.0, 15.0
        )
        n_targets = n_slots
    else:
        in_max = min(2 * k, n * k)
        flat_t = nbr_ids.reshape(-1)                   # pair -> target pixel
        sort_key = flat_t
        n_targets = n

    if transpose != "scatter":
        order = jnp.argsort(sort_key)
        sorted_t = flat_t[order]
        # rank of each pair within its target segment (sorted order).
        # seg_first via searchsorted — the first occurrence index of each
        # target in the (non-decreasing) sorted_t — NOT an
        # associative_scan: the scan over the [N*k] pair axis is the one
        # op the remote TPU compile service never returns on above ~3M
        # pairs (round-3 bisection), while argsort+searchsorted at 5.3M
        # compile in ~40 s (round-4 probes, tools/bisect_nl_compile.py).
        pos = jnp.arange(n * k, dtype=jnp.int32)
        if n * k > _SCAN_MAX_PAIRS:
            # first-occurrence index per TARGET, not per pair: the target
            # universe (n_targets ~ 20k slots) is tiny next to the pair
            # axis, so binary-search it once and gather — one [n_targets]
            # searchsorted + one [N*k]-row gather instead of 5.3M binary
            # searches.
            offsets = jnp.searchsorted(
                sorted_t, jnp.arange(n_targets, dtype=sorted_t.dtype),
                side="left",
            ).astype(jnp.int32)
            seg_first = offsets[sorted_t]
        else:
            is_start = jnp.concatenate(
                [jnp.ones((1,), bool), sorted_t[1:] != sorted_t[:-1]]
            )
            seg_first = jax.lax.associative_scan(
                jnp.maximum, jnp.where(is_start, pos, 0)
            )
        rank = pos - seg_first
        keep = rank < in_max
        # in_tab[t, r] = pair slot (into the flat pair axis) or sentinel
        # n*k.  Kept (target, rank) pairs are unique; dropped pairs write
        # the sentinel so a .min scatter keeps whatever real slot lands
        # there.
        in_tab = jnp.full((n_targets, in_max), n * k, dtype=jnp.int32)
        in_tab = in_tab.at[
            jnp.where(keep, sorted_t, n_targets - 1),
            jnp.where(keep, rank, in_max - 1),
        ].min(jnp.where(keep, order, n * k).astype(jnp.int32))
        # zero overflowed pairs on the out side too (symmetry); `order`
        # is a permutation, so the scatter rows are unique — without the
        # hint TPU scatters assume possible duplicates and serialize
        keep_by_pair = jnp.zeros((n * k,), bool).at[order].set(
            keep, unique_indices=True
        )
        pair_w = jnp.where(keep_by_pair.reshape(n, k), pair_w, 0.0)
        pair_w_flat = pair_w.reshape(n * k)

        # Resolve pair slots to (source pixel, weight); sentinel -> (0, 0).
        valid = in_tab < n * k
        in_tab_c = jnp.minimum(in_tab, n * k - 1)
        in_src = jnp.where(valid, (in_tab_c // k).astype(jnp.int32), 0)
        in_w = jnp.where(valid, pair_w_flat[in_tab_c], 0.0)
        out_deg = jnp.sum(pair_w, axis=1)              # [N]
        if use_slots:
            # scatter the per-slot tables' sums back to pixel space once
            # at build time (slot -> pixel is cand_flat); the
            # per-iteration in-sum reuses the same sorted order.
            cs_order = jnp.argsort(cand_flat)
            cs_ids = cand_flat[cs_order]
            in_deg = jnp.zeros((n,), jnp.float32).at[cs_ids].add(
                jnp.sum(in_w, axis=1)[cs_order],
                indices_are_sorted=True, unique_indices=False,
            )
        else:
            in_deg = jnp.sum(in_w, axis=1)             # [N]
        both_deg = (out_deg + in_deg)[:, None]

        def nl_apply(u):
            """u: [N, C] -> sum_j w_ij (u_i - u_j), both edge directions."""
            if use_slots:
                # two-hop gather through the small candidate table: 20k-row
                # tables gather ~3x faster than the 300k-row pixel table
                u_cand = u[cand_flat]                      # [K*M, C]
                uj = u_cand[nbr_slots]                     # [N, k, C]
                out_sum = jnp.sum(pair_w[..., None] * uj, axis=1)
                in_sum_c = jnp.sum(in_w[..., None] * u[in_src], axis=1)
                in_sum = jnp.zeros_like(u).at[cs_ids].add(
                    in_sum_c[cs_order],
                    indices_are_sorted=True, unique_indices=False,
                )
            else:
                uj = u[nbr_ids]                            # [N, k, C]
                out_sum = jnp.sum(pair_w[..., None] * uj, axis=1)
                in_sum = jnp.sum(in_w[..., None] * u[in_src], axis=1)
            return both_deg * u - out_sum - in_sum

    def operator(x):
        a, b = x
        lin = s * a + b
        data_a = d2 * s * lin
        data_b = d2 * lin
        # local rows appear twice per edge -> factor 2 (see module docstring)
        loc_a = 2.0 * laplacian_apply(a, gx2, gy2)
        loc_b = 2.0 * laplacian_apply(b, gx2, gy2)
        # one 6-channel graph apply: a and b share indices, so stacking
        # halves the gather count per CG iteration
        ab = jnp.concatenate(
            [a.reshape(n, 3), b.reshape(n, 3)], axis=1
        )
        nl = nl_apply(ab)
        nl_a = nl[:, :3].reshape(h, w, 3)
        nl_b = nl[:, 3:].reshape(h, w, 3)
        return (data_a + loc_a + nl_a, data_b + loc_b + nl_b)

    rhs = (d2 * s * r, d2 * r)

    # 2x2 block-Jacobi preconditioner: the data rows couple (a_i, b_i) as
    # d2*[[s^2, s],[s, 1]], and the Laplacians only add to the diagonal, so
    # the exact per-(pixel,channel) 2x2 block inverse is cheap and much
    # tighter than plain Jacobi on this system.
    deg_nl = nonlocal_degree(nbr_ids, pair_w, n).reshape(h, w)[..., None]
    if precond_kind == "mg":
        # data blocks + k-NN degree on the diagonal; the doubled local
        # Laplacian is carried as explicit edge weights in the hierarchy
        precond = make_mg_preconditioner(
            d2 * s * s + deg_nl, d2 * s, d2 + deg_nl,
            2.0 * gx2, 2.0 * gy2,
        )
        return operator, rhs, precond

    deg = 2.0 * laplacian_degree(gx2, gy2)[..., None] + deg_nl
    blk_aa = d2 * s * s + deg
    blk_bb = d2 + deg
    blk_ab = d2 * s
    inv_det = 1.0 / (blk_aa * blk_bb - blk_ab * blk_ab)

    def precond(res):
        ra, rb = res
        return (
            inv_det * (blk_bb * ra - blk_ab * rb),
            inv_det * (blk_aa * rb - blk_ab * ra),
        )

    return operator, rhs, precond


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "precond_kind", "dynamic", "in_cap", "transpose",
        "return_iters",
    ),
)
def solve_nonlocal(
    a0: jnp.ndarray,
    b0: jnp.ndarray,
    src_lab: jnp.ndarray,
    ref_lab: jnp.ndarray,
    confidence: jnp.ndarray,
    nbr_ids: jnp.ndarray,
    nbr_w: jnp.ndarray,
    norm_factor: float | jnp.ndarray,
    local_weight: float = 0.125,
    alpha: float = 1.2,
    nonlocal_weight: float = 2.0,
    iters: int = 100,
    tol: float = 1e-6,
    candidates: jnp.ndarray | None = None,
    nbr_slots: jnp.ndarray | None = None,
    precond_kind: str = "block_jacobi",
    dynamic: bool = True,
    in_cap: int = 128,
    transpose: str = "auto",
    return_iters: bool = False,
):
    """Solve for regularized (a, b) at down-res.  Returns (a, b) [H, W, 3].

    src_lab/ref_lab: [H, W, 3] unit-domain Lab (content, BDS guidance);
    confidence: [H, W] data weight m_weight; norm_factor = fullArea /
    downArea (the dWeight of ref :1369).  candidates/nbr_slots (from
    knn_graph) enable the fast small-table out-gather.

    ``return_iters=True`` appends (iterations run, final ||r||^2) — the
    convergence diagnostic behind the per-level budgets (PERFORMANCE.md).
    """
    operator, rhs, precond = make_nonlocal_system(
        src_lab, ref_lab, confidence, nbr_ids, nbr_w, norm_factor,
        local_weight, alpha, nonlocal_weight, candidates, nbr_slots,
        precond_kind, in_cap, transpose,
    )
    (a, b), r2, n_it = cg_solve(
        operator, rhs, (a0.astype(jnp.float32), b0.astype(jnp.float32)),
        iters=iters, tol=tol, preconditioner=precond, dynamic=dynamic,
        return_info=True,
    )
    if return_iters:
        return a, b, n_it, r2
    return a, b
