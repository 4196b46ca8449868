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


def laplacian_apply(u: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray):
    """Graph Laplacian of the 4-neighbour grid with per-edge weights.

    u: [H, W, C]; wx[y, x] weighs edge to (x+1, y); wy to (x, y+1).
    Returns sum_j w_ij * (u_i - u_j) at each pixel.
    """
    out = jnp.zeros_like(u)
    dxe = (u[:, :-1] - u[:, 1:]) * wx[:, :-1, None]
    out = out.at[:, :-1].add(dxe)
    out = out.at[:, 1:].add(-dxe)
    dye = (u[:-1, :] - u[1:, :]) * wy[:-1, :, None]
    out = out.at[:-1, :].add(dye)
    out = out.at[1:, :].add(-dye)
    return out


def laplacian_degree(wx: jnp.ndarray, wy: jnp.ndarray):
    """Diagonal of the grid Laplacian: sum of incident edge weights."""
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
):
    """Build (operator, rhs, preconditioner) for the normal equations.

    Exposed separately so tests can probe the operator against a dense
    A^T A reconstruction of the reference's LS rows.
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
    # precomputed ONCE as a fixed-width in-edge table: in_tab[j] lists the
    # pair slots whose target is j (capped at IN_MAX; overflow pairs have
    # their weight zeroed on BOTH sides, keeping the operator symmetric
    # PSD).  Every CG iteration is then two gathers and zero scatters.
    in_max = 2 * k
    flat_t = nbr_ids.reshape(-1)                       # pair p -> target
    order = jnp.argsort(flat_t)
    sorted_t = flat_t[order]
    # rank of each pair within its target segment (sorted order)
    pos = jnp.arange(n * k, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_t[1:] != sorted_t[:-1]]
    )
    seg_first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0)
    )
    rank = pos - seg_first
    keep = rank < in_max
    # in_tab[j, r] = pair slot (into the flat pair axis) or sentinel n*k.
    # Kept (target, rank) pairs are unique; dropped pairs write the sentinel
    # so a .min scatter keeps whatever real slot lands there.
    in_tab = jnp.full((n, in_max), n * k, dtype=jnp.int32)
    in_tab = in_tab.at[
        jnp.where(keep, sorted_t, n - 1),
        jnp.where(keep, rank, in_max - 1),
    ].min(jnp.where(keep, order, n * k).astype(jnp.int32))
    # zero overflowed pairs on the out side too (symmetry)
    keep_by_pair = jnp.zeros((n * k,), bool).at[order].set(keep)
    pair_w = jnp.where(keep_by_pair.reshape(n, k), pair_w, 0.0)
    pair_w_flat = pair_w.reshape(n * k)

    use_slots = candidates is not None and nbr_slots is not None
    if use_slots:
        cand_flat = candidates.reshape(-1)

    def nl_apply(u):
        """u: [N, C] -> sum_j w_ij (u_i - u_j) over both edge directions."""
        if use_slots:
            # two-hop gather through the small candidate table: 20k-row
            # tables gather ~3x faster than the 300k-row pixel table
            u_cand = u[cand_flat]                          # [K*M, C]
            uj = u_cand[nbr_slots]                         # [N, k, C]
        else:
            uj = u[nbr_ids]                                # [N, k, C]
        diff = (u[:, None, :] - uj) * pair_w[..., None]    # [N, k, C]
        out = jnp.sum(diff, axis=1)
        dpad = jnp.concatenate(
            [diff.reshape(n * k, -1),
             jnp.zeros((1, u.shape[1]), diff.dtype)], axis=0
        )
        out = out - jnp.sum(dpad[in_tab], axis=1)          # transpose side
        return out

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
    deg_loc = 2.0 * laplacian_degree(gx2, gy2)
    deg_nl = nonlocal_degree(nbr_ids, pair_w, n).reshape(h, w)
    deg = (deg_loc + deg_nl)[..., None]
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


@functools.partial(jax.jit, static_argnames=("iters",))
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
):
    """Solve for regularized (a, b) at down-res.  Returns (a, b) [H, W, 3].

    src_lab/ref_lab: [H, W, 3] unit-domain Lab (content, BDS guidance);
    confidence: [H, W] data weight m_weight; norm_factor = fullArea /
    downArea (the dWeight of ref :1369).  candidates/nbr_slots (from
    knn_graph) enable the fast small-table out-gather.
    """
    operator, rhs, precond = make_nonlocal_system(
        src_lab, ref_lab, confidence, nbr_ids, nbr_w, norm_factor,
        local_weight, alpha, nonlocal_weight, candidates, nbr_slots,
    )
    (a, b), _ = cg_solve(
        operator, rhs, (a0.astype(jnp.float32), b0.astype(jnp.float32)),
        iters=iters, tol=tol, preconditioner=precond,
    )
    return a, b
