"""Solver-suite tests: CG core, matrix-free operators vs dense assemblies.

The nonlocal and WLS operators are validated against *literal* dense
reconstructions of the reference's least-squares rows (reference:
ColorTransfer.cpp:612-911 and :1001-1093), built independently in numpy —
if the matrix-free operator equals A^T A of those rows, the TPU solve is
solving the same system the CUDA/MKL code did.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nct_tpu.solve.cg import cg_solve
from nct_tpu.solve.nonlocal_solve import (
    gradient_weights,
    laplacian_apply,
    laplacian_degree,
    make_nonlocal_system,
    nonlocal_apply,
    solve_nonlocal,
)
from nct_tpu.solve.wls import roughness_gate, solve_wls


def test_cg_matches_dense_solve(rng):
    n = 24
    m = rng.standard_normal((n, n))
    spd = m @ m.T + n * np.eye(n)
    b = rng.standard_normal(n).astype(np.float32)
    x_np = np.linalg.solve(spd, b)

    op = lambda x: jnp.asarray(spd, jnp.float32) @ x  # noqa: E731
    x, res = cg_solve(op, jnp.asarray(b), jnp.zeros(n, jnp.float32), iters=60)
    np.testing.assert_allclose(np.asarray(x), x_np, rtol=1e-3, atol=1e-3)


def test_cg_pytree_and_preconditioner(rng):
    diag = rng.uniform(1.0, 5.0, 10).astype(np.float32)
    b = rng.standard_normal(10).astype(np.float32)
    op = lambda x: {"v": jnp.asarray(diag) * x["v"]}  # noqa: E731
    pre = lambda r: {"v": r["v"] / jnp.asarray(diag)}  # noqa: E731
    x, _ = cg_solve(
        op, {"v": jnp.asarray(b)}, {"v": jnp.zeros(10, jnp.float32)},
        iters=3, preconditioner=pre,
    )
    np.testing.assert_allclose(np.asarray(x["v"]), b / diag, rtol=1e-5)


def _dense_grid_laplacian(wx, wy):
    """Dense Laplacian matrix for the 4-neighbour grid."""
    h, w = wx.shape
    n = h * w
    L = np.zeros((n, n))
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x + 1 < w:
                g = wx[y, x]
                j = i + 1
                L[i, i] += g; L[j, j] += g
                L[i, j] -= g; L[j, i] -= g
            if y + 1 < h:
                g = wy[y, x]
                j = i + w
                L[i, i] += g; L[j, j] += g
                L[i, j] -= g; L[j, i] -= g
    return L


def test_laplacian_apply_matches_dense(rng):
    h, w = 5, 7
    wx = rng.uniform(0.1, 2.0, (h, w)); wx[:, -1] = 0
    wy = rng.uniform(0.1, 2.0, (h, w)); wy[-1, :] = 0
    u = rng.standard_normal((h, w, 3)).astype(np.float32)
    L = _dense_grid_laplacian(wx, wy)
    want = (L @ u.reshape(-1, 3)).reshape(h, w, 3)
    got = laplacian_apply(
        jnp.asarray(u), jnp.asarray(wx, jnp.float32), jnp.asarray(wy, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(laplacian_degree(jnp.asarray(wx, jnp.float32),
                                    jnp.asarray(wy, jnp.float32))).reshape(-1),
        np.diag(L), rtol=1e-5,
    )


def test_nonlocal_apply_matches_dense(rng):
    n, k = 12, 3
    ids = rng.integers(0, n, (n, k)).astype(np.int32)
    wts = rng.uniform(0.1, 1.0, (n, k)).astype(np.float32)
    u = rng.standard_normal((n, 2)).astype(np.float32)
    L = np.zeros((n, n))
    for i in range(n):
        for t in range(k):
            j, wv = ids[i, t], wts[i, t]
            L[i, i] += wv; L[j, j] += wv
            L[i, j] -= wv; L[j, i] -= wv
    want = L @ u
    got = nonlocal_apply(jnp.asarray(u), jnp.asarray(ids), jnp.asarray(wts))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def _reference_nonlocal_rows(s, r, conf, nf, gx, gy, ids, wts, nl_w, k_num):
    """Literal LS rows per ColorTransfer.cpp:612-911 (one channel)."""
    h, w = s.shape
    n = h * w
    rows, rhs = [], []
    # data rows (:612-658)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            d = np.sqrt(conf[y, x]) * np.sqrt(nf)
            row = np.zeros(2 * n)
            row[i] = d * s[y, x]
            row[n + i] = d
            rows.append(row); rhs.append(d * r[y, x])
    # local rows: each pixel emits rows for all 4 in-bounds directions,
    # separately for a and b (:661-847)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            for (dx, dy) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                xn, yn = x + dx, y + dy
                if not (0 <= xn < w and 0 <= yn < h):
                    continue
                if dx:
                    g = gx[y, min(x, xn)]
                else:
                    g = gy[min(y, yn), x]
                j = yn * w + xn
                for base in (0, n):
                    row = np.zeros(2 * n)
                    row[base + i] = -g
                    row[base + j] = g
                    rows.append(row); rhs.append(0.0)
    # nonlocal rows (:850-911); += because the reference emits two CSR
    # entries that share a column when j == i (they sum in SpMV)
    iw_scale = np.sqrt(nl_w / k_num)
    for i in range(n):
        for t in range(ids.shape[1]):
            j = ids[i, t]
            iw = np.sqrt(wts[i, t]) * iw_scale
            for base in (0, n):
                row = np.zeros(2 * n)
                row[base + min(i, j)] += iw
                row[base + max(i, j)] -= iw
                rows.append(row); rhs.append(0.0)
    A = np.stack(rows)
    b = np.asarray(rhs)
    return A, b


def _bounded_indegree_ids(rng, n, k):
    """Random-ish directed kNN ids with in-degree == k exactly — the
    gather-only nonlocal apply caps in-degree at 2k (overflow edges are
    dropped by design), so operator-exactness tests must stay under it."""
    perm = rng.permutation(n)
    ids = np.stack(
        [np.roll(perm, t + 1) for t in range(k)], axis=1
    ).astype(np.int32)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    return ids[inv]


def test_nonlocal_operator_matches_dense_normal_matrix(rng):
    """Matrix-free operator == A^T A of the literal reference rows."""
    h, w = 3, 4
    n = h * w
    s = rng.uniform(0.1, 0.9, (h, w, 3))
    r = rng.uniform(0.1, 0.9, (h, w, 3))
    conf = rng.uniform(0.2, 1.0, (h, w))
    ids = _bounded_indegree_ids(rng, n, 4)
    wts = rng.uniform(0.3, 2.0, (n, 4))
    nf, lw, alpha, nlw = 4.0, 0.125, 1.2, 2.0

    gx, gy = gradient_weights(jnp.asarray(s[..., 0], jnp.float32), lw, alpha)
    gx, gy = np.asarray(gx, np.float64), np.asarray(gy, np.float64)

    operator, rhs, _ = make_nonlocal_system(
        jnp.asarray(s, jnp.float32), jnp.asarray(r, jnp.float32),
        jnp.asarray(conf, jnp.float32), jnp.asarray(ids),
        jnp.asarray(wts, jnp.float32), nf, lw, alpha, nlw,
    )

    x_a = rng.standard_normal((h, w, 3)).astype(np.float32)
    x_b = rng.standard_normal((h, w, 3)).astype(np.float32)
    got_a, got_b = operator((jnp.asarray(x_a), jnp.asarray(x_b)))

    for c in range(3):
        A, rb = _reference_nonlocal_rows(
            s[..., c], r[..., c], conf, nf, gx, gy, ids, wts, nlw, 4
        )
        NtN = A.T @ A
        x = np.concatenate([x_a[..., c].reshape(-1), x_b[..., c].reshape(-1)])
        want = NtN @ x
        got = np.concatenate([
            np.asarray(got_a[..., c]).reshape(-1),
            np.asarray(got_b[..., c]).reshape(-1),
        ])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        want_rhs = A.T @ rb
        got_rhs = np.concatenate([
            np.asarray(rhs[0][..., c]).reshape(-1),
            np.asarray(rhs[1][..., c]).reshape(-1),
        ])
        np.testing.assert_allclose(got_rhs, want_rhs, rtol=2e-4, atol=2e-4)


def test_nonlocal_solve_matches_reference_normal_equations(rng):
    h, w = 4, 5
    n = h * w
    s = rng.uniform(0.1, 0.9, (h, w, 3))
    r = rng.uniform(0.1, 0.9, (h, w, 3))
    conf = rng.uniform(0.2, 1.0, (h, w))
    ids = _bounded_indegree_ids(rng, n, 4)
    wts = rng.uniform(0.3, 2.0, (n, 4)).astype(np.float64)
    nf, lw, alpha, nlw = 4.0, 0.125, 1.2, 2.0

    gx, gy = gradient_weights(jnp.asarray(s[..., 0], jnp.float32), lw, alpha)
    gx, gy = np.asarray(gx, np.float64), np.asarray(gy, np.float64)

    a_got, b_got = solve_nonlocal(
        jnp.zeros((h, w, 3)), jnp.zeros((h, w, 3)),
        jnp.asarray(s, jnp.float32), jnp.asarray(r, jnp.float32),
        jnp.asarray(conf, jnp.float32),
        jnp.asarray(ids), jnp.asarray(wts, jnp.float32),
        nf, lw, alpha, nlw, iters=400, tol=1e-12,
    )

    for c in range(3):
        A, rhs = _reference_nonlocal_rows(
            s[..., c], r[..., c], conf, nf, gx, gy, ids, wts, nlw, 4
        )
        x = np.linalg.solve(A.T @ A, A.T @ rhs)
        np.testing.assert_allclose(
            np.asarray(a_got[..., c]).reshape(-1), x[:n], rtol=2e-2, atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(b_got[..., c]).reshape(-1), x[n:], rtol=2e-2, atol=2e-2
        )


def test_roughness_gate_last_channel_wins():
    # The reference's per-channel loop overwrites roughness, so only the
    # final (Lab b) channel decides (ColorTransfer.cpp:476-487).
    lab = jnp.full((1, 2, 3), 0.5)
    a = jnp.asarray([[[5.0, 5.0, 1.0], [1.0, 1.0, 5.0]]])  # ch2 in/out of gamut
    b = jnp.zeros((1, 2, 3))
    r = roughness_gate(a, b, lab)
    np.testing.assert_allclose(np.asarray(r), [[1.0, 1e-6]])


def test_wls_matches_dense_solve(rng):
    h, w = 6, 5
    n = h * w
    lab = rng.uniform(0.0, 1.0, (h, w, 3))
    a_up = rng.uniform(0.5, 1.5, (h, w, 3))
    b_up = rng.uniform(-0.2, 0.2, (h, w, 3))
    lam, alpha = 0.3, 1.2

    gx, gy = gradient_weights(jnp.asarray(lab[..., 0], jnp.float32), 1.0, alpha)
    gx2 = np.asarray(gx, np.float64) ** 2 * lam
    gy2 = np.asarray(gy, np.float64) ** 2 * lam
    rough = np.asarray(
        roughness_gate(jnp.asarray(a_up), jnp.asarray(b_up), jnp.asarray(lab))
    )
    N = _dense_grid_laplacian(gx2, gy2) + np.diag(rough.reshape(-1))

    a_got, b_got = solve_wls(
        jnp.asarray(a_up, jnp.float32), jnp.asarray(b_up, jnp.float32),
        jnp.asarray(lab, jnp.float32), lam, alpha, iters=600, tol=1e-12,
    )
    for c in range(3):
        want_a = np.linalg.solve(N, rough.reshape(-1) * a_up[..., c].reshape(-1))
        want_b = np.linalg.solve(N, rough.reshape(-1) * b_up[..., c].reshape(-1))
        np.testing.assert_allclose(
            np.asarray(a_got[..., c]).reshape(-1), want_a, rtol=1e-2, atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(b_got[..., c]).reshape(-1), want_b, rtol=1e-2, atol=1e-2
        )


def test_wls_mg_matches_dense_solve_large(rng):
    """The mg-preconditioned WLS against a dense solve at the largest
    size a dense factorization can check (VERDICT round-3 #3), in the
    coarse-level lam regime (lam ~ wls_lambda_init * fullArea/downArea)
    where the system is Laplacian-dominated — plain Jacobi-PCG burns a
    200-iteration budget here without converging (tools/
    wls_convergence.py), so this is exactly the regime the V-cycle must
    be provably exact in."""
    h, w = 48, 64
    lab = rng.uniform(0.0, 1.0, (h, w, 3))
    a_up = rng.uniform(0.0, 2.0, (h, w, 3))
    b_up = rng.uniform(-0.5, 0.5, (h, w, 3))
    lam, alpha = 6.0, 1.2

    gx, gy = gradient_weights(jnp.asarray(lab[..., 0], jnp.float32), 1.0, alpha)
    gx2 = np.asarray(gx, np.float64) ** 2 * lam
    gy2 = np.asarray(gy, np.float64) ** 2 * lam
    rough = np.asarray(
        roughness_gate(jnp.asarray(a_up), jnp.asarray(b_up), jnp.asarray(lab))
    )
    N = _dense_grid_laplacian(gx2, gy2) + np.diag(rough.reshape(-1))

    a_got, b_got = solve_wls(
        jnp.asarray(a_up, jnp.float32), jnp.asarray(b_up, jnp.float32),
        jnp.asarray(lab, jnp.float32), lam, alpha, iters=80, tol=1e-8,
        precond_kind="mg",
    )
    rhs = rough.reshape(-1, 1) * np.concatenate(
        [a_up.reshape(-1, 3), b_up.reshape(-1, 3)], axis=1
    )
    want = np.linalg.solve(N, rhs)
    np.testing.assert_allclose(
        np.asarray(a_got).reshape(-1, 3), want[:, :3], rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(b_got).reshape(-1, 3), want[:, 3:], rtol=2e-2, atol=2e-2
    )


def test_wls_mg_beats_jacobi_budget(rng):
    """The VERDICT round-3 #3 bar, pinned as a test: the mg-PCG WLS must
    reach a residual <= the 200-iteration Jacobi result in <= 1/4 the
    iterations, on a coarse-level-lam system."""
    h, w = 60, 80
    lab = rng.uniform(0.0, 1.0, (h, w, 3))
    a_up = rng.uniform(0.0, 2.0, (h, w, 3)).astype(np.float32)
    b_up = rng.uniform(-0.5, 0.5, (h, w, 3)).astype(np.float32)
    lam = 6.0

    _, _, it_j, r2_j = solve_wls(
        jnp.asarray(a_up), jnp.asarray(b_up), jnp.asarray(lab, jnp.float32),
        lam, iters=200, tol=1e-12, precond_kind="jacobi", return_iters=True,
    )
    _, _, it_m, r2_m = solve_wls(
        jnp.asarray(a_up), jnp.asarray(b_up), jnp.asarray(lab, jnp.float32),
        lam, iters=50, tol=1e-12, precond_kind="mg", return_iters=True,
    )
    assert int(it_m) <= 50 and int(it_j) == 200
    assert float(r2_m) <= float(r2_j)


def test_mg_preconditioner_symmetric_positive_definite(rng):
    """The V-cycle must be a fixed SPD linear operator or PCG is invalid."""
    from nct_tpu.solve.nonlocal_solve import make_mg_preconditioner

    h, w = 13, 21  # odd dims exercise the padding paths
    d2 = rng.uniform(0.5, 4.0, (h, w, 3)).astype(np.float32)
    s = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    wx = rng.uniform(0.05, 50.0, (h, w)).astype(np.float32); wx[:, -1] = 0
    wy = rng.uniform(0.05, 50.0, (h, w)).astype(np.float32); wy[-1, :] = 0
    pre = make_mg_preconditioner(
        jnp.asarray(d2 * s * s + 1.0), jnp.asarray(d2 * s),
        jnp.asarray(d2 + 1.0), jnp.asarray(wx), jnp.asarray(wy),
    )

    def dot(a, b):
        return sum(
            float(jnp.sum(x1 * x2)) for x1, x2 in zip(a, b)
        )

    for seed in range(3):
        r2 = np.random.default_rng(seed)
        u = tuple(
            jnp.asarray(r2.standard_normal((h, w, 3)), jnp.float32)
            for _ in range(2)
        )
        v = tuple(
            jnp.asarray(r2.standard_normal((h, w, 3)), jnp.float32)
            for _ in range(2)
        )
        upv = dot(u, pre(v))
        puv = dot(pre(u), v)
        np.testing.assert_allclose(upv, puv, rtol=2e-4)
        assert dot(u, pre(u)) > 0


def test_nonlocal_solve_mg_matches_reference_normal_equations(rng):
    """solve_nonlocal with the multigrid preconditioner reaches the same
    solution of the reference's normal equations as block-Jacobi does."""
    h, w = 4, 5
    n = h * w
    s = rng.uniform(0.1, 0.9, (h, w, 3))
    r = rng.uniform(0.1, 0.9, (h, w, 3))
    conf = rng.uniform(0.2, 1.0, (h, w))
    ids = _bounded_indegree_ids(rng, n, 4)
    wts = rng.uniform(0.3, 2.0, (n, 4)).astype(np.float64)
    nf, lw, alpha, nlw = 4.0, 0.125, 1.2, 2.0

    gx, gy = gradient_weights(jnp.asarray(s[..., 0], jnp.float32), lw, alpha)
    gx, gy = np.asarray(gx, np.float64), np.asarray(gy, np.float64)

    a_got, b_got = solve_nonlocal(
        jnp.zeros((h, w, 3)), jnp.zeros((h, w, 3)),
        jnp.asarray(s, jnp.float32), jnp.asarray(r, jnp.float32),
        jnp.asarray(conf, jnp.float32),
        jnp.asarray(ids), jnp.asarray(wts, jnp.float32),
        nf, lw, alpha, nlw, iters=400, tol=1e-12, precond_kind="mg",
    )

    for c in range(3):
        A, rhs = _reference_nonlocal_rows(
            s[..., c], r[..., c], conf, nf, gx, gy, ids, wts, nlw, 4
        )
        x = np.linalg.solve(A.T @ A, A.T @ rhs)
        np.testing.assert_allclose(
            np.asarray(a_got[..., c]).reshape(-1), x[:n], rtol=2e-2, atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(b_got[..., c]).reshape(-1), x[n:], rtol=2e-2, atol=2e-2
        )


def test_nonlocal_slot_path_matches_dense_normal_matrix(rng):
    """Operator with candidates/nbr_slots (the pipeline path, slot-keyed
    in-edge tables) == A^T A of the literal reference rows when the
    in-cap is ample — including duplicate candidate entries and pixels
    that are candidates several times."""
    h, w = 3, 4
    n = h * w
    kc, m, k = 3, 5, 4                       # 3 clusters x 5 candidates
    s = rng.uniform(0.1, 0.9, (h, w, 3))
    r = rng.uniform(0.1, 0.9, (h, w, 3))
    conf = rng.uniform(0.2, 1.0, (h, w))
    candidates = rng.integers(0, n, (kc, m)).astype(np.int32)
    cand_flat = candidates.reshape(-1)
    nbr_slots = rng.integers(0, kc * m, (n, k)).astype(np.int32)
    ids = cand_flat[nbr_slots]
    wts = rng.uniform(0.3, 2.0, (n, k)).astype(np.float32)
    nf, lw, alpha, nlw = 4.0, 0.125, 1.2, 2.0

    gx, gy = gradient_weights(jnp.asarray(s[..., 0], jnp.float32), lw, alpha)
    gx, gy = np.asarray(gx, np.float64), np.asarray(gy, np.float64)

    operator, rhs, _ = make_nonlocal_system(
        jnp.asarray(s, jnp.float32), jnp.asarray(r, jnp.float32),
        jnp.asarray(conf, jnp.float32), jnp.asarray(ids),
        jnp.asarray(wts, jnp.float32), nf, lw, alpha, nlw,
        candidates=jnp.asarray(candidates),
        nbr_slots=jnp.asarray(nbr_slots),
        in_cap=n * k,
    )

    x_a = rng.standard_normal((h, w, 3)).astype(np.float32)
    x_b = rng.standard_normal((h, w, 3)).astype(np.float32)
    got_a, got_b = operator((jnp.asarray(x_a), jnp.asarray(x_b)))

    for c in range(3):
        A, _rb = _reference_nonlocal_rows(
            s[..., c], r[..., c], conf, nf, gx, gy, ids, wts, nlw, k
        )
        NtN = A.T @ A
        x = np.concatenate([x_a[..., c].reshape(-1), x_b[..., c].reshape(-1)])
        want = NtN @ x
        got = np.concatenate([
            np.asarray(got_a[..., c]).reshape(-1),
            np.asarray(got_b[..., c]).reshape(-1),
        ])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_nonlocal_scatter_transpose_matches_tables(rng):
    """transpose="scatter" (the MAX_SIZE path: per-iteration scatter-add
    of W^T, no in-edge tables — the table build's global sort-and-rank
    chain stalls the remote compile service above ~3M pairs) must equal
    the ample-cap table operator — i.e. the exact uncapped A^T A graph
    term — on both the slot-keyed and pixel-keyed paths."""
    h, w = 3, 4
    n = h * w
    kc, m, k = 3, 5, 4
    s = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    conf = rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)
    candidates = rng.integers(0, n, (kc, m)).astype(np.int32)
    cand_flat = candidates.reshape(-1)
    nbr_slots = rng.integers(0, kc * m, (n, k)).astype(np.int32)
    ids = cand_flat[nbr_slots]
    wts = rng.uniform(0.3, 2.0, (n, k)).astype(np.float32)
    x_a = rng.standard_normal((h, w, 3)).astype(np.float32)
    x_b = rng.standard_normal((h, w, 3)).astype(np.float32)

    # pixel-keyed tables cap in-edges at 2k, so that comparison needs
    # bounded in-degree: a shifted ring gives every pixel exactly k
    # in-edges (the slot-keyed case uses the ample cap and random hubs)
    ring_ids = ((np.arange(n)[:, None] + np.arange(1, k + 1)) % n
                ).astype(np.int32)
    for use_ids, slot_kwargs in (
        (ids, dict(candidates=jnp.asarray(candidates),
                   nbr_slots=jnp.asarray(nbr_slots))),
        (ring_ids, dict()),
    ):
        op_tab, rhs_tab, _ = make_nonlocal_system(
            jnp.asarray(s), jnp.asarray(r), jnp.asarray(conf),
            jnp.asarray(use_ids), jnp.asarray(wts), 4.0,
            in_cap=n * k, transpose="tables", **slot_kwargs,
        )
        op_sc, rhs_sc, _ = make_nonlocal_system(
            jnp.asarray(s), jnp.asarray(r), jnp.asarray(conf),
            jnp.asarray(use_ids), jnp.asarray(wts), 4.0,
            transpose="scatter", **slot_kwargs,
        )
        ta, tb = op_tab((jnp.asarray(x_a), jnp.asarray(x_b)))
        sa, sb = op_sc((jnp.asarray(x_a), jnp.asarray(x_b)))
        np.testing.assert_allclose(np.asarray(sa), np.asarray(ta),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sb), np.asarray(tb),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rhs_sc[0]), np.asarray(rhs_tab[0]), rtol=1e-6)


def test_nonlocal_searchsorted_ranks_match_scan(rng, monkeypatch):
    """The MAX_SIZE table build computes segment ranks via searchsorted
    (the associative_scan it replaces stalls the remote compile service
    above ~3M pairs, round-4 probes); both rank methods must produce the
    IDENTICAL operator."""
    from nct_tpu.solve import nonlocal_solve as nl

    h, w = 3, 4
    n = h * w
    kc, m, k = 3, 5, 4
    s = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    conf = rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)
    candidates = rng.integers(0, n, (kc, m)).astype(np.int32)
    nbr_slots = rng.integers(0, kc * m, (n, k)).astype(np.int32)
    ids = candidates.reshape(-1)[nbr_slots]
    wts = rng.uniform(0.3, 2.0, (n, k)).astype(np.float32)
    x = (jnp.asarray(rng.standard_normal((h, w, 3)), jnp.float32),
         jnp.asarray(rng.standard_normal((h, w, 3)), jnp.float32))

    outs = []
    for scan_max in (1 << 62, 0):       # scan ranks vs searchsorted ranks
        monkeypatch.setattr(nl, "_SCAN_MAX_PAIRS", scan_max)
        op, _rhs, _pre = nl.make_nonlocal_system(
            jnp.asarray(s), jnp.asarray(r), jnp.asarray(conf),
            jnp.asarray(ids), jnp.asarray(wts), 4.0,
            candidates=jnp.asarray(candidates),
            nbr_slots=jnp.asarray(nbr_slots),
            in_cap=2, transpose="tables",   # small cap: ranks decide keeps
        )
        outs.append(op(x))
    for a_, b_ in zip(*outs):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=0, atol=0)


def test_nonlocal_slot_path_ample_cap_exact_under_hub(rng):
    """Regression: with an ample in-cap (>= n*k) the slot-path operator
    must equal dense A^T A even when one slot is a hub absorbing EVERY
    directed edge — the width heuristic used to floor at max(8, 1.5*mean)
    and silently drop hub overflow, making the 'ample cap' contract
    order-dependently false for unlucky draws."""
    h, w = 3, 4
    n = h * w
    kc, m, k = 2, 4, 5
    s = rng.uniform(0.1, 0.9, (h, w, 3))
    r = rng.uniform(0.1, 0.9, (h, w, 3))
    conf = rng.uniform(0.2, 1.0, (h, w))
    candidates = rng.integers(0, n, (kc, m)).astype(np.int32)
    # every pair targets slot 0: in-degree n*k at one slot, 0 elsewhere
    nbr_slots = np.zeros((n, k), np.int32)
    ids = candidates.reshape(-1)[nbr_slots]
    wts = rng.uniform(0.3, 2.0, (n, k)).astype(np.float32)
    nf, lw, alpha, nlw = 4.0, 0.125, 1.2, 2.0

    gx, gy = gradient_weights(jnp.asarray(s[..., 0], jnp.float32), lw, alpha)
    gx, gy = np.asarray(gx, np.float64), np.asarray(gy, np.float64)

    operator, _, _ = make_nonlocal_system(
        jnp.asarray(s, jnp.float32), jnp.asarray(r, jnp.float32),
        jnp.asarray(conf, jnp.float32), jnp.asarray(ids),
        jnp.asarray(wts, jnp.float32), nf, lw, alpha, nlw,
        candidates=jnp.asarray(candidates),
        nbr_slots=jnp.asarray(nbr_slots),
        in_cap=n * k,
    )
    x_a = rng.standard_normal((h, w, 3)).astype(np.float32)
    x_b = rng.standard_normal((h, w, 3)).astype(np.float32)
    got_a, got_b = operator((jnp.asarray(x_a), jnp.asarray(x_b)))
    for c in range(3):
        A, _rb = _reference_nonlocal_rows(
            s[..., c], r[..., c], conf, nf, gx, gy, ids, wts, nlw, k
        )
        x = np.concatenate([x_a[..., c].reshape(-1), x_b[..., c].reshape(-1)])
        want = A.T @ A @ x
        got = np.concatenate([
            np.asarray(got_a[..., c]).reshape(-1),
            np.asarray(got_b[..., c]).reshape(-1),
        ])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_nonlocal_slot_path_capped_stays_symmetric(rng):
    """When the in-cap truncates (hub candidates), the operator must stay
    symmetric (dropped edges zeroed on BOTH sides) or CG diverges."""
    h, w = 4, 4
    n = h * w
    kc, m, k = 2, 3, 6
    s = rng.uniform(0.1, 0.9, (h, w, 3))
    r = rng.uniform(0.1, 0.9, (h, w, 3))
    conf = rng.uniform(0.2, 1.0, (h, w))
    candidates = rng.integers(0, n, (kc, m)).astype(np.int32)
    # every pixel targets slot 0 a lot -> in-degree ~n*k/(kc*m) >> cap
    nbr_slots = rng.integers(0, kc * m, (n, k)).astype(np.int32)
    ids = candidates.reshape(-1)[nbr_slots]
    wts = rng.uniform(0.3, 2.0, (n, k)).astype(np.float32)

    operator, _, _ = make_nonlocal_system(
        jnp.asarray(s, jnp.float32), jnp.asarray(r, jnp.float32),
        jnp.asarray(conf, jnp.float32), jnp.asarray(ids),
        jnp.asarray(wts, jnp.float32), 4.0,
        candidates=jnp.asarray(candidates),
        nbr_slots=jnp.asarray(nbr_slots),
        in_cap=4,
    )

    def dot(u, v):
        return sum(float(jnp.sum(a * b)) for a, b in zip(u, v))

    for seed in range(3):
        r2 = np.random.default_rng(seed)
        u = tuple(jnp.asarray(r2.standard_normal((h, w, 3)), jnp.float32)
                  for _ in range(2))
        v = tuple(jnp.asarray(r2.standard_normal((h, w, 3)), jnp.float32)
                  for _ in range(2))
        np.testing.assert_allclose(
            dot(u, operator(v)), dot(operator(u), v), rtol=2e-4
        )


def test_nonlocal_in_cap_auto_raises_above_mean_degree(rng):
    """When the mean in-degree per slot exceeds the configured in-edge
    cap (the MAX_SIZE L4 regime: ~5.3M pairs over ~20k slots, mean ~260
    vs nl_in_cap 128), the table width must auto-raise to the mean-degree
    headroom instead of silently zeroing ~half the edges (ADVICE r04).
    With a perfectly balanced slot assignment (every slot exactly mean_in
    in-edges, under the 1.5x headroom) the capped-table operator must
    therefore equal the exact scatter-transpose operator even though
    in_cap << mean_in."""
    from nct_tpu.solve.nonlocal_solve import make_nonlocal_system

    h, w = 4, 6
    n = h * w
    kc, m, k = 1, 4, 8          # 4 slots, n*k=192 pairs -> mean_in = 48
    s = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    r = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    conf = rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)
    candidates = rng.integers(0, n, (kc, m)).astype(np.int32)
    # round-robin slots: every slot gets exactly n*k/(kc*m) in-edges
    nbr_slots = (np.arange(n * k).reshape(n, k) % (kc * m)).astype(np.int32)
    ids = candidates.reshape(-1)[nbr_slots]
    wts = rng.uniform(0.3, 2.0, (n, k)).astype(np.float32)
    x = (jnp.asarray(rng.standard_normal((h, w, 3)), jnp.float32),
         jnp.asarray(rng.standard_normal((h, w, 3)), jnp.float32))

    op_cap, _, _ = make_nonlocal_system(
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(conf),
        jnp.asarray(ids), jnp.asarray(wts), 4.0,
        candidates=jnp.asarray(candidates),
        nbr_slots=jnp.asarray(nbr_slots),
        in_cap=8, transpose="tables",     # cap 8 << mean_in 48
    )
    op_exact, _, _ = make_nonlocal_system(
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(conf),
        jnp.asarray(ids), jnp.asarray(wts), 4.0,
        candidates=jnp.asarray(candidates),
        nbr_slots=jnp.asarray(nbr_slots),
        transpose="scatter",
    )
    ca, cb = op_cap(x)
    ea, eb = op_exact(x)
    np.testing.assert_allclose(np.asarray(ca), np.asarray(ea),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(eb),
                               rtol=1e-5, atol=1e-5)


def test_wls_vmap_folds_batch_into_channels_matching_singles(rng):
    """solve_wls under jax.vmap routes through the batch-in-channels
    custom batching rule (grouped-dot CG): each pair's result must match
    its unbatched solve to reduction-order noise, and the per-pair
    iteration counts must agree (the rule keeps per-pair alpha/beta, so
    it IS the per-pair iteration, just fused wide)."""
    from nct_tpu.solve.wls import solve_wls

    B, H, W = 3, 24, 32
    a_up = jnp.asarray(rng.uniform(0.5, 1.5, (B, H, W, 3)), jnp.float32)
    b_up = jnp.asarray(rng.uniform(-0.2, 0.2, (B, H, W, 3)), jnp.float32)
    cnt = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    lam = 0.4

    singles = [
        solve_wls(a_up[i], b_up[i], cnt[i], lam, iters=8,
                  dynamic=False, return_iters=True) for i in range(B)
    ]
    f = jax.jit(jax.vmap(
        lambda a, b, c: solve_wls(a, b, c, lam, iters=8, dynamic=False,
                                  return_iters=True)))
    av, bv, itv, _r2v = f(a_up, b_up, cnt)
    for i in range(B):
        a_s, b_s, it_s, _ = singles[i]
        assert int(itv[i]) == int(it_s)
        np.testing.assert_allclose(np.asarray(av[i]), np.asarray(a_s),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(bv[i]), np.asarray(b_s),
                                   rtol=2e-3, atol=2e-4)
