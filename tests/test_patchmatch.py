"""PatchMatch: distance semantics, convergence, determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from nct_tpu.ops import nnf as nnf_ops
from nct_tpu.ops.features import l2_normalize
from nct_tpu.ops.patchmatch import (
    patchmatch, patchify, patch_offsets, _eval_candidates,
)


def _naive_dist(a, b, ax, ay, bx, by, patch=3):
    """Reference dist_compute_single math (GeneralizedPatchMatch.cu:355-405)."""
    ha, wa = a.shape[:2]
    hb, wb = b.shape[:2]
    s, n = 0.0, 0
    for dy in range(-(patch // 2), patch // 2 + 1):
        for dx in range(-(patch // 2), patch // 2 + 1):
            if 0 <= ay + dy < ha and 0 <= ax + dx < wa and \
               0 <= by + dy < hb and 0 <= bx + dx < wb:
                s -= float(np.dot(a[ay + dy, ax + dx], b[by + dy, bx + dx]))
                n += 1
    return 1.0 if n == 0 else s / n


def test_eval_matches_naive_distance():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((6, 7, 4)).astype(np.float32)
    b = rng.standard_normal((5, 8, 4)).astype(np.float32)
    an, _ = l2_normalize(jnp.asarray(a))
    bn, _ = l2_normalize(jnp.asarray(b))
    an, bn = np.asarray(an), np.asarray(bn)

    pa, pam = patchify(jnp.asarray(an), 3)
    pb, pbm = patchify(jnp.asarray(bn), 3)
    pa = pa.reshape(6, 7, 9 * 4)          # flat [K*C] patch vectors
    pb_flat = pb.reshape(-1, 9 * 4)
    pbm_flat = pbm.reshape(-1, 9)

    cand = np.zeros((6, 7, 2), np.int32)
    rng2 = np.random.default_rng(6)
    cand[..., 0] = rng2.integers(0, 8, size=(6, 7))
    cand[..., 1] = rng2.integers(0, 5, size=(6, 7))

    d = np.asarray(
        _eval_candidates(
            pa, pam, pb_flat, pbm_flat, jnp.asarray(cand),
            jnp.ones((6, 7), bool), 8,
        )
    )
    for ay in range(6):
        for ax in range(7):
            want = _naive_dist(an, bn, ax, ay, cand[ay, ax, 0], cand[ay, ax, 1])
            np.testing.assert_allclose(d[ay, ax], want, atol=1e-5)


def test_patchmatch_recovers_translation():
    # B contains A translated: optimal NNF is a constant offset.
    rng = np.random.default_rng(7)
    big = rng.standard_normal((40, 40, 8)).astype(np.float32)
    a = big[5:25, 7:27]     # 20x20
    b = big                  # a appears at offset (7,5)
    an, _ = l2_normalize(jnp.asarray(a))
    bn, _ = l2_normalize(jnp.asarray(b))

    nnf0 = nnf_ops.init_scaled_identity(20, 20, 40, 40)
    nnf, d = patchmatch(an, bn, nnf0, jax.random.PRNGKey(0),
                        iters=10, rs_max=16)
    nnf = np.asarray(nnf)
    # interior pixels should find the exact translated match
    interior = nnf[3:-3, 3:-3]
    xs = interior[..., 0] - np.arange(3, 17)[None, :]
    ys = interior[..., 1] - np.arange(3, 17)[:, None]
    frac_exact = np.mean((xs == 7) & (ys == 5))
    assert frac_exact > 0.9, frac_exact
    assert float(np.asarray(d)[3:-3, 3:-3].mean()) < -0.95


def test_patchmatch_deterministic():
    rng = np.random.default_rng(8)
    a = rng.standard_normal((12, 13, 4)).astype(np.float32)
    b = rng.standard_normal((11, 14, 4)).astype(np.float32)
    an, _ = l2_normalize(jnp.asarray(a))
    bn, _ = l2_normalize(jnp.asarray(b))
    nnf0 = nnf_ops.init_scaled_identity(12, 13, 11, 14)
    n1, d1 = patchmatch(an, bn, nnf0, jax.random.PRNGKey(3), iters=4, rs_max=8)
    n2, d2 = patchmatch(an, bn, nnf0, jax.random.PRNGKey(3), iters=4, rs_max=8)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_patchmatch_never_worsens():
    rng = np.random.default_rng(9)
    a = rng.standard_normal((10, 10, 4)).astype(np.float32)
    b = rng.standard_normal((10, 10, 4)).astype(np.float32)
    an, _ = l2_normalize(jnp.asarray(a))
    bn, _ = l2_normalize(jnp.asarray(b))
    nnf0 = nnf_ops.init_scaled_identity(10, 10, 10, 10)
    pa, pam = patchify(an, 3)
    pb, pbm = patchify(bn, 3)
    d0 = np.asarray(_eval_candidates(
        pa.reshape(10, 10, 9 * 4), pam, pb.reshape(-1, 9 * 4),
        pbm.reshape(-1, 9), nnf0, jnp.ones((10, 10), bool), 10))
    _, d = patchmatch(an, bn, nnf0, jax.random.PRNGKey(1), iters=3, rs_max=8)
    assert (np.asarray(d) <= d0 + 1e-6).all()


def test_nnf_init_scaled_identity():
    nnf = np.asarray(nnf_ops.init_scaled_identity(4, 4, 8, 8))
    # ax/(aw-1)*(bw-1): 0->0, 3->7
    assert tuple(nnf[0, 0]) == (0, 0)
    assert tuple(nnf[3, 3]) == (7, 7)
    assert tuple(nnf[0, 3]) == (7, 0)


def test_nnf_upsample_preserves_offsets():
    # coarse NNF with constant offset (+2,+1) at half res -> (+4,+2) at full
    coarse = np.zeros((5, 5, 2), np.int32)
    coarse[..., 0] = np.arange(5)[None, :] + 2
    coarse[..., 1] = np.arange(5)[:, None] + 1
    up = np.asarray(nnf_ops.upsample(jnp.asarray(coarse), 10, 10, 20, 20))
    xs = np.broadcast_to(np.arange(10)[None, :], (10, 10))
    ys = np.broadcast_to(np.arange(10)[:, None], (10, 10))
    np.testing.assert_array_equal(up[..., 0], np.clip(xs + 4, 0, 19))
    np.testing.assert_array_equal(up[..., 1], np.clip(ys + 2, 0, 19))


def test_patch_offsets_order():
    offs = patch_offsets(3)
    assert len(offs) == 9
    assert offs[0] == (-1, -1) and offs[-1] == (1, 1)
