"""exact_nn tests: global-optimality vs brute force, PatchMatch agreement."""

import numpy as np
import jax
import jax.numpy as jnp

from nct_tpu.ops.exact_nn import exact_nn
from nct_tpu.ops.patchmatch import patch_offsets, patchmatch


def _brute_nnf(a, b, ps=3):
    """Reference-semantics exhaustive search in numpy (float64)."""
    ha, wa, c = a.shape
    hb, wb, _ = b.shape
    offs = patch_offsets(ps)
    nnf = np.zeros((ha, wa, 2), np.int32)
    dmin = np.full((ha, wa), np.inf)
    for ay in range(ha):
        for ax in range(wa):
            for by in range(hb):
                for bx in range(wb):
                    num, cnt = 0.0, 0
                    for dx, dy in offs:
                        ayy, axx = ay + dy, ax + dx
                        byy, bxx = by + dy, bx + dx
                        if 0 <= ayy < ha and 0 <= axx < wa \
                           and 0 <= byy < hb and 0 <= bxx < wb:
                            num += np.dot(a[ayy, axx], b[byy, bxx])
                            cnt += 1
                    d = -num / cnt if cnt else 1.0
                    if d < dmin[ay, ax]:
                        dmin[ay, ax] = d
                        nnf[ay, ax] = (bx, by)
    return nnf, dmin


def test_exact_nn_matches_bruteforce(rng):
    a = rng.standard_normal((5, 6, 4)).astype(np.float32)
    b = rng.standard_normal((6, 7, 4)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)

    nnf, annd = exact_nn(
        jnp.asarray(a), jnp.asarray(b), a_chunk=16, b_tile=8, bf16=False
    )
    want_nnf, want_d = _brute_nnf(a, b)
    np.testing.assert_allclose(np.asarray(annd), want_d, rtol=1e-4, atol=1e-4)
    # argmin ties could differ; check achieved distance instead of indices
    got = np.asarray(nnf)
    for y in range(5):
        for x in range(6):
            assert abs(np.asarray(annd)[y, x] - want_d[y, x]) < 1e-3


def test_exact_nn_beats_or_equals_patchmatch(rng):
    a = rng.standard_normal((12, 14, 8)).astype(np.float32)
    b = rng.standard_normal((13, 15, 8)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)

    nnf_e, d_e = exact_nn(jnp.asarray(a), jnp.asarray(b), bf16=False)
    from nct_tpu.ops.nnf import init_scaled_identity
    nnf0 = init_scaled_identity(12, 14, 13, 15)
    nnf_p, d_p = patchmatch(
        jnp.asarray(a), jnp.asarray(b), nnf0, jax.random.PRNGKey(0),
        iters=10, rs_max=8,
    )
    # global optimum is never worse anywhere (small float tolerance)
    assert np.all(np.asarray(d_e) <= np.asarray(d_p) + 1e-4)


def test_exact_nn_identical_images_near_identity(rng):
    a = rng.standard_normal((9, 10, 6)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    nnf, annd = exact_nn(jnp.asarray(a), jnp.asarray(a), bf16=False)
    xs, ys = np.meshgrid(np.arange(10), np.arange(9))
    got = np.asarray(nnf)
    # identity must be among the global minima; distances equal identity's
    ident_d = np.asarray(
        exact_nn(jnp.asarray(a), jnp.asarray(a), bf16=False)[1]
    )
    assert np.all(np.asarray(annd) <= ident_d + 1e-5)
    # and most pixels pick themselves (random features are distinctive)
    frac_ident = np.mean((got[..., 0] == xs) & (got[..., 1] == ys))
    assert frac_ident > 0.9
