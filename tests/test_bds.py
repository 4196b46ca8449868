"""BDS voting: identity reconstruction, weighting, masked borders."""

import numpy as np
import jax.numpy as jnp

from nct_tpu.ops.bds import bds_vote, bds_reconstruct_color


def _identity_nnf(h, w):
    nnf = np.zeros((h, w, 2), np.int32)
    nnf[..., 0] = np.arange(w)[None, :]
    nnf[..., 1] = np.arange(h)[:, None]
    return jnp.asarray(nnf)


def test_identity_vote_reconstructs_payload():
    rng = np.random.default_rng(10)
    payload = rng.random((9, 11, 3)).astype(np.float32)
    ann = _identity_nnf(9, 11)
    bnn = _identity_nnf(9, 11)
    voted, w = bds_vote(jnp.asarray(payload), ann, bnn, 1.0, 2.0)
    np.testing.assert_allclose(np.asarray(voted), payload, atol=1e-5)
    assert float(jnp.min(w)) > 0


def test_vote_weight_counts():
    # identity NNFs on same-size grids: every offset valid in interior
    payload = np.ones((8, 8, 1), np.float32)
    ann = _identity_nnf(8, 8)
    bnn = _identity_nnf(8, 8)
    _, w = bds_vote(jnp.asarray(payload), ann, bnn, 1.0, 3.0)
    w = np.asarray(w)
    wa, wb = 1.0 / 64, 3.0 / 64
    np.testing.assert_allclose(w[4, 4], 9 * (wa + wb), rtol=1e-5)
    np.testing.assert_allclose(w[0, 0], 4 * (wa + wb), rtol=1e-5)  # corner


def test_constant_shift_vote():
    # ann maps every a-pixel to b-pixel shifted by +2 in x; bnn inverse.
    h, w = 8, 10
    payload = np.zeros((h, w, 1), np.float32)
    payload[..., 0] = np.arange(w)[None, :]
    ann = np.zeros((h, w, 2), np.int32)
    ann[..., 0] = np.clip(np.arange(w)[None, :] + 2, 0, w - 1)
    ann[..., 1] = np.arange(h)[:, None]
    bnn = np.zeros((h, w, 2), np.int32)
    bnn[..., 0] = np.clip(np.arange(w)[None, :] - 2, 0, w - 1)
    bnn[..., 1] = np.arange(h)[:, None]
    voted, _ = bds_vote(jnp.asarray(payload), jnp.asarray(ann),
                        jnp.asarray(bnn), 1.0, 2.0)
    # interior pixels should see x+2 from both directions
    got = np.asarray(voted)[4, 3:6, 0]
    np.testing.assert_allclose(got, np.arange(3, 6) + 2, atol=1e-4)


def _brute_force_vote(payload, ann, bnn, w_cohere, w_complete):
    """Literal per-pixel loop over the reference's voting rules
    (avg_vote_bds_a/_b, GeneralizedPatchMatch.cu:1074-1178)."""
    hb, wb, p = payload.shape
    ha, wa = ann.shape[:2]
    acc = np.zeros((ha, wa, p), np.float64)
    wacc = np.zeros((ha, wa), np.float64)
    offs = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    # direction A: pixel p gathers payload[ann[p+o] - o]
    for y in range(ha):
        for x in range(wa):
            for dx, dy in offs:
                xo, yo = x + dx, y + dy
                if not (0 <= xo < wa and 0 <= yo < ha):
                    continue
                tx = ann[yo, xo, 0] - dx
                ty = ann[yo, xo, 1] - dy
                if not (0 <= tx < wb and 0 <= ty < hb):
                    continue
                acc[y, x] += payload[ty, tx] * (w_cohere / (ha * wa))
                wacc[y, x] += w_cohere / (ha * wa)
    # direction B: pixel b scatters payload[b+o] onto bnn[b] + o
    for y in range(hb):
        for x in range(wb):
            for dx, dy in offs:
                xo, yo = x + dx, y + dy
                if not (0 <= xo < wb and 0 <= yo < hb):
                    continue
                tx = bnn[y, x, 0] + dx
                ty = bnn[y, x, 1] + dy
                if not (0 <= tx < wa and 0 <= ty < ha):
                    continue
                acc[ty, tx] += payload[yo, xo] * (w_complete / (hb * wb))
                wacc[ty, tx] += w_complete / (hb * wb)
    voted = np.where(
        wacc[..., None] > 0, acc / np.maximum(wacc, 1e-20)[..., None], 0.0
    )
    return voted, wacc


def test_vote_matches_brute_force_random_nnf():
    """Random NNFs on differently-sized grids vs the literal reference
    semantics — covers duplicate scatter targets, border masking, and
    asymmetric a/b dims."""
    rng = np.random.default_rng(12)
    ha, wa, hb, wb, p = 7, 9, 10, 8, 3
    payload = rng.random((hb, wb, p)).astype(np.float32)
    ann = np.stack(
        [rng.integers(0, wb, (ha, wa)), rng.integers(0, hb, (ha, wa))],
        axis=-1,
    ).astype(np.int32)
    bnn = np.stack(
        [rng.integers(0, wa, (hb, wb)), rng.integers(0, ha, (hb, wb))],
        axis=-1,
    ).astype(np.int32)
    voted, wacc = bds_vote(
        jnp.asarray(payload), jnp.asarray(ann), jnp.asarray(bnn), 1.0, 2.0
    )
    exp_v, exp_w = _brute_force_vote(payload, ann, bnn, 1.0, 2.0)
    np.testing.assert_allclose(np.asarray(wacc), exp_w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(voted), exp_v, rtol=2e-4, atol=1e-5)


def test_reconstruct_color_uint8():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    ann = _identity_nnf(6, 6)
    bnn = _identity_nnf(6, 6)
    out = np.asarray(bds_reconstruct_color(jnp.asarray(img), ann, bnn))
    assert out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
