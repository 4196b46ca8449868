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


def test_reconstruct_color_uint8():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    ann = _identity_nnf(6, 6)
    bnn = _identity_nnf(6, 6)
    out = np.asarray(bds_reconstruct_color(jnp.asarray(img), ann, bnn))
    assert out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
