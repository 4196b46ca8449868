"""Bilinear resize semantics (OpenCV INTER_LINEAR parity)."""

import numpy as np
import jax.numpy as jnp

from nct_tpu.ops.resize import resize_bilinear, max_size_resize_dims


def _cv2_linear_ref(img, out_h, out_w):
    """Straightforward numpy reimplementation of cv2 INTER_LINEAR."""
    src_h, src_w = img.shape[:2]
    out = np.zeros((out_h, out_w) + img.shape[2:], dtype=np.float64)
    for i in range(out_h):
        fy = (i + 0.5) * src_h / out_h - 0.5
        y0 = int(np.floor(fy))
        wy = fy - y0
        if fy < 0:
            y0, wy = 0, 0.0
        if fy > src_h - 1:
            y0, wy = src_h - 1, 0.0
        y1 = min(y0 + 1, src_h - 1)
        for j in range(out_w):
            fx = (j + 0.5) * src_w / out_w - 0.5
            x0 = int(np.floor(fx))
            wx = fx - x0
            if fx < 0:
                x0, wx = 0, 0.0
            if fx > src_w - 1:
                x0, wx = src_w - 1, 0.0
            x1 = min(x0 + 1, src_w - 1)
            out[i, j] = (
                img[y0, x0] * (1 - wy) * (1 - wx)
                + img[y0, x1] * (1 - wy) * wx
                + img[y1, x0] * wy * (1 - wx)
                + img[y1, x1] * wy * wx
            )
    return out


def test_matches_reference_bilinear_upscale():
    rng = np.random.default_rng(2)
    img = rng.random((7, 9, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 13, 17))
    want = _cv2_linear_ref(img, 13, 17)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_matches_reference_bilinear_downscale():
    rng = np.random.default_rng(3)
    img = rng.random((21, 33, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 8, 11))
    want = _cv2_linear_ref(img, 8, 11)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_identity():
    rng = np.random.default_rng(4)
    img = rng.random((5, 6, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 5, 6))
    np.testing.assert_allclose(got, img, atol=1e-7)


def test_uint8_roundtrip_dtype():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_bilinear(jnp.asarray(img), 8, 8)
    assert np.asarray(out).dtype == np.uint8


def test_max_size_dims_match_reference_integer_math():
    # main.cu:499-522 — truncating int math
    assert max_size_resize_dims(452, 680, 1000) == (452, 680)
    assert max_size_resize_dims(600, 1200, 1000) == (500, 1000)
    assert max_size_resize_dims(1200, 600, 1000) == (1000, 500)
    assert max_size_resize_dims(1100, 1300, 1000) == (int(1000 / 1300 * 1100), 1000)
