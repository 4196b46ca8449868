"""Lab conversion parity with OpenCV uint8 conventions."""

import numpy as np
import jax.numpy as jnp

from nct_tpu.ops.color import bgr_u8_to_lab_u8, lab_u8_to_bgr_u8


def test_primary_colors_match_opencv():
    # Known OpenCV CV_BGR2Lab 8-bit outputs (sRGB gamma, D65).
    bgr = jnp.asarray(
        [
            [0, 0, 0],        # black
            [255, 255, 255],  # white
            [0, 0, 255],      # red
            [0, 255, 0],      # green
            [255, 0, 0],      # blue
            [128, 128, 128],  # grey
        ],
        dtype=jnp.uint8,
    )
    lab = np.asarray(bgr_u8_to_lab_u8(bgr)).astype(int)
    expected = np.array(
        [
            [0, 128, 128],
            [255, 128, 128],
            [136, 208, 195],
            [224, 42, 211],
            [82, 207, 20],
            [137, 128, 128],
        ]
    )
    assert np.abs(lab - expected).max() <= 2, (lab, expected)


def test_roundtrip_close():
    rng = np.random.default_rng(1)
    bgr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    lab = bgr_u8_to_lab_u8(jnp.asarray(bgr))
    back = np.asarray(lab_u8_to_bgr_u8(lab)).astype(int)
    # uint8 Lab quantization loses up to a few LSB of chroma
    assert np.abs(back - bgr.astype(int)).mean() < 3.0
    # saturated dark colors lose the most to uint8 Lab quantization
    assert np.abs(back - bgr.astype(int)).max() <= 30


def test_gray_axis():
    g = np.arange(256, dtype=np.uint8)
    bgr = np.stack([g, g, g], axis=-1)
    lab = np.asarray(bgr_u8_to_lab_u8(jnp.asarray(bgr)))
    # neutral colors keep a=b=128
    assert np.abs(lab[:, 1].astype(int) - 128).max() <= 1
    assert np.abs(lab[:, 2].astype(int) - 128).max() <= 1
    # L monotonically non-decreasing
    assert (np.diff(lab[:, 0].astype(int)) >= 0).all()
