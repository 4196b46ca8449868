"""Bit-level parity with OpenCV for the colour-space and resize ops.

The reference does every colour hop through OpenCV's uint8 cvtColor and
every pyramid resize through INTER_LINEAR (ColorTransfer.h:54-60,
main.cu:106-107, :351-356), so the uint8 Lab encoding is part of the
algorithm's numerics.  OpenCV uses fixed-point tables internally; the
float32 JAX path lands within 2 LSB on <0.03% of pixels.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from nct_tpu.ops.color import bgr_u8_to_lab_u8, lab_u8_to_bgr_u8  # noqa: E402
from nct_tpu.ops.resize import resize_bilinear  # noqa: E402


@pytest.fixture(scope="module")
def bgr():
    # fresh generator so results don't depend on test order
    r = np.random.default_rng(42)
    return r.integers(0, 256, (96, 80, 3)).astype(np.uint8)


def test_bgr2lab_matches_opencv(bgr):
    want = cv2.cvtColor(bgr, cv2.COLOR_BGR2Lab).astype(int)
    got = np.asarray(bgr_u8_to_lab_u8(bgr)).astype(int)
    diff = np.abs(want - got)
    assert diff.max() <= 2
    assert (diff > 1).mean() < 3e-3


def test_lab2bgr_matches_opencv(bgr):
    lab = cv2.cvtColor(bgr, cv2.COLOR_BGR2Lab)
    want = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR).astype(int)
    got = np.asarray(lab_u8_to_bgr_u8(lab)).astype(int)
    diff = np.abs(want - got)
    assert diff.max() <= 2
    assert (diff > 1).mean() < 3e-3


@pytest.mark.parametrize("out_hw", [(45, 37), (200, 150), (31, 97)])
def test_resize_matches_opencv_inter_linear(bgr, out_hw):
    oh, ow = out_hw
    want = cv2.resize(bgr, (ow, oh), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(bgr, oh, ow))
    assert np.abs(want.astype(int) - got.astype(int)).max() <= 1


def test_roundtrip_stability(bgr):
    """uint8 BGR -> Lab -> BGR must be as stable as OpenCV's own roundtrip."""
    lab = np.asarray(bgr_u8_to_lab_u8(bgr))
    back = np.asarray(lab_u8_to_bgr_u8(lab))
    lab_cv = cv2.cvtColor(bgr, cv2.COLOR_BGR2Lab)
    back_cv = cv2.cvtColor(lab_cv, cv2.COLOR_Lab2BGR)
    ours = np.abs(back.astype(int) - bgr.astype(int)).mean()
    theirs = np.abs(back_cv.astype(int) - bgr.astype(int)).mean()
    assert ours <= theirs + 0.5
