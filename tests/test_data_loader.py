"""Native data-loader tests: decode parity, resize parity, prefetch order."""

import os

import numpy as np
import pytest

from nct_tpu.data import NativeLib, PairLoader, native_available
from nct_tpu.io import cap_max_size, imread_bgr
from nct_tpu.ops.resize import resize_bilinear

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader not built"
)

DEMO = "/root/reference/demo/example/in"


def _demo(name):
    path = os.path.join(DEMO, name)
    if not os.path.exists(path):
        pytest.skip("demo assets unavailable")
    return path


def test_decode_matches_pil():
    path = _demo("in1.png")
    np.testing.assert_array_equal(
        NativeLib.imread_bgr(path), imread_bgr(path)
    )


def test_resize_matches_jax_within_rounding():
    img = NativeLib.imread_bgr(_demo("in2.png"))
    a = NativeLib.resize_bilinear(img, 77, 123)
    b = np.asarray(resize_bilinear(img, 77, 123))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_max_size_cap_matches_python_path():
    path = _demo("tar0.png")
    native = NativeLib.imread_bgr(path, max_size=300)
    ref = cap_max_size(imread_bgr(path), 300)
    assert native.shape == ref.shape
    assert np.abs(native.astype(int) - ref.astype(int)).max() <= 1


def test_pair_loader_order_and_failure(tmp_path):
    good = _demo("in0.png")
    bad = str(tmp_path / "missing.png")
    loader = PairLoader(
        [(good, good), (good, bad), (good, good)], max_size=100, threads=2
    )
    items = list(loader)
    loader.close()
    assert items[1] is None
    assert items[0] is not None and items[2] is not None
    cnt, stl = items[0]
    assert max(cnt.shape[:2]) <= 100


def test_png_write_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (31, 45, 3)).astype(np.uint8)
    path = str(tmp_path / "out.png")
    NativeLib.imwrite_png(path, img)
    np.testing.assert_array_equal(NativeLib.imread_bgr(path), img)
