"""VGG-19 backbone: shapes, Caffe pooling parity, weight round-trip."""

import io

import numpy as np
import jax.numpy as jnp
import pytest

from nct_tpu.models import vgg19
from nct_tpu.models.caffe_io import read_caffemodel, caffemodel_to_npz


@pytest.fixture(scope="module")
def params():
    return vgg19.init_params()


def test_feature_dims_ceil_mode():
    dims = vgg19.feature_dims(97, 130)
    assert dims["conv1_1"] == (97, 130)
    assert dims["conv2_1"] == (49, 65)
    assert dims["conv3_1"] == (25, 33)
    assert dims["conv4_1"] == (13, 17)
    assert dims["conv5_1"] == (7, 9)


def test_forward_shapes_and_taps(params):
    img = jnp.zeros((97, 66, 3), dtype=jnp.uint8)
    feats = vgg19.features(params, img)
    dims = vgg19.feature_dims(97, 66)
    chans = vgg19.tap_channels()
    for tap in vgg19.PIPELINE_TAPS:
        h, w = dims[tap]
        assert feats[tap].shape == (h, w, chans[tap]), tap
    # post-ReLU => non-negative
    for tap in vgg19.PIPELINE_TAPS:
        assert float(jnp.min(feats[tap])) >= 0.0


def test_mean_subtraction():
    x = vgg19.preprocess_bgr(jnp.full((2, 2, 3), 128, dtype=jnp.uint8))
    want = 128.0 - np.asarray(vgg19.BGR_MEAN)
    np.testing.assert_allclose(np.asarray(x[0, 0, 0]), want, atol=1e-4)


def test_ceil_maxpool_matches_caffe():
    # Caffe pools odd sizes with a clipped trailing window.
    x = jnp.arange(5 * 5, dtype=jnp.float32).reshape(1, 5, 5, 1)
    out = vgg19._ceil_maxpool(x)
    assert out.shape == (1, 3, 3, 1)
    want = np.array([[6, 8, 9], [16, 18, 19], [21, 23, 24]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], want)


def _encode_varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _encode_field(field, wire, payload):
    tag = _encode_varint((field << 3) | wire)
    if wire == 2:
        return tag + _encode_varint(len(payload)) + payload
    return tag + payload


def _fake_caffemodel(layer_field, name_field, blob_field):
    """Build a minimal NetParameter with one conv1_1 layer."""
    w = np.arange(64 * 3 * 3 * 3, dtype=np.float32)  # (out,in,kh,kw)
    b = np.ones(64, dtype=np.float32)

    def blob(arr, shape):
        msg = b""
        for dim, f in zip(shape, (1, 2, 3, 4)):
            msg += _encode_field(f, 0, _encode_varint(dim))
        msg += _encode_field(5, 2, arr.astype("<f4").tobytes())
        return msg

    layer = _encode_field(name_field, 2, b"conv1_1")
    layer += _encode_field(blob_field, 2, blob(w, (64, 3, 3, 3)))
    layer += _encode_field(blob_field, 2, blob(b, (1, 1, 1, 64)))
    return _encode_field(layer_field, 2, layer)


@pytest.mark.parametrize(
    "layer_field,name_field,blob_field",
    [(2, 4, 6), (100, 1, 7)],  # V1LayerParameter and LayerParameter forms
)
def test_caffemodel_parse_roundtrip(tmp_path, layer_field, name_field, blob_field):
    raw = _fake_caffemodel(layer_field, name_field, blob_field)
    path = tmp_path / "fake.caffemodel"
    path.write_bytes(raw)

    layers = read_caffemodel(str(path))
    assert "conv1_1" in layers
    assert layers["conv1_1"][0].shape == (64, 3, 3, 3)

    npz_path = tmp_path / "w.npz"
    converted = caffemodel_to_npz(str(path), str(npz_path))
    assert converted == ["conv1_1"]

    loaded = vgg19.load_params(str(npz_path))
    assert loaded["conv1_1"]["w"].shape == (3, 3, 3, 64)
    # HWIO transpose correctness: element (o,i,kh,kw) -> (kh,kw,i,o)
    w_oihw = np.arange(64 * 3 * 3 * 3, dtype=np.float32).reshape(64, 3, 3, 3)
    np.testing.assert_allclose(
        loaded["conv1_1"]["w"][1, 2, 0, 5], w_oihw[5, 0, 1, 2]
    )


def test_deterministic_fallback(params):
    p2 = vgg19.init_params()
    np.testing.assert_array_equal(params["conv3_1"]["w"], p2["conv3_1"]["w"])
