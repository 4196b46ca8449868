"""pycaffe convenience layer (round-2 VERDICT missing #6): Classifier /
Detector / Transformer / oversample (code/python/caffe/classifier.py,
detector.py, io.py), BlobProto converters, and coord_map."""

import numpy as np
import pytest

from nct_tpu.models.caffe_io import (
    array_to_blobproto, blobproto_to_array,
)
from nct_tpu.nn.apps import (
    Classifier, Detector, Transformer, oversample, resize_image,
)
from nct_tpu.nn.coord_map import coord_map_from_to, crop_offsets
from nct_tpu.nn.net import Net


DEPLOY = """
name: "toynet"
input: "data"
input_shape { dim: 1 dim: 3 dim: 8 dim: 8 }
layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
  convolution_param { num_output: 4 kernel_size: 3 pad: 1
    weight_filler { type: "xavier" } } }
layer { name: "pool" type: "Pooling" bottom: "conv" top: "pool"
  pooling_param { pool: AVE global_pooling: true } }
layer { name: "fc" type: "InnerProduct" bottom: "pool" top: "score"
  inner_product_param { num_output: 5
    weight_filler { type: "xavier" } } }
layer { name: "prob" type: "Softmax" bottom: "score" top: "prob" }
"""


def test_blobproto_roundtrip(rng):
    arr = rng.standard_normal((2, 3, 4)).astype(np.float32)
    diff = rng.standard_normal((2, 3, 4)).astype(np.float32)
    payload = array_to_blobproto(arr, diff)
    np.testing.assert_allclose(blobproto_to_array(payload), arr)
    np.testing.assert_allclose(
        blobproto_to_array(payload, return_diff=True), diff)


def test_oversample_ten_crops(rng):
    im = rng.uniform(size=(8, 10, 3)).astype(np.float32)
    crops = oversample([im], (6, 6))
    assert crops.shape == (10, 6, 6, 3)
    np.testing.assert_allclose(crops[0], im[:6, :6])        # top-left
    np.testing.assert_allclose(crops[3], im[2:8, 4:10])     # bottom-right
    np.testing.assert_allclose(crops[4], im[1:7, 2:8])      # center
    np.testing.assert_allclose(crops[5], im[:6, :6][:, ::-1])  # mirrored


def test_transformer_pre_deprocess_inverse(rng):
    tr = Transformer({"data": (1, 3, 8, 8)})
    tr.set_raw_scale("data", 255.0)
    tr.set_channel_swap("data", (2, 1, 0))
    tr.set_mean("data", np.asarray([10.0, 20.0, 30.0], np.float32))
    tr.set_input_scale("data", 0.5)
    im = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    pre = tr.preprocess("data", im)
    back = tr.deprocess("data", pre)
    np.testing.assert_allclose(back, im, rtol=1e-5, atol=1e-5)
    # order: raw_scale then swap then mean then input_scale
    want = (im * 255.0)[:, :, [2, 1, 0]] - [10.0, 20.0, 30.0]
    np.testing.assert_allclose(pre, want * 0.5, rtol=1e-5)


def test_classifier_predict_shapes(rng):
    clf = Classifier(DEPLOY, image_dims=(10, 10), raw_scale=255.0)
    # untrained filters: only the contract matters — shape + normalization
    imgs = [rng.uniform(size=(12, 14, 3)).astype(np.float32)
            for _ in range(2)]
    probs = clf.predict(imgs, oversample_crops=True)
    assert probs.shape == (2, 5)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
    probs_c = clf.predict(imgs, oversample_crops=False)
    assert probs_c.shape == (2, 5)


def test_detector_windows(rng):
    det = Detector(DEPLOY, context_pad=1)
    im = rng.uniform(size=(20, 24, 3)).astype(np.float32)
    dets = det.detect_windows([(im, [(0, 0, 10, 10), (5, 6, 18, 20)])])
    assert len(dets) == 2
    assert dets[0]["window"] == (0, 0, 10, 10)
    assert dets[0]["prediction"].shape == (5,)
    assert np.isfinite(dets[0]["prediction"]).all()


def test_coord_map_fcn_alignment():
    """The classic FCN geometry: conv(k3,p1) keeps coordinates, pool(k2,s2)
    halves them, deconv(k4,s2,p1) exactly undoes the pool — net offset 0
    (coord_map.py's own docstring example)."""
    net = Net("""
    input: "data"
    layer { name: "c" type: "Convolution" bottom: "data" top: "c"
      convolution_param { num_output: 2 kernel_size: 3 pad: 1 } }
    layer { name: "p" type: "Pooling" bottom: "c" top: "p"
      pooling_param { kernel_size: 2 stride: 2 } }
    layer { name: "u" type: "Deconvolution" bottom: "p" top: "u"
      convolution_param { num_output: 2 kernel_size: 4 stride: 2 pad: 1 } }
    """)
    a, b = coord_map_from_to(net, "u", "data")
    assert (a, b) == (1, 0)
    assert crop_offsets(net, "u", "data") == 0


def test_coord_map_offset_and_errors():
    net = Net("""
    input: "data"
    layer { name: "p" type: "Pooling" bottom: "data" top: "p"
      pooling_param { kernel_size: 2 stride: 2 } }
    layer { name: "u" type: "Deconvolution" bottom: "p" top: "u"
      convolution_param { num_output: 2 kernel_size: 4 stride: 2 } }
    """)
    # pad 0 deconv leaves a half-kernel misalignment: offset 1
    assert crop_offsets(net, "u", "data") == 1
    with pytest.raises(ValueError):
        crop_offsets(net, "p", "data")   # scale 2 != 1


def test_resize_image_range_preserved(rng):
    im = rng.uniform(0.2, 0.8, size=(6, 6, 3)).astype(np.float32)
    out = resize_image(im, (12, 9))
    assert out.shape == (12, 9, 3)
    assert out.min() >= 0.19 and out.max() <= 0.81
