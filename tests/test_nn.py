"""nn graph framework tests: prototxt parsing, layer semantics, and parity
of the prototxt-driven Net against the hand-written VGG-19 path on the
reference's actual deploy prototxt."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from nct_tpu.models import vgg19
from nct_tpu.nn import Net, parse_prototxt
from nct_tpu.nn.layers import LAYER_REGISTRY

DEPLOY = "/root/reference/demo/model/vgg19/VGG_ILSVRC_19_layers_deploy.prototxt"


def test_parse_prototxt_structure():
    msg = parse_prototxt("""
        name: "tiny"
        input: "data"
        input_shape { dim: 1 dim: 3 }
        layer {
          name: "c1" type: "Convolution" bottom: "data" top: "c1"
          convolution_param { num_output: 8 pad: 1 kernel_size: 3 }
        }
        layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
    """)
    assert msg["name"] == "tiny"
    assert len(msg["layer"]) == 2
    assert msg["layer"][0]["convolution_param"]["num_output"] == 8
    assert msg["input_shape"][0]["dim"] == [1, 3]


def test_registry_covers_common_types():
    for t in ("Convolution", "ReLU", "Pooling", "InnerProduct", "Softmax",
              "Dropout", "Concat", "Eltwise", "BatchNorm", "Scale", "LRN"):
        assert t in LAYER_REGISTRY


def test_inplace_relu_semantics(rng):
    net = Net("""
        input: "data"
        layer { name: "c" type: "Convolution" bottom: "data" top: "c"
                convolution_param { num_output: 4 kernel_size: 1 } }
        layer { name: "r" type: "ReLU" bottom: "c" top: "c" }
    """)
    w = rng.standard_normal((1, 1, 3, 4)).astype(np.float32)
    net.set_params("c", {"w": w})
    x = jnp.asarray(rng.standard_normal((1, 5, 5, 3)), jnp.float32)
    out = net.forward({"data": x})["c"]
    # blob "c" is post-ReLU (the reference's in-place overwrite, SURVEY §3.3)
    assert np.asarray(out).min() >= 0.0


@pytest.mark.skipif(
    not os.path.exists(DEPLOY), reason="reference deploy prototxt missing"
)
def test_vgg19_deploy_matches_handwritten(rng):
    """The generic Net on the reference's own prototxt must reproduce the
    specialised vgg19.features path (same weights, same taps)."""
    net = Net(DEPLOY)
    params = vgg19.init_params()
    for name, _ in vgg19.VGG19_CONV_LAYERS:
        net.set_params(name, params[name])

    img = rng.integers(0, 256, (36, 40, 3)).astype(np.uint8)
    x = vgg19.preprocess_bgr(jnp.asarray(img))
    taps = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")
    got = net.forward({"data": x}, taps)
    want = vgg19.features(params, jnp.asarray(img), taps)
    for t in taps:
        np.testing.assert_allclose(
            np.asarray(got[t][0]), np.asarray(want[t]),
            rtol=2e-3, atol=2e-3,
        )


def test_pooling_ave_and_global(rng):
    net = Net("""
        input: "data"
        layer { name: "p" type: "Pooling" bottom: "data" top: "p"
                pooling_param { pool: AVE kernel_size: 2 stride: 2 } }
    """)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    out = np.asarray(net.forward({"data": x})["p"])
    want = np.asarray(x).reshape(1, 2, 2, 2, 2, 2).mean(axis=(2, 4))
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_eltwise_and_concat(rng):
    net = Net("""
        input: "a"
        input: "b"
        layer { name: "s" type: "Eltwise" bottom: "a" bottom: "b" top: "s" }
        layer { name: "c" type: "Concat" bottom: "a" bottom: "s" top: "c" }
    """)
    a = jnp.ones((1, 2, 2, 3))
    b = jnp.full((1, 2, 2, 3), 2.0)
    out = net.forward({"a": a, "b": b})
    np.testing.assert_allclose(np.asarray(out["s"]), 3.0)
    assert out["c"].shape == (1, 2, 2, 6)


def test_train_phase_filtering():
    net = Net("""
        input: "data"
        layer { name: "drop" type: "Dropout" bottom: "data" top: "data"
                include { phase: TRAIN } }
        layer { name: "r" type: "ReLU" bottom: "data" top: "out" }
    """, phase="TEST")
    assert [c["name"] for c in net.layers] == ["r"]
