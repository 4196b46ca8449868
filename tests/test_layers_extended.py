"""Extended layer-vocabulary tests: the common Caffe deploy ops beyond the
VGG path (src/caffe/layers/*), each checked against a small numpy
reference, plus the NCHW->NHWC axis-mapping contract for explicit
prototxt ``axis`` fields."""

import numpy as np
import jax.numpy as jnp

from nct_tpu.nn import Net
from nct_tpu.nn.layers import LAYER_REGISTRY, _nhwc_axis


def test_registry_covers_extended_types():
    for t in ("Power", "Exp", "Log", "AbsVal", "BNLL", "ELU", "PReLU",
              "Threshold", "Bias", "MVN", "Split", "Slice", "Crop",
              "Reshape", "Reduction", "ArgMax", "Deconvolution"):
        assert t in LAYER_REGISTRY


def test_axis_mapping():
    # NCHW axis -> NHWC axis for 4-D; identity otherwise
    assert [_nhwc_axis(i, 4) for i in range(4)] == [0, 3, 1, 2]
    assert _nhwc_axis(-1, 4) == 2
    assert _nhwc_axis(1, 2) == 1


def test_power_exp_log_absval_bnll_elu_threshold(rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 3, 2)), jnp.float32)
    xn = np.asarray(x)
    run = lambda t, p="": Net(
        'input: "d" layer { name: "l" type: "%s" bottom: "d" top: "o" %s }'
        % (t, p)
    ).forward({"d": x})["o"]

    np.testing.assert_allclose(
        np.asarray(run("Power", "power_param { power: 2 scale: 3 shift: 1 }")),
        (1 + 3 * xn) ** 2, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(run("Exp", "exp_param { scale: 0.5 }")),
        np.exp(0.5 * xn), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(run("Log", "log_param { shift: 5 base: 2 }")),
        np.log2(5 + xn), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(run("AbsVal")), np.abs(xn))
    np.testing.assert_allclose(
        np.asarray(run("BNLL")), np.log1p(np.exp(xn)), rtol=1e-5)
    a = 0.7
    np.testing.assert_allclose(
        np.asarray(run("ELU", "elu_param { alpha: 0.7 }")),
        np.where(xn > 0, xn, a * (np.exp(xn) - 1)), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(run("Threshold", "threshold_param { threshold: 0.1 }")),
        (xn > 0.1).astype(np.float32))


def test_prelu_channelwise(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)), jnp.float32)
    slope = np.asarray([0.1, 0.2, 0.3], np.float32)
    net = Net('input: "d" layer { name: "p" type: "PReLU" '
              'bottom: "d" top: "o" }')
    net.set_params("p", {"w": slope})
    out = np.asarray(net.forward({"d": x})["o"])
    xn = np.asarray(x)
    np.testing.assert_allclose(out, np.where(xn > 0, xn, xn * slope),
                               rtol=1e-6)


def test_bias_param_and_bottom(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 3)), jnp.float32)
    b = np.asarray([1.0, -2.0, 3.0], np.float32)
    net = Net('input: "d" layer { name: "b" type: "Bias" '
              'bottom: "d" top: "o" }')
    net.set_params("b", {"b": b})
    np.testing.assert_allclose(
        np.asarray(net.forward({"d": x})["o"]), np.asarray(x) + b)
    net2 = Net('input: "d" input: "bias" layer { name: "b" type: "Bias" '
               'bottom: "d" bottom: "bias" top: "o" }')
    out2 = net2.forward({"d": x, "bias": jnp.asarray(b)})["o"]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x) + b)


def test_mvn(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 4, 3)) * 3 + 1, jnp.float32)
    net = Net('input: "d" layer { name: "m" type: "MVN" '
              'bottom: "d" top: "o" }')
    out = np.asarray(net.forward({"d": x})["o"])
    # per-sample, per-channel (across_channels false): HW statistics
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=(1, 2)), 1.0, atol=1e-3)


def test_split_and_slice(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 6)), jnp.float32)
    net = Net("""
        input: "d"
        layer { name: "sp" type: "Split" bottom: "d" top: "s1" top: "s2" }
        layer { name: "sl" type: "Slice" bottom: "s1" top: "a" top: "b"
                slice_param { axis: 1 slice_point: 2 } }
    """)
    out = net.forward({"d": x})
    np.testing.assert_array_equal(np.asarray(out["s1"]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(out["s2"]), np.asarray(x))
    # axis: 1 is CHANNELS (NCHW semantics) -> NHWC trailing axis
    assert out["a"].shape == (1, 2, 2, 2)
    assert out["b"].shape == (1, 2, 2, 4)
    np.testing.assert_array_equal(
        np.asarray(out["a"]), np.asarray(x)[..., :2])


def test_concat_explicit_channel_axis(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 3)), jnp.float32)
    net = Net("""
        input: "a" input: "b"
        layer { name: "c" type: "Concat" bottom: "a" bottom: "b" top: "c"
                concat_param { axis: 1 } }
    """)
    out = net.forward({"a": x, "b": x})["c"]
    assert out.shape == (1, 2, 2, 6)      # channels, not height


def test_crop(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 9, 3)), jnp.float32)
    ref = jnp.zeros((1, 4, 5, 3), jnp.float32)
    net = Net("""
        input: "d" input: "r"
        layer { name: "c" type: "Crop" bottom: "d" bottom: "r" top: "o"
                crop_param { axis: 2 offset: 1 offset: 2 } }
    """)
    out = np.asarray(net.forward({"d": x, "r": ref})["o"])
    np.testing.assert_array_equal(out, np.asarray(x)[:, 1:5, 2:7, :])


def test_reshape_nchw_semantics(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 3, 4)), jnp.float32)
    net = Net("""
        input: "d"
        layer { name: "r" type: "Reshape" bottom: "d" top: "o"
                reshape_param { shape { dim: 0 dim: -1 } } }
    """)
    out = np.asarray(net.forward({"d": x})["o"])
    # caffe reshapes the NCHW view: flatten is C-major, then H, W
    want = np.asarray(x).transpose(0, 3, 1, 2).reshape(1, -1)
    np.testing.assert_array_equal(out, want)


def test_reduction_ops(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 5)), jnp.float32)
    xn = np.asarray(x).transpose(0, 3, 1, 2)   # NCHW view
    for op, ref in (
        ("SUM", xn.reshape(2, -1).sum(-1)),
        ("ASUM", np.abs(xn).reshape(2, -1).sum(-1)),
        ("SUMSQ", (xn * xn).reshape(2, -1).sum(-1)),
        ("MEAN", xn.reshape(2, -1).mean(-1)),
    ):
        net = Net(
            'input: "d" layer { name: "r" type: "Reduction" bottom: "d" '
            'top: "o" reduction_param { operation: %s axis: 1 coeff: 2 } }'
            % op
        )
        out = np.asarray(net.forward({"d": x})["o"])
        np.testing.assert_allclose(out, 2 * ref, rtol=1e-4)


def test_argmax(rng):
    x = jnp.asarray(rng.standard_normal((2, 1, 1, 7)), jnp.float32)
    net = Net('input: "d" layer { name: "a" type: "ArgMax" bottom: "d" '
              'top: "o" argmax_param { axis: 1 } }')
    out = np.asarray(net.forward({"d": x})["o"])
    want = np.asarray(x).argmax(axis=-1, keepdims=True)
    np.testing.assert_array_equal(out.astype(int), want)


def test_deconvolution_matches_dense(rng):
    """Deconv == scatter of stride-spaced copies of the kernel (the
    transpose of the forward conv), checked against a literal loop."""
    ci, co, k, s, pad = 3, 2, 3, 2, 1
    h = w = 4
    x = rng.standard_normal((1, h, w, ci)).astype(np.float32)
    w_caffe = rng.standard_normal((ci, co, k, k)).astype(np.float32)

    net = Net(
        'input: "d" layer { name: "dc" type: "Deconvolution" bottom: "d" '
        'top: "o" convolution_param { num_output: %d kernel_size: %d '
        'stride: %d pad: %d } }' % (co, k, s, pad)
    )
    # loader layout: flipped spatially, HWIO with I=C_in
    net.set_params("dc", {
        "w": np.ascontiguousarray(
            w_caffe[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    })
    out = np.asarray(net.forward({"d": jnp.asarray(x)})["o"])

    oh = s * (h - 1) + k - 2 * pad
    want = np.zeros((1, oh + 2 * pad, oh + 2 * pad, co), np.float32)
    for y in range(h):
        for xx in range(w):
            for c_in in range(ci):
                want[0, y * s:y * s + k, xx * s:xx * s + k, :] += (
                    x[0, y, xx, c_in]
                    * w_caffe[c_in].transpose(1, 2, 0)
                )
    want = want[:, pad:pad + oh, pad:pad + oh, :]
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
