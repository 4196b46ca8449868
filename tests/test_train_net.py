"""Trainable-net stack: loss layers, fillers, filler-driven init, the
solver prototxt front-end, and numerical gradient checking.

Rebuilds the reference's training-side test surface (SURVEY §4):
per-layer forward checks against numpy references (the gtest layer tests),
a central-difference GradientChecker
(include/caffe/test/test_gradient_check_util.hpp) applied to layers and
losses via jax.grad, and a solver-convergence test in the spirit of
src/caffe/test/test_gradient_based_solver.cpp — here an inline solver
prototxt whose DummyData-fed net trains to near-zero loss end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nct_tpu.nn import LAYER_REGISTRY, Net, parse_prototxt
from nct_tpu.nn.fillers import fill
from nct_tpu.train.solver_proto import NetSolver, parse_solver_prototxt


# ---------------------------------------------------------------------------
# GradientChecker: central differences vs jax.grad (the reference's
# GradientChecker compares Backward_cpu against the same estimator).
# ---------------------------------------------------------------------------

def check_gradient(fn, x, step=1e-3, threshold=1e-2):
    """fn: array -> scalar.  Compares jax.grad(fn)(x) to central
    differences at every coordinate, with the reference checker's
    tolerance rule: |analytic - numeric| <= threshold * scale where
    scale = max(|analytic|, |numeric|, 1)
    (test_gradient_check_util.hpp:75-265)."""
    x = np.asarray(x, np.float64).astype(np.float32)
    analytic = np.asarray(jax.grad(lambda v: fn(v).astype(jnp.float32))(
        jnp.asarray(x))).reshape(-1)
    flat = x.reshape(-1)
    numeric = np.zeros_like(flat)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + step
        fp = float(fn(jnp.asarray(x)))
        flat[i] = orig - step
        fm = float(fn(jnp.asarray(x)))
        flat[i] = orig
        numeric[i] = (fp - fm) / (2 * step)
    scale = np.maximum(np.maximum(np.abs(analytic), np.abs(numeric)), 1.0)
    err = np.abs(analytic - numeric) / scale
    assert err.max() <= threshold, (err.max(), err.argmax())


def test_gradient_checker_conv():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    w = rng.standard_normal((3, 3, 2, 4)).astype(np.float32) * 0.5
    cfg = {"convolution_param": {"num_output": 4, "kernel_size": 3,
                                 "pad": 1}}
    conv = LAYER_REGISTRY["Convolution"]
    # step 1e-2 like the reference's conv checks (fp32 roundoff dominates
    # the FD estimate at smaller steps)
    check_gradient(
        lambda v: jnp.sum(conv({"w": jnp.asarray(w)}, cfg, v) ** 2), x,
        step=1e-2)
    check_gradient(
        lambda v: jnp.sum(
            conv({"w": v}, cfg, jnp.asarray(x)) ** 2), w, step=1e-2)


def test_gradient_checker_losses():
    rng = np.random.default_rng(1)
    scores = rng.standard_normal((4, 5)).astype(np.float32)
    labels = jnp.asarray([0, 2, 4, 1], jnp.int32)
    sml = LAYER_REGISTRY["SoftmaxWithLoss"]
    check_gradient(lambda v: sml({}, {}, v, labels), scores)

    a = rng.standard_normal((3, 7)).astype(np.float32)
    b = jnp.asarray(rng.standard_normal((3, 7)), jnp.float32)
    eu = LAYER_REGISTRY["EuclideanLoss"]
    check_gradient(lambda v: eu({}, {}, v, b), a)

    t = jnp.asarray(rng.uniform(size=(3, 7)) > 0.5, jnp.float32)
    sce = LAYER_REGISTRY["SigmoidCrossEntropyLoss"]
    check_gradient(lambda v: sce({}, {}, v, t), a)

    # L2 hinge is differentiable everywhere
    hl = LAYER_REGISTRY["HingeLoss"]
    cfg = {"hinge_loss_param": {"norm": "L2"}}
    check_gradient(
        lambda v: hl({}, cfg, v, jnp.asarray([1, 3, 0], jnp.int32)), a)


# ---------------------------------------------------------------------------
# Loss-layer forward semantics vs direct numpy references
# ---------------------------------------------------------------------------

def _np_softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def test_softmax_with_loss_matches_numpy():
    rng = np.random.default_rng(2)
    scores = rng.standard_normal((6, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=6)
    p = _np_softmax(scores)
    want = -np.mean(np.log(p[np.arange(6), labels]))
    got = LAYER_REGISTRY["SoftmaxWithLoss"](
        {}, {}, jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_softmax_with_loss_ignore_label_and_normalization():
    scores = jnp.asarray(np.random.default_rng(3).standard_normal((4, 3)),
                         jnp.float32)
    labels = jnp.asarray([0, 1, 2, 1], jnp.int32)
    sml = LAYER_REGISTRY["SoftmaxWithLoss"]
    full = sml({}, {}, scores, labels)
    # ignoring one label removes its term AND shrinks the VALID normalizer
    ig = sml({}, {"loss_param": {"ignore_label": 2}}, scores, labels)
    p = _np_softmax(np.asarray(scores))
    nll = -np.log(p[np.arange(4), np.asarray(labels)])
    np.testing.assert_allclose(float(full), nll.mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(ig), nll[[0, 1, 3]].mean(), rtol=1e-5)
    # BATCH_SIZE normalization divides by outer num regardless of mask
    bs = sml({}, {"loss_param": {"ignore_label": 2,
                                 "normalization": "BATCH_SIZE"}},
             scores, labels)
    np.testing.assert_allclose(float(bs), nll[[0, 1, 3]].sum() / 4,
                               rtol=1e-5)
    none = sml({}, {"loss_param": {"normalization": "NONE"}},
               scores, labels)
    np.testing.assert_allclose(float(none), nll.sum(), rtol=1e-5)


def test_softmax_with_loss_spatial_axis():
    """4-D NHWC scores with per-pixel labels (the (N,C,H,W) axis-1 case)."""
    rng = np.random.default_rng(4)
    scores = rng.standard_normal((2, 3, 3, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 3, 3))
    p = _np_softmax(scores)
    want = -np.mean(np.log(
        np.take_along_axis(p, labels[..., None], axis=-1)))
    got = LAYER_REGISTRY["SoftmaxWithLoss"](
        {}, {}, jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_euclidean_and_hinge_losses():
    a = np.asarray([[1.0, 2.0], [3.0, 4.0]], np.float32)
    b = np.asarray([[0.0, 2.0], [3.0, 2.0]], np.float32)
    got = LAYER_REGISTRY["EuclideanLoss"](
        {}, {}, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(got), (1 + 4) / (2 * 2))

    scores = np.asarray([[2.0, -1.0, 0.5]], np.float32)
    lab = jnp.asarray([0], jnp.int32)
    # flip the true class, hinge at margin 1: [max(0,1-2), max(0,1-1),
    # max(0,1+0.5)] = [0, 0, 1.5]
    l1 = LAYER_REGISTRY["HingeLoss"]({}, {}, jnp.asarray(scores), lab)
    np.testing.assert_allclose(float(l1), 1.5)
    l2 = LAYER_REGISTRY["HingeLoss"](
        {}, {"hinge_loss_param": {"norm": "L2"}}, jnp.asarray(scores), lab)
    np.testing.assert_allclose(float(l2), 2.25)


def test_sigmoid_cross_entropy_matches_naive():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    t = (rng.uniform(size=(3, 4)) > 0.5).astype(np.float32)
    s = 1 / (1 + np.exp(-x))
    want = -np.sum(t * np.log(s) + (1 - t) * np.log(1 - s)) / 3
    got = LAYER_REGISTRY["SigmoidCrossEntropyLoss"](
        {}, {}, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_accuracy_top_k_and_ignore():
    scores = jnp.asarray([[0.1, 0.9, 0.0],
                          [0.8, 0.1, 0.1],
                          [0.2, 0.3, 0.5],
                          [0.4, 0.5, 0.1]], jnp.float32)
    labels = jnp.asarray([1, 0, 1, 0], jnp.int32)
    acc = LAYER_REGISTRY["Accuracy"]
    # top-1 hits: rows 0 and 1 only
    np.testing.assert_allclose(float(acc({}, {}, scores, labels)), 0.5)
    # top-2 sets per row: {1,0},{0,1|2},{2,1},{1,0} -> all four hit
    top2 = acc({}, {"accuracy_param": {"top_k": 2}}, scores, labels)
    np.testing.assert_allclose(float(top2), 1.0)
    # ignoring label 0 keeps rows 0 and 2: hits 1 of 2
    ig = acc({}, {"accuracy_param": {"ignore_label": 0}}, scores, labels)
    np.testing.assert_allclose(float(ig), 0.5)


# ---------------------------------------------------------------------------
# Fillers + init_params
# ---------------------------------------------------------------------------

def test_fillers_constant_uniform_gaussian_xavier():
    key = jax.random.PRNGKey(0)
    c = fill(key, {"type": "constant", "value": 2.5}, (3, 4))
    assert float(c.min()) == float(c.max()) == 2.5
    u = fill(key, {"type": "uniform", "min": -1, "max": 1}, (1000,))
    assert -1 <= float(u.min()) and float(u.max()) <= 1
    g = fill(key, {"type": "gaussian", "mean": 1.0, "std": 0.1}, (5000,))
    assert abs(float(g.mean()) - 1.0) < 0.02
    # xavier FAN_IN: |w| <= sqrt(3/fan_in)
    x = fill(key, {"type": "xavier"}, (3, 3, 8, 16), fan_in=72, fan_out=144)
    bound = np.sqrt(3.0 / 72)
    assert float(jnp.abs(x).max()) <= bound + 1e-6
    m = fill(key, {"type": "msra"}, (3, 3, 8, 16), fan_in=72, fan_out=144)
    assert abs(float(m.std()) - np.sqrt(2.0 / 72)) < 0.02


def test_init_params_infers_shapes_through_dag():
    net = Net("""
        name: "tiny"
        input: "data"
        layer { name: "c1" type: "Convolution" bottom: "data" top: "c1"
          convolution_param { num_output: 6 kernel_size: 3 pad: 1
            weight_filler { type: "xavier" } } }
        layer { name: "r1" type: "ReLU" bottom: "c1" top: "c1" }
        layer { name: "p1" type: "Pooling" bottom: "c1" top: "p1"
          pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
        layer { name: "fc" type: "InnerProduct" bottom: "p1" top: "fc"
          inner_product_param { num_output: 4
            weight_filler { type: "gaussian" std: 0.01 } } }
    """)
    params = net.init_params({"data": (2, 8, 8, 3)}, seed=1)
    assert params["c1"]["w"].shape == (3, 3, 3, 6)
    assert params["c1"]["b"].shape == (6,)
    assert params["fc"]["w"].shape == (4 * 4 * 6, 4)
    out = net.forward({"data": jnp.zeros((2, 8, 8, 3))}, ("fc",))
    assert out["fc"].shape == (2, 4)


def test_dummy_data_layer_shapes_and_fillers():
    net = Net("""
        name: "dd"
        layer { name: "data" type: "DummyData" top: "x" top: "y"
          dummy_data_param {
            shape { dim: 4 dim: 3 dim: 2 dim: 2 }
            shape { dim: 4 dim: 1 }
            data_filler { type: "constant" value: 3.0 }
            data_filler { type: "constant" value: 1.0 } } }
    """)
    blobs = net.forward({})
    assert blobs["x"].shape == (4, 2, 2, 3)   # NCHW prototxt -> NHWC blob
    assert blobs["y"].shape == (4, 1)
    np.testing.assert_allclose(np.asarray(blobs["x"]), 3.0)
    np.testing.assert_allclose(np.asarray(blobs["y"]), 1.0)


def test_dropout_train_phase_masks_and_scales():
    net = Net("""
        name: "d"
        input: "data"
        layer { name: "drop" type: "Dropout" bottom: "data" top: "out"
          dropout_param { dropout_ratio: 0.5 } }
    """, phase="TRAIN")
    x = jnp.ones((64, 64))
    out = net.forward({"data": x}, ("out",),
                      rng=jax.random.PRNGKey(0))["out"]
    vals = np.unique(np.asarray(out))
    assert set(np.round(vals, 5)).issubset({0.0, 2.0})
    assert 0.3 < float((out > 0).mean()) < 0.7
    # TEST phase (no rng): identity
    np.testing.assert_allclose(
        np.asarray(net.forward({"data": x}, ("out",))["out"]), 1.0)


# ---------------------------------------------------------------------------
# Solver prototxt + end-to-end training (test_gradient_based_solver.cpp)
# ---------------------------------------------------------------------------

LINREG_SOLVER = """
net_param {
  name: "linreg"
  layer { name: "data" type: "DummyData" top: "x" top: "y"
    dummy_data_param {
      shape { dim: 16 dim: 3 }
      shape { dim: 16 dim: 1 }
      data_filler { type: "gaussian" std: 1.0 }
      data_filler { type: "constant" value: 1.0 } } }
  layer { name: "fc" type: "InnerProduct" bottom: "x" top: "pred"
    inner_product_param { num_output: 1
      weight_filler { type: "gaussian" std: 0.3 } } }
  layer { name: "loss" type: "EuclideanLoss" bottom: "pred" bottom: "y"
    top: "loss" }
}
base_lr: 0.2
lr_policy: "fixed"
momentum: 0.9
type: "SGD"
max_iter: 150
random_seed: 7
"""


def test_parse_solver_prototxt_fields():
    sp = parse_solver_prototxt(LINREG_SOLVER)
    assert sp.solver_params.lr.base_lr == 0.2
    assert sp.solver_params.opt.solver_type == "sgd"
    assert sp.solver_params.opt.momentum == 0.9
    assert sp.solver_params.max_iter == 150
    assert sp.random_seed == 7
    assert isinstance(sp.net, dict) and sp.net["name"] == "linreg"


def test_net_solver_trains_linear_regression_to_fit():
    ns = NetSolver(LINREG_SOLVER)
    first = ns.solver.step({})
    loss = ns.solve()
    # fixed DummyData -> the 3-weight linear model overfits to ~exactly
    assert loss < 0.05 * first, (first, loss)


@pytest.mark.parametrize("stype", ["adam", "nesterov", "rmsprop"])
def test_net_solver_other_optimizers_converge(stype):
    text = LINREG_SOLVER.replace('type: "SGD"', f'type: "{stype.upper()}"')
    text = text.replace("base_lr: 0.2",
                        "base_lr: 0.05" if stype != "nesterov"
                        else "base_lr: 0.2")
    ns = NetSolver(text)
    first = ns.solver.step({})
    loss = ns.solve()
    assert loss < 0.2 * first, (stype, first, loss)


def test_net_loss_fn_respects_loss_weight():
    net = Net("""
        name: "w"
        input: "a"
        input: "b"
        layer { name: "l" type: "EuclideanLoss" bottom: "a" bottom: "b"
          top: "l" loss_weight: 2.5 }
    """, phase="TRAIN")
    fn = net.make_loss_fn()
    a = jnp.ones((2, 3))
    b = jnp.zeros((2, 3))
    # euclidean = 6/(2*2) = 1.5; weighted by 2.5
    np.testing.assert_allclose(float(fn({}, {"a": a, "b": b})), 3.75)


def test_caffe_tool_test_subcommand(tmp_path, capsys):
    """`caffe test`: averaged scalar outputs over iterations."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    import caffe_tool

    model = tmp_path / "net.prototxt"
    model.write_text("""
        name: "acc"
        layer { name: "data" type: "DummyData" top: "x" top: "y"
          dummy_data_param {
            shape { dim: 8 dim: 4 }
            shape { dim: 8 dim: 1 }
            data_filler { type: "gaussian" std: 1.0 }
            data_filler { type: "constant" value: 1.0 } } }
        layer { name: "loss" type: "SoftmaxWithLoss" bottom: "x" bottom: "y"
          top: "loss" }
        layer { name: "acc" type: "Accuracy" bottom: "x" bottom: "y"
          top: "acc" }
    """)
    rc = caffe_tool.main(["test", "--model", str(model), "--iterations", "3"])
    assert rc == 0
    cap = capsys.readouterr()
    out = cap.out + cap.err      # scores log through glog (stderr)
    assert "loss = " in out and "acc = " in out


# ---------------------------------------------------------------------------
# ImageData layer + DataTransformer (image_data_layer.cpp,
# data_transformer.cpp)
# ---------------------------------------------------------------------------

def test_data_transformer_center_crop_mean_scale():
    from nct_tpu.data.image_data import DataTransformer

    img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    tr = DataTransformer(
        {"crop_size": 4, "mean_value": [1.0, 2.0, 3.0], "scale": 0.5},
        phase="TEST",
    )
    out = tr(img)
    assert out.shape == (4, 4, 3)
    # center crop offsets: h_off=(6-4)//2=1, w_off=(8-4)//2=2
    want = (img[1:5, 2:6].astype(np.float32)
            - np.asarray([1.0, 2.0, 3.0], np.float32)) * 0.5
    np.testing.assert_allclose(out, want)


def test_image_data_source_batches_and_wraparound(tmp_path):
    from nct_tpu.data.image_data import ImageDataSource

    lst = tmp_path / "list.txt"
    lst.write_text(
        "in/in0.png 0\n"
        "in/tar0.png 1\n"
    )
    cfg = {
        "top": ["data", "label"],
        "image_data_param": {
            "source": str(lst),
            "root_folder": "/root/reference/demo/example/",
            "batch_size": 3,
            "new_height": 16,
            "new_width": 16,
        },
    }
    src = ImageDataSource(cfg, phase="TEST")
    imgs, labels = src.next_batch()
    assert imgs.shape == (3, 16, 16, 3)
    # batch of 3 over a 2-line list wraps: labels 0, 1, 0
    np.testing.assert_allclose(labels, [0.0, 1.0, 0.0])
    imgs2, labels2 = src.next_batch()
    np.testing.assert_allclose(labels2, [1.0, 0.0, 1.0])
    assert np.isfinite(imgs).all() and imgs.max() > 1.0


def test_net_solver_trains_from_image_data_layer(tmp_path):
    """caffe train on a real image-list net: ImageData -> conv -> pool ->
    fc -> SoftmaxWithLoss, two demo images as a 2-class toy problem."""
    lst = tmp_path / "list.txt"
    lst.write_text("in/in0.png 0\nin/tar0.png 1\n")
    solver_text = f"""
net_param {{
  name: "imgnet"
  layer {{ name: "data" type: "ImageData" top: "data" top: "label"
    image_data_param {{
      source: "{lst}"
      root_folder: "/root/reference/demo/example/"
      batch_size: 2
      new_height: 16
      new_width: 16 }}
    transform_param {{ scale: 0.00390625 }} }}
  layer {{ name: "fc" type: "InnerProduct" bottom: "data" top: "score"
    inner_product_param {{ num_output: 2
      weight_filler {{ type: "xavier" }} }} }}
  layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "score"
    bottom: "label" top: "loss" }}
}}
base_lr: 0.1
lr_policy: "fixed"
momentum: 0.9
max_iter: 40
random_seed: 3
"""
    from nct_tpu.train.solver_proto import NetSolver

    ns = NetSolver(solver_text)
    loss = ns.solve()
    # two fixed images, a linear classifier: separable -> loss near 0
    assert loss < 0.1, loss
