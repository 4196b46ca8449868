"""Long-tail layer vocabulary (round-2 VERDICT #7): Embed, Tile, SPP,
BatchReindex, Contrastive/Infogain losses, and the recurrent stack
(RNN/LSTM as lax.scan cells), each against a small numpy reference —
plus a GradientChecker sweep parametrized over every differentiable
registered layer type (the reference grad-checks per layer-test file;
test_gradient_check_util.hpp:19-24)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nct_tpu.nn import Net
from nct_tpu.nn.layers import LAYER_REGISTRY
from tests.test_train_net import check_gradient


def test_registry_covers_longtail_types():
    for t in ("Embed", "Tile", "SPP", "BatchReindex", "ContrastiveLoss",
              "InfogainLoss", "RNN", "LSTM"):
        assert t in LAYER_REGISTRY


# ---------------------------------------------------------------------------
# Forward semantics vs numpy
# ---------------------------------------------------------------------------

def test_embed_forward(rng):
    w = rng.standard_normal((7, 4)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    idx = rng.integers(0, 7, size=(3, 5))
    out = LAYER_REGISTRY["Embed"](
        {"w": jnp.asarray(w), "b": jnp.asarray(b)}, {},
        jnp.asarray(idx, jnp.float32))
    assert out.shape == (3, 5, 4)
    np.testing.assert_allclose(np.asarray(out), w[idx] + b, rtol=1e-6)


def test_tile_whole_block_copies(rng):
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    # Caffe axis 1 = channels -> NHWC trailing axis
    out = LAYER_REGISTRY["Tile"](
        {}, {"tile_param": {"axis": 1, "tiles": 3}}, jnp.asarray(x))
    assert out.shape == (2, 3, 4, 15)
    np.testing.assert_array_equal(
        np.asarray(out), np.concatenate([x] * 3, axis=3))
    # tile along the batch axis of a 2-D blob
    x2 = rng.standard_normal((2, 3)).astype(np.float32)
    out2 = LAYER_REGISTRY["Tile"](
        {}, {"tile_param": {"axis": 0, "tiles": 2}}, jnp.asarray(x2))
    np.testing.assert_array_equal(
        np.asarray(out2), np.concatenate([x2] * 2, axis=0))


def test_batch_reindex(rng):
    x = rng.standard_normal((4, 3, 2, 5)).astype(np.float32)
    idx = np.asarray([2, 0, 0, 3, 1], np.float32)
    out = LAYER_REGISTRY["BatchReindex"](
        {}, {}, jnp.asarray(x), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), x[idx.astype(int)])


def test_spp_shapes_and_level0(rng):
    x = rng.standard_normal((2, 9, 7, 3)).astype(np.float32)
    out = LAYER_REGISTRY["SPP"](
        {}, {"spp_param": {"pyramid_height": 3}}, jnp.asarray(x))
    # sum over levels of C * 4^i = 3 * (1 + 4 + 16)
    assert out.shape == (2, 3 * 21)
    # level 0 (one bin) is a global max pool, first C entries in NCHW order
    np.testing.assert_allclose(
        np.asarray(out[:, :3]), x.max(axis=(1, 2)), rtol=1e-6)
    # level 1: 2x2 bins, kernel = ceil(dim/2), stride = kernel; verify one
    # bin against a direct numpy window max (bin (0,0): rows 0..4, cols 0..3
    # at 9x7 -> kernel 5x4, pad (5*2-9+1)//2 = 1, (4*2-7+1)//2 = 1, so the
    # first window covers rows -1..3, cols -1..2 of the unpadded image)
    lvl1 = np.asarray(out[:, 3:15]).reshape(2, 3, 2, 2)  # NCHW order
    np.testing.assert_allclose(
        lvl1[:, :, 0, 0], x[:, :4, :3, :].max(axis=(1, 2)).reshape(2, 3),
        rtol=1e-6)


def test_contrastive_loss_matches_numpy(rng):
    a = rng.standard_normal((5, 4)).astype(np.float32)
    b = rng.standard_normal((5, 4)).astype(np.float32)
    y = np.asarray([1, 0, 1, 0, 0], np.float32)
    margin = 2.0
    d2 = ((a - b) ** 2).sum(axis=1)
    want = np.where(
        y > 0, d2, np.maximum(margin - np.sqrt(d2), 0) ** 2
    ).sum() / (2 * 5)
    got = LAYER_REGISTRY["ContrastiveLoss"](
        {}, {"contrastive_loss_param": {"margin": margin}},
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(y))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # legacy: max(margin - d2, 0) unsquared
    want_l = np.where(y > 0, d2, np.maximum(margin - d2, 0)).sum() / 10
    got_l = LAYER_REGISTRY["ContrastiveLoss"](
        {}, {"contrastive_loss_param": {"margin": margin,
                                        "legacy_version": True}},
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(y))
    np.testing.assert_allclose(float(got_l), want_l, rtol=1e-5)


def test_infogain_loss(rng):
    p = rng.uniform(0.05, 1.0, size=(4, 5)).astype(np.float32)
    p /= p.sum(axis=1, keepdims=True)
    lab = np.asarray([0, 3, 2, 4])
    h = rng.uniform(0.0, 2.0, size=(5, 5)).astype(np.float32)
    want = -(h[lab] * np.log(np.maximum(p, 1e-20))).sum() / 4
    got = LAYER_REGISTRY["InfogainLoss"](
        {}, {}, jnp.asarray(p), jnp.asarray(lab, jnp.int32), jnp.asarray(h))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # identity H == MultinomialLogisticLoss
    got_i = LAYER_REGISTRY["InfogainLoss"](
        {}, {}, jnp.asarray(p), jnp.asarray(lab, jnp.int32))
    want_i = LAYER_REGISTRY["MultinomialLogisticLoss"](
        {}, {}, jnp.asarray(p), jnp.asarray(lab, jnp.int32))
    np.testing.assert_allclose(float(got_i), float(want_i), rtol=1e-5)


# ---------------------------------------------------------------------------
# Recurrent stack
# ---------------------------------------------------------------------------

def _lstm_params(rng, d, h):
    return {
        "w_x": jnp.asarray(rng.standard_normal((d, 4 * h)) * 0.3,
                           jnp.float32),
        "w_h": jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.3,
                           jnp.float32),
        "b": jnp.asarray(rng.standard_normal(4 * h) * 0.1, jnp.float32),
    }


def _np_lstm(params, x, cont):
    """Step-by-step numpy LSTM with Caffe's i,f,o,g order and cont gating
    (lstm_layer.hpp:26-31, lstm_unit semantics)."""
    wx = np.asarray(params["w_x"]); wh = np.asarray(params["w_h"])
    b = np.asarray(params["b"])
    t, n, d = x.shape
    h_dim = wh.shape[0]
    h = np.zeros((n, h_dim), np.float32)
    c = np.zeros((n, h_dim), np.float32)
    sig = lambda v: 1 / (1 + np.exp(-v))
    outs = []
    for step in range(t):
        hc = h * cont[step][:, None]
        g = x[step] @ wx + b + hc @ wh
        i, f, o, gg = np.split(g, 4, axis=1)
        c = cont[step][:, None] * (sig(f) * c) + sig(i) * np.tanh(gg)
        h = sig(o) * np.tanh(c)
        outs.append(h)
    return np.stack(outs)


def test_lstm_matches_numpy(rng):
    t, n, d, h = 4, 3, 5, 6
    x = rng.standard_normal((t, n, d)).astype(np.float32)
    cont = np.ones((t, n), np.float32)
    cont[0] = 0            # Caffe streams start with cont=0
    cont[2, 1] = 0         # mid-sequence restart on one stream
    params = _lstm_params(rng, d, h)
    cfg = {"recurrent_param": {"num_output": h}}
    got = LAYER_REGISTRY["LSTM"](params, cfg, jnp.asarray(x),
                                 jnp.asarray(cont))
    np.testing.assert_allclose(
        np.asarray(got), _np_lstm(params, x, cont), rtol=1e-5, atol=1e-6)


def test_lstm_cont_restart_equals_fresh_run(rng):
    """cont=0 at step k must make steps k.. independent of steps <k
    (recurrent_layer.hpp cont semantics)."""
    t, n, d, h = 6, 2, 4, 5
    x = rng.standard_normal((t, n, d)).astype(np.float32)
    params = _lstm_params(rng, d, h)
    cfg = {"recurrent_param": {"num_output": h}}
    cont = np.ones((t, n), np.float32)
    cont[3] = 0
    full = np.asarray(LAYER_REGISTRY["LSTM"](
        params, cfg, jnp.asarray(x), jnp.asarray(cont)))
    fresh = np.asarray(LAYER_REGISTRY["LSTM"](
        params, cfg, jnp.asarray(x[3:]),
        jnp.asarray(np.vstack([np.zeros((1, n)), np.ones((2, n))]),
                    jnp.float32)))
    np.testing.assert_allclose(full[3:], fresh, rtol=1e-5, atol=1e-6)


def test_rnn_forward_and_expose_hidden(rng):
    t, n, d, h = 3, 2, 4, 4
    x = rng.standard_normal((t, n, d)).astype(np.float32)
    cont = np.ones((t, n), np.float32); cont[0] = 0
    params = {
        "w_x": jnp.asarray(rng.standard_normal((d, h)) * 0.4, jnp.float32),
        "w_h": jnp.asarray(rng.standard_normal((h, h)) * 0.4, jnp.float32),
        "b": jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32),
        "w_o": jnp.asarray(rng.standard_normal((h, h)) * 0.4, jnp.float32),
        "b_o": jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32),
    }
    cfg = {"recurrent_param": {"num_output": h}}
    out = LAYER_REGISTRY["RNN"](params, cfg, jnp.asarray(x),
                                jnp.asarray(cont))
    # numpy reference (rnn_layer.hpp:24-26)
    hh = np.zeros((n, h), np.float32)
    outs = []
    for s in range(t):
        hh = np.tanh((hh * cont[s][:, None]) @ np.asarray(params["w_h"])
                     + x[s] @ np.asarray(params["w_x"])
                     + np.asarray(params["b"]))
        outs.append(np.tanh(hh @ np.asarray(params["w_o"])
                            + np.asarray(params["b_o"])))
    np.testing.assert_allclose(np.asarray(out), np.stack(outs),
                               rtol=1e-5, atol=1e-6)
    # expose_hidden: h0 bottom + final-state top
    cfg_e = {"recurrent_param": {"num_output": h, "expose_hidden": True}}
    h0 = jnp.asarray(rng.standard_normal((1, n, h)) * 0.5, jnp.float32)
    out_e, h_last = LAYER_REGISTRY["RNN"](
        params, cfg_e, jnp.asarray(x), jnp.asarray(cont), h0)
    assert h_last.shape == (1, n, h)
    # cont[0]=0 zeroes h0's influence; outputs must match the plain run
    np.testing.assert_allclose(np.asarray(out_e), np.stack(outs),
                               rtol=1e-5, atol=1e-6)


def test_recurrent_net_init_and_forward(rng):
    """Prototxt-driven RNN/LSTM through Net.init_params + forward (the
    unrolled-net path of recurrent_layer.cpp, here one scan program)."""
    proto = """
    input: "x" input: "cont"
    layer { name: "lstm" type: "LSTM" bottom: "x" bottom: "cont"
            top: "h" recurrent_param { num_output: 6
              weight_filler { type: "uniform" min: -0.1 max: 0.1 } } }
    layer { name: "rnn" type: "RNN" bottom: "h" bottom: "cont"
            top: "o" recurrent_param { num_output: 3
              weight_filler { type: "uniform" min: -0.1 max: 0.1 } } }
    """
    net = Net(proto)
    params = net.init_params({"x": (4, 2, 5), "cont": (4, 2)})
    assert params["lstm"]["w_x"].shape == (5, 24)
    assert params["rnn"]["w_x"].shape == (6, 3)
    x = jnp.asarray(rng.standard_normal((4, 2, 5)), jnp.float32)
    cont = jnp.ones((4, 2), jnp.float32).at[0].set(0.0)
    out = net.forward({"x": x, "cont": cont})["o"]
    assert out.shape == (4, 2, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# GradientChecker sweep over every differentiable registered layer
# (reference: each layer test file runs GradientChecker;
#  test_gradient_check_util.hpp:19-24)
# ---------------------------------------------------------------------------

def _x4(r, shape=(1, 4, 4, 2)):
    # offset from 0 so ReLU/AbsVal kinks and pooling ties are avoided
    return (r.standard_normal(shape) * 0.5 + np.where(
        r.uniform(size=shape) > 0.5, 1.0, -1.0)).astype(np.float32)


def _grad_cases():
    r = np.random.default_rng(42)
    x = _x4(r)
    x2 = r.standard_normal((3, 6)).astype(np.float32)
    lab = jnp.asarray([1, 0, 2], jnp.int32)
    pos = (r.uniform(0.2, 2.0, size=(1, 4, 4, 2))).astype(np.float32)
    seq = r.standard_normal((3, 2, 4)).astype(np.float32)
    cont = jnp.asarray(np.vstack([np.zeros((1, 2)), np.ones((2, 2))]),
                       jnp.float32)
    rec_p = {
        "w_x": jnp.asarray(r.standard_normal((4, 12)) * 0.3, jnp.float32),
        "w_h": jnp.asarray(r.standard_normal((3, 12)) * 0.3, jnp.float32),
        "b": jnp.asarray(r.standard_normal(12) * 0.1, jnp.float32),
    }
    rnn_p = {
        "w_x": jnp.asarray(r.standard_normal((4, 3)) * 0.3, jnp.float32),
        "w_h": jnp.asarray(r.standard_normal((3, 3)) * 0.3, jnp.float32),
        "b": jnp.asarray(r.standard_normal(3) * 0.1, jnp.float32),
        "w_o": jnp.asarray(r.standard_normal((3, 3)) * 0.3, jnp.float32),
        "b_o": jnp.asarray(r.standard_normal(3) * 0.1, jnp.float32),
    }
    emb_w = r.standard_normal((5, 3)).astype(np.float32)
    ip_w = jnp.asarray(r.standard_normal((6, 3)), jnp.float32)
    dec_w = jnp.asarray(r.standard_normal((2, 2, 2, 2)) * 0.4, jnp.float32)
    cl_b = jnp.asarray(r.standard_normal((3, 4)), jnp.float32)
    ig_h = jnp.asarray(r.uniform(0, 2, (6, 6)), jnp.float32)
    sq = lambda t: jnp.sum(t ** 2) if not isinstance(t, (tuple, list)) \
        else jnp.sum(t[0] ** 2)
    L = LAYER_REGISTRY
    cases = {
        "ReLU": (lambda v: sq(L["ReLU"]({}, {}, v)), x),
        "Sigmoid": (lambda v: sq(L["Sigmoid"]({}, {}, v)), x),
        "TanH": (lambda v: sq(L["TanH"]({}, {}, v)), x),
        "ELU": (lambda v: sq(L["ELU"]({}, {}, v)), x),
        "BNLL": (lambda v: sq(L["BNLL"]({}, {}, v)), x),
        "AbsVal": (lambda v: sq(L["AbsVal"]({}, {}, v)), x),
        "Power": (lambda v: sq(L["Power"](
            {}, {"power_param": {"power": 2, "scale": 0.5, "shift": 3}},
            v)), x),
        "Exp": (lambda v: sq(L["Exp"]({}, {}, v)), x),
        "Log": (lambda v: sq(L["Log"](
            {}, {"log_param": {"shift": 0.0}}, v)), pos),
        "PReLU": (lambda v: sq(L["PReLU"](
            {"w": jnp.asarray([0.2, 0.4])}, {}, v)), x),
        "Softmax": (lambda v: sq(L["Softmax"]({}, {}, v)), x2),
        "LRN": (lambda v: sq(L["LRN"]({}, {}, v)), x),
        "MVN": (lambda v: sq(L["MVN"]({}, {}, v)), x),
        "Scale": (lambda v: sq(L["Scale"](
            {"w": jnp.asarray([1.5, 0.5]), "b": jnp.asarray([0.1, -0.2])},
            {}, v)), x),
        "Bias": (lambda v: sq(L["Bias"](
            {"b": jnp.asarray([0.3, -0.1])}, {}, v)), x),
        "Flatten": (lambda v: sq(L["Flatten"]({}, {}, v)), x),
        "Reshape": (lambda v: sq(L["Reshape"](
            {}, {"reshape_param": {"shape": {"dim": [0, -1]}}}, v)), x2),
        "Reduction": (lambda v: sq(L["Reduction"](
            {}, {"reduction_param": {"operation": "SUMSQ"}}, v)), x2),
        "Concat": (lambda v: sq(L["Concat"]({}, {}, v, v)), x),
        "Eltwise": (lambda v: sq(L["Eltwise"](
            {}, {"eltwise_param": {"operation": "PROD"}}, v, v)), x),
        "Split": (lambda v: sq(L["Split"]({}, {}, v)), x),
        "Slice": (lambda v: sq(L["Slice"](
            {}, {"slice_param": {"axis": 1, "slice_point": 1}}, v)), x),
        "Tile": (lambda v: sq(L["Tile"](
            {}, {"tile_param": {"axis": 1, "tiles": 2}}, v)), x),
        "BatchReindex": (lambda v: sq(L["BatchReindex"](
            {}, {}, v, jnp.asarray([1, 0, 1], jnp.float32))), x2),
        "Pooling_AVE": (lambda v: sq(L["Pooling"](
            {}, {"pooling_param": {"pool": "AVE", "kernel_size": 2,
                                   "stride": 2}}, v)), x),
        "Pooling_MAX": (lambda v: sq(L["Pooling"](
            {}, {"pooling_param": {"pool": "MAX", "kernel_size": 2,
                                   "stride": 2}}, v)), x),
        "SPP": (lambda v: sq(L["SPP"](
            {}, {"spp_param": {"pyramid_height": 2}}, v)), x),
        "InnerProduct": (lambda v: sq(L["InnerProduct"](
            {"w": ip_w}, {}, v)), x2),
        "Embed_w": (lambda v: sq(L["Embed"](
            {"w": v}, {}, jnp.asarray([0, 2, 4, 1], jnp.float32))), emb_w),
        "BatchNorm": (lambda v: sq(L["BatchNorm"](
            {"mean": jnp.asarray([0.1, -0.2]),
             "var": jnp.asarray([1.2, 0.8])}, {}, v)), x),
        "Deconvolution": (lambda v: sq(L["Deconvolution"](
            {"w": dec_w},
            {"convolution_param": {"num_output": 2, "kernel_size": 2,
                                   "stride": 2}}, v)), x),
        "LSTM": (lambda v: sq(L["LSTM"](
            rec_p, {"recurrent_param": {"num_output": 3}}, v, cont)), seq),
        "RNN": (lambda v: sq(L["RNN"](
            rnn_p, {"recurrent_param": {"num_output": 3}}, v, cont)), seq),
        "ContrastiveLoss": (lambda v: L["ContrastiveLoss"](
            {}, {"contrastive_loss_param": {"margin": 2.0}}, v, cl_b,
            jnp.asarray([1, 0, 0], jnp.float32)),
            r.standard_normal((3, 4)).astype(np.float32)),
        "InfogainLoss": (lambda v: L["InfogainLoss"](
            {}, {}, jax.nn.softmax(v, axis=-1), lab, ig_h), x2),
        "LRN_within": (lambda v: sq(L["LRN"](
            {}, {"lrn_param": {"norm_region": "WITHIN_CHANNEL",
                               "local_size": 3}}, v)), x),
        "SmoothL1LossOHEM": (lambda v: L["SmoothL1LossOHEM"](
            {}, {}, v, jnp.zeros_like(v))[0], x2),
        "SoftmaxWithLossOHEM": (lambda v: L["SoftmaxWithLossOHEM"](
            {}, {}, v, lab)[0], x2),
    }
    return cases


_CASES = _grad_cases()


@pytest.mark.parametrize("name", sorted(_CASES))
def test_gradcheck_registry(name):
    fn, x = _CASES[name]
    step = 1e-2 if name in ("Deconvolution", "LSTM", "RNN", "LRN") else 1e-3
    check_gradient(lambda v: fn(v).astype(jnp.float32), x, step=step)
