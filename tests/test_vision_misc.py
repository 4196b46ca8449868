"""ROI/PSROI pooling vs direct numpy ports of the reference kernels, plus
the misc long-tail types (Silence, Im2col, Parameter, LSTMUnit,
SmoothL1Loss, HDF5Output, Filter, MemoryData)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nct_tpu.nn.layers import LAYER_REGISTRY


def test_registry_covers_vision_and_misc():
    for t in ("ROIPooling", "PSROIPooling", "SmoothL1Loss", "Silence",
              "Im2col", "Parameter", "LSTMUnit", "HDF5Output", "Filter"):
        assert t in LAYER_REGISTRY


# --- numpy ports of the reference kernels -----------------------------------

def _np_roi_pool(x, rois, ph, pw, ss):
    """roi_pooling_layer.cpp:41-120 loop, NHWC."""
    n, h, w, c = x.shape
    out = np.zeros((len(rois), ph, pw, c), np.float32)
    for r, roi in enumerate(rois):
        b = int(roi[0])
        xs, ys, xe, ye = [int(round(v * ss)) for v in roi[1:]]
        rh = max(ye - ys + 1, 1)
        rw = max(xe - xs + 1, 1)
        for i in range(ph):
            for j in range(pw):
                hs = min(max(int(np.floor(i * rh / ph)) + ys, 0), h)
                he = min(max(int(np.ceil((i + 1) * rh / ph)) + ys, 0), h)
                ws = min(max(int(np.floor(j * rw / pw)) + xs, 0), w)
                we = min(max(int(np.ceil((j + 1) * rw / pw)) + xs, 0), w)
                if he <= hs or we <= ws:
                    continue
                out[r, i, j] = x[b, hs:he, ws:we].max(axis=(0, 1))
    return out


def _np_psroi_pool(x, rois, out_dim, gs, ss):
    """psroi_pooling_layer.cu PSROIPoolingForward loop, NHWC."""
    n, h, w, c = x.shape
    out = np.zeros((len(rois), gs, gs, out_dim), np.float32)
    for r, roi in enumerate(rois):
        b = int(roi[0])
        xs = round(roi[1]) * ss
        ys = round(roi[2]) * ss
        xe = round(roi[3] + 1.0) * ss
        ye = round(roi[4] + 1.0) * ss
        rh = max(ye - ys, 0.1)
        rw = max(xe - xs, 0.1)
        for i in range(gs):
            for j in range(gs):
                hs = min(max(int(np.floor(i * rh / gs + ys)), 0), h)
                he = min(max(int(np.ceil((i + 1) * rh / gs + ys)), 0), h)
                ws = min(max(int(np.floor(j * rw / gs + xs)), 0), w)
                we = min(max(int(np.ceil((j + 1) * rw / gs + xs)), 0), w)
                if he <= hs or we <= ws:
                    continue
                for ct in range(out_dim):
                    cc = (ct * gs + i) * gs + j
                    out[r, i, j, ct] = x[b, hs:he, ws:we, cc].mean()
    return out


def test_roi_pooling_matches_reference_loop(rng):
    x = rng.standard_normal((2, 12, 16, 3)).astype(np.float32)
    rois = np.asarray([
        [0, 0, 0, 30, 22],       # full image at ss=0.5
        [1, 4, 2, 14, 10],
        [0, 8, 6, 9, 7],         # tiny roi
    ], np.float32)
    cfg = {"roi_pooling_param": {"pooled_h": 4, "pooled_w": 4,
                                 "spatial_scale": 0.5}}
    got = np.asarray(LAYER_REGISTRY["ROIPooling"](
        {}, cfg, jnp.asarray(x), jnp.asarray(rois)))
    want = _np_roi_pool(x, rois, 4, 4, 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_psroi_pooling_matches_reference_loop(rng):
    gs, out_dim = 3, 2
    x = rng.standard_normal((2, 10, 12, out_dim * gs * gs)).astype(
        np.float32)
    rois = np.asarray([
        [0, 1, 1, 20, 16],
        [1, 0, 0, 6, 5],
    ], np.float32)
    cfg = {"psroi_pooling_param": {"output_dim": out_dim, "group_size": gs,
                                   "spatial_scale": 0.5}}
    got = np.asarray(LAYER_REGISTRY["PSROIPooling"](
        {}, cfg, jnp.asarray(x), jnp.asarray(rois)))
    want = _np_psroi_pool(x, rois, out_dim, gs, 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_smooth_l1_loss(rng):
    pred = rng.standard_normal((4, 6)).astype(np.float32) * 2
    targ = rng.standard_normal((4, 6)).astype(np.float32)
    sigma = 2.0
    d = pred - targ
    s2 = sigma * sigma
    want = np.where(np.abs(d) < 1 / s2, 0.5 * d * d * s2,
                    np.abs(d) - 0.5 / s2).sum() / 4
    got = LAYER_REGISTRY["SmoothL1Loss"](
        {}, {"smooth_l1_loss_param": {"sigma": sigma}},
        jnp.asarray(pred), jnp.asarray(targ))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # gradient check (the reference grad-checks via GPU backward)
    from tests.test_train_net import check_gradient

    check_gradient(
        lambda v: LAYER_REGISTRY["SmoothL1Loss"](
            {}, {"smooth_l1_loss_param": {"sigma": 1.0}}, v,
            jnp.asarray(targ)), pred)


def test_im2col_matches_patch_order(rng):
    x = rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
    cfg = {"convolution_param": {"kernel_size": 3, "stride": 1, "pad": 0}}
    out = np.asarray(LAYER_REGISTRY["Im2col"]({}, cfg, jnp.asarray(x)))
    assert out.shape == (1, 3, 3, 2 * 9)
    # tap (ky=1, kx=2) of output pixel (0, 0) = input (1, 2); channel
    # block layout [C, k*k] flattened
    np.testing.assert_allclose(
        out[0, 0, 0].reshape(2, 9)[:, 1 * 3 + 2], x[0, 1, 2])


def test_silence_and_parameter(rng):
    assert LAYER_REGISTRY["Silence"]({}, {}, jnp.ones((2, 2))) == ()
    w = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(LAYER_REGISTRY["Parameter"]({"w": w}, {})), w)
    # Net fills Parameter from parameter_param
    from nct_tpu.nn import Net

    net = Net("""
    input: "d"
    layer { name: "p" type: "Parameter" top: "w"
      parameter_param { shape { dim: 2 dim: 3 }
        filler { type: "constant" value: 2.5 } } }
    layer { name: "s" type: "Scale" bottom: "d" top: "o" }
    """)
    params = net.init_params({"d": (1, 3)})
    assert params["p"]["w"].shape == (2, 3)
    np.testing.assert_allclose(np.asarray(params["p"]["w"]), 2.5)


def test_lstm_unit_single_step(rng):
    n, hd = 3, 4
    c_prev = jnp.asarray(rng.standard_normal((1, n, hd)), jnp.float32)
    gates = jnp.asarray(rng.standard_normal((1, n, 4 * hd)), jnp.float32)
    cont = jnp.asarray([[1.0, 0.0, 1.0]], jnp.float32)
    c, h = LAYER_REGISTRY["LSTMUnit"]({}, {}, c_prev, gates, cont)
    sig = lambda v: 1 / (1 + np.exp(-np.asarray(v)))
    i, f, o, g = np.split(np.asarray(gates), 4, axis=-1)
    want_c = np.asarray(cont)[..., None] * sig(f) * np.asarray(c_prev) \
        + sig(i) * np.tanh(g)
    np.testing.assert_allclose(np.asarray(c), want_c, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h), sig(o) * np.tanh(want_c), rtol=1e-5, atol=1e-6)


def test_filter_eager_and_traced(rng):
    x = rng.standard_normal((4, 3)).astype(np.float32)
    sel = np.asarray([1, 0, 1, 0], np.float32)
    out = LAYER_REGISTRY["Filter"]({}, {}, jnp.asarray(x),
                                   jnp.asarray(sel))
    np.testing.assert_allclose(np.asarray(out), x[[0, 2]])
    with pytest.raises(NotImplementedError):
        jax.jit(lambda a, s: LAYER_REGISTRY["Filter"]({}, {}, a, s))(
            jnp.asarray(x), jnp.asarray(sel))


def test_hdf5_output_writes_batches(tmp_path, rng):
    import h5py

    path = str(tmp_path / "out.h5")
    data = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    label = jnp.asarray([1.0, 0.0], jnp.float32)
    cfg = {"hdf5_output_param": {"file_name": path}}
    LAYER_REGISTRY["HDF5Output"]({}, cfg, data, label)
    jax.effects_barrier()
    with h5py.File(path, "r") as f:
        np.testing.assert_allclose(f["data_0"][...], np.asarray(data))
        np.testing.assert_allclose(f["label_0"][...], [1.0, 0.0])


def test_memory_data_source(rng):
    from nct_tpu.data.memory_data import MemoryDataSource

    data = rng.standard_normal((4, 2, 2, 3)).astype(np.float32)
    labels = np.arange(4, dtype=np.float32)
    src = MemoryDataSource(
        {"memory_data_param": {"batch_size": 2},
         "__arrays__": (data, labels)})
    d1, l1 = src.next_batch()
    np.testing.assert_allclose(l1, [0, 1])
    d2, l2 = src.next_batch()
    np.testing.assert_allclose(l2, [2, 3])
    d3, l3 = src.next_batch()           # wraps
    np.testing.assert_allclose(l3, [0, 1])
    with pytest.raises(ValueError):
        src.reset(data[:3], labels[:3])  # 3 % 2 != 0


# ---------------------------------------------------------------------------
# R-FCN OHEM trio + LRN WITHIN_CHANNEL (op-library completion, round 3)
# ---------------------------------------------------------------------------

def _np_box_annotator_ohem(rois, loss, labels, bbox_w, roi_per_img,
                           ignore_label):
    """box_annotator_ohem_layer.cu:16-75 host loop, NHWC blobs."""
    n, h, w, _ = rois.shape
    r = n * h * w
    b = rois[..., 0].reshape(r).astype(int)
    l = loss.reshape(r)
    top_labels = np.full_like(labels, ignore_label)
    top_w = np.zeros_like(bbox_w)
    order = sorted(range(r), key=lambda i: -l[i])
    left = {}
    for i in order:
        bi = b[i]
        left.setdefault(bi, roi_per_img)
        if left[bi] > 0:
            left[bi] -= 1
            ni, rem = divmod(i, h * w)
            hi, wi = divmod(rem, w)
            top_labels[ni, hi, wi, 0] = labels[ni, hi, wi, 0]
            top_w[ni, hi, wi, :] = bbox_w[ni, hi, wi, :]
    return top_labels, top_w


def test_box_annotator_ohem_matches_reference_loop(rng):
    n, h, w, c = 8, 2, 3, 4
    rois = np.zeros((n, h, w, 5), np.float32)
    rois[..., 0] = rng.integers(0, 2, size=(n, h, w))  # 2 images
    loss = rng.standard_normal((n, h, w, 1)).astype(np.float32)
    labels = rng.integers(0, 5, size=(n, h, w, 1)).astype(np.float32)
    bbox_w = rng.standard_normal((n, h, w, c)).astype(np.float32)
    cfg = {"box_annotator_ohem_param": {"roi_per_img": 3,
                                        "ignore_label": -1}}
    got_l, got_w = LAYER_REGISTRY["BoxAnnotatorOHEM"](
        {}, cfg, jnp.asarray(rois), jnp.asarray(loss), jnp.asarray(labels),
        jnp.asarray(bbox_w))
    want_l, want_w = _np_box_annotator_ohem(
        rois, loss, labels, bbox_w, 3, -1)
    np.testing.assert_allclose(np.asarray(got_l), want_l)
    np.testing.assert_allclose(np.asarray(got_w), want_w)
    # keeps exactly roi_per_img per image (both images have >3 rois here)
    assert int((np.asarray(got_l) != -1).sum()) == 6


def test_smooth_l1_ohem_loss_and_per_position(rng):
    pred = rng.standard_normal((2, 3, 3, 4)).astype(np.float32) * 2
    tgt = rng.standard_normal((2, 3, 3, 4)).astype(np.float32)
    wts = rng.random((2, 3, 3, 4)).astype(np.float32)
    d = (pred - tgt) * wts
    err = np.where(np.abs(d) < 1, 0.5 * d * d, np.abs(d) - 0.5)
    loss, per = LAYER_REGISTRY["SmoothL1LossOHEM"](
        {}, {}, jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(wts))
    # default normalization VALID == outer * inner (ref get_normalizer)
    np.testing.assert_allclose(float(loss), err.sum() / (2 * 9), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(per)[..., 0], err.sum(axis=-1), rtol=1e-5)
    loss_pf, _ = LAYER_REGISTRY["SmoothL1LossOHEM"](
        {}, {"loss_param": {"normalization": "PRE_FIXED",
                            "pre_fixed_normalizer": 7.0}},
        jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(wts))
    np.testing.assert_allclose(float(loss_pf), err.sum() / 7.0, rtol=1e-5)


def test_softmax_ohem_matches_softmax_loss_plus_tops(rng):
    scores = rng.standard_normal((2, 3, 3, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 3, 3, 1)).astype(np.float32)
    labels[0, 0, 0, 0] = -1
    cfg = {"loss_param": {"ignore_label": -1}}
    loss, prob, per = LAYER_REGISTRY["SoftmaxWithLossOHEM"](
        {}, cfg, jnp.asarray(scores), jnp.asarray(labels))
    base = LAYER_REGISTRY["SoftmaxWithLoss"](
        {}, cfg, jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(base), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(prob), jax.nn.softmax(scores, axis=-1), rtol=1e-5)
    assert per.shape == labels.shape
    assert float(per[0, 0, 0, 0]) == 0.0  # ignored position contributes 0
    p = jax.nn.softmax(scores, axis=-1)
    want = -np.log(p[1, 2, 2, int(labels[1, 2, 2, 0])])
    np.testing.assert_allclose(float(per[1, 2, 2, 0]), want, rtol=1e-5)


def test_loss_tops_cover_ohem_types():
    from nct_tpu.nn.losses import is_loss_type
    assert is_loss_type("SmoothL1LossOHEM")
    assert is_loss_type("SoftmaxWithLossOHEM")
    assert not is_loss_type("BoxAnnotatorOHEM")


def _np_caffe_ave_pool(x, k, s, p):
    """pooling_layer.cpp:190-213 AVE loop (divisor counts pad cells)."""
    n, h, w, c = x.shape
    oh = int(np.ceil((h + 2 * p - k) / s)) + 1
    ow = int(np.ceil((w + 2 * p - k) / s)) + 1
    out = np.zeros((n, oh, ow, c), np.float32)
    for i in range(oh):
        for j in range(ow):
            hs, ws = i * s - p, j * s - p
            he, we = min(hs + k, h + p), min(ws + k, w + p)
            size = (he - hs) * (we - ws)
            hs2, ws2 = max(hs, 0), max(ws, 0)
            he2, we2 = min(he, h), min(we, w)
            out[:, i, j] = x[:, hs2:he2, ws2:we2].sum(axis=(1, 2)) / size
    return out


def test_ave_pooling_padded_divisor_matches_caffe(rng):
    x = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    got = LAYER_REGISTRY["Pooling"](
        {}, {"pooling_param": {"pool": "AVE", "kernel_size": 3,
                               "stride": 2, "pad": 1}}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), _np_caffe_ave_pool(x, 3, 2, 1), rtol=1e-5)


def test_lrn_within_channel_matches_composite(rng):
    """WithinChannelForward == square -> Caffe-AVE-pool -> power -> product
    (lrn_layer.cpp:17-66); also covers the cudnn LCN dispatch."""
    x = rng.standard_normal((2, 5, 5, 4)).astype(np.float32)
    alpha, beta, size = 2.0, 0.75, 3
    got = LAYER_REGISTRY["LRN"](
        {}, {"lrn_param": {"norm_region": "WITHIN_CHANNEL",
                           "local_size": size, "alpha": alpha,
                           "beta": beta}}, jnp.asarray(x))
    pooled = _np_caffe_ave_pool(x * x, size, 1, size // 2)
    want = x * (1.0 + alpha * pooled) ** (-beta)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
