"""Layer op library + registry.

TPU-native analogue of Caffe's polymorphic layer zoo and factory
(reference: include/caffe/layer.hpp, src/caffe/layer_factory.cpp:42-90,
src/caffe/layers/*).  Each op is a pure function
``fn(params, layer_cfg, *bottoms) -> tops`` over NHWC arrays; the registry
maps prototxt ``type`` strings to ops.  The inference-path layers the
reference's VGG uses (Convolution / ReLU / Pooling / Input) are exact
Caffe-semantics ports (ceil-mode pooling, cross-correlation convs); the
rest covers the common deploy-net vocabulary.  Register custom layers with
``@register_layer("MyType")``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

LAYER_REGISTRY: dict[str, Callable] = {}


def register_layer(name: str):
    def deco(fn):
        LAYER_REGISTRY[name] = fn
        return fn
    return deco


def _int(v, default=None):
    if v is None:
        return default
    if isinstance(v, list):
        v = v[0]
    return int(v)


def _pool_out(n: int, k: int, s: int, p: int) -> int:
    """Caffe ceil-mode pooled size (pooling_layer.cpp Reshape), including
    the padded-mode clip: the last window must start strictly inside the
    image + left pad."""
    out = max(-(-(n + 2 * p - k) // s) + 1, 1)
    if p and (out - 1) * s >= n + p:
        out -= 1
    return out


def _nhwc_axis(axis, ndim: int) -> int:
    """Map a Caffe (NCHW-semantics) axis index onto our NHWC blobs.

    Prototxt axis fields count N,C,H,W (blob.hpp CanonicalAxisIndex);
    this framework stores 4-D blobs NHWC, so an explicit ``axis: 1``
    (channels) must land on the trailing axis.  Non-4-D blobs have no
    layout difference and pass through (negative axes canonicalized).
    """
    axis = int(axis)
    if axis < 0:
        axis += ndim
    if ndim == 4:
        return {0: 0, 1: 3, 2: 1, 3: 2}[axis]
    return axis


@register_layer("Convolution")
def conv_layer(params, cfg, x):
    cp = cfg.get("convolution_param", {})
    pad = _int(cp.get("pad"), 0)
    stride = _int(cp.get("stride"), 1)
    w = params["w"]                      # HWIO
    groups = _int(cp.get("group"), 1)
    dilation = _int(cp.get("dilation"), 1)
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in params:
        out = out + params["b"].astype(jnp.float32)
    return out.astype(x.dtype)


@register_layer("InnerProduct")
def inner_product_layer(params, cfg, x):
    flat = x.reshape(x.shape[0], -1)
    out = jnp.dot(
        flat, params["w"].astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    if "b" in params:
        out = out + params["b"].astype(jnp.float32)
    return out.astype(x.dtype)


@register_layer("ReLU")
def relu_layer(params, cfg, x):
    slope = cfg.get("relu_param", {}).get("negative_slope", 0.0)
    if slope:
        return jnp.where(x > 0, x, x * slope)
    return jnp.maximum(x, 0)


@register_layer("Sigmoid")
def sigmoid_layer(params, cfg, x):
    return jax.nn.sigmoid(x)


@register_layer("TanH")
def tanh_layer(params, cfg, x):
    return jnp.tanh(x)


@register_layer("Pooling")
def pooling_layer(params, cfg, x):
    pp = cfg.get("pooling_param", {})
    method = str(pp.get("pool", "MAX")).upper()
    # rectangular *_h/*_w fields override the square ones
    # (pooling_layer.cpp LayerSetUp)
    if pp.get("global_pooling") in (True, "true"):
        k_h, k_w = x.shape[1], x.shape[2]
        s_h = s_w = 1
    else:
        k = _int(pp.get("kernel_size"), 2)
        k_h = _int(pp.get("kernel_h"), k)
        k_w = _int(pp.get("kernel_w"), k)
        s = _int(pp.get("stride"), 1)
        s_h = _int(pp.get("stride_h"), s)
        s_w = _int(pp.get("stride_w"), s)
    pad = _int(pp.get("pad"), 0)
    p_h = _int(pp.get("pad_h"), pad)
    p_w = _int(pp.get("pad_w"), pad)
    oh = _pool_out(x.shape[1], k_h, s_h, p_h)
    ow = _pool_out(x.shape[2], k_w, s_w, p_w)
    # Caffe ceil mode: pad so strided windows cover the input
    pad_h = max((oh - 1) * s_h + k_h - x.shape[1] - p_h, 0)
    pad_w = max((ow - 1) * s_w + k_w - x.shape[2] - p_w, 0)
    if method == "AVE":
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            (1, k_h, k_w, 1), (1, s_h, s_w, 1),
            ((0, 0), (p_h, pad_h), (p_w, pad_w), (0, 0)),
        )
        # Caffe's AVE divisor counts PADDING cells: pool_size =
        # (hend - hstart) * (wend - wstart) with hend clipped at
        # height + pad BEFORE the [0, height) clip (pooling_layer.cpp:
        # 197-212) — so border windows divide by the padded window area,
        # not by the number of real elements summed.
        def _caffe_count(n_out, k, s, p, dim):
            start = jnp.arange(n_out, dtype=jnp.float32) * s - p
            end = jnp.minimum(start + k, dim + p)
            return end - start
        cnt_h = _caffe_count(oh, k_h, s_h, p_h, x.shape[1])
        cnt_w = _caffe_count(ow, k_w, s_w, p_w, x.shape[2])
        return summed / (cnt_h[:, None] * cnt_w[None, :])[None, :, :, None]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, k_h, k_w, 1), (1, s_h, s_w, 1),
        ((0, 0), (p_h, pad_h), (p_w, pad_w), (0, 0)),
    )


@register_layer("Softmax")
def softmax_layer(params, cfg, x):
    axis = cfg.get("softmax_param", {}).get("axis", 1)
    return jax.nn.softmax(x, axis=_nhwc_axis(axis, x.ndim))


@register_layer("Dropout")
def dropout_layer(params, cfg, x):
    """TEST phase is identity; TRAIN phase (the Net passes a per-layer
    ``__rng__`` key) applies the inverted-scale Bernoulli mask of
    dropout_layer.cpp: keep with prob 1-ratio, scale kept values by
    1/(1-ratio)."""
    rng = params.get("__rng__")
    if rng is None:
        return x
    ratio = float(cfg.get("dropout_param", {}).get("dropout_ratio", 0.5))
    keep = 1.0 - ratio
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


@register_layer("LRN")
def lrn_layer(params, cfg, x):
    """lrn_layer.cpp.  ACROSS_CHANNELS is the classic AlexNet response
    norm over the channel axis; WITHIN_CHANNEL is the spatial (local
    contrast) variant the reference composes from square -> AVE-pool ->
    power -> product (lrn_layer.cpp:17-66, WithinChannelForward :155-162)
    — the layer_factory routes it to CuDNNLCNLayer on GPU builds
    (cudnn_lcn_layer.cpp), so this branch is also the LCN analogue."""
    lp = cfg.get("lrn_param", {})
    local_size = _int(lp.get("local_size"), 5)
    alpha = float(lp.get("alpha", 1.0))
    beta = float(lp.get("beta", 0.75))
    half = local_size // 2
    region = str(lp.get("norm_region", "ACROSS_CHANNELS")).upper()
    if region == "WITHIN_CHANNEL":
        # avg-pool of x^2 over a local_size window at stride 1, same pad
        # (the reference stacks its own Pooling layer the same way); then
        # (1 + alpha * s)^-beta with s the window MEAN of squares.
        pooled = pooling_layer(
            {},
            {"pooling_param": {"pool": "AVE", "kernel_size": local_size,
                               "stride": 1, "pad": half}},
            x * x,
        )
        return x * (1.0 + alpha * pooled) ** (-beta)
    sq = x * x
    pad = jnp.pad(sq, ((0, 0), (0, 0), (0, 0), (half, half)))
    acc = jnp.zeros_like(x)
    for i in range(local_size):
        acc = acc + jax.lax.dynamic_slice_in_dim(
            pad, i, x.shape[-1], axis=3
        )
    scale = (1.0 + (alpha / local_size) * acc) ** (-beta)
    return x * scale


@register_layer("Concat")
def concat_layer(params, cfg, *xs):
    axis = cfg.get("concat_param", {}).get("axis", 1)
    return jnp.concatenate(xs, axis=_nhwc_axis(axis, xs[0].ndim))


@register_layer("Eltwise")
def eltwise_layer(params, cfg, *xs):
    op = str(cfg.get("eltwise_param", {}).get("operation", "SUM")).upper()
    out = xs[0]
    for other in xs[1:]:
        if op == "PROD":
            out = out * other
        elif op == "MAX":
            out = jnp.maximum(out, other)
        else:
            out = out + other
    return out


@register_layer("BatchNorm")
def batchnorm_layer(params, cfg, x):
    eps = float(cfg.get("batch_norm_param", {}).get("eps", 1e-5))
    mean, var = params["mean"], params["var"]
    scale = params.get("scale_factor", 1.0)
    inv = 1.0 / jnp.maximum(jnp.asarray(scale, jnp.float32), 1e-30)
    return (x - mean * inv) * jax.lax.rsqrt(var * inv + eps)


@register_layer("Scale")
def scale_layer(params, cfg, x):
    out = x * params["w"]
    if "b" in params:
        out = out + params["b"]
    return out


@register_layer("Flatten")
def flatten_layer(params, cfg, x):
    return x.reshape(x.shape[0], -1)


@register_layer("Input")
def input_layer(params, cfg, x):
    return x


# --- elementwise / activation vocabulary (src/caffe/layers/*) -----------

@register_layer("Power")
def power_layer(params, cfg, x):
    pp = cfg.get("power_param", {})
    power = float(pp.get("power", 1.0))
    scale = float(pp.get("scale", 1.0))
    shift = float(pp.get("shift", 0.0))
    base = shift + scale * x
    if power == 1.0:
        return base
    return jnp.power(base, power)


@register_layer("Exp")
def exp_layer(params, cfg, x):
    ep = cfg.get("exp_param", {})
    base = float(ep.get("base", -1.0))
    scale = float(ep.get("scale", 1.0))
    shift = float(ep.get("shift", 0.0))
    inner = shift + scale * x
    if base == -1.0:            # Caffe sentinel for e
        return jnp.exp(inner)
    return jnp.power(base, inner)


@register_layer("Log")
def log_layer(params, cfg, x):
    lp = cfg.get("log_param", {})
    base = float(lp.get("base", -1.0))
    scale = float(lp.get("scale", 1.0))
    shift = float(lp.get("shift", 0.0))
    out = jnp.log(shift + scale * x)
    if base != -1.0:
        out = out / jnp.log(base)
    return out


@register_layer("AbsVal")
def absval_layer(params, cfg, x):
    return jnp.abs(x)


@register_layer("BNLL")
def bnll_layer(params, cfg, x):
    # log(1 + exp(x)), computed stably as in bnll_layer.cpp
    return jnp.where(
        x > 0, x + jnp.log1p(jnp.exp(-x)), jnp.log1p(jnp.exp(x))
    )


@register_layer("ELU")
def elu_layer(params, cfg, x):
    alpha = float(cfg.get("elu_param", {}).get("alpha", 1.0))
    return jnp.where(x > 0, x, alpha * (jnp.exp(jnp.minimum(x, 0)) - 1.0))


@register_layer("PReLU")
def prelu_layer(params, cfg, x):
    """Channel-wise learned slope (prelu_layer.cpp); slope blob broadcasts
    along the NHWC channel axis (channel_shared => scalar blob)."""
    slope = params.get("w", params.get("0"))
    if slope is None:
        slope = jnp.asarray(0.25, x.dtype)   # Caffe filler default
    slope = jnp.asarray(slope).reshape(-1)
    if slope.size == 1:
        slope = slope[0]
    return jnp.where(x > 0, x, x * slope)


@register_layer("Threshold")
def threshold_layer(params, cfg, x):
    t = float(cfg.get("threshold_param", {}).get("threshold", 0.0))
    return (x > t).astype(x.dtype)


@register_layer("Bias")
def bias_layer(params, cfg, x, *rest):
    """Adds a per-channel bias — learned blob or second bottom
    (bias_layer.cpp; axis semantics folded to the NHWC channel axis)."""
    b = rest[0] if rest else params.get("b", params.get("0"))
    b = jnp.asarray(b).reshape(-1)
    return x + b


@register_layer("MVN")
def mvn_layer(params, cfg, x):
    mp = cfg.get("mvn_param", {})
    across = mp.get("across_channels", False) in (True, "true")
    normalize = mp.get("normalize_variance", True) in (True, "true")
    eps = float(mp.get("eps", 1e-9))
    axes = (1, 2, 3) if across else (1, 2)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    out = x - mean
    if normalize:
        var = jnp.mean(out * out, axis=axes, keepdims=True)
        out = out / (jnp.sqrt(var) + eps)
    return out


# --- shape / routing vocabulary -----------------------------------------

@register_layer("Split")
def split_layer(params, cfg, x):
    n = len(cfg.get("top")) if isinstance(cfg.get("top"), list) else 1
    return tuple(x for _ in range(n)) if n > 1 else x


@register_layer("Slice")
def slice_layer(params, cfg, x):
    sp = cfg.get("slice_param", {})
    axis = _nhwc_axis(sp.get("axis", sp.get("slice_dim", 1)), x.ndim)
    tops = cfg.get("top")
    n_tops = len(tops) if isinstance(tops, list) else 1
    points = sp.get("slice_point")
    if points is None:
        size = x.shape[axis] // n_tops
        points = [size * i for i in range(1, n_tops)]
    elif not isinstance(points, list):
        points = [points]
    return tuple(jnp.split(x, [int(p) for p in points], axis=axis))


@register_layer("Crop")
def crop_layer(params, cfg, x, ref):
    """Crop x to ref's shape from `axis` on, at `offset` (crop_layer.cpp).
    Offsets are given in NCHW axis order; applied here per mapped axis."""
    cp = cfg.get("crop_param", {})
    axis = int(cp.get("axis", 2))
    offsets = cp.get("offset", 0)
    if not isinstance(offsets, list):
        offsets = [offsets]
    starts = [0] * x.ndim
    sizes = list(x.shape)
    for i, caffe_ax in enumerate(range(axis, 4)):
        our_ax = _nhwc_axis(caffe_ax, x.ndim)
        off = int(offsets[i]) if i < len(offsets) else int(offsets[-1])
        starts[our_ax] = off
        sizes[our_ax] = ref.shape[our_ax]
    return jax.lax.dynamic_slice(x, starts, sizes)


@register_layer("Reshape")
def reshape_layer(params, cfg, x):
    """Caffe reshape dims are NCHW-semantic (0 = copy, -1 = infer);
    reshape happens in the NCHW view, and 4-D results return as NHWC."""
    dims = cfg.get("reshape_param", {}).get("shape", {}).get("dim", [])
    if not isinstance(dims, list):
        dims = [dims]
    view = jnp.transpose(x, (0, 3, 1, 2)) if x.ndim == 4 else x
    shape = []
    for i, d in enumerate(int(v) for v in dims):
        if d == 0:
            shape.append(view.shape[i])
        else:
            shape.append(d)
    out = view.reshape(shape)
    if out.ndim == 4:
        out = jnp.transpose(out, (0, 2, 3, 1))
    return out


@register_layer("Reduction")
def reduction_layer(params, cfg, x):
    """Reduce over the NCHW-trailing axes from `axis` on
    (reduction_layer.cpp); output keeps the leading axes."""
    rp = cfg.get("reduction_param", {})
    op = str(rp.get("operation", "SUM")).upper()
    axis = int(rp.get("axis", 0))
    coeff = float(rp.get("coeff", 1.0))
    view = jnp.transpose(x, (0, 3, 1, 2)) if x.ndim == 4 else x
    if axis < 0:
        axis += view.ndim
    flat = view.reshape(view.shape[:axis] + (-1,))
    if op == "ASUM":
        out = jnp.sum(jnp.abs(flat), axis=-1)
    elif op == "SUMSQ":
        out = jnp.sum(flat * flat, axis=-1)
    elif op == "MEAN":
        out = jnp.mean(flat, axis=-1)
    else:  # SUM
        out = jnp.sum(flat, axis=-1)
    return out * coeff


@register_layer("ArgMax")
def argmax_layer(params, cfg, x):
    ap = cfg.get("argmax_param", {})
    top_k = int(ap.get("top_k", 1))
    axis = ap.get("axis")
    if axis is not None:
        ax = _nhwc_axis(axis, x.ndim)
        if top_k == 1:
            return jnp.argmax(x, axis=ax, keepdims=True).astype(
                jnp.float32)
        moved = jnp.moveaxis(x, ax, -1)
        _, idx = jax.lax.top_k(moved, top_k)
        return jnp.moveaxis(idx, -1, ax).astype(jnp.float32)
    flat = x.reshape(x.shape[0], -1)
    vals, idx = jax.lax.top_k(flat, top_k)
    out = idx.astype(jnp.float32)
    if ap.get("out_max_val") in (True, "true"):
        out = jnp.concatenate([out, vals], axis=-1)
    return out


@register_layer("Silence")
def silence_layer(params, cfg, *xs):
    """Consumes its bottoms and produces nothing (silence_layer.cpp —
    suppresses unconsumed-top warnings)."""
    return ()


@register_layer("Parameter")
def parameter_layer(params, cfg, *unused):
    """Exposes its learnable blob as a top (parameter_layer.hpp) — the
    way Caffe nets learn free variables not tied to an input."""
    return params["w"]


@register_layer("Im2col")
def im2col_layer(params, cfg, x):
    """Patch extraction as a layer (im2col_layer.cpp): output channels =
    C * kh * kw in Caffe's (c, ky, kx) order, spatial dims strided like a
    conv (here via an identity-weight conv-general patch gather kept as
    plain slicing: XLA fuses it)."""
    cp = cfg.get("convolution_param", {})
    k = _int(cp.get("kernel_size"), 1)
    stride = _int(cp.get("stride"), 1)
    pad = _int(cp.get("pad"), 0)
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    cols = []
    for ky in range(k):
        for kx in range(k):
            cols.append(xp[:, ky:ky + oh * stride:stride,
                           kx:kx + ow * stride:stride, :])
    # Caffe channel order (c, ky, kx): stack taps last, then flatten with
    # c leading within each block
    stacked = jnp.stack(cols, axis=-1)          # [N, oh, ow, C, k*k]
    return stacked.reshape(n, oh, ow, c * k * k)


@register_layer("Filter")
def filter_layer(params, cfg, *xs):
    """Select batch items whose selector entry is nonzero
    (filter_layer.cpp).  The output batch size is DATA-DEPENDENT, which
    XLA's static shapes cannot express — usable eagerly (outside jit)
    only, like the reference's CPU-side usage in data pipelines."""
    import numpy as np

    selector = xs[-1]
    if isinstance(selector, jax.core.Tracer):
        raise NotImplementedError(
            "Filter has a data-dependent output shape; run it eagerly "
            "(outside jit) — XLA programs need static shapes")
    keep = np.flatnonzero(np.asarray(selector).reshape(-1))
    outs = tuple(jnp.take(x, keep, axis=0) for x in xs[:-1])
    return outs if len(outs) > 1 else outs[0]


@register_layer("HDF5Output")
def hdf5_output_layer(params, cfg, data, label):
    """Write (data, label) batches to an HDF5 file
    (hdf5_output_layer.cpp).  The write is a host side effect, expressed
    as jax.experimental.io_callback so it works under jit; batches append
    as data_0/label_0, data_1/... datasets like the reference's
    SaveBlobs."""
    import numpy as np

    file_name = str(cfg.get("hdf5_output_param", {}).get("file_name"))
    counter = [0]

    def _write(d, l):
        import h5py

        mode = "a" if counter[0] else "w"
        with h5py.File(file_name, mode) as f:
            f.create_dataset(f"data_{counter[0]}", data=np.asarray(d))
            f.create_dataset(f"label_{counter[0]}", data=np.asarray(l))
        counter[0] += 1
        return np.zeros((), np.int32)

    from jax.experimental import io_callback

    io_callback(_write, jax.ShapeDtypeStruct((), jnp.int32), data, label,
                ordered=True)
    return ()


@register_layer("Embed")
def embed_layer(params, cfg, x):
    """Lookup-table layer (embed_layer.cpp): bottom holds integer indices
    in [0, input_dim); top = bottom shape + (num_output,).  The weight is
    stored [input_dim, num_output] ("transposed from InnerProductLayer",
    embed_layer.cpp:26-30), so the forward is one row gather + bias."""
    idx = x.astype(jnp.int32)
    out = jnp.take(params["w"], idx, axis=0)
    if "b" in params:
        out = out + params["b"]
    return out


@register_layer("Tile")
def tile_layer(params, cfg, x):
    """Repeat the blob `tiles` times along `axis` as whole-block copies
    (tile_layer.cpp Forward_cpu: outer x tiles x inner copy order)."""
    tp = cfg.get("tile_param", {})
    ax = _nhwc_axis(tp.get("axis", 1), x.ndim)
    tiles = int(tp.get("tiles"))
    reps = [1] * x.ndim
    reps[ax] = tiles
    return jnp.tile(x, reps)


@register_layer("BatchReindex")
def batch_reindex_layer(params, cfg, x, idx):
    """top[i] = bottom[idx[i]] along the batch axis
    (batch_reindex_layer.cpp Forward_cpu)."""
    return jnp.take(x, idx.astype(jnp.int32), axis=0)


@register_layer("SPP")
def spp_layer(params, cfg, x):
    """Spatial pyramid pooling (spp_layer.cpp): for level i in
    [0, pyramid_height), pool with num_bins = 2^i uniform bins
    (kernel = ceil(dim/bins), stride = kernel,
    pad = (kernel*bins - dim + 1)/2 — GetPoolingParam, spp_layer.cpp:17-63),
    flatten each pooled map in Caffe's NCHW element order and concat.
    Output [N, C * sum_i 4^i]."""
    sp = cfg.get("spp_param", {})
    height = int(sp.get("pyramid_height", 1))
    pool = str(sp.get("pool", "MAX")).upper()
    n = x.shape[0]
    outs = []
    for i in range(height):
        bins = 2 ** i
        k_h = -(-x.shape[1] // bins)
        k_w = -(-x.shape[2] // bins)
        p_h = (k_h * bins - x.shape[1] + 1) // 2
        p_w = (k_w * bins - x.shape[2] + 1) // 2
        pcfg = {"pooling_param": {
            "pool": pool, "kernel_h": k_h, "kernel_w": k_w,
            "stride_h": k_h, "stride_w": k_w, "pad_h": p_h, "pad_w": p_w,
        }}
        pooled = pooling_layer({}, pcfg, x)[:, :bins, :bins, :]
        # Caffe flattens the NCHW blob: (c, y, x) element order
        outs.append(jnp.transpose(pooled, (0, 3, 1, 2)).reshape(n, -1))
    return jnp.concatenate(outs, axis=1)


@register_layer("Deconvolution")
def deconv_layer(params, cfg, x):
    """Transposed convolution = gradient of the forward conv
    (deconv_layer.cpp); out = stride*(in-1) + kernel - 2*pad.  Expressed
    as an input-dilated conv so XLA lowers it onto the MXU like any other
    conv.  Weights arrive pre-flipped/transposed HWIO (see Net loader)."""
    cp = cfg.get("convolution_param", {})
    pad = _int(cp.get("pad"), 0)
    stride = _int(cp.get("stride"), 1)
    k = _int(cp.get("kernel_size"), 1)
    groups = _int(cp.get("group"), 1)
    w = params["w"]
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((k - 1 - pad, k - 1 - pad), (k - 1 - pad, k - 1 - pad)),
        lhs_dilation=(stride, stride),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in params:
        out = out + params["b"].astype(jnp.float32)
    return out.astype(x.dtype)
