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
    """Caffe ceil-mode pooled size (pooling_layer.cpp)."""
    return max(-(-(n + 2 * p - k) // s) + 1, 1)


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
    k = _int(pp.get("kernel_size"), 2)
    s = _int(pp.get("stride"), 1)
    pad = _int(pp.get("pad"), 0)
    method = str(pp.get("pool", "MAX")).upper()
    # global pooling: kernel = spatial dims
    if pp.get("global_pooling") in (True, "true"):
        k_h, k_w = x.shape[1], x.shape[2]
        s = 1
    else:
        k_h = k_w = k
    oh = _pool_out(x.shape[1], k_h, s, pad)
    ow = _pool_out(x.shape[2], k_w, s, pad)
    # Caffe ceil mode: pad so strided windows cover the input
    pad_h = max((oh - 1) * s + k_h - x.shape[1] - pad, 0)
    pad_w = max((ow - 1) * s + k_w - x.shape[2] - pad, 0)
    if method == "AVE":
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            (1, k_h, k_w, 1), (1, s, s, 1),
            ((0, 0), (pad, pad_h), (pad, pad_w), (0, 0)),
        )
        count = jax.lax.reduce_window(
            jnp.ones_like(x), 0.0, jax.lax.add,
            (1, k_h, k_w, 1), (1, s, s, 1),
            ((0, 0), (pad, pad_h), (pad, pad_w), (0, 0)),
        )
        return summed / count
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, k_h, k_w, 1), (1, s, s, 1),
        ((0, 0), (pad, pad_h), (pad, pad_w), (0, 0)),
    )


@register_layer("Softmax")
def softmax_layer(params, cfg, x):
    axis = cfg.get("softmax_param", {}).get("axis", -1)
    return jax.nn.softmax(x, axis=axis)


@register_layer("Dropout")
def dropout_layer(params, cfg, x):
    return x  # inference mode (TEST phase) is identity


@register_layer("LRN")
def lrn_layer(params, cfg, x):
    lp = cfg.get("lrn_param", {})
    local_size = _int(lp.get("local_size"), 5)
    alpha = float(lp.get("alpha", 1.0))
    beta = float(lp.get("beta", 0.75))
    half = local_size // 2
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
    axis = cfg.get("concat_param", {}).get("axis", -1)
    return jnp.concatenate(xs, axis=axis)


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
