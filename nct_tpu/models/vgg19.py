"""VGG-19 feature extractor, pure JAX, Caffe inference semantics.

TPU-native replacement for the reference's Classifier facade plus the entire
vendored Caffe inference stack (reference: source/Classifier.cpp:59-105,
code/src/caffe/net.cpp ForwardFromTo, conv/relu/pool layers) — ~25k lines of
C++/CUDA collapse into one jitted NHWC forward pass on the MXU.

Caffe-parity details preserved:
  * input is float BGR with per-channel mean (103.939, 116.779, 123.68)
    subtracted (Classifier.cpp:40, Preprocess :253-255);
  * convolutions are 3x3, pad 1, stride 1, cross-correlation + bias;
  * pooling is MAX 2x2 stride 2 with **ceil-mode** output sizes
    (Caffe PoolingLayer: ceil((H-k)/s)+1), window clipped at the border;
  * requested taps ("conv5_1".."conv1_1") are post-ReLU because Caffe's
    in-place ReLU overwrites the conv blob (SURVEY §3.3).

Weights come from `nct_tpu.models.caffe_io` (offline caffemodel -> npz
conversion) or a seeded deterministic fallback for weight-free testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# (name, out_channels); pools sit between stages.  Full VGG-19 conv body.
VGG19_CONV_LAYERS: tuple[tuple[str, int], ...] = (
    ("conv1_1", 64), ("conv1_2", 64),
    ("conv2_1", 128), ("conv2_2", 128),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
)
_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_4", "conv4_4", "conv5_4"}

BGR_MEAN = (103.939, 116.779, 123.68)  # Classifier.cpp:40

# The progressive pipeline's taps, coarse-to-fine (main.cu:55-59).
PIPELINE_TAPS = ("conv5_1", "conv4_1", "conv3_1", "conv2_1", "conv1_1")


def ceil_pool_dim(n: int) -> int:
    """Caffe ceil-mode pooled size for k=2,s=2: ceil(n/2)."""
    return -(-n // 2)


def feature_dims(h: int, w: int) -> dict[str, tuple[int, int]]:
    """(H, W) of every conv tap for an (h, w) input, Caffe ceil-pool rules."""
    dims = {}
    ch, cw = h, w
    for name, _ in VGG19_CONV_LAYERS:
        dims[name] = (ch, cw)
        if name in _POOL_AFTER:
            ch, cw = ceil_pool_dim(ch), ceil_pool_dim(cw)
    return dims


def tap_channels() -> dict[str, int]:
    return {name: c for name, c in VGG19_CONV_LAYERS}


def init_params(key: jax.Array | None = None) -> dict[str, dict[str, np.ndarray]]:
    """Deterministic He-init weights — the weight-free fallback backbone.

    Real VGG-19 ImageNet weights (converted offline with
    ``tools/convert_vgg19.py`` from VGG_ILSVRC_19_layers.caffemodel) should be
    preferred; random filters still yield usable correspondences for testing
    because both images are embedded by the *same* filters, but transfer
    quality is below the pretrained backbone.
    """
    if key is None:
        key = jax.random.PRNGKey(19)
    params = {}
    in_c = 3
    for name, out_c in VGG19_CONV_LAYERS:
        key, wk = jax.random.split(key)
        fan_in = 3 * 3 * in_c
        w = jax.random.normal(wk, (3, 3, in_c, out_c), dtype=jnp.float32)
        w = w * np.sqrt(2.0 / fan_in)
        params[name] = {
            "w": np.asarray(w),
            "b": np.zeros((out_c,), dtype=np.float32),
        }
        in_c = out_c
    return params


def load_params(npz_path: str) -> dict[str, dict[str, np.ndarray]]:
    """Load converted weights: npz with ``<layer>_w`` [3,3,in,out] HWIO and
    ``<layer>_b`` [out] entries (see nct_tpu.models.caffe_io)."""
    data = np.load(npz_path)
    params = {}
    for name, out_c in VGG19_CONV_LAYERS:
        wkey, bkey = f"{name}_w", f"{name}_b"
        if wkey not in data:
            break  # permit truncated files (conv body up to conv5_1 suffices)
        w, b = data[wkey], data[bkey]
        if w.shape[-1] != out_c:
            raise ValueError(f"{name}: expected {out_c} filters, got {w.shape}")
        params[name] = {"w": w, "b": b}
    return params


def preprocess_bgr(bgr_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 BGR [H,W,3] -> mean-subtracted float NHWC [1,H,W,3]."""
    x = bgr_u8.astype(jnp.float32) - jnp.asarray(BGR_MEAN, dtype=jnp.float32)
    return x[None]


def _ceil_maxpool(x: jnp.ndarray) -> jnp.ndarray:
    """MAX 2x2/2 pool, ceil-mode (border windows clipped), NHWC."""
    h, w = x.shape[1], x.shape[2]
    pad_h = ceil_pool_dim(h) * 2 - h
    pad_w = ceil_pool_dim(w) * 2 - w
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


def features(
    params: dict,
    bgr_u8: jnp.ndarray,
    taps: tuple[str, ...] = PIPELINE_TAPS,
    compute_dtype: jnp.dtype = jnp.float32,
) -> dict[str, jnp.ndarray]:
    """Forward a uint8 BGR image, returning {tap: [H', W', C] float32}.

    Equivalent of Classifier::Predict (Classifier.cpp:59-105): reshape-to-
    image-size semantics are free here (XLA compiles per static shape), taps
    are post-ReLU activations.
    """
    needed = set(taps)
    x = preprocess_bgr(bgr_u8).astype(compute_dtype)
    out: dict[str, jnp.ndarray] = {}
    deepest = max(
        i for i, (name, _) in enumerate(VGG19_CONV_LAYERS) if name in needed
    )
    for i, (name, _) in enumerate(VGG19_CONV_LAYERS):
        w = params[name]["w"].astype(compute_dtype)
        b = params[name]["b"].astype(compute_dtype)
        x = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        x = x + b.astype(jnp.float32)
        x = jnp.maximum(x, 0.0)  # in-place ReLU => tap is post-ReLU
        if name in needed:
            out[name] = x[0]
        if i == deepest:
            break
        x = x.astype(compute_dtype)
        if name in _POOL_AFTER:
            x = _ceil_maxpool(x)
    return out


@functools.partial(jax.jit, static_argnames=("taps", "bf16"))
def features_jit(params, bgr_u8, taps: tuple[str, ...] = PIPELINE_TAPS,
                 bf16: bool = False):
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    return features(params, bgr_u8, taps, compute_dtype=dtype)
