"""Loss, metric, and synthetic-data layers for the nn graph framework.

Rebuilds the training-side layer vocabulary of the vendored Caffe that the
solver stack needs (SURVEY §2.2 "Op library" / B4):

  * SoftmaxWithLoss  — src/caffe/layers/softmax_loss_layer.cpp (fused
    log-softmax + NLL, ignore_label, the four NormalizationMode rules with
    the max(1, normalizer) NaN guard)
  * EuclideanLoss    — euclidean_loss_layer.cpp (sum of squares / 2N)
  * SigmoidCrossEntropyLoss — sigmoid_cross_entropy_loss_layer.cpp (the
    numerically-stable form, normalized by batch size)
  * HingeLoss        — hinge_loss_layer.cpp (L1/L2 norms)
  * MultinomialLogisticLoss — multinomial_logistic_loss_layer.cpp
  * Accuracy         — accuracy_layer.cpp (top-k, ignore_label)
  * DummyData        — dummy_data_layer.cpp (filler-driven synthetic tops,
    the data source Caffe's own solver tests use)

Blob conventions follow the rest of the framework: 4-D blobs are NHWC, so
Caffe's canonical softmax axis 1 (the NCHW channel) is our trailing axis;
labels arrive as any blob with outer*inner elements.  Losses return scalars;
backward passes are jax.grad instead of hand-written Backward_cpu — the
gradient-checker test (tests/test_train_net.py) plays the role of Caffe's
GradientChecker for them.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp

from nct_tpu.nn.fillers import fill
from nct_tpu.nn.layers import register_layer, _nhwc_axis

# Types whose top[0] receives an implicit loss_weight of 1.  In the
# reference this is "derives from LossLayer" (loss_layer.cpp sets
# set_loss(0, 1)); name-wise that is every type containing "Loss" — the
# R-FCN OHEM losses end in "LossOHEM", not "Loss" (box_annotator is NOT a
# loss layer and contains no "Loss").
LOSS_SUFFIX = "Loss"


def is_loss_type(ltype: str) -> bool:
    return LOSS_SUFFIX in ltype


def _loss_param(cfg):
    lp = cfg.get("loss_param", {}) or {}
    ignore = lp.get("ignore_label")
    norm = lp.get("normalization")
    if norm is None and "normalize" in lp:
        # deprecated bool: true -> VALID, false -> BATCH_SIZE (caffe.proto)
        norm = "VALID" if lp.get("normalize") else "BATCH_SIZE"
    return (None if ignore is None else int(ignore),
            str(norm or "VALID").upper())


def _class_axis(cfg, ndim: int, param_key: str, default_axis=1) -> int:
    axis = cfg.get(param_key, {}).get("axis", default_axis)
    return _nhwc_axis(int(axis), ndim)


def _flat_scores_labels(scores, labels, ax):
    """[outer*inner, C] scores and int [outer*inner] labels, Caffe's
    (outer_num_, inner_num_) iteration flattened."""
    c = jnp.moveaxis(scores, ax, -1)
    flat = c.reshape(-1, c.shape[-1])
    lab = labels.reshape(-1).astype(jnp.int32)
    return flat, lab


def _normalizer(norm: str, valid_count, outer: int, inner: int):
    if norm == "FULL":
        n = jnp.float32(outer * inner)
    elif norm == "BATCH_SIZE":
        n = jnp.float32(outer)
    elif norm == "NONE":
        n = jnp.float32(1.0)
    else:  # VALID
        n = valid_count.astype(jnp.float32)
    return jnp.maximum(n, 1.0)  # the reference's NaN guard


@register_layer("SoftmaxWithLoss")
def softmax_with_loss_layer(params, cfg, scores, labels):
    ignore, norm = _loss_param(cfg)
    ax = _class_axis(cfg, scores.ndim, "softmax_param")
    flat, lab = _flat_scores_labels(scores, labels, ax)
    logp = jax.nn.log_softmax(flat.astype(jnp.float32), axis=-1)
    safe_lab = jnp.clip(lab, 0, flat.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe_lab[:, None], axis=-1)[:, 0]
    if ignore is not None:
        mask = (lab != ignore).astype(jnp.float32)
    else:
        mask = jnp.ones_like(nll)
    outer = scores.shape[0]
    inner = nll.shape[0] // outer
    total = jnp.sum(nll * mask)
    return total / _normalizer(norm, jnp.sum(mask), outer, inner)


@register_layer("MultinomialLogisticLoss")
def multinomial_logistic_loss_layer(params, cfg, probs, labels):
    """-log(p[label]) averaged over the batch; input is already a
    probability distribution (multinomial_logistic_loss_layer.cpp uses
    max(p, kLOG_THRESHOLD=1e-20))."""
    ax = _class_axis(cfg, probs.ndim, "softmax_param")
    flat, lab = _flat_scores_labels(probs, labels, ax)
    p = jnp.take_along_axis(flat, lab[:, None], axis=-1)[:, 0]
    nll = -jnp.log(jnp.maximum(p.astype(jnp.float32), 1e-20))
    return jnp.sum(nll) / jnp.float32(probs.shape[0])


@register_layer("EuclideanLoss")
def euclidean_loss_layer(params, cfg, a, b):
    diff = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.sum(diff * diff) / (2.0 * a.shape[0])


@register_layer("SigmoidCrossEntropyLoss")
def sigmoid_cross_entropy_loss_layer(params, cfg, x, t):
    x = x.astype(jnp.float32)
    t = t.astype(jnp.float32)
    # stable form: x*(t - (x>=0)) - log(1 + exp(x - 2x*(x>=0)))
    pos = (x >= 0).astype(jnp.float32)
    per = x * (t - pos) - jnp.log1p(jnp.exp(x - 2.0 * x * pos))
    return -jnp.sum(per) / jnp.float32(x.shape[0])


@register_layer("HingeLoss")
def hinge_loss_layer(params, cfg, scores, labels):
    norm = str(cfg.get("hinge_loss_param", {}).get("norm", "L1")).upper()
    num = scores.shape[0]
    flat = scores.reshape(num, -1).astype(jnp.float32)
    lab = labels.reshape(-1).astype(jnp.int32)
    sign = 1.0 - 2.0 * jax.nn.one_hot(lab, flat.shape[1], dtype=jnp.float32)
    h = jnp.maximum(0.0, 1.0 + sign * flat)
    if norm == "L2":
        return jnp.sum(h * h) / jnp.float32(num)
    return jnp.sum(h) / jnp.float32(num)


@register_layer("Accuracy")
def accuracy_layer(params, cfg, scores, labels):
    ap = cfg.get("accuracy_param", {}) or {}
    top_k = int(ap.get("top_k", 1))
    ignore = ap.get("ignore_label")
    ax = _class_axis(cfg, scores.ndim, "accuracy_param")
    flat, lab = _flat_scores_labels(scores, labels, ax)
    _, idx = jax.lax.top_k(flat, top_k)
    hit = jnp.any(idx == lab[:, None], axis=-1).astype(jnp.float32)
    if ignore is not None:
        mask = (lab != int(ignore)).astype(jnp.float32)
    else:
        mask = jnp.ones_like(hit)
    return jnp.sum(hit * mask) / jnp.maximum(jnp.sum(mask), 1.0)


@register_layer("ContrastiveLoss")
def contrastive_loss_layer(params, cfg, a, b, y):
    """Siamese-pair margin loss (contrastive_loss_layer.cpp:30-62):
    d2 = ||a_i - b_i||^2; similar pairs (y=1) contribute d2, dissimilar
    pairs max(margin - d, 0)^2 — or max(margin - d2, 0) with
    legacy_version — summed over the batch and divided by 2N."""
    cp = cfg.get("contrastive_loss_param", {}) or {}
    margin = jnp.float32(cp.get("margin", 1.0))
    legacy = cp.get("legacy_version") in (True, "true")
    num = a.shape[0]
    diff = a.reshape(num, -1).astype(jnp.float32) - \
        b.reshape(num, -1).astype(jnp.float32)
    d2 = jnp.sum(diff * diff, axis=1)
    sim = (y.reshape(-1).astype(jnp.int32) != 0)
    if legacy:
        dis = jnp.maximum(margin - d2, 0.0)
    else:
        dis = jnp.maximum(margin - jnp.sqrt(d2), 0.0) ** 2
    return jnp.sum(jnp.where(sim, d2, dis)) / (2.0 * num)


@register_layer("InfogainLoss")
def infogain_loss_layer(params, cfg, probs, labels, *rest):
    """Infogain-weighted multinomial loss (infogain_loss_layer.cpp
    Forward_cpu): loss = -sum_i sum_j H[label_i, j] * log(max(p_ij, 1e-20))
    / N.  H comes from the optional third bottom, from params["H"] (the
    infogain_loss_param.source matrix, loadable via numpy), or defaults to
    identity (= MultinomialLogisticLoss)."""
    flat = probs.reshape(probs.shape[0], -1).astype(jnp.float32)
    lab = labels.reshape(-1).astype(jnp.int32)
    dim = flat.shape[1]
    if rest:
        h = rest[0].reshape(dim, dim).astype(jnp.float32)
    elif "H" in params:
        h = jnp.asarray(params["H"], jnp.float32).reshape(dim, dim)
    else:
        h = jnp.eye(dim, dtype=jnp.float32)
    rows = jnp.take(h, lab, axis=0)                      # [N, dim]
    logp = jnp.log(jnp.maximum(flat, 1e-20))
    return -jnp.sum(rows * logp) / jnp.float32(flat.shape[0])


@register_layer("SmoothL1Loss")
def smooth_l1_loss_layer(params, cfg, pred, target, *weights):
    """Fast R-CNN bounding-box loss (smooth_l1_loss_layer.cu:10-57):
    d = w_in * (pred - target);
    f(d) = 0.5 (sigma d)^2 if |d| < 1/sigma^2 else |d| - 0.5/sigma^2;
    loss = sum(w_out * f(d)) / num.  Optional bottoms 3/4 are the
    inside/outside weights."""
    p = cfg.get("smooth_l1_loss_param", {}) or {}
    sigma = float(p.get("sigma", 1.0))
    sigma2 = sigma * sigma
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if weights:
        d = d * weights[0].astype(jnp.float32)
    ad = jnp.abs(d)
    err = jnp.where(ad < 1.0 / sigma2, 0.5 * d * d * sigma2,
                    ad - 0.5 / sigma2)
    if len(weights) > 1:
        err = err * weights[1].astype(jnp.float32)
    return jnp.sum(err) / jnp.float32(pred.shape[0])


@register_layer("SmoothL1LossOHEM")
def smooth_l1_loss_ohem_layer(params, cfg, pred, target, *weights):
    """R-FCN OHEM variant (smooth_L1_loss_ohem_layer.cu:47-85): fixed
    sigma=1 smooth-L1 with an optional single weights bottom multiplied
    into the diff, LossParameter normalization modes (incl. PRE_FIXED),
    and a second top carrying the per-position channel-summed loss
    [N, H, W, 1] that BoxAnnotatorOHEM ranks."""
    lp = cfg.get("loss_param", {}) or {}
    norm = lp.get("normalization")
    if norm is None and "normalize" in lp:
        norm = "VALID" if lp.get("normalize") else "BATCH_SIZE"
    norm = str(norm or "VALID").upper()
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if weights:
        d = d * weights[0].astype(jnp.float32)
    ad = jnp.abs(d)
    err = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    outer = pred.shape[0]
    inner = int(pred.size // (outer * pred.shape[-1]))  # H*W (NHWC)
    if norm == "BATCH_SIZE":
        n = float(outer)
    elif norm == "PRE_FIXED":
        n = float(lp.get("pre_fixed_normalizer", 1.0))
    elif norm == "NONE":
        n = 1.0
    else:  # FULL and VALID both normalize by outer*inner (ref :67-72)
        n = float(outer * inner)
    loss = jnp.sum(err) / max(n, 1.0)
    per_position = jnp.sum(err, axis=-1, keepdims=True)
    return loss, per_position


@register_layer("SoftmaxWithLossOHEM")
def softmax_with_loss_ohem_layer(params, cfg, scores, labels):
    """R-FCN OHEM softmax loss (softmax_loss_ohem_layer.cu:30-68): the
    SoftmaxWithLoss math plus two extra tops — the softmax probabilities
    (top[1] shares prob_, :62) and the per-position unnormalized NLL map
    (top[2], :66-67; zero at ignored labels) that BoxAnnotatorOHEM ranks."""
    ignore, norm = _loss_param(cfg)
    ax = _class_axis(cfg, scores.ndim, "softmax_param")
    flat, lab = _flat_scores_labels(scores, labels, ax)
    logp = jax.nn.log_softmax(flat.astype(jnp.float32), axis=-1)
    safe_lab = jnp.clip(lab, 0, flat.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, safe_lab[:, None], axis=-1)[:, 0]
    if ignore is not None:
        mask = (lab != ignore).astype(jnp.float32)
    else:
        mask = jnp.ones_like(nll)
    outer = scores.shape[0]
    inner = nll.shape[0] // outer
    loss = jnp.sum(nll * mask) / _normalizer(norm, jnp.sum(mask),
                                             outer, inner)
    prob = jnp.moveaxis(
        jnp.exp(logp).reshape(
            jnp.moveaxis(scores, ax, -1).shape), -1, ax)
    per_position = (nll * mask).reshape(labels.shape)
    return loss, prob, per_position


@register_layer("DummyData")
def dummy_data_layer(params, cfg, *unused):
    """Filler-driven synthetic tops (dummy_data_layer.cpp).  Non-constant
    fillers draw from a PRNG key seeded by the layer name — deterministic
    across forwards by design (the reference refills gaussian data every
    forward from a global RNG; a traced program has no such ambient state,
    and Caffe's own solver tests only rely on the values being fixed once
    seeded)."""
    ddp = cfg.get("dummy_data_param", {}) or {}
    shapes = ddp.get("shape", [])
    if not isinstance(shapes, list):
        shapes = [shapes]
    dims = []
    if shapes:
        for s in shapes:
            d = s.get("dim", [])
            dims.append([int(v) for v in (d if isinstance(d, list) else [d])])
    else:  # legacy num/channels/height/width fields -> NHWC
        def as_list(v):
            return [int(x) for x in (v if isinstance(v, list) else [v])]
        nums = as_list(ddp.get("num", 1))
        chans = as_list(ddp.get("channels", 1))
        heights = as_list(ddp.get("height", 1))
        widths = as_list(ddp.get("width", 1))
        k = max(map(len, (nums, chans, heights, widths)))
        def pick(lst, i):
            return lst[i] if i < len(lst) else lst[-1]
        dims = [[pick(nums, i), pick(heights, i), pick(widths, i),
                 pick(chans, i)] for i in range(k)]
    fillers = ddp.get("data_filler", [])
    if not isinstance(fillers, list):
        fillers = [fillers]
    name = str(cfg.get("name", "dummy"))
    outs = []
    for i, dim in enumerate(dims):
        if len(dim) == 4 and shapes:
            # prototxt BlobShape is NCHW; store NHWC like every other blob
            dim = [dim[0], dim[2], dim[3], dim[1]]
        spec = fillers[i] if i < len(fillers) else (
            fillers[0] if fillers else None)
        key = jax.random.PRNGKey(zlib.crc32(f"{name}/{i}".encode()))
        outs.append(fill(key, spec, tuple(dim)))
    return outs if len(outs) > 1 else outs[0]
