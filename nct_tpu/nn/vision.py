"""R-FCN / detection vision ops: ROIPooling, PSROIPooling, BoxAnnotatorOHEM.

Rebuilds the Microsoft-fork detection layers (reference:
src/caffe/layers/roi_pooling_layer.cpp — Fast R-CNN max ROI pooling —
psroi_pooling_layer.cu — R-FCN position-sensitive average pooling — and
box_annotator_ohem_layer.cu — online hard example mining).

TPU-native shape: the reference assigns one CUDA thread per output bin
walking a dynamic [hstart, hend) x [wstart, wend) region.  Dynamic
per-ROI extents are shape-hostile under XLA, so each ROI's bins are
evaluated as SEPARABLE masked reductions over the full feature map:
a [ph, H] row-membership mask and a [pw, W] column mask turn every bin
max/mean into two static-shape reductions (max/sum over W per column
bin, then over H per row bin) — O(R * (ph*H + pw*W) * C) work, all
batched over ROIs with vmap.  Bin boundary arithmetic is bit-faithful
to the reference (floor/ceil, clipping, empty-bin zeroing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nct_tpu.nn.layers import register_layer


def _bin_masks(size_f, n_bins, lo_off, limit, add_before_floor):
    """[n_bins, limit] membership masks for the reference's bin rule:
    start_i = floor(i * bin + off), end_i = ceil((i+1) * bin + off),
    clipped to [0, limit].  ``add_before_floor`` matches the two kernels'
    differing order (ROI pooling floors the product then adds the int
    start; PSROI adds the float start before flooring)."""
    i = jnp.arange(n_bins, dtype=jnp.float32)
    if add_before_floor:
        s = jnp.floor(i * size_f + lo_off)
        e = jnp.ceil((i + 1.0) * size_f + lo_off)
    else:
        s = jnp.floor(i * size_f) + lo_off
        e = jnp.ceil((i + 1.0) * size_f) + lo_off
    s = jnp.clip(s, 0, limit)
    e = jnp.clip(e, 0, limit)
    pos = jnp.arange(limit, dtype=jnp.float32)
    return (pos[None, :] >= s[:, None]) & (pos[None, :] < e[:, None])


@register_layer("ROIPooling")
def roi_pooling_layer(params, cfg, x, rois):
    """Fast R-CNN ROI max pooling (roi_pooling_layer.cpp:41-120):
    x [N, H, W, C], rois [R, 5] rows (batch_idx, x1, y1, x2, y2) in
    original-image coordinates scaled by spatial_scale.  Output
    [R, ph, pw, C]; empty bins are 0."""
    p = cfg.get("roi_pooling_param", {}) or {}
    ph = int(p.get("pooled_h"))
    pw = int(p.get("pooled_w"))
    ss = float(p.get("spatial_scale", 1.0))
    n, h, w, c = x.shape

    def one(roi):
        b = roi[0].astype(jnp.int32)
        xs = jnp.round(roi[1] * ss)
        ys = jnp.round(roi[2] * ss)
        xe = jnp.round(roi[3] * ss)
        ye = jnp.round(roi[4] * ss)
        rh = jnp.maximum(ye - ys + 1.0, 1.0)
        rw = jnp.maximum(xe - xs + 1.0, 1.0)
        mh = _bin_masks(rh / ph, ph, ys, h, add_before_floor=False)
        mw = _bin_masks(rw / pw, pw, xs, w, add_before_floor=False)
        feat = jnp.take(x, b, axis=0)                       # [H, W, C]
        # separable masked max: columns first, then rows
        col = jnp.max(
            jnp.where(mw[:, None, :, None], feat[None], -jnp.inf),
            axis=2,
        )                                                   # [pw, H, C]
        out = jnp.max(
            jnp.where(mh[:, None, :, None], col[None], -jnp.inf),
            axis=2,
        )                                                   # [ph, pw, C]
        return jnp.where(jnp.isfinite(out), out, 0.0)

    return jax.vmap(one)(rois.astype(jnp.float32))


@register_layer("PSROIPooling")
def psroi_pooling_layer(params, cfg, x, rois):
    """R-FCN position-sensitive average ROI pooling
    (psroi_pooling_layer.cu PSROIPoolingForward): x [N, H, W,
    output_dim * group_size^2], rois [R, 5].  Output bin (i, j) of output
    channel ct averages input channel (ct*gs + i)*gs + j over the bin —
    each spatial cell of the output reads its OWN channel group.  ROI
    edges: start = round(coord) * scale, end = round(coord + 1) * scale;
    too-small ROIs forced to 0.1 extent; empty bins 0."""
    p = cfg.get("psroi_pooling_param", {}) or {}
    out_dim = int(p.get("output_dim"))
    gs = int(p.get("group_size"))
    ss = float(p.get("spatial_scale", 1.0))
    n, h, w, c = x.shape
    assert c == out_dim * gs * gs, (c, out_dim, gs)

    def one(roi):
        b = roi[0].astype(jnp.int32)
        xs = jnp.round(roi[1]) * ss
        ys = jnp.round(roi[2]) * ss
        xe = jnp.round(roi[3] + 1.0) * ss
        ye = jnp.round(roi[4] + 1.0) * ss
        rh = jnp.maximum(ye - ys, 0.1)
        rw = jnp.maximum(xe - xs, 0.1)
        mh = _bin_masks(rh / gs, gs, ys, h, add_before_floor=True)
        mw = _bin_masks(rw / gs, gs, xs, w, add_before_floor=True)
        feat = jnp.take(x, b, axis=0).reshape(h, w, out_dim, gs, gs)
        # separable masked sums; output cell (i, j) reads input channel
        # block [:, i, j]: the column sum selects kernel column j while
        # binning w, the row sum selects kernel row i while binning h
        col = jnp.einsum("jw,hwkij->jhki", mw.astype(jnp.float32),
                         feat.astype(jnp.float32))   # [gs(j), H, K, gs(i)]
        out = jnp.einsum("ih,jhki->kij", mh.astype(jnp.float32), col)
        area = (jnp.sum(mh, axis=1).astype(jnp.float32)[:, None]
                * jnp.sum(mw, axis=1).astype(jnp.float32)[None, :])
        return jnp.where(area[None] > 0, out / jnp.maximum(area[None], 1.0),
                         0.0)                       # [K, gs, gs]

    out = jax.vmap(one)(rois.astype(jnp.float32))   # [R, K, gs, gs]
    return jnp.transpose(out, (0, 2, 3, 1))         # NHWC [R, gs, gs, K]


@register_layer("BoxAnnotatorOHEM")
def box_annotator_ohem_layer(params, cfg, rois, per_roi_loss, labels,
                             bbox_loss_weights):
    """R-FCN online hard example mining (box_annotator_ohem_layer.cu:16-75):
    keep the ``roi_per_img`` highest-loss ROIs of each image; everything
    else gets label = ignore_label and zero bbox loss weights.

    Bottoms (NHWC): rois [N, H, W, 5] (channel 0 = image batch index),
    per-ROI loss [N, H, W, 1], labels [N, H, W, 1], bbox loss weights
    [N, H, W, C].  Tops: (hard-example labels, gated bbox weights).

    TPU-native selection: the reference sorts index arrays on the host and
    walks them with per-image countdown counters.  Here the per-image rank
    is computed with static shapes only — sort ROIs by loss (descending),
    then stably sort that order by image id so each image's ROIs are
    contiguous *in loss order*; the rank within the contiguous group is
    ``arange - cummax(group-start)``, and rank < roi_per_img is the keep
    mask (scattered back through the composed permutation, which is
    bijective, so the scatter has unique indices)."""
    p = cfg.get("box_annotator_ohem_param", {}) or {}
    roi_per_img = int(p.get("roi_per_img"))
    ignore_label = float(p.get("ignore_label", -1))

    r = int(rois.size // rois.shape[-1])
    batch_ind = rois[..., 0].reshape(r).astype(jnp.int32)
    loss = per_roi_loss.reshape(r).astype(jnp.float32)

    order = jnp.argsort(-loss, stable=True)            # loss desc
    b_ord = jnp.take(batch_ind, order)
    order2 = jnp.argsort(b_ord, stable=True)           # group by image,
    b_sorted = jnp.take(b_ord, order2)                 # loss order kept
    idx = jnp.arange(r, dtype=jnp.int32)
    change = jnp.concatenate(
        [jnp.ones((1,), bool), b_sorted[1:] != b_sorted[:-1]])
    group_start = jax.lax.cummax(jnp.where(change, idx, 0))
    keep_sorted = (idx - group_start) < roi_per_img
    orig = jnp.take(order, order2)                     # composed permutation
    keep = jnp.zeros((r,), bool).at[orig].set(keep_sorted, unique_indices=True)

    keep_l = keep.reshape(labels.shape)
    top_labels = jnp.where(
        keep_l, labels, jnp.full_like(labels, ignore_label))
    keep_w = keep.reshape(labels.shape[:-1] + (1,))
    top_weights = jnp.where(keep_w, bbox_loss_weights,
                            jnp.zeros_like(bbox_loss_weights))
    return top_labels, top_weights
