"""Semantic clustering of deep features.

TPU-native replacement for the reference's one-time k-means of L2-normalized
conv5_1 source features (reference: ColorTransfer.cpp:355-395 via modified
FLANN ``hierarchicalClustering``, branching=10, iters=11, random centers,
``srand(1)``) and the cluster->pixel expansion with 4-neighbour boundary
dilation (``getClusters`` :273-353, ``insertClusterPixel`` :255-271).

Differences by design (SURVEY §7.4): plain fixed-trip-count Lloyd k-means
with an explicit PRNG key replaces FLANN's recursive hierarchical splitting —
same cluster count, same iteration budget, deterministic, and expressible as
two dense matmuls per iteration (assignments + center update) that land on
the MXU.  Empty clusters keep their previous center (FLANN similarly never
produces empty leaf clusters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_clusters", "iters"))
def kmeans(
    points: jnp.ndarray,
    key: jax.Array,
    num_clusters: int = 10,
    iters: int = 11,
):
    """Lloyd k-means.  points: [N, C] float.  Returns (labels [N] int32,
    centers [K, C] float32).

    Matches the reference's budget (10 clusters, 11 iterations, random
    initial centers — ColorTransfer.cpp:372-373).
    """
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    # replace=True only when the grid is smaller than the cluster count
    # (tiny test images); duplicated centers simply leave clusters empty.
    init_idx = jax.random.choice(
        key, n, shape=(num_clusters,), replace=n < num_clusters
    )
    centers0 = pts[init_idx]
    pts_sq = jnp.sum(pts * pts, axis=1)

    def assign(centers):
        # ||p - c||^2 = ||p||^2 - 2 p.c + ||c||^2 ; argmin over c. The p.c
        # term is an [N,C]x[C,K] matmul (MXU).
        dots = pts @ centers.T
        d = pts_sq[:, None] - 2.0 * dots + jnp.sum(centers * centers, axis=1)
        return jnp.argmin(d, axis=1).astype(jnp.int32)

    def body(centers, _):
        labels = assign(centers)
        onehot = jax.nn.one_hot(labels, num_clusters, dtype=jnp.float32)
        sums = onehot.T @ pts                      # [K, C]
        counts = jnp.sum(onehot, axis=0)           # [K]
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None],
            centers,
        )
        return new_centers, None

    centers, _ = jax.lax.scan(body, centers0, None, length=iters)
    return assign(centers), centers


def cluster_membership(
    label_map: jnp.ndarray, num_clusters: int
) -> jnp.ndarray:
    """Per-cluster cell membership with 4-neighbour boundary dilation.

    The reference marks every cell of cluster l plus each 4-neighbour of a
    cell whose label differs (getClusters :288-315) — exactly the binary
    4-dilation of the (labels == l) mask.

    label_map: [lh, lw] int32.  Returns bool [K, lh, lw].
    """
    onehot = (
        label_map[None, :, :] == jnp.arange(num_clusters)[:, None, None]
    )

    def dilate4(m):
        p = jnp.pad(m, ((0, 0), (1, 1), (1, 1)))
        return (
            m
            | p[:, :-2, 1:-1] | p[:, 2:, 1:-1]
            | p[:, 1:-1, :-2] | p[:, 1:-1, 2:]
        )

    return dilate4(onehot)


def labels_for_pixels(
    label_map: jnp.ndarray, h: int, w: int, stride: int
) -> jnp.ndarray:
    """Expand the conv5_1-resolution label grid to an [h, w] pixel label map.

    Pixel (x, y) falls in cell (x // stride, y // stride) (inverse of
    insertClusterPixel :255-271, which writes cell -> pixel block); the cell
    index is clipped for ceil-pooled border cells.
    """
    lh, lw = label_map.shape
    ys = jnp.clip(jnp.arange(h) // stride, 0, lh - 1)
    xs = jnp.clip(jnp.arange(w) // stride, 0, lw - 1)
    return label_map[ys[:, None], xs[None, :]]


def membership_for_pixels(
    membership: jnp.ndarray, h: int, w: int, stride: int
) -> jnp.ndarray:
    """Expand [K, lh, lw] cell membership to [K, h, w] pixel membership."""
    k, lh, lw = membership.shape
    ys = jnp.clip(jnp.arange(h) // stride, 0, lh - 1)
    xs = jnp.clip(jnp.arange(w) // stride, 0, lw - 1)
    return membership[:, ys[:, None], xs[None, :]]


def multi_labels_for_pixels(
    label_map: jnp.ndarray,
    membership: jnp.ndarray,
    h: int,
    w: int,
    stride: int,
    num_memberships: int,
) -> jnp.ndarray:
    """Per-pixel list of up to P cluster memberships, primary first.

    The reference queries a kd-tree for EVERY cluster a pixel belongs to
    through the boundary-dilated membership and merges the results
    (ColorTransfer.cpp:397-423 ``findKnns`` loops clusters; :60-110
    ``sortMergeComputeWeight`` merges across queries).  The primary-cluster
    path (P=1) is the round-1 approximation; P>1 restores the reference's
    multi-cluster merge with a fixed membership cap.

    Pixels with fewer than P memberships repeat their primary cluster
    (duplicate candidates tie on distance and are deduplicated during
    neighbour selection).  Returns int32 [h, w, P].
    """
    k = membership.shape[0]
    # score: primary cluster 2, dilated member 1, other 0; stable top-P
    primary = (
        label_map[None, :, :] == jnp.arange(k)[:, None, None]
    )
    score = membership.astype(jnp.int32) + primary.astype(jnp.int32)
    _, order = jax.lax.top_k(
        jnp.moveaxis(score, 0, -1), min(num_memberships, k)
    )                                                    # [lh, lw, P]
    got = jnp.take_along_axis(
        jnp.moveaxis(score, 0, -1), order, axis=-1
    )
    cells = jnp.where(got > 0, order, order[..., :1]).astype(jnp.int32)
    lh, lw = label_map.shape
    ys = jnp.clip(jnp.arange(h) // stride, 0, lh - 1)
    xs = jnp.clip(jnp.arange(w) // stride, 0, lw - 1)
    return cells[ys[:, None], xs[None, :], :]
