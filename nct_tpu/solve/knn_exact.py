"""Numpy EXACT reimplementation of the reference's k-NN graph build.

Validation reference only — never on the pipeline path.  Reproduces the
reference's semantics literally (reference: ColorTransfer.cpp:397-423
``findKnns``, :136-220 ``findSubKNNs``, :60-110 ``sortMergeComputeWeight``):

  * every pixel queries the kd-tree of EVERY cluster whose boundary-dilated
    member list contains it (a pixel near a cluster boundary is in several
    lists, getClusters :288-315);
  * each per-cluster query returns the k nearest OTHER members by squared
    unit-Lab L2 (nanoflann L2_Simple over double Lab, self dropped
    :190-210);
  * per pixel, all per-cluster results are concatenated, sorted by
    distance, deduplicated by id (duplicates of a pair share a distance so
    they sort adjacent), and the first k kept with weight exp(1 - d/3)
    (:92-104).

Used by tests/test_stats_cluster_knn.py (graph-recall fence) and
tools/knn_recall.py (the table justifying the default in PERFORMANCE.md).
"""

from __future__ import annotations

import numpy as np


def exact_knn_graph(
    lab_unit: np.ndarray,
    member_pix: np.ndarray,
    k_num: int = 8,
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Exact multi-membership k-NN graph.

    lab_unit: [H, W, 3] float unit-Lab; member_pix: bool [K, H, W] dilated
    per-cluster pixel membership (cluster.membership_for_pixels).  Returns
    (ids, weights): per-pixel variable-length arrays (<= k_num), ids into
    the flat H*W pixel axis, weights exp(1 - d/3).
    """
    h, w, _ = lab_unit.shape
    n = h * w
    colors = lab_unit.reshape(n, 3).astype(np.float64)
    kc = member_pix.shape[0]
    per_pixel: list[list[tuple[float, int]]] = [[] for _ in range(n)]

    for c in range(kc):
        ids = np.nonzero(member_pix[c].reshape(-1))[0]
        if ids.size <= 1:
            continue
        cc = colors[ids]                                   # [m, 3]
        # full pairwise squared distances within the cluster list
        d = (
            np.sum(cc * cc, axis=1)[:, None]
            - 2.0 * (cc @ cc.T)
            + np.sum(cc * cc, axis=1)[None, :]
        )
        np.fill_diagonal(d, np.inf)                        # drop self
        d = np.maximum(d, 0.0)
        kk = min(k_num, ids.size - 1)
        nn = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        for row, pid in enumerate(ids):
            for j in nn[row]:
                per_pixel[pid].append((float(d[row, j]), int(ids[j])))

    out_ids: list[np.ndarray] = []
    out_w: list[np.ndarray] = []
    for i in range(n):
        pairs = sorted(per_pixel[i], key=lambda t: t[0])
        seen: set[int] = set()
        ids_i: list[int] = []
        w_i: list[float] = []
        for dist, j in pairs:
            if j in seen:
                continue
            seen.add(j)
            ids_i.append(j)
            w_i.append(float(np.exp(1.0 - dist / 3.0)))
            if len(ids_i) >= k_num:
                break
        out_ids.append(np.asarray(ids_i, np.int32))
        out_w.append(np.asarray(w_i, np.float32))
    return out_ids, out_w


def graph_recall(
    got_ids: np.ndarray,
    got_w: np.ndarray,
    exact_ids: list[np.ndarray],
    exact_w: list[np.ndarray],
) -> tuple[float, float]:
    """(id recall, weight recall) of a built graph vs the exact one.

    id recall   = mean over pixels of |got ∩ exact| / |exact|;
    weight recall = total exact weight recovered / total exact weight —
    weights decay exp(-d/3), so missing a far neighbour costs little.
    """
    n = len(exact_ids)
    hit = 0.0
    cnt = 0
    w_hit = 0.0
    w_tot = 0.0
    for i in range(n):
        ex = exact_ids[i]
        if ex.size == 0:
            continue
        got = set(int(g) for g, wt in zip(got_ids[i], got_w[i]) if wt > 0)
        inset = np.asarray([int(e) in got for e in ex])
        hit += float(inset.mean())
        cnt += 1
        w_hit += float(exact_w[i][inset].sum())
        w_tot += float(exact_w[i].sum())
    return hit / max(cnt, 1), w_hit / max(w_tot, 1e-30)
