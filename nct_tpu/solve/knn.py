"""k-NN graph over Lab colours within semantic clusters.

TPU-native replacement for the reference's per-cluster nanoflann kd-tree
queries (reference: ColorTransfer.cpp:136-220 ``findSubKNNs``, :397-423
``findKnns``, :60-110 ``sortMergeComputeWeight``): for every down-res pixel,
find the k=8 nearest *other* pixels of its semantic cluster in unit-Lab
colour space (squared L2, matching nanoflann's L2 metric) and weight each
neighbour ``exp(1 - d / 3)``.

Design (SURVEY §7.4): exact kd-trees are pointer-chasing-hostile on TPU, so
each cluster's candidate set is a fixed-size random subsample (M pixels,
seeded PRNG) and every pixel scores its own cluster's candidates with a
dense masked distance computation, chunked over pixels to bound VMEM.  The
reference's cross-cluster merge (pixels reachable through boundary-dilated
membership of several clusters) is approximated by the pixel's primary
cluster; the nonlocal term is a regulariser, so graph quality is judged by
end-to-end output SSIM, not by graph equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sample_cluster_candidates(
    membership_pix: jnp.ndarray,
    key: jax.Array,
    max_candidates: int,
) -> jnp.ndarray:
    """Sample up to M member pixel ids per cluster.

    membership_pix: bool [K, H, W].  Returns int32 [K, M] flat pixel ids;
    clusters smaller than M repeat their members (dedup happens naturally in
    the top-k merge since duplicate ids tie on distance).

    Replaces the reference's ``random_shuffle`` of each cluster's pixel list
    (ColorTransfer.cpp:409) with a weighted top-M draw under an explicit key.
    """
    k, h, w = membership_pix.shape
    n = h * w
    m = membership_pix.reshape(k, n)
    u = jax.random.uniform(key, (k, n), dtype=jnp.float32)
    score = jnp.where(m, u, -1.0)
    _, idx = jax.lax.top_k(score, max_candidates)
    # For tiny clusters (< M members) top_k returns non-member ids with
    # score -1; replace them with the cluster's first member.
    member_rank = jnp.take_along_axis(score, idx, axis=1)
    first = idx[:, :1]
    return jnp.where(member_rank >= 0.0, idx, first).astype(jnp.int32)


def _knn_graph_impl(
    lab_unit: jnp.ndarray,
    pixel_labels: jnp.ndarray,
    candidates: jnp.ndarray,
    k_num: int = 8,
    chunk: int = 2048,
):
    """Build the nonlocal k-NN graph (unbatched body; see knn_graph).

    lab_unit: [H, W, 3] float Lab in [0, 1] (ref queries cntLabD,
    ColorTransfer.cpp:150-169).  pixel_labels: [H, W] int32 primary cluster
    per pixel, or [H, W, P] int32 for the reference's multi-cluster merge
    (every listed membership's candidates are scored and the k best of the
    union kept, matching findKnns/sortMergeComputeWeight semantics).
    candidates: [K, M] int32 flat pixel ids per cluster.

    Returns (ids [N, k] int32, weights [N, k] float32, slots [N, k] int32)
    with N = H*W and weights = exp(1 - d/3), d the squared unit-Lab
    distance (sortMergeComputeWeight :99).  ``slots`` locate each
    neighbour inside the flattened [K_clusters * M] candidate table —
    downstream gathers against that small table run ~3x faster on TPU
    than against the full pixel table (see solve_nonlocal).
    """
    h, w, _ = lab_unit.shape
    n = h * w
    colors = lab_unit.reshape(n, 3).astype(jnp.float32)
    if pixel_labels.ndim == 2:
        pixel_labels = pixel_labels[..., None]
    p = pixel_labels.shape[-1]
    labels_flat = pixel_labels.reshape(n, p)
    m = candidates.shape[1]

    if p == 1:
        return _knn_graph_sorted(
            colors, labels_flat[:, 0], candidates, k_num, chunk
        )

    pad = (-n) % chunk
    q_colors = jnp.pad(colors, ((0, pad), (0, 0)))
    q_labels = jnp.pad(labels_flat, ((0, pad), (0, 0)))
    q_ids = jnp.pad(jnp.arange(n, dtype=jnp.int32), (0, pad))
    n_chunks = (n + pad) // chunk

    # Pre-gather each cluster's candidate colours ONCE ([K, M, 3]); chunks then
    # gather whole per-cluster rows (M*3 contiguous floats) by label instead
    # of 4M scattered 12-byte rows — the difference between DMA-friendly
    # and scalarized gathers on TPU.
    cand_colors = colors[candidates]           # [K, M, 3]
    cand_sq = jnp.sum(cand_colors * cand_colors, axis=-1)   # [K, M]

    def one_chunk(args):
        qc, ql, qi = args                      # [B,3], [B,P], [B]
        b = qc.shape[0]
        cand_ids = candidates[ql].reshape(b, p * m)      # (row gather)
        cc = cand_colors[ql].reshape(b, p * m, 3)        # (row gather)
        csq = cand_sq[ql].reshape(b, p * m)
        # ||q-c||^2 = ||c||^2 - 2 q.c + ||q||^2 (exact value needed for the
        # exp(1-d/3) weights); clamp tiny negative cancellation residue.
        cross = jax.lax.dot_general(
            qc[:, None, :], cc,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]
        q_sq = jnp.sum(qc * qc, axis=-1)
        d = jnp.maximum(
            csq - 2.0 * cross + q_sq[:, None], 0.0
        )                                                # [B, P*M]
        # Self-matches must not be neighbours; drop via distance-inf.
        d = jnp.where(cand_ids == qi[:, None], jnp.inf, d)
        # k smallest by iterative argmin extraction — O(k) cheap VPU
        # reductions instead of a full [B, M] sort (lax.top_k lowers to a
        # sort, which is slow on TPU).  Duplicate candidate ids are masked
        # out as they are selected, which also dedups repeated entries
        # (within a cluster's subsample AND across merged memberships).
        work = d
        ids_list, d_list, slot_list = [], [], []
        for _ in range(k_num):
            j = jnp.argmin(work, axis=1)                      # first min
            dj = jnp.take_along_axis(work, j[:, None], 1)[:, 0]
            cid = jnp.take_along_axis(cand_ids, j[:, None], 1)[:, 0]
            ids_list.append(cid)
            d_list.append(dj)
            # slot into the flat [K*M] table: owning cluster * m + offset
            j32 = j.astype(jnp.int32)
            owner = jnp.take_along_axis(ql, (j32 // m)[:, None], 1)[:, 0]
            slot_list.append(owner * m + j32 % m)
            # mask every candidate slot holding this id (dedup + advance)
            work = jnp.where(cand_ids == cid[:, None], jnp.inf, work)
        ids = jnp.stack(ids_list, axis=1)
        dists = jnp.stack(d_list, axis=1)
        slots = jnp.stack(slot_list, axis=1)
        weights = jnp.where(
            jnp.isfinite(dists), jnp.exp(1.0 - dists / 3.0), 0.0
        )
        return ids, weights, slots

    qc = q_colors.reshape(n_chunks, chunk, 3)
    ql = q_labels.reshape(n_chunks, chunk, p)
    qi = q_ids.reshape(n_chunks, chunk)
    ids, weights, slots = jax.lax.map(one_chunk, (qc, ql, qi))
    return (
        ids.reshape(-1, k_num)[:n],
        weights.reshape(-1, k_num)[:n],
        slots.reshape(-1, k_num)[:n],
    )


@functools.lru_cache(maxsize=None)
def _knn_custom_vmap(k_num: int, chunk: int):
    """custom_vmap wrapper: a vmapped knn_graph (the multi-chip serving
    program) folds the batch into the ROW axis instead of lowering
    batched gathers — B images become ONE flat problem whose pixel ids
    and cluster ids carry per-image offsets (clusters are disjoint
    across images, so per-pixel results are bitwise the single-image
    ones).  The vmapped lowering measured 1.78x per-item cost at batch 4
    (round-4 serving table); the folded build runs the SAME proven
    single-image program at B x the rows, so per-item scaling is 1.0 by
    construction."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(lab_unit, pixel_labels, candidates):
        return _knn_graph_impl(lab_unit, pixel_labels, candidates,
                               k_num, chunk)

    @f.def_vmap
    def _rule(axis_size, in_batched, lab_unit, pixel_labels, candidates):
        bsz = axis_size

        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (bsz,) + x.shape)

        lab_unit = bcast(lab_unit, in_batched[0])
        pixel_labels = bcast(pixel_labels, in_batched[1])
        candidates = bcast(candidates, in_batched[2])
        multi = pixel_labels.ndim == 4          # [B, H, W, P] memberships
        if multi:
            # the multi-membership merge path keeps plain vmap semantics
            out = jax.vmap(
                lambda l, pl, cd: _knn_graph_impl(l, pl, cd, k_num, chunk)
            )(lab_unit, pixel_labels, candidates)
            return out, (True, True, True)

        _b, h, w, _ = lab_unit.shape
        n = h * w
        kc, m = candidates.shape[1:]
        boff = jnp.arange(bsz, dtype=jnp.int32)
        colors = lab_unit.astype(jnp.float32).reshape(bsz * n, 3)
        labels_off = (pixel_labels.reshape(bsz, n).astype(jnp.int32)
                      + boff[:, None] * kc).reshape(bsz * n)
        cands_off = (candidates.astype(jnp.int32)
                     + boff[:, None, None] * n).reshape(bsz * kc, m)
        ids, wts, slots = _knn_graph_sorted(
            colors, labels_off, cands_off, k_num, chunk)
        ids = ids.reshape(bsz, n, k_num) - boff[:, None, None] * n
        slots = (slots.reshape(bsz, n, k_num)
                 - boff[:, None, None] * (kc * m))
        return (ids, wts.reshape(bsz, n, k_num), slots), (True, True, True)

    return f


@functools.partial(jax.jit, static_argnames=("k_num", "chunk"))
def knn_graph(
    lab_unit: jnp.ndarray,
    pixel_labels: jnp.ndarray,
    candidates: jnp.ndarray,
    k_num: int = 8,
    chunk: int = 2048,
):
    """Build the nonlocal k-NN graph (see _knn_graph_impl for the
    algorithm; under jax.vmap the batch folds into the row axis —
    _knn_custom_vmap)."""
    return _knn_custom_vmap(int(k_num), int(chunk))(
        lab_unit, pixel_labels, candidates)


# Row count from which the sorted builder's un-permute runs as gathers
# instead of a scatter-set (the TPU scatter cliff sits between 135k and
# 542k rows; single-pair grids stay below, batch-folded ones above).
_GATHER_EPILOGUE_MIN_ROWS = 400_000


def _knn_graph_sorted(
    colors: jnp.ndarray,
    labels: jnp.ndarray,
    candidates: jnp.ndarray,
    k_num: int,
    chunk: int,
):
    """Single-membership fast path: pixels sorted by cluster, chunks
    aligned to cluster starts.

    The generic path gathers each pixel's cluster candidate table as one
    M*3-float row — ~7 GB of gather traffic at 700 px.  Grouping pixels by
    their (single) cluster makes every chunk single-cluster, so each chunk
    reads its candidate table ONCE; the extra cost is two N-element
    permutations at build time.  Semantics are identical to the generic
    path (same distances, same first-min tie-breaking within a cluster's
    candidate order).
    """
    n = colors.shape[0]
    kc, m = candidates.shape
    n_chunks = (n + chunk - 1) // chunk + (kc - 1)   # static upper bound

    order = jnp.argsort(labels)                       # stable: groups clusters
    counts = jnp.bincount(labels, length=kc)
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    n_chunks_c = -(-counts // chunk)                  # ceil per cluster
    chunk_off = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(n_chunks_c)[:-1]]
    )

    # chunk row -> (cluster, first sorted position, validity count)
    rows = jnp.arange(n_chunks, dtype=jnp.int32)
    row_cluster = (
        jnp.searchsorted(jnp.cumsum(n_chunks_c), rows, side="right")
    ).astype(jnp.int32)
    row_cluster = jnp.minimum(row_cluster, kc - 1)
    local_j = rows - chunk_off[row_cluster].astype(jnp.int32)
    data_start = (starts[row_cluster] + local_j * chunk).astype(jnp.int32)
    cluster_end = (starts[row_cluster] + counts[row_cluster]).astype(jnp.int32)

    cand_colors = colors[candidates]                  # [K, M, 3]
    cand_sq = jnp.sum(cand_colors * cand_colors, axis=-1)

    # Duplicate candidate entries (small clusters are padded by repeating
    # members) are masked to their FIRST occurrence once per cluster —
    # duplicates share a distance, so this reproduces the generic path's
    # per-pick id-dedup exactly, and distinct-id rows are a precondition
    # for the two-level group selection below.
    cid_sorted_ord = jnp.argsort(candidates, axis=1)
    cid_sorted = jnp.take_along_axis(candidates, cid_sorted_ord, axis=1)
    is_first_sorted = jnp.concatenate(
        [jnp.ones((kc, 1), bool), cid_sorted[:, 1:] != cid_sorted[:, :-1]],
        axis=1,
    )
    first_mask = jnp.zeros((kc, m), bool)
    first_mask = first_mask.at[
        jnp.arange(kc, dtype=jnp.int32)[:, None], cid_sorted_ord
    ].set(is_first_sorted)

    def one_chunk(args):
        c, d0, dend = args
        pos = d0 + jnp.arange(chunk, dtype=jnp.int32)
        pid = order[jnp.minimum(pos, n - 1)].astype(jnp.int32)
        qc = colors[pid]                              # [B, 3]
        cand_ids = candidates[c]                      # [M]
        cc = cand_colors[c]                           # [M, 3]
        csq = cand_sq[c]                              # [M]
        cross = qc @ cc.T                             # [B, M]
        q_sq = jnp.sum(qc * qc, axis=-1)
        d = jnp.maximum(csq[None, :] - 2.0 * cross + q_sq[:, None], 0.0)
        d = jnp.where(cand_ids[None, :] == pid[:, None], jnp.inf, d)
        d = jnp.where(first_mask[c][None, :], d, jnp.inf)
        # extraction passes RANK on bf16 keys (halves the HBM traffic of
        # the stage's dominant cost); exact f32 distances for the k
        # winners are recomputed afterwards from their colours in one
        # [B*k]-row gather, so the exp(1-d/3) weights stay exact without
        # re-reading the f32 row per pick.  Rows are duplicate-free
        # (first_mask), so advancing = masking the one selected column.
        nfin = jnp.sum(jnp.isfinite(d), axis=1)       # finite candidates
        work = d.astype(jnp.bfloat16)
        ids_list, slot_list = [], []
        for _ in range(k_num):
            j = jnp.argmin(work, axis=1)
            ids_list.append(cand_ids[j])
            slot_list.append(c * m + j.astype(jnp.int32))
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, work.shape, 1)
                == j[:, None]
            )
            work = jnp.where(onehot, jnp.inf, work)
        ids = jnp.stack(ids_list, axis=1)             # [B, k]
        slots = jnp.stack(slot_list, axis=1)
        ncol = colors[ids]                            # [B, k, 3]
        dists = jnp.maximum(
            jnp.sum((qc[:, None, :] - ncol) ** 2, axis=-1), 0.0
        )
        # pick t consumed one finite column while any remained
        alive = (
            jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1)
            < nfin[:, None]
        )
        weights = jnp.where(alive, jnp.exp(1.0 - dists / 3.0), 0.0)
        return ids, weights, slots

    ids, weights, slots = jax.lax.map(
        one_chunk, (row_cluster, data_start, cluster_end)
    )
    import os
    # Epilogue selection: the gather un-permute exists to dodge the TPU
    # scatter cliff (scatter-set 1.4 ms at 135k rows but 47 ms at 542k —
    # the batch-FOLDED regime), while the scatter epilogue is the
    # round-4 program every fused single-pair geometry shipped with —
    # and the round-5 fused-452 A/B showed the gather epilogue's
    # argsort->scan->gather chain participates in a whole-pipeline
    # composition kernel fault on the relayed worker (scan/staged
    # programs run it clean).  Below the cliff there is nothing to win,
    # so keep the proven scatter there; NCT_KNN_EPILOGUE overrides.
    epilogue = os.environ.get(
        "NCT_KNN_EPILOGUE",
        "gather" if n >= _GATHER_EPILOGUE_MIN_ROWS else "scatter",
    )
    if epilogue == "scatter":
        # Round-4 epilogue: the [rows, k] scatter-set.
        n_rows = ids.shape[0] * ids.shape[1]
        pos = (data_start[:, None]
               + jnp.arange(chunk, dtype=jnp.int32)[None, :])
        valid = (pos < cluster_end[:, None]).reshape(-1)
        pid = order[jnp.minimum(pos.reshape(-1), n - 1)].astype(jnp.int32)
        tgt = jnp.where(valid, pid, n)
        ids_o = jnp.zeros((n + 1, k_num), jnp.int32).at[tgt].set(
            ids.reshape(-1, k_num), unique_indices=False)
        w_o = jnp.zeros((n + 1, k_num), jnp.float32).at[tgt].set(
            weights.reshape(-1, k_num), unique_indices=False)
        s_o = jnp.zeros((n + 1, k_num), jnp.int32).at[tgt].set(
            slots.reshape(-1, k_num), unique_indices=False)
        return ids_o[:n], w_o[:n], s_o[:n]
    # Un-permute by GATHER, not scatter: TPU scatters hit a superlinear
    # cliff above ~0.5M rows (measured 1.4 ms at 135k vs 47 ms at 542k —
    # the batch-folded build's regime) while equal-sized gathers stay
    # ~linear.  The valid chunk rows enumerate sorted positions 0..n-1
    # IN ORDER (chunks walk clusters in cluster order, positions in
    # position order), so the flat row holding sorted position `pos` is
    # computable analytically, and pixel p's result row is that of
    # pos = inv_order[p] (order's inverse permutation, one cheap
    # argsort).
    pos_arr = jnp.arange(n, dtype=jnp.int32)
    pos_cluster = jnp.minimum(
        jnp.searchsorted(jnp.cumsum(counts), pos_arr, side="right"),
        kc - 1,
    ).astype(jnp.int32)
    local = pos_arr - starts[pos_cluster].astype(jnp.int32)
    flat_row = (
        (chunk_off[pos_cluster].astype(jnp.int32) + local // chunk)
        * chunk + local % chunk
    )
    inv_order = jnp.argsort(order).astype(jnp.int32)
    take = flat_row[inv_order]                        # [n] result rows
    # Materialize the chunk-scan outputs before the un-permute gathers:
    # cuts the composed argsort -> scan -> gather chain the relayed
    # toolchain's compile service and worker mishandle when fused with
    # the surrounding level program (round-5 fused-452 incident;
    # PERFORMANCE.md composition-fault class).
    ids, weights, slots, take = jax.lax.optimization_barrier(
        (ids, weights, slots, take))
    return (
        ids.reshape(-1, k_num)[take],
        weights.reshape(-1, k_num)[take],
        slots.reshape(-1, k_num)[take],
    )
