#!/usr/bin/env python
"""Graph recall of the TPU k-NN builder vs the reference-exact graph.

VERDICT round-3 #5: the rebuild's default k-NN graph (primary cluster,
2048-candidate subsample) had no measured fidelity vs the reference's
semantics (all dilated memberships, kd-tree over ALL members, merged to
k=8).  This tool measures id/weight recall of each configuration against
the numpy-exact implementation (nct_tpu/solve/knn_exact.py) on a REAL demo
pair's clusters and Lab colours — the table that justifies the committed
default (PERFORMANCE.md round-4).

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/knn_recall.py \
      [--pair 0] [--size 256] [--level 3]
"""

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import numpy as np

EXAMPLE = "/root/reference/demo/example"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pair", type=int, default=0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--level", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from nct_tpu.config import Config
    from nct_tpu.io import cap_max_size, imread_bgr
    from nct_tpu.models import vgg19
    from nct_tpu.ops import features
    from nct_tpu.ops.color import bgr_u8_to_lab_u8
    from nct_tpu.ops.resize import resize_bilinear
    from nct_tpu.solve import cluster, knn
    from nct_tpu.solve.knn_exact import exact_knn_graph, graph_recall

    config = Config()
    cnt = jax.device_put(jnp.asarray(np.asarray(cap_max_size(
        imread_bgr(f"{EXAMPLE}/in/in{args.pair}.png"), args.size))))
    h, w = cnt.shape[:2]
    dims = vgg19.feature_dims(h, w)
    taps = config.vgg_layers()
    ah, aw = dims[taps[args.level]]
    stride = 2 ** args.level

    params = vgg19.init_params()
    feats = vgg19.features_jit(params, cnt, (taps[0],), False)[taps[0]]
    lh, lw = dims[taps[0]]
    f0n, _ = features.l2_normalize(feats.astype(jnp.float32))
    key = jax.random.PRNGKey(7)
    key, kkey = jax.random.split(key)
    label_map, _ = cluster.kmeans(
        f0n.reshape(lh * lw, -1), kkey, num_clusters=config.cluster_num,
        iters=config.kmeans_iters)
    label_map = label_map.reshape(lh, lw)
    membership = cluster.cluster_membership(label_map, config.cluster_num)

    down_cnt = resize_bilinear(cnt, ah, aw)
    lab_d = bgr_u8_to_lab_u8(down_cnt).astype(jnp.float32) / 255.0
    member_pix = cluster.membership_for_pixels(membership, ah, aw, stride)

    t0 = time.perf_counter()
    ex_ids, ex_w = exact_knn_graph(
        np.asarray(lab_d), np.asarray(member_pix), config.k_num)
    t_exact = time.perf_counter() - t0
    n_memb = np.asarray(member_pix).sum(0)
    print(f"pair in{args.pair} L{args.level} grid {aw}x{ah} "
          f"(N={ah * aw}), memberships/pixel mean "
          f"{n_memb.mean():.2f} max {int(n_memb.max())}; exact build "
          f"{t_exact:.0f}s")
    print("| config | candidates M | id recall | weight recall | note |")
    print("|---|---|---|---|---|")

    key, ckey = jax.random.split(key)
    full_m = ah * aw
    for name, memberships, m_cand in [
        ("default", 1, min(2048, ah * aw)),
        ("full candidates", 1, full_m),
        ("memberships=2", 2, min(2048, ah * aw)),
        ("memberships=3", 3, min(2048, ah * aw)),
        ("memberships=3 + full", 3, full_m),
        ("memberships=4 + full", 4, full_m),
    ]:
        candidates = knn.sample_cluster_candidates(member_pix, ckey, m_cand)
        if memberships > 1:
            labels = cluster.multi_labels_for_pixels(
                label_map, membership, ah, aw, stride, memberships)
        else:
            labels = cluster.labels_for_pixels(label_map, ah, aw, stride)
        ids, ws, _ = knn.knn_graph(
            lab_d, labels, candidates, k_num=config.k_num)
        rid, rw = graph_recall(
            np.asarray(ids), np.asarray(ws), ex_ids, ex_w)
        print(f"| {name} | {m_cand} | {rid:.4f} | {rw:.6f} | |",
              flush=True)
    return 0


if __name__ == "__main__":
    _sys.exit(main())
