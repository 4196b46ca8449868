"""Analytic FLOP/byte model sanity (nct_tpu/utils/flops.py).

The model's exact parts (matmul dims) are pinned against hand
calculations; the aggregate is fenced for shape errors rather than
precision (the solver-stage counts are first-order by design).
"""

import numpy as np

from nct_tpu.config import Config
from nct_tpu.utils import flops as fl


def test_exact_nn_matmul_count_is_exact():
    # L3 at the headline geometry: [76840, 9*128] x [9*128, 144000]
    f, _b = fl.match_counts(226 * 340, 300 * 480, 128, True, Config())
    assert f == 2.0 * 226 * 340 * 300 * 480 * 9 * 128


def test_vgg_flops_match_hand_count_small():
    # 32x32 input: conv1_1 3->64 + conv1_2 64->64 at 32x32
    f = fl.vgg_forward_flops(32, 32, upto="conv1_2")
    assert f == 2 * 32 * 32 * 9 * 3 * 64 + 2 * 32 * 32 * 9 * 64 * 64


def test_pipeline_counts_structure_and_dominance():
    c = fl.pipeline_counts(452, 680, 600, 960, Config())
    assert set(c) == {"vgg", "match", "bds", "knn", "nonlocal", "wls",
                      "total"}
    total = sum(v["flops"] for k, v in c.items() if k != "total")
    assert c["total"]["flops"] == total
    # the exact-NN matmuls dominate arithmetic at this geometry
    assert c["match"]["flops"] > 0.9 * c["total"]["flops"]
    assert all(v["bytes"] > 0 for v in c.values())


def test_roofline_fraction_names_binding_resource():
    # pure matmul-ish stage: high flops, low bytes -> compute bound
    r = fl.roofline_fraction(1e12, 1e6, 0.1)
    assert r["bound"] == "compute"
    r = fl.roofline_fraction(1e6, 1e10, 0.1)
    assert r["bound"] == "bandwidth"
    # fractions scale inversely with time
    a = fl.roofline_fraction(1e12, 1e9, 0.1)["compute_frac"]
    b = fl.roofline_fraction(1e12, 1e9, 0.2)["compute_frac"]
    assert np.isclose(a, 2 * b)


def test_mfu_definition():
    assert fl.mfu(fl.V5E_PEAK_BF16, 1.0) == 1.0
