"""End-to-end pipeline tests on tiny images (CPU backend).

The reference has no automated tests; its correctness story is golden
outputs (SURVEY §4).  Here: structural smoke + determinism + the guidance
path actually pulling the style palette.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nct_tpu.config import Config
from nct_tpu.models import vgg19
from nct_tpu.pipeline import image_pyramid, transfer_pair


@pytest.fixture(scope="module")
def tiny_setup():
    rng = np.random.default_rng(3)
    cnt = rng.integers(0, 256, (40, 48, 3)).astype(np.uint8)
    stl = rng.integers(0, 256, (44, 52, 3)).astype(np.uint8)
    params = vgg19.init_params()
    # cg_iters_mg stays at the tight 10 here: these tests compare
    # execution MODES (fused / staged / sub-split), and the dynamic early
    # exit is value-dependent — two bitwise-different-but-equivalent
    # programs can exit a 40-iteration solve one iteration apart,
    # amplifying rounding into multi-LSB output diffs on these tiny
    # random images (seen when the coarse mg cap rose 10 -> 40; at 10
    # both modes run to the cap and trip counts match).
    config = Config(
        pm_iters=2, cg_iters=10, cg_iters_final=10, wls_cg_iters=10,
        cg_iters_mg=10,
        kmeans_iters=3,
    )
    return params, cnt, stl, config


def test_transfer_pair_shapes_and_determinism(tiny_setup):
    params, cnt, stl, config = tiny_setup
    key = jax.random.PRNGKey(0)
    out1 = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config, key=key)
    )
    out2 = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config, key=key)
    )
    assert out1.shape == cnt.shape and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)


def test_transfer_pair_intermediates(tiny_setup):
    params, cnt, stl, config = tiny_setup
    out, trace = transfer_pair(
        params, cnt, stl, 2.0, config, key=jax.random.PRNGKey(1),
        return_intermediates=True,
    )
    assert len(trace) == 5
    dims = vgg19.feature_dims(cnt.shape[0], cnt.shape[1])
    for lvl, tap in enumerate(config.vgg_layers()):
        t = trace[lvl]
        assert t["ann"].shape[:2] == dims[tap]
        assert t["guide"].shape[:2] == dims[tap]
        assert t["refined"].shape == cnt.shape
    # finest level feature grid == full image grid
    assert dims["conv1_1"] == cnt.shape[:2]


def test_constant_style_pulls_palette(tiny_setup):
    """With a uniform orange style, the result should move decisively
    toward that colour (the BDS guidance is orange everywhere)."""
    params, cnt, _, config = tiny_setup
    stl = np.zeros((44, 52, 3), np.uint8)
    stl[..., 2] = 220  # BGR orange-ish (red-dominant)
    stl[..., 1] = 120
    out = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config,
                      key=jax.random.PRNGKey(2))
    )
    # red channel mean should exceed blue channel mean like the style does
    assert out[..., 2].mean() > out[..., 0].mean() + 20


def test_image_pyramid_cascade():
    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (32, 32, 3)), jnp.uint8
    )
    dims = [(2, 2), (4, 4), (8, 8), (16, 16), (32, 32)]
    pyr = image_pyramid(img, dims)
    for (h, w), lvl in zip(dims, pyr):
        assert lvl.shape[:2] == (h, w)
    np.testing.assert_array_equal(np.asarray(pyr[-1]), np.asarray(img))


def test_truncated_pyramid_runs_full_res(tiny_setup):
    """num_levels < 5 truncates to the coarsest taps but still returns a
    full-resolution result (WLS refines at full res every level)."""
    import dataclasses

    params, cnt, stl, config = tiny_setup
    cfg2 = dataclasses.replace(config, num_levels=2)
    assert cfg2.vgg_layers() == ["conv5_1", "conv4_1"]
    out = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, cfg2, key=jax.random.PRNGKey(0))
    )
    assert out.shape == cnt.shape and out.dtype == np.uint8
    assert out.std() > 0


def test_staged_matches_fused(tiny_setup):
    """staged=True (per-level jitted programs) must agree with the fused
    trace.  Bit equality is not guaranteed — program partitioning changes
    XLA contraction orders, and ulp flips relocate argmin matches — so the
    contract is the same statistical one as the batch/sharding tests
    (and, like there, f32 features keep bf16 tie-flips out of the gate)."""
    import dataclasses

    params, cnt, stl, config = tiny_setup
    # Full 5-level depth: truncated pyramids end on a high-channel level
    # whose near-tie argmin matches flip between program partitionings,
    # blowing the tolerance; the full pyramid's finest levels are stable.
    config = dataclasses.replace(config, feature_dtype="float32")
    key = jax.random.PRNGKey(0)
    fused = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config, key=key)
    ).astype(int)
    staged = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config, key=key, staged=True)
    ).astype(int)
    diff = np.abs(fused - staged)
    # random-noise inputs + untrained backbone = near-degenerate match
    # fields, the worst case for partitioning divergence; diffs measured
    # spatially uniform (no boundary artefacts), mean ~0.8 LSB, max ~6
    assert (diff <= 2).mean() >= 0.95, (diff > 2).mean()
    assert diff.mean() <= 1.0, diff.mean()


def test_scatter_transpose_pipeline_matches_tables(tiny_setup, monkeypatch):
    """The MAX_SIZE nonlocal transpose mode (per-iteration scatter-add
    instead of in-edge tables; auto-selected above
    nonlocal_solve._TABLES_MAX_PAIRS because the table build's global
    sort-and-rank chain stalls the remote compile service at >=1000 px
    L4 geometries) must agree with the table path through the whole
    pipeline.  The operator itself is exact (test_solvers); residual
    output difference is CG rounding-schedule only."""
    import dataclasses

    from nct_tpu.solve import nonlocal_solve as nl

    params, cnt, stl, config = tiny_setup
    config = dataclasses.replace(config, feature_dtype="float32")
    key = jax.random.PRNGKey(0)
    base = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config, key=key)
    ).astype(int)
    monkeypatch.setattr(nl, "_TABLES_MAX_PAIRS", 0)
    scat = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config, key=key)
    ).astype(int)
    diff = np.abs(base - scat)
    assert (diff <= 2).mean() >= 0.95, (diff > 2).mean()
    assert diff.mean() <= 1.0, diff.mean()


def test_match_serialize_is_identity(tiny_setup):
    """The optimization_barrier sequencing of the two window-refine
    directions (auto-on above pipeline._SERIALIZE_PIXELS, the measured
    live-set fault boundary) is a pure scheduling constraint — the output
    must be BITWISE equal with the flag forced on."""
    import dataclasses

    params, cnt, stl, config = tiny_setup
    key = jax.random.PRNGKey(0)
    base = np.asarray(transfer_pair(params, cnt, stl, 2.0, config, key=key))
    ser = np.asarray(transfer_pair(
        params, cnt, stl, 2.0,
        dataclasses.replace(config, match_serialize=True), key=key,
    ))
    assert (base == ser).all()


def test_staged_subsplit_matches_staged(tiny_setup, monkeypatch):
    """The MAX_SIZE sub-split (search-per-direction + BDS + solve as
    separate programs — the fix for the >=465x700 _level_match kernel
    fault, PERFORMANCE.md round 3) must agree with whole-level staged
    programs.  Forced on at every level by shrinking the envelope."""
    import dataclasses

    from nct_tpu import pipeline

    params, cnt, stl, config = tiny_setup
    config = dataclasses.replace(config, feature_dtype="float32")
    key = jax.random.PRNGKey(0)
    whole = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config, key=key, staged=True)
    ).astype(int)
    monkeypatch.setattr(pipeline, "FUSED_ENVELOPE_PIXELS", 0)
    split = np.asarray(
        transfer_pair(params, cnt, stl, 2.0, config, key=key, staged=True)
    ).astype(int)
    diff = np.abs(whole - split)
    assert (diff <= 2).mean() >= 0.95, (diff > 2).mean()
    assert diff.mean() <= 1.0, diff.mean()


def test_transfer_pair_stats_trace(tiny_setup):
    """return_intermediates="stats": the per-level solver-convergence
    scalars (and ONLY scalars — no big intermediates) that
    tools/profile_cg.py reads; nl/wls trip counts must be positive and
    bounded by their configured caps."""
    params, cnt, stl, config = tiny_setup
    out, trace = transfer_pair(
        params, cnt, stl, 2.0, config, key=jax.random.PRNGKey(1),
        return_intermediates="stats",
    )
    assert out.shape == cnt.shape
    assert len(trace) == config.num_levels
    for lvl, tr in enumerate(trace):
        assert set(tr) == {"level", "nl_iters", "nl_r2", "wls_iters",
                           "wls_r2"}
        assert tr["level"] == lvl
        nl_cap = (config.cg_iters_final_mg if lvl == config.num_levels - 1
                  else config.cg_iters_mg)
        assert 1 <= int(tr["nl_iters"]) <= nl_cap
        assert 1 <= int(tr["wls_iters"]) <= config.wls_cg_iters_mg
        assert np.isfinite(float(tr["nl_r2"]))


def test_stage1_subset_default_plumbs_through_subsplit(tiny_setup,
                                                      monkeypatch):
    """The MAX_SIZE stage-1 channel-subset default
    (window_stage1_channels_maxsize) is keyed on _STAGE1_SUBSET_PIXELS,
    NOT the monkeypatchable fused envelope: forcing the sub-split path
    at tiny geometry must not change the math (covered by
    test_staged_subsplit_matches_staged), while shrinking the subset
    threshold itself must produce bitwise the run with the subset
    requested explicitly."""
    import dataclasses

    from nct_tpu import pipeline

    params, cnt, stl, config = tiny_setup
    config = dataclasses.replace(
        config, feature_dtype="float32", window_stage1_channels_maxsize=2
    )
    key = jax.random.PRNGKey(0)
    monkeypatch.setattr(pipeline, "FUSED_ENVELOPE_PIXELS", 0)
    explicit = np.asarray(transfer_pair(
        params, cnt, stl, 2.0,
        dataclasses.replace(config, window_stage1_channels=2),
        key=key, staged=True,
    ))
    monkeypatch.setattr(pipeline, "_STAGE1_SUBSET_PIXELS", 0)
    auto = np.asarray(transfer_pair(
        params, cnt, stl, 2.0, config, key=key, staged=True,
    ))
    np.testing.assert_array_equal(auto, explicit)
