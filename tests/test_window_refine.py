"""window_refine tests: never regresses the incumbent; finds within-window
optima when the shortlist covers the window."""

import numpy as np
import jax.numpy as jnp

from nct_tpu.ops.exact_nn import exact_nn
from nct_tpu.ops.nnf import init_scaled_identity
from nct_tpu.ops.patchmatch import patchify
from nct_tpu.ops.window_refine import window_refine


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_never_worse_than_incumbent(rng):
    a = _norm(rng.standard_normal((10, 12, 8)).astype(np.float32))
    b = _norm(rng.standard_normal((11, 13, 8)).astype(np.float32))
    nnf0 = init_scaled_identity(10, 12, 11, 13)
    _, d0 = window_refine(
        jnp.asarray(a), jnp.asarray(b), nnf0, radius=0, shortlist=1
    )
    _, d1 = window_refine(
        jnp.asarray(a), jnp.asarray(b), nnf0, radius=3, shortlist=8
    )
    assert np.all(np.asarray(d1) <= np.asarray(d0) + 1e-3)


def test_full_shortlist_finds_window_optimum(rng):
    """With shortlist >= dense-window size the result is at least as good
    as the exhaustive dense-window minimum of the full patch metric (the
    far rings may find strictly better matches outside the window)."""
    a = _norm(rng.standard_normal((6, 7, 4)).astype(np.float32))
    b = _norm(rng.standard_normal((7, 8, 4)).astype(np.float32))
    r = 1
    nnf0 = init_scaled_identity(6, 7, 7, 8)
    nnf, d = window_refine(
        jnp.asarray(a), jnp.asarray(b), nnf0,
        radius=r, shortlist=(2 * r + 1) ** 2 + 16,   # dense + both rings
    )
    pa, pam = patchify(jnp.asarray(a), 3)
    pb, pbm = patchify(jnp.asarray(b), 3)
    pa, pam = np.asarray(pa, np.float64), np.asarray(pam, np.float64)
    pb, pbm = np.asarray(pb, np.float64), np.asarray(pbm, np.float64)
    n0 = np.asarray(nnf0)
    got_d = np.asarray(d)
    for y in range(6):
        for x in range(7):
            best = np.inf
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    bx = np.clip(n0[y, x, 0] + dx, 0, 7)
                    by = np.clip(n0[y, x, 1] + dy, 0, 6)
                    num = -(pa[y, x] * pb[by, bx]).sum()
                    cnt = (pam[y, x] * pbm[by, bx]).sum()
                    dd = num / cnt if cnt else 1.0
                    best = min(best, dd)
            assert got_d[y, x] <= best + 2e-2, (y, x)


def test_close_to_exact_when_seeded_well(rng):
    """Seeded by the exact field itself, refinement stays at (or improves
    past, via clamping ties) the global optimum."""
    a = _norm(rng.standard_normal((8, 9, 6)).astype(np.float32))
    b = _norm(rng.standard_normal((9, 10, 6)).astype(np.float32))
    nnf_e, d_e = exact_nn(jnp.asarray(a), jnp.asarray(b), bf16=False)
    _, d_r = window_refine(jnp.asarray(a), jnp.asarray(b), nnf_e, radius=2)
    assert np.all(np.asarray(d_r) <= np.asarray(d_e) + 2e-2)


def test_window_refine_vmap_folds_batch_into_rows_bitwise(rng):
    """window_refine under jax.vmap routes through the batch-in-rows
    custom batching rule (flat strip/patch tables with per-image row
    offsets); per-image fields must be BITWISE the unbatched ones."""
    import jax

    from nct_tpu.ops import features
    from nct_tpu.ops import nnf as nnf_mod
    from nct_tpu.ops.window_refine import window_refine

    rng_np = np.random.default_rng(2)
    B, HA, WA, HB, WB, C = 3, 14, 18, 12, 20, 16
    fa = jnp.asarray(rng_np.standard_normal((B, HA, WA, C)), jnp.float32)
    fb = jnp.asarray(rng_np.standard_normal((B, HB, WB, C)), jnp.float32)
    fa_n = jax.vmap(lambda x: features.l2_normalize(x)[0])(fa)
    fb_n = jax.vmap(lambda x: features.l2_normalize(x)[0])(fb)
    n0 = jnp.stack([nnf_mod.init_scaled_identity(HA, WA, HB, WB)] * B)

    singles = [window_refine(fa_n[i], fb_n[i], n0[i], 3, 2, 3)
               for i in range(B)]
    f = jax.jit(jax.vmap(lambda a, b, n: window_refine(a, b, n, 3, 2, 3)))
    nnf_b, d_b = f(fa_n, fb_n, n0)
    for i in range(B):
        nnf_s, d_s = singles[i]
        np.testing.assert_array_equal(np.asarray(nnf_b[i]),
                                      np.asarray(nnf_s))
        np.testing.assert_allclose(np.asarray(d_b[i]), np.asarray(d_s),
                                   rtol=1e-5, atol=1e-6)


def test_stage1_channel_subset_never_regresses(rng):
    """stage1_channels ranks the shortlist on a channel SUBSET (the
    MAX_SIZE traffic knob, config.window_stage1_channels_maxsize); the
    exact stage-2 rescore + incumbent guarantee must keep the output
    metric at or below the incumbent field's regardless of how bad the
    subset ranking is."""
    a = _norm(rng.standard_normal((10, 12, 8)).astype(np.float32))
    b = _norm(rng.standard_normal((11, 13, 8)).astype(np.float32))
    nnf0 = init_scaled_identity(10, 12, 11, 13)
    _, d0 = window_refine(
        jnp.asarray(a), jnp.asarray(b), nnf0, radius=0, shortlist=1
    )
    for cs in (4, 2, 1):
        _, d1 = window_refine(
            jnp.asarray(a), jnp.asarray(b), nnf0, radius=3, shortlist=2,
            patch_size=3, stage1_channels=cs,
        )
        assert np.all(np.asarray(d1) <= np.asarray(d0) + 1e-3), cs


def test_stage1_subset_vmap_fold_matches_unbatched(rng):
    """The batch-in-rows fold must honour the channel subset: vmapped
    output with stage1_channels=cs is bitwise the unbatched cs run."""
    import jax

    rng_np = np.random.default_rng(5)
    B, HA, WA, HB, WB, C = 2, 10, 12, 11, 13, 8
    fa = _norm(rng_np.standard_normal((B, HA, WA, C)).astype(np.float32))
    fb = _norm(rng_np.standard_normal((B, HB, WB, C)).astype(np.float32))
    n0 = jnp.stack([init_scaled_identity(HA, WA, HB, WB)] * B)
    fa = jnp.asarray(fa)
    fb = jnp.asarray(fb)
    f = jax.jit(jax.vmap(
        lambda a, b, n: window_refine(a, b, n, 3, 2, 3, 4)))
    nnf_b, _ = f(fa, fb, n0)
    for i in range(B):
        nnf_s, _ = window_refine(fa[i], fb[i], n0[i], 3, 2, 3, 4)
        np.testing.assert_array_equal(np.asarray(nnf_b[i]),
                                      np.asarray(nnf_s))
