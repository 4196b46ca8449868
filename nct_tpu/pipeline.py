"""Progressive colour-transfer pipeline: the 5-level coarse-to-fine loop.

TPU-native rebuild of the reference orchestrator (reference: source/main.cu
:47-454 ``transfer_color_single_bds``).  Per level (conv5_1 -> conv1_1):

  1. NNF init (level 0) or coarse-to-fine upsample          (main.cu:229-251)
  2. L2-normalize features, PatchMatch in both directions   (:253-284)
  3. BDS colour guidance + BDS feature vote -> error map    (:291-318)
  4. semantic k-NN graph on down-res Lab colours            (:351-359)
  5. patch-moment (a, b) init + confidence                  (:368-378)
  6. nonlocal CG solve at down-res                          (ColorTransfer.cpp:548)
  7. bilinear coefficient upsample + roughness gate + WLS   (:951, :1376-1429)
  8. apply a*Lab+b at full res, Lab -> BGR                  (:1436-1477)
  9. re-extract VGG features from the refined image         (main.cu:424-427)

Everything except image IO runs as jitted XLA programs with static
per-level shapes; one compilation per distinct input geometry (SURVEY §7
bucket-and-pad is the batching strategy on top).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any

import jax
import jax.numpy as jnp

from nct_tpu.config import Config
from nct_tpu.models import vgg19
from nct_tpu.ops import (
    bds, exact_nn, features, nnf, patchmatch, resize, window_refine,
)
from nct_tpu.ops.color import bgr_u8_to_lab_u8, unit_lab_to_bgr_u8
from nct_tpu.solve import cluster, knn, stats
from nct_tpu.solve.nonlocal_solve import solve_nonlocal
from nct_tpu.solve.wls import apply_transform, solve_wls


def _on_tpu() -> bool:
    """True when the default backend is a TPU (trace-time decision)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def image_pyramid(
    img_u8: jnp.ndarray, dims: list[tuple[int, int]]
) -> list[jnp.ndarray]:
    """Cascaded INTER_LINEAR pyramid: each level resized from the next finer
    one (ref main.cu:104-108 resizes cntImages[l+1] -> cntImages[l]).

    In the full 5-level pipeline the finest dims equal the image dims; a
    truncated pyramid (config.num_levels < 5) resizes the finest level too.
    """
    n = len(dims)
    out: list[Any] = [None] * n
    h, w = dims[n - 1]
    if img_u8.shape[:2] == (h, w):
        out[n - 1] = img_u8
    else:
        out[n - 1] = resize.resize_bilinear(img_u8, h, w)
    for l in range(n - 2, -1, -1):
        h, w = dims[l]
        out[l] = resize.resize_bilinear(out[l + 1], h, w)
    return out


# Content-pixel count above which _level_match serializes its two search
# directions with optimization_barrier (see the use_window branch) — the
# measured fault boundary of the concurrently-scheduled pair, i.e. the
# fused envelope (680x452 ~307k px is safe; 700x465 ~326k px faults).
_SERIALIZE_PIXELS = 320_000


def _level_match(
    params,
    *,
    config: Config,
    l: int,
    rs: int,
    bds_weight,
    key,
    ann_prev,
    bnn_prev,
    cnt_feat_l,
    stl_feat_l,
    down_stl,
):
    """Steps 1-3 of a pyramid level: correspondence search + BDS guidance
    (ref main.cu:229-318).  Returns (ann, bnn, guide_bgr, bds_err, key)."""
    ah, aw = cnt_feat_l.shape[0], cnt_feat_l.shape[1]
    bh, bw = down_stl.shape[0], down_stl.shape[1]
    bf16 = config.feature_dtype == "bfloat16"

    # 1-2. correspondence search (ref :229-284).  Coarse levels: exact
    # streaming-matmul NN (globally optimal for the same metric); fine
    # levels: PatchMatch seeded by the upsampled previous-level field.
    fdt = jnp.bfloat16 if bf16 else jnp.float32
    fc = cnt_feat_l.astype(jnp.float32)
    fs = stl_feat_l.astype(jnp.float32)
    fc_n, _ = features.l2_normalize(fc)
    fs_n, _ = features.l2_normalize(fs)
    # bf16 halves the HBM traffic of the gather-bound candidate
    # evaluations; all dot products still accumulate in f32.
    fc_n = fc_n.astype(fdt)
    fs_n = fs_n.astype(fdt)
    use_exact = l < config.exact_nn_levels
    use_window = (
        config.fine_strategy == "window" and l > 0 and not use_exact
    )
    ring = (
        config.space_mesh is not None
        and config.space_mesh.shape.get(config.space_axis, 1) > 1
    )
    if use_exact:
        if ring:
            # Space-sharded execution: ring-scheduled matcher — both patch
            # tables stay row-sharded; the style blocks stream around the
            # ring via ppermute instead of being all-gathered per shard.
            from nct_tpu.parallel.ring_nn import ring_exact_nn

            ann, _ = ring_exact_nn(
                fc_n, fs_n, config.space_mesh, axis=config.space_axis,
                patch_size=config.patch_size, bf16=bf16,
            )
            bnn, _ = ring_exact_nn(
                fs_n, fc_n, config.space_mesh, axis=config.space_axis,
                patch_size=config.patch_size, bf16=bf16,
            )
        elif _on_tpu():
            # fused matmul+argmin Pallas kernel (~1.6x the XLA scan);
            # the distance matrix is symmetric, so ONE sweep folds both
            # the row argmin (ann) and the column argmin (bnn) — half
            # the matmul FLOPs and HBM streaming of two directed calls
            from nct_tpu.ops.pallas_nn import exact_nn_pallas_bidir

            ann, _, bnn, _ = exact_nn_pallas_bidir(
                fc_n, fs_n, config.patch_size)
        else:
            ann, _ = exact_nn.exact_nn(fc_n, fs_n, config.patch_size)
            bnn, _ = exact_nn.exact_nn(fs_n, fc_n, config.patch_size)
    elif use_window:
        # Above the fused envelope the combined match program's concurrent
        # live set (both refine directions' strip/shortlist tables + the
        # BDS buffers scheduled together) kernel-faults the relayed TPU
        # worker while each constituent passes alone (round-3 bisection,
        # PERFORMANCE.md).  optimization_barrier pins a sequential
        # schedule — the b->a refine cannot start (and its buffers cannot
        # be live) until the a->b refine's value is materialized — which
        # bounds peak memory to one direction's working set at a time.
        serialize = config.match_serialize or ah * aw > _SERIALIZE_PIXELS
        ann0 = nnf.upsample(ann_prev, ah, aw, bh, bw)
        bnn0 = nnf.upsample(bnn_prev, bh, bw, ah, aw)
        ann, _ = window_refine.window_refine(
            fc_n, fs_n, ann0, config.window_radius,
            config.window_shortlist, config.patch_size,
            config.window_stage1_channels, config.window_boxsum,
        )
        if serialize:
            ann, fc_n, fs_n, bnn0 = jax.lax.optimization_barrier(
                (ann, fc_n, fs_n, bnn0))
        bnn, _ = window_refine.window_refine(
            fs_n, fc_n, bnn0, config.window_radius,
            config.window_shortlist, config.patch_size,
            config.window_stage1_channels, config.window_boxsum,
        )
        if serialize:
            ann, bnn, down_stl, fs, fc_n = jax.lax.optimization_barrier(
                (ann, bnn, down_stl, fs, fc_n))
    else:
        if l == 0:
            if ann_prev is not None:   # video warm start (config #5)
                ann = jnp.asarray(ann_prev)
                bnn = jnp.asarray(bnn_prev)
            else:
                ann = nnf.init_scaled_identity(ah, aw, bh, bw)
                bnn = nnf.init_scaled_identity(bh, bw, ah, aw)
        else:
            ann = nnf.upsample(ann_prev, ah, aw, bh, bw)
            bnn = nnf.upsample(bnn_prev, bh, bw, ah, aw)
        key, k_ab, k_ba = jax.random.split(key, 3)
        pm_iters = (
            config.pm_iters_fine
            if config.exact_nn_levels > 0 else config.pm_iters
        )
        ann, _ = patchmatch.patchmatch(
            fc_n, fs_n, ann, k_ab,
            iters=pm_iters, rs_max=rs, patch_size=config.patch_size,
        )
        bnn, _ = patchmatch.patchmatch(
            fs_n, fc_n, bnn, k_ba,
            iters=pm_iters, rs_max=rs, patch_size=config.patch_size,
        )

    # 3. BDS guidance image + feature vote -> matching error (ref :291-318)
    guide_bgr = bds.bds_reconstruct_color(
        down_stl, ann, bnn, 1.0, bds_weight, config.patch_size
    )
    voted_feat, _ = bds.bds_vote(
        fs, ann, bnn, 1.0, bds_weight, config.patch_size
    )
    gf_n, _ = features.l2_normalize(voted_feat)
    bds_err = features.cosine_error(fc_n, gf_n)
    return ann, bnn, guide_bgr, bds_err, key


def _match_search_dir(
    params,
    *,
    config: Config,
    l: int,
    rs: int,
    key_dir,
    a_feat,
    b_feat,
    prev_field,
):
    """ONE search direction of a level's correspondence stage, compiled as
    its own program — the MAX_SIZE sub-split.  At >=465x700 content the
    combined _level_match program (two window refines + BDS vote in one
    fusion) kernel-faults the relayed TPU worker while each constituent
    runs fine alone (PERFORMANCE.md round-3 bisection), so MAX_SIZE-class
    levels run search-per-direction + BDS as three smaller programs.
    Same math as the corresponding _level_match branch; exact-NN levels
    use the directed streaming matcher (no bidirectional fold across
    programs)."""
    ah, aw = a_feat.shape[0], a_feat.shape[1]
    bh, bw = b_feat.shape[0], b_feat.shape[1]
    fdt = jnp.bfloat16 if config.feature_dtype == "bfloat16" else jnp.float32
    fa_n, _ = features.l2_normalize(a_feat.astype(jnp.float32))
    fb_n, _ = features.l2_normalize(b_feat.astype(jnp.float32))
    fa_n = fa_n.astype(fdt)
    fb_n = fb_n.astype(fdt)
    use_exact = l < config.exact_nn_levels
    use_window = (
        config.fine_strategy == "window" and l > 0 and not use_exact
    )
    if use_exact:
        field, _ = exact_nn.exact_nn(fa_n, fb_n, config.patch_size)
    elif use_window:
        f0 = nnf.upsample(prev_field, ah, aw, bh, bw)
        # MAX_SIZE levels rank stage 1 on a channel subset by default:
        # the centre-distance gathers dominate this program's time and
        # only feed the shortlist RANKING (stage 2 rescores exactly and
        # keeps the incumbent).  Keyed on its own constant — NOT
        # FUSED_ENVELOPE_PIXELS, which tests monkeypatch to force this
        # path at tiny geometries where the subset must stay off.
        cs = config.window_stage1_channels
        if cs == 0 and ah * aw > _STAGE1_SUBSET_PIXELS:
            cs = config.window_stage1_channels_maxsize
        field, _ = window_refine.window_refine(
            fa_n, fb_n, f0, config.window_radius,
            config.window_shortlist, config.patch_size,
            cs, config.window_boxsum,
        )
    else:
        if l == 0:
            f0 = (jnp.asarray(prev_field) if prev_field is not None
                  else nnf.init_scaled_identity(ah, aw, bh, bw))
        else:
            f0 = nnf.upsample(prev_field, ah, aw, bh, bw)
        pm_iters = (
            config.pm_iters_fine
            if config.exact_nn_levels > 0 else config.pm_iters
        )
        field, _ = patchmatch.patchmatch(
            fa_n, fb_n, f0, key_dir,
            iters=pm_iters, rs_max=rs, patch_size=config.patch_size,
        )
    return field


def _match_bds(
    params, *, config: Config, bds_weight, ann, bnn, cnt_feat_l,
    stl_feat_l, down_stl,
):
    """BDS guidance + feature vote + matching error as its own program
    (the third piece of the MAX_SIZE match sub-split; same math as
    _level_match step 3, ref main.cu:291-318)."""
    fdt = jnp.bfloat16 if config.feature_dtype == "bfloat16" else jnp.float32
    fs = stl_feat_l.astype(jnp.float32)
    fc_n, _ = features.l2_normalize(cnt_feat_l.astype(jnp.float32))
    fc_n = fc_n.astype(fdt)
    guide_bgr = bds.bds_reconstruct_color(
        down_stl, ann, bnn, 1.0, bds_weight, config.patch_size
    )
    voted_feat, _ = bds.bds_vote(
        fs, ann, bnn, 1.0, bds_weight, config.patch_size
    )
    gf_n, _ = features.l2_normalize(voted_feat)
    bds_err = features.cosine_error(fc_n, gf_n)
    return guide_bgr, bds_err


_match_search_dir_jit = functools.partial(
    jax.jit, static_argnames=("config", "l", "rs")
)(_match_search_dir)

_match_bds_jit = functools.partial(
    jax.jit, static_argnames=("config",)
)(_match_bds)


def _solve_graph(
    *, config: Config, l: int, key, down_cnt, guide_bgr, bds_err,
    label_map, membership,
):
    """Steps 4-5 of a pyramid level: semantic k-NN graph on down-res Lab
    (ref main.cu:351-359) + patch moments -> (a, b) init + confidence
    (ref :368-378, 1194-1357).  First piece of the MAX_SIZE solve
    sub-split — the combined _level_solve program at 1000 px-class
    geometries never returns from the remote compile service, so MAX_SIZE
    levels run graph / nonlocal / finish as three smaller programs."""
    ah, aw = down_cnt.shape[0], down_cnt.shape[1]
    cnt_lab_u8 = bgr_u8_to_lab_u8(down_cnt)
    cnt_lab_d = cnt_lab_u8.astype(jnp.float32) / 255.0
    stride = 2 ** l
    if config.knn_memberships > 1:
        pixel_labels = cluster.multi_labels_for_pixels(
            label_map, membership, ah, aw, stride,
            config.knn_memberships,
        )
    else:
        pixel_labels = cluster.labels_for_pixels(
            label_map, ah, aw, stride
        )
    member_pix = cluster.membership_for_pixels(membership, ah, aw, stride)
    key, ckey = jax.random.split(key)
    m_cand = min(2048, ah * aw)
    candidates = knn.sample_cluster_candidates(member_pix, ckey, m_cand)
    nbr_ids, nbr_w, nbr_slots = knn.knn_graph(
        cnt_lab_d, pixel_labels, candidates, k_num=config.k_num
    )

    guide_lab_u8 = bgr_u8_to_lab_u8(guide_bgr)
    guide_lab_d = guide_lab_u8.astype(jnp.float32) / 255.0
    a0, b0 = stats.init_ab(
        cnt_lab_u8, guide_lab_u8, config.patch_size, config.var_epsilon
    )
    confidence = stats.error_confidence(bds_err)
    return (nbr_ids, nbr_w, nbr_slots, candidates, a0, b0, confidence,
            cnt_lab_d, guide_lab_d, key)


def _solve_nl(
    *, config: Config, l: int, numlayer: int, full_hw: tuple,
    a0, b0, prev_ab, cnt_lab_d, guide_lab_d, confidence,
    nbr_ids, nbr_w, nbr_slots, candidates,
):
    """Step 6: nonlocal solve at down-res (ref ColorTransfer.cpp:548-949).
    CG start: the previous level's SOLVED coefficients upsampled — the
    system is SPD so the solution is x0-independent, but the warm start
    converges in far fewer iterations than the reference's patch-stat
    init (its Rab, :630-636), which we keep for level 0."""
    h, w = full_hw
    ah, aw = cnt_lab_d.shape[0], cnt_lab_d.shape[1]
    if prev_ab is not None:
        a0 = resize.resize_bilinear(prev_ab[0], ah, aw)
        b0 = resize.resize_bilinear(prev_ab[1], ah, aw)
    else:
        # Sanitize the level-0 patch-stat init: a = sigma_ref/(sigma_src
        # + eps) spikes to O(50) wherever sigma_src ~ 0 (ref :1255-1263
        # has the same spikes and burns unpreconditioned CG iterations
        # fighting them).  Those pixels sit in low-confidence regions
        # whose (a, b) is decided by the regularizers, i.e. exactly the
        # near-null modes PCG converges on SLOWEST — at the headline
        # geometry the raw init needs ~40 mg-PCG iterations before the
        # residual spikes stop reading as garish contrast, while the
        # clamped init is closer to the solution at 5 than raw is at 40
        # (captured-system study, PERFORMANCE.md round-4).  Clamping a
        # to [0, 2] and recomputing b keeps the init's PREDICTED COLOR
        # a*s+b bitwise identical (gamut-clipped), so the init still
        # encodes the same guidance; only the coefficient-space spike —
        # pure CG error — is removed.  The solve's fixed point is
        # x0-independent (SPD).
        tgt = jnp.clip(cnt_lab_d * a0 + b0, 0.0, 1.0)
        a0 = jnp.clip(a0, 0.0, 2.0)
        b0 = tgt - cnt_lab_d * a0
    norm_factor = float(h * w) / float(ah * aw)
    if config.nl_precond == "mg":
        cg_iters = (
            config.cg_iters_final_mg if l == numlayer - 1
            else config.cg_iters_mg
        )
    else:
        cg_iters = (
            config.cg_iters_final if l == numlayer - 1
            else config.cg_iters
        )
    a_d, b_d, nl_it, nl_r2 = solve_nonlocal(
        a0, b0, cnt_lab_d, guide_lab_d, confidence, nbr_ids, nbr_w,
        norm_factor, config.local_weight, config.wls_alpha,
        config.nonlocal_weight, iters=cg_iters, tol=config.cg_tol,
        candidates=candidates, nbr_slots=nbr_slots,
        precond_kind=config.nl_precond, dynamic=config.cg_dynamic,
        in_cap=config.nl_in_cap, transpose=config.nl_transpose,
        return_iters=True,
    )
    return a_d, b_d, (nl_it, nl_r2)


def _solve_finish(
    params, *, config: Config, l: int, numlayer: int,
    a_d, b_d, cnt_lab_unit,
):
    """Steps 7-9: coefficient upsample + WLS at full res (ref :1376-1429),
    apply + convert (ref :1436-1477), progressive feature re-extraction
    (ref main.cu:424-427).  The reference re-extracts all 5 taps every
    level but only ever reads tap l+1 from the l-th re-extraction;
    extracting just that tap turns the re-extraction cost from 4 full
    forwards into progressively SHALLOWER ones (conv1_1 re-extraction is
    a single conv)."""
    h, w = cnt_lab_unit.shape[0], cnt_lab_unit.shape[1]
    ah, aw = a_d.shape[0], a_d.shape[1]
    taps = tuple(config.vgg_layers())
    vgg_bf16 = (config.vgg_compute_dtype or config.feature_dtype) == "bfloat16"
    norm_factor = float(h * w) / float(ah * aw)
    a_up = resize.resize_bilinear(a_d, h, w)
    b_up = resize.resize_bilinear(b_d, h, w)
    lam = config.wls_lambda_init * norm_factor
    if (ah, aw) == (h, w):
        lam = lam * 4.0  # final-level boost (ref :1418-1424)
    wls_iters = (
        config.wls_cg_iters_mg if config.wls_precond == "mg"
        else config.wls_cg_iters
    )
    a_f, b_f, wls_it, wls_r2 = solve_wls(
        a_up, b_up, cnt_lab_unit, lam, config.wls_alpha,
        iters=wls_iters, tol=config.cg_tol,
        dynamic=config.cg_dynamic, return_iters=True,
        precond_kind=config.wls_precond,
    )

    res_lab = apply_transform(a_f, b_f, cnt_lab_unit)
    refined = unit_lab_to_bgr_u8(res_lab)

    cnt_feat_next = None
    if l < numlayer - 1:
        cnt_feat_next = vgg19.features_jit(
            params, refined, (taps[l + 1],), vgg_bf16
        )[taps[l + 1]]
    return refined, cnt_feat_next, a_f, b_f, (wls_it, wls_r2)


def _level_solve(
    params,
    *,
    config: Config,
    l: int,
    numlayer: int,
    want_trace: bool,
    key,
    ann,
    bnn,
    guide_bgr,
    bds_err,
    prev_ab,
    down_cnt,
    cnt_lab_unit,
    label_map,
    membership,
):
    """Steps 4-9 of a pyramid level: k-NN graph, patch moments, nonlocal +
    WLS solves, apply, progressive feature re-extraction (ref main.cu
    :351-428).  Composition of _solve_graph / _solve_nl / _solve_finish
    (the MAX_SIZE sub-split pieces trace the same code).  Returns the
    level's carry tuple."""
    h, w = cnt_lab_unit.shape[0], cnt_lab_unit.shape[1]

    (nbr_ids, nbr_w, nbr_slots, candidates, a0, b0, confidence,
     cnt_lab_d, guide_lab_d, key) = _solve_graph(
        config=config, l=l, key=key, down_cnt=down_cnt,
        guide_bgr=guide_bgr, bds_err=bds_err, label_map=label_map,
        membership=membership,
    )
    a_d, b_d, nl_info = _solve_nl(
        config=config, l=l, numlayer=numlayer, full_hw=(h, w),
        a0=a0, b0=b0, prev_ab=prev_ab, cnt_lab_d=cnt_lab_d,
        guide_lab_d=guide_lab_d, confidence=confidence,
        nbr_ids=nbr_ids, nbr_w=nbr_w, nbr_slots=nbr_slots,
        candidates=candidates,
    )
    prev_ab = (a_d, b_d)
    refined, cnt_feat_next, a_f, b_f, wls_info = _solve_finish(
        params, config=config, l=l, numlayer=numlayer,
        a_d=a_d, b_d=b_d, cnt_lab_unit=cnt_lab_unit,
    )

    tr = None
    if want_trace:
        # want_trace == "stats": solver-convergence scalars only (cheap
        # program outputs for tools/profile_cg.py — no big intermediates).
        tr = {
            "level": l,
            "nl_iters": nl_info[0], "nl_r2": nl_info[1],
            "wls_iters": wls_info[0], "wls_r2": wls_info[1],
        }
        if want_trace != "stats":
            tr.update({
                "ann": ann, "bnn": bnn, "guide": guide_bgr,
                "a": a_f, "b": b_f, "bds_err": bds_err,
                "refined": refined,
            })

    # Barrier the cross-level state: in the fully-fused program XLA's
    # scheduler may otherwise hoist later levels' large intermediates
    # (patchified features, pallas operands) to overlap earlier ones,
    # blowing HBM; nesting lifetimes costs nothing here because the
    # levels are sequential anyway.
    ann, bnn, refined, cnt_feat_next, prev_ab = (
        jax.lax.optimization_barrier(
            (ann, bnn, refined, cnt_feat_next, prev_ab)
        )
    )
    return ann, bnn, refined, cnt_feat_next, prev_ab, key, tr


def _level_body(
    params,
    *,
    config: Config,
    l: int,
    numlayer: int,
    rs: int,
    want_trace: bool,
    bds_weight,
    key,
    ann_prev,
    bnn_prev,
    cnt_feat_l,
    prev_ab,
    stl_feat_l,
    down_cnt,
    down_stl,
    cnt_lab_unit,
    label_map,
    membership,
):
    """One pyramid level (ref main.cu:179-428 loop body) = match + solve.

    Pure function of the cross-level carry (NNFs, current level's content
    features, solved coefficients, PRNG key) and the level's static inputs;
    traced inline by the fused whole-pipeline program, compiled as its own
    program in staged mode, or as TWO programs (match / solve halves) for
    geometries whose single-level program still exceeds the compile
    service's memory — identical math in every mode.

    Returns (ann, bnn, refined, cnt_feat_next, prev_ab, key, trace_entry).
    """
    ann, bnn, guide_bgr, bds_err, key = _level_match(
        params, config=config, l=l, rs=rs, bds_weight=bds_weight, key=key,
        ann_prev=ann_prev, bnn_prev=bnn_prev, cnt_feat_l=cnt_feat_l,
        stl_feat_l=stl_feat_l, down_stl=down_stl,
    )
    return _level_solve(
        params, config=config, l=l, numlayer=numlayer,
        want_trace=want_trace, key=key, ann=ann, bnn=bnn,
        guide_bgr=guide_bgr, bds_err=bds_err, prev_ab=prev_ab,
        down_cnt=down_cnt, cnt_lab_unit=cnt_lab_unit, label_map=label_map,
        membership=membership,
    )


_level_jit = functools.partial(
    jax.jit,
    static_argnames=("config", "l", "numlayer", "rs", "want_trace"),
)(_level_body)

_level_match_jit = functools.partial(
    jax.jit, static_argnames=("config", "l", "rs")
)(_level_match)

_level_solve_jit = functools.partial(
    jax.jit, static_argnames=("config", "l", "numlayer", "want_trace")
)(_level_solve)

# MAX_SIZE solve sub-split: the combined _level_solve program at
# 1000 px-class geometries never returns from the remote compile service
# (>3 h observed, vs minutes for each piece), so staged mode compiles the
# three sub-expressions as separate programs above FUSED_ENVELOPE_PIXELS.
_solve_graph_jit = functools.partial(
    jax.jit, static_argnames=("config", "l")
)(_solve_graph)

_solve_nl_jit = functools.partial(
    jax.jit, static_argnames=("config", "l", "numlayer", "full_hw")
)(_solve_nl)

_solve_finish_jit = functools.partial(
    jax.jit, static_argnames=("config", "l", "numlayer")
)(_solve_finish)

# Largest content-pixel count known safe for the FUSED whole-pipeline
# program on the relayed TPU: the 680x452 headline (~307k px) runs fused;
# 700x465 (~326k px) compiles but kernel-faults the worker at run time —
# the fault lives in the combined _level_match program (both window
# refines + BDS in one fusion; each constituent passes alone, round-3
# bisection in PERFORMANCE.md).  The CLI auto-switches to staged mode
# above this (--no-staged forces fused), and staged mode further splits
# levels above it into search-per-direction + BDS + solve programs.
FUSED_ENVELOPE_PIXELS = 320_000

# Level-pixel threshold above which the sub-split search ranks the
# window refine's stage 1 on Config.window_stage1_channels_maxsize
# channels instead of all of them (see _match_search_dir).  Deliberately
# a separate constant from FUSED_ENVELOPE_PIXELS: tests monkeypatch the
# envelope to 0 to force the sub-split path at tiny geometries, and the
# subset default must not change the math there.
_STAGE1_SUBSET_PIXELS = 320_000


def _setup(params, cnt, stl, key, config: Config, taps):
    """Pre-loop work: feature extraction, pyramids, Lab, semantic clusters
    (ref main.cu:94-168).  Shared by the fused and staged execution modes."""
    h, w = cnt.shape[0], cnt.shape[1]
    hs, ws = stl.shape[0], stl.shape[1]
    cnt_dims_map = vgg19.feature_dims(h, w)
    stl_dims_map = vgg19.feature_dims(hs, ws)
    cnt_dims = [cnt_dims_map[t] for t in taps]
    stl_dims = [stl_dims_map[t] for t in taps]

    vgg_bf16 = (config.vgg_compute_dtype or config.feature_dtype) == "bfloat16"
    cnt_feats = vgg19.features_jit(params, cnt, taps, vgg_bf16)
    stl_feats = vgg19.features_jit(params, stl, taps, vgg_bf16)

    cnt_pyr = image_pyramid(cnt, cnt_dims)
    stl_pyr = image_pyramid(stl, stl_dims)

    # Full-res content Lab, fixed across levels (ref m_cntLabD).
    cnt_lab_unit = bgr_u8_to_lab_u8(cnt).astype(jnp.float32) / 255.0

    # --- one-time semantic clustering of conv5_1 content features
    # (ref main.cu:145-168 + ColorTransfer::clusterFeastures).
    lh, lw = cnt_dims[0]
    f0 = cnt_feats[taps[0]].astype(jnp.float32)
    f0n, _ = features.l2_normalize(f0)
    key, kkey = jax.random.split(key)
    label_map, _ = cluster.kmeans(
        f0n.reshape(lh * lw, -1), kkey,
        num_clusters=config.cluster_num, iters=config.kmeans_iters,
    )
    label_map = label_map.reshape(lh, lw)
    membership = cluster.cluster_membership(label_map, config.cluster_num)
    return (
        cnt_feats, stl_feats, tuple(cnt_pyr), tuple(stl_pyr),
        cnt_lab_unit, label_map, membership, key,
    )


@functools.partial(jax.jit, static_argnames=("config", "taps"))
def _setup_jit(params, cnt, stl, key, config: Config, taps):
    return _setup(params, cnt, stl, key, config, taps)


def transfer_pair(
    params: dict,
    cnt_bgr_u8,
    stl_bgr_u8,
    bds_weight: float,
    config: Config = Config(),
    key: jax.Array | None = None,
    return_intermediates: bool = False,
    warm_start: dict | None = None,
    return_state: bool = False,
    staged: bool = False,
):
    """Run the full progressive transfer for one image pair.

    cnt/stl: uint8 BGR arrays (already capped to max_size by the caller).
    Returns uint8 BGR result at the content's resolution — plus a per-level
    trace dict when ``return_intermediates`` (the reference's ENABLE_VIS).
    ``return_intermediates="stats"`` returns only the per-level solver
    convergence scalars (nl/wls iteration counts + residuals) — cheap
    program outputs for convergence profiling (tools/profile_cg.py).

    ``warm_start``: optional {"ann", "bnn"} NNFs at conv5_1 dims (from a
    previous, same-geometry frame) replacing the scaled-identity level-0
    init — the video warm-start path (BASELINE config #5; the reference is
    stateless per pair).  ``return_state``: also return that dict for the
    next frame.

    ``staged``: run setup and each pyramid level as its OWN jitted program
    instead of tracing everything into the caller's single fusion.  The
    per-level programs are ~5x smaller, which is what the remote XLA
    service can hold for MAX_SIZE-class geometries (the fused 1000 px
    program OOM-kills its compiler); arrays stay on device between stages,
    so the runtime cost is only a handful of dispatches.  Identical math
    either way — the level body is the same traced code.
    """
    if key is None:
        key = jax.random.PRNGKey(7)
    if config.window_boxsum == "auto":
        # shifted-add box sums are ~38 ms/direction cheaper but
        # kernel-fault the relayed worker when fused into the
        # whole-pipeline program (round-5 composition-fault A/B —
        # staged per-level programs run them clean); resolve per mode
        config = dataclasses.replace(
            config,
            window_boxsum="shifts" if staged else "reduce_window",
        )
    taps = tuple(config.vgg_layers())
    numlayer = len(taps)

    cnt = jnp.asarray(cnt_bgr_u8)
    stl = jnp.asarray(stl_bgr_u8)
    h, w = cnt.shape[0], cnt.shape[1]
    hs, ws = stl.shape[0], stl.shape[1]
    max_len = max(h, w, hs, ws)
    ranges = config.pm_search_radii(max_len)

    cnt_dims_map = vgg19.feature_dims(h, w)
    stl_dims_map = vgg19.feature_dims(hs, ws)
    cnt_dims = [cnt_dims_map[t] for t in taps]
    stl_dims = [stl_dims_map[t] for t in taps]

    bf16 = config.feature_dtype == "bfloat16"

    setup = _setup_jit if staged else _setup
    (cnt_feats, stl_feats, cnt_pyr, stl_pyr, cnt_lab_unit, label_map,
     membership, key) = setup(params, cnt, stl, key, config, taps)

    ann = bnn = None
    if warm_start is not None:
        ann = jnp.asarray(warm_start["ann"])
        bnn = jnp.asarray(warm_start["bnn"])
    refined = cnt
    cnt_feat_l = cnt_feats[taps[0]]
    trace: list[dict] = []
    prev_ab = None
    coarse_state = None

    step = _level_jit if staged else _level_body
    # NCT_STAGED_VERBOSE=1: per-level (and per-half in split mode)
    # wall-time prints with a hard device barrier — the remote compile
    # service gives no progress signal, so this is the only way to see
    # WHICH program a MAX_SIZE run is stuck compiling.
    verbose = staged and bool(os.environ.get("NCT_STAGED_VERBOSE"))
    if verbose:
        from nct_tpu.utils.profiling import device_sync as _sync
    for l in range(numlayer):
        t_l = time.perf_counter() if verbose else 0.0
        ah, aw = cnt_dims[l]
        if staged and ah * aw > FUSED_ENVELOPE_PIXELS:
            # MAX_SIZE-class level: the whole _level_match program
            # kernel-faults the relayed worker at >=465x700 content while
            # every constituent passes alone (PERFORMANCE.md round-3
            # bisection), and one full level OOMs the compile service at
            # 1000 px — run search-per-direction, BDS, and solve as
            # separate programs (same math; the pieces are the fused
            # trace's own sub-expressions).
            key, k_ab, k_ba = jax.random.split(key, 3)
            stl_feat_l = stl_feats[taps[l]]
            rs_l = max(int(ranges[l]), 1)
            ann = _match_search_dir_jit(
                params, config=config, l=l, rs=rs_l, key_dir=k_ab,
                a_feat=cnt_feat_l, b_feat=stl_feat_l, prev_field=ann,
            )
            bnn = _match_search_dir_jit(
                params, config=config, l=l, rs=rs_l, key_dir=k_ba,
                a_feat=stl_feat_l, b_feat=cnt_feat_l, prev_field=bnn,
            )
            guide_bgr, bds_err = _match_bds_jit(
                params, config=config, bds_weight=bds_weight, ann=ann,
                bnn=bnn, cnt_feat_l=cnt_feat_l, stl_feat_l=stl_feat_l,
                down_stl=stl_pyr[l],
            )
            if verbose:
                _sync(bds_err)
                print(f"[staged] L{l} match {time.perf_counter() - t_l:.1f}s",
                      flush=True)
                t_l = time.perf_counter()
            # Solve sub-split (graph / nonlocal / finish as separate
            # programs — the combined solve program at 1000 px never
            # returns from the remote compile service).
            (nbr_ids, nbr_w, nbr_slots, candidates, a0, b0, confidence,
             cnt_lab_d, guide_lab_d, key) = _solve_graph_jit(
                config=config, l=l, key=key, down_cnt=cnt_pyr[l],
                guide_bgr=guide_bgr, bds_err=bds_err, label_map=label_map,
                membership=membership,
            )
            if verbose:
                _sync(confidence)
                print(f"[staged] L{l} graph {time.perf_counter() - t_l:.1f}s",
                      flush=True)
                t_l = time.perf_counter()
            a_d, b_d, nl_info = _solve_nl_jit(
                config=config, l=l, numlayer=numlayer, full_hw=(h, w),
                a0=a0, b0=b0, prev_ab=prev_ab, cnt_lab_d=cnt_lab_d,
                guide_lab_d=guide_lab_d, confidence=confidence,
                nbr_ids=nbr_ids, nbr_w=nbr_w, nbr_slots=nbr_slots,
                candidates=candidates,
            )
            prev_ab = (a_d, b_d)
            if verbose:
                _sync(a_d)
                print(f"[staged] L{l} nl {time.perf_counter() - t_l:.1f}s",
                      flush=True)
                t_l = time.perf_counter()
            refined, cnt_feat_l, a_f, b_f, wls_info = _solve_finish_jit(
                params, config=config, l=l, numlayer=numlayer,
                a_d=a_d, b_d=b_d, cnt_lab_unit=cnt_lab_unit,
            )
            tr = None
            if return_intermediates:
                tr = {
                    "level": l,
                    "nl_iters": nl_info[0], "nl_r2": nl_info[1],
                    "wls_iters": wls_info[0], "wls_r2": wls_info[1],
                }
                if return_intermediates != "stats":
                    tr.update({
                        "ann": ann, "bnn": bnn, "guide": guide_bgr,
                        "a": a_f, "b": b_f, "bds_err": bds_err,
                        "refined": refined,
                    })
        else:
            ann, bnn, refined, cnt_feat_l, prev_ab, key, tr = step(
                params, config=config, l=l, numlayer=numlayer,
                rs=max(int(ranges[l]), 1), want_trace=return_intermediates,
                bds_weight=bds_weight, key=key, ann_prev=ann, bnn_prev=bnn,
                cnt_feat_l=cnt_feat_l, prev_ab=prev_ab,
                stl_feat_l=stl_feats[taps[l]], down_cnt=cnt_pyr[l],
                down_stl=stl_pyr[l], cnt_lab_unit=cnt_lab_unit,
                label_map=label_map, membership=membership,
            )
        if verbose:
            _sync(refined)
            print(f"[staged] L{l} done {time.perf_counter() - t_l:.1f}s",
                  flush=True)
        if l == 0:
            coarse_state = {"ann": ann, "bnn": bnn}
        if return_intermediates:
            trace.append(tr)

    outs = [refined]
    if return_intermediates:
        outs.append(trace)
    if return_state:
        outs.append(coarse_state)
    return outs[0] if len(outs) == 1 else tuple(outs)


@functools.partial(jax.jit, static_argnames=("config",))
def transfer_pair_jit(
    params, cnt_bgr_u8, stl_bgr_u8, bds_weight, key,
    config: Config = Config(),
):
    """Whole-pipeline single-program entry point.

    The reference pays ~40 kernel launches per level (main.cu:179-428);
    tracing the full 5-level loop into ONE XLA program per input geometry
    eliminates every dispatch and host round-trip, and — crucially under
    remote-compile setups — costs one compilation instead of ~40.
    """
    return transfer_pair(
        params, cnt_bgr_u8, stl_bgr_u8, bds_weight, config, key=key
    )


def transfer_sequence(
    params: dict,
    frames,
    stl_bgr_u8,
    bds_weight: float,
    config: Config = Config(),
    key: jax.Array | None = None,
):
    """Transfer a sequence of same-size content frames against one style,
    warm-starting each frame's level-0 NNFs from the previous frame
    (BASELINE config #5).  Yields uint8 BGR results."""
    if key is None:
        key = jax.random.PRNGKey(7)
    state = None
    for i, frame in enumerate(frames):
        key, fkey = jax.random.split(key)
        out, state = transfer_pair(
            params, frame, stl_bgr_u8, bds_weight, config, key=fkey,
            warm_start=state, return_state=True,
        )
        yield out
