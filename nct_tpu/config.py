"""Pipeline configuration.

Defaults mirror the reference's Config.h (reference:
code/windows/neural_color_transfer/source/ColorTransfer/Config.h:58-72 and
:4-5).  Note the reference CLI *help text* (main.cu:40-43) advertises
different defaults (0.4 / 0.001 / 0.0234375); the values actually used are
the ones here.
"""

from __future__ import annotations

import dataclasses


MAX_SIZE = 1000          # hard cap on the longer image side (Config.h:5)
MIN_VAL = -1e8
MAX_VAL = 1e8


@dataclasses.dataclass(frozen=True)
class Config:
    """All pipeline hyper-parameters (ref Config.h:55-98)."""

    # --- adjustable parameters -------------------------------------------
    reverse_weight: float = 2.0    # BDS "completeness" vote weight (m_reverseWeight)
    var_epsilon: float = 0.6       # a = sigma_ref/(sigma_src+eps), 0-255 domain (m_varEpslon)
    nonlocal_weight: float = 2.0   # nonlocal constraint weight (m_nonlocalWeight)
    local_weight: float = 0.125    # 1st-order smoothness weight (m_localWeight)
    wls_lambda_init: float = 0.024  # WLS lambda before area scaling (m_wlsLamdaInit)

    # --- usually-fixed parameters ----------------------------------------
    cluster_num: int = 10          # semantic k-means clusters (m_clusterNum)
    k_num: int = 8                 # k-NN neighbours in the nonlocal graph (m_kNum)
    patch_size: int = 3            # patch width for PatchMatch / voting (m_patchSize)
    wls_alpha: float = 1.2         # gradient exponent (m_wlsAlpha)

    # --- algorithm schedule (ref main.cu:55-68) --------------------------
    pm_iters: int = 10             # PatchMatch iterations per level (params.iter)
    num_levels: int = 5            # conv5_1 .. conv1_1 pyramid levels
    max_size: int = MAX_SIZE

    # --- solver budgets (ref ColorTransfer.cpp:916-921) ------------------
    # The reference runs double-precision CG to ||r||^2 < 1e-6 absolute;
    # our f32 CG uses a RELATIVE residual target — 1e-6 relative sits at
    # the f32 noise floor (the early exit never fires), so the default is
    # 1e-4, far below perceptual relevance for (a, b) coefficient maps.
    cg_tol: float = 1e-4
    # Iteration budgets: the reference runs UNpreconditioned double CG for
    # 50 (finest) / 100 iterations; ours is 2x2-block-Jacobi PCG with a
    # cross-level warm start, which reaches a lower residual in half the
    # budget, so the defaults are halved (while_loop exits earlier still
    # whenever tol is hit).
    cg_iters_final: int = 25       # at the finest level (layer==4)
    cg_iters: int = 50             # at coarser levels
    wls_cg_iters: int = 200        # WLS PCG budget (ref uses a direct solver)
    # WLS preconditioner: "mg" = the nonlocal solve's geometric-multigrid
    # V-cycle with zero cross-blocks.  The coarse levels' WLS systems are
    # strongly Laplacian-dominated (lam scales with fullArea/downArea,
    # ColorTransfer.cpp:1359-1361) — plain Jacobi-PCG stalls there
    # (680x452 L0: r2 6.8e8 after its whole 200-iteration budget) while
    # mg-PCG passes it 18x at 30 iterations and converges arbitrarily
    # further (tools/wls_convergence.py; PERFORMANCE.md round-4).  The
    # DEFAULT cap of 8 is a quality/speed point, not the convergence
    # limit: the closure sweep (tools/sweep_nl_quality.py) measures all
    # 5 demo pairs under their golden ceilings at caps 6-30 with closure
    # slightly BETTER at 6-10, and each mg iteration costs ~6x a Jacobi
    # one at full res, so 8 is ~5x cheaper than the r03 jacobi-200
    # budget per level.  Raise toward 30+ (or reference_parity's 100)
    # when exactness vs the direct solver matters more than latency.
    wls_precond: str = "mg"
    wls_cg_iters_mg: int = 8
    # Nonlocal-solve preconditioner: "mg" = multigrid V-cycle (reaches the
    # block-Jacobi budget's residual in ~1/8 the iterations on the real
    # Laplacian-dominated systems; see PERFORMANCE.md), "block_jacobi" =
    # the exact per-pixel 2x2 inverse (the round-1 default, kept for the
    # parity config).  The mg budgets below apply when nl_precond="mg".
    nl_precond: str = "mg"
    # Coarse-level cap 10: round 3 raised this to 40 because the in1/tar1
    # demo pair's coarse solves left garish contrast spikes at 10 — but
    # the spikes were CG *error from the init*, not missing convergence:
    # the patch-stat a0 = sigma_ref/(sigma_src+eps) spikes to O(50) in
    # low-confidence regions whose (a, b) rides the regularizers — the
    # near-null modes PCG converges on slowest.  _solve_nl now clamps the
    # level-0 init to a in [0, 2] with b recomputed (identical predicted
    # color, identical fixed point), after which the iterate is closer to
    # the exact solution at 5 iterations than the raw init was at 40
    # (captured-system study + closure sweep, PERFORMANCE.md round-4;
    # tools/sweep_nl_quality.py: all 5 pairs under their test_golden
    # ceilings at cap 10).  The finest level stays at 6 —
    # measured to not matter for this failure mode, and it dominates
    # solve cost.
    cg_iters_mg: int = 10
    cg_iters_final_mg: int = 6
    # CG loop style: dynamic while_loop (early exit; best single-pair
    # latency) vs fixed-trip scan (vmapped while_loop serializes the whole
    # batch on the slowest element every step, so batched serving flips
    # this to False — see parallel/batch.py).
    cg_dynamic: bool = True

    # --- TPU execution knobs (no reference equivalent) -------------------
    feature_dtype: str = "bfloat16"  # halves matcher HBM traffic; f32 accum
    # VGG forward compute dtype; "" follows feature_dtype.  Space-sharded
    # meshes force "float32": XLA 0.9's SPMD partitioner mis-types the
    # halo-padding broadcast of row-sharded bf16 convolutions (hlo_verifier
    # RET_CHECK SameElementType) — see parallel/batch.py.
    vgg_compute_dtype: str = ""
    kmeans_iters: int = 11          # ref FLANN KMeansIndexParams(.., 11, ..)
    # Levels [0, exact_nn_levels) use the exhaustive streaming-matmul NN
    # search (ops/exact_nn.py) — the global optimum of the reference's
    # patch metric on the MXU; finer levels run PatchMatch seeded by the
    # upsampled exact field.  4 = conv5_1..conv2_1 exact, conv1_1 PatchMatch.
    exact_nn_levels: int = 4
    pm_iters_fine: int = 4          # PatchMatch iters when seeded by exact NN
    # Matching strategy for levels >= exact_nn_levels: "window" = two-stage
    # local window refinement (ops/window_refine.py, ~9x cheaper);
    # "patchmatch" = the reference-shaped sweep search.
    fine_strategy: str = "window"
    window_radius: int = 4
    # Rescored candidates per pixel: the shortlist is ranked by the
    # patch-APPROXIMATE score (3x3 box-sum of centre distances), which is
    # near-exact under an offset-preserving upsample, so 2 exact rescores
    # suffice (SSIM 0.998 vs 8 rescores at 192 px; each rescore is an
    # Ha*Wa-row gather of K*C-wide patch rows).
    window_shortlist: int = 2
    # Box-sum lowering for the window refine's patch-approx stage:
    # "shifts" (separable shifted-add — streams at line rate; ~38 ms/dir
    # cheaper than reduce_window at 452 px) / "reduce_window" /
    # "auto" = shifts in staged per-level programs (proven clean),
    # reduce_window inside the fused whole-pipeline program, where the
    # shifted-add lowering kernel-faults the relayed worker (round-5
    # composition-fault A/B, PERFORMANCE.md).
    window_boxsum: str = "auto"
    # Stage-1 ranking channel subset (0 = all): the centre-distance
    # gathers are the window refine's dominant HBM traffic and only feed
    # the shortlist RANKING — stage 2 rescores exactly and keeps the
    # incumbent — so halving the channels halves the stage's traffic at
    # bounded shortlist-quality cost.  A MAX_SIZE tuning knob.
    window_stage1_channels: int = 0
    # Stage-1 channel subset applied by the MAX_SIZE sub-split search
    # path when window_stage1_channels is 0 (= "auto"): at the 665x1000
    # L4 geometry ranking on 32 of 64 channels cuts the refine from
    # 400 to 306 ms/dir (random-feature A/B, the subset's WORST case:
    # isotropic channels carry no ordering; mean exact-metric loss was
    # 5.6% relative before stage-2's exact rescore bounds it).  0
    # disables the subset (full channels everywhere).
    window_stage1_channels_maxsize: int = 32
    # Force optimization_barrier sequencing of the two window-refine
    # directions (+ the BDS stage) inside _level_match.  Auto-enabled by
    # geometry above pipeline._SERIALIZE_PIXELS — the measured boundary
    # where the concurrently-scheduled pair's live set kernel-faults the
    # relayed worker (PERFORMANCE.md round-3 bisection); this flag forces
    # it below that for A/B testing.
    match_serialize: bool = False
    # Nonlocal transpose-table cap: in-edges kept per candidate slot (the
    # strongest under the cap).  Every directed k-NN pair targets one of
    # the ~K*M candidate pixels, whose mean in-degree at 700 px is ~120 —
    # the cap trades CG-iteration gather rows for graph completeness.
    nl_in_cap: int = 128
    # W^T application: "tables" (gather-only CG iterations; the build's
    # rank chain is searchsorted-based since round 4, which the remote
    # compile service handles at any size — the associative_scan variant
    # it replaced stalled above ~3M pairs), "scatter" (per-iteration
    # scatter-add, exact uncapped operator, ~450 ms/iteration at the
    # 5.3M-pair MAX_SIZE L4 — TPU scatters with duplicate unsorted
    # indices serialize), or "auto" (nonlocal_solve picks).
    nl_transpose: str = "auto"
    # k-NN graph: how many of a pixel's (dilated) cluster memberships are
    # queried and merged.  1 = primary cluster only; >1 restores the
    # reference's multi-cluster kd-tree merge (ColorTransfer.cpp:397-423)
    # at ~P x the graph-build cost (build-time only, not per CG iteration).
    knn_memberships: int = 1
    # Space sharding: when set (a jax.sharding.Mesh whose `space_axis` has
    # size > 1), the exact-NN levels route through the ring-scheduled
    # matcher (parallel/ring_nn.py) instead of the auto-partitioned one —
    # both patch tables stay row-sharded and the style table is streamed
    # around the ring (lax.ppermute) rather than ALL-GATHERED onto every
    # shard (~90% of the auto-partitioned module's collective bytes and an
    # O(style-size) per-device memory ceiling; PERFORMANCE.md).  Set by
    # parallel/batch.make_batch_transfer for space-sharded meshes; a Mesh
    # is hashable, so the Config still rides as a static jit argument.
    space_mesh: object = None
    space_axis: str = "space"

    @classmethod
    def reference_parity(cls, **overrides) -> "Config":
        """The reference-shaped configuration: PatchMatch at every level
        with the reference's 10 iterations (main.cu:64-68), unhalved CG
        budgets and the tight 1e-6 tolerance (ColorTransfer.cpp:916-921).
        Used for apples-to-apples regression against the golden outputs
        once pretrained weights exist; the TPU-optimized default search
        (exact NN + window refine, mg preconditioner) is compared against
        this in tools/compare_strategies.py and PERFORMANCE.md."""
        base = dict(
            exact_nn_levels=0, fine_strategy="patchmatch",
            pm_iters=10, pm_iters_fine=10, nl_precond="block_jacobi",
            cg_iters=100, cg_iters_final=50, wls_cg_iters=400,
            wls_cg_iters_mg=100, cg_tol=1e-6,
        )
        base.update(overrides)
        return cls(**base)

    def pm_search_radii(self, max_len: int) -> list[int]:
        """Per-level random-search radii (ref main.cu:77-83)."""
        return [max_len // 16, max_len // 32, max_len // 64, 32, 32]

    def vgg_layers(self) -> list[str]:
        """Coarse-to-fine feature taps (ref main.cu:55-59), post-ReLU.

        ``num_levels < 5`` truncates the pyramid to its COARSEST levels;
        every level already refines the full-resolution image (WLS runs at
        full res each pass), so a truncated run still returns a full-res
        result — a cheap preview / fast-serving mode the reference's fixed
        5-level loop does not offer.
        """
        taps = ["conv5_1", "conv4_1", "conv3_1", "conv2_1", "conv1_1"]
        return taps[: max(1, min(self.num_levels, len(taps)))]
