"""Pallas exact-NN kernel vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nct_tpu.ops.exact_nn import exact_nn


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_pallas_nn_matches_exact_nn(rng):
    from jax.experimental.pallas import tpu as pltpu

    from nct_tpu.ops.pallas_nn import exact_nn_pallas

    a = _norm(rng.standard_normal((8, 9, 8)).astype(np.float32))
    b = _norm(rng.standard_normal((9, 11, 8)).astype(np.float32))

    nnf_x, d_x = exact_nn(jnp.asarray(a), jnp.asarray(b), bf16=True)
    with pltpu.force_tpu_interpret_mode():
        nnf_p, d_p = exact_nn_pallas(
            jnp.asarray(a), jnp.asarray(b), a_tile=32, b_tile=32
        )
    # same metric in bf16 on both paths -> distances match tightly;
    # argmin ties may differ, so compare achieved distance
    np.testing.assert_allclose(
        np.asarray(d_p), np.asarray(d_x), rtol=1e-2, atol=1e-2
    )


def test_pallas_nn_bidir_matches_two_unidirectional(rng):
    """One symmetric-matrix sweep == two separate sweeps, bitwise.

    The distance is symmetric and the f32 accumulation over K is
    order-identical in both operand orders, so the fused bidirectional
    kernel must reproduce both unidirectional results exactly —
    including first-match tie-breaking.
    """
    from jax.experimental.pallas import tpu as pltpu

    from nct_tpu.ops.pallas_nn import exact_nn_pallas, exact_nn_pallas_bidir

    a = _norm(rng.standard_normal((8, 9, 8)).astype(np.float32))
    b = _norm(rng.standard_normal((9, 11, 8)).astype(np.float32))
    # quantize hard so exact ties actually occur and tie-break is exercised
    a = _norm(np.round(a * 4) / 4 + 1e-3)
    b = _norm(np.round(b * 4) / 4 + 1e-3)

    with pltpu.force_tpu_interpret_mode():
        nnf_ab_u, d_ab_u = exact_nn_pallas(
            jnp.asarray(a), jnp.asarray(b), a_tile=32, b_tile=32)
        nnf_ba_u, d_ba_u = exact_nn_pallas(
            jnp.asarray(b), jnp.asarray(a), a_tile=32, b_tile=32)
        nnf_ab, d_ab, nnf_ba, d_ba = exact_nn_pallas_bidir(
            jnp.asarray(a), jnp.asarray(b), a_tile=32, b_tile=32)

    np.testing.assert_array_equal(np.asarray(nnf_ab), np.asarray(nnf_ab_u))
    np.testing.assert_array_equal(np.asarray(nnf_ba), np.asarray(nnf_ba_u))
    np.testing.assert_array_equal(np.asarray(d_ab), np.asarray(d_ab_u))
    np.testing.assert_array_equal(np.asarray(d_ba), np.asarray(d_ba_u))


def test_pallas_nn_bidir_vmap(rng):
    """The batch path vmaps the pipeline; the bidir kernel must survive
    vmap (Pallas prepends the batch dim to the grid) with per-element
    results equal to the unvmapped call."""
    from jax.experimental.pallas import tpu as pltpu

    from nct_tpu.ops.pallas_nn import exact_nn_pallas_bidir

    a = _norm(rng.standard_normal((2, 8, 9, 8)).astype(np.float32))
    b = _norm(rng.standard_normal((2, 9, 11, 8)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        f = jax.vmap(
            lambda x, y: exact_nn_pallas_bidir(x, y, 3, a_tile=32, b_tile=32)
        )
        nab, _, nba, _ = f(jnp.asarray(a), jnp.asarray(b))
        for i in range(2):
            ru, _, rv, _ = exact_nn_pallas_bidir(
                jnp.asarray(a[i]), jnp.asarray(b[i]), a_tile=32, b_tile=32)
            np.testing.assert_array_equal(np.asarray(nab[i]), np.asarray(ru))
            np.testing.assert_array_equal(np.asarray(nba[i]), np.asarray(rv))
