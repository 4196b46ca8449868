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
