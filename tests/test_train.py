"""Training-stack tests: LR policies vs Caffe formulas, solver updates vs
hand-computed references, snapshot/restore equivalence, data-parallel psum.

Mirrors the vendored framework's own test strategy
(test_gradient_based_solver.cpp: update-rule checks + snapshot/restore
equivalence; SURVEY §4).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nct_tpu.parallel.mesh import make_mesh
from nct_tpu.train import Solver, SolverParams, learning_rate, make_optimizer
from nct_tpu.train.lr_policies import LrPolicy
from nct_tpu.train.optimizers import OptimizerParams


def test_lr_policies_match_caffe_formulas():
    assert learning_rate(LrPolicy("fixed", base_lr=0.1), 500) == pytest.approx(0.1)
    assert learning_rate(
        LrPolicy("step", base_lr=1.0, gamma=0.5, stepsize=10), 25
    ) == pytest.approx(0.25)
    assert learning_rate(
        LrPolicy("exp", base_lr=1.0, gamma=0.99), 10
    ) == pytest.approx(0.99 ** 10, rel=1e-5)
    assert learning_rate(
        LrPolicy("inv", base_lr=1.0, gamma=0.1, power=0.75), 10
    ) == pytest.approx((1 + 0.1 * 10) ** -0.75, rel=1e-5)
    assert learning_rate(
        LrPolicy("multistep", base_lr=1.0, gamma=0.1, stepvalues=(5, 8)), 9
    ) == pytest.approx(0.01, rel=1e-5)
    assert learning_rate(
        LrPolicy("poly", base_lr=1.0, power=2.0, max_iter=100), 50
    ) == pytest.approx(0.25, rel=1e-5)
    assert learning_rate(
        LrPolicy("sigmoid", base_lr=1.0, gamma=0.5, stepsize=10), 10
    ) == pytest.approx(0.5, rel=1e-5)


def test_sgd_momentum_update():
    init, update = make_optimizer(OptimizerParams("sgd", momentum=0.9))
    w = {"w": jnp.asarray([1.0, 2.0])}
    g = {"w": jnp.asarray([0.5, -0.5])}
    st = init(w)
    w1, st = update(w, g, st, 0.1, 0)
    np.testing.assert_allclose(np.asarray(w1["w"]), [0.95, 2.05])
    # second step accumulates momentum: h = 0.9*0.05 + 0.1*0.5 = 0.095
    w2, st = update(w1, g, st, 0.1, 1)
    np.testing.assert_allclose(np.asarray(w2["w"]), [0.95 - 0.095, 2.05 + 0.095], rtol=1e-6)


def test_nesterov_update():
    init, update = make_optimizer(OptimizerParams("nesterov", momentum=0.9))
    w = {"w": jnp.asarray([0.0])}
    g = {"w": jnp.asarray([1.0])}
    st = init(w)
    # h_new = 0.1, step = 1.9*0.1 - 0.9*0 = 0.19
    w1, _ = update(w, g, st, 0.1, 0)
    np.testing.assert_allclose(np.asarray(w1["w"]), [-0.19], rtol=1e-6)


def test_adam_update_matches_formula():
    p = OptimizerParams("adam", momentum=0.9, momentum2=0.999, delta=1e-8)
    init, update = make_optimizer(p)
    w = {"w": jnp.asarray([1.0])}
    g = {"w": jnp.asarray([2.0])}
    st = init(w)
    w1, st = update(w, g, st, 0.1, 0)
    m = 0.1 * 2.0
    v = 0.001 * 4.0
    corr = np.sqrt(1 - 0.999) / (1 - 0.9)
    want = 1.0 - 0.1 * corr * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(np.asarray(w1["w"]), [want], rtol=1e-5)


@pytest.mark.parametrize("solver_type", [
    "sgd", "nesterov", "adagrad", "rmsprop", "adadelta", "adam",
])
def test_all_solvers_reduce_quadratic_loss(solver_type):
    target = jnp.asarray([3.0, -2.0])

    def loss_fn(params, batch):
        return jnp.sum((params["w"] - target) ** 2)

    params = {"w": jnp.zeros(2)}
    # adadelta's sqrt(h2/h) step scale starts near zero (cold state), so it
    # needs a much larger base_lr to make progress in few iterations.
    lr = {"adadelta": 20.0, "adagrad": 0.5}.get(solver_type, 0.05)
    s = Solver(
        loss_fn, params,
        SolverParams(
            lr=LrPolicy("fixed", base_lr=lr),
            opt=OptimizerParams(solver_type, momentum=0.5),
            max_iter=200,
        ),
    )
    final = s.solve([None] * 200)
    first = float(loss_fn(params, None))
    assert final < first * 0.2, f"{solver_type}: {final} vs {first}"


def test_weight_decay_and_clip():
    p = OptimizerParams("sgd", momentum=0.0, weight_decay=0.1,
                        clip_gradients=1.0)
    init, update = make_optimizer(p)
    w = {"w": jnp.asarray([2.0])}
    g = {"w": jnp.asarray([3.0])}   # norm 3 > clip 1 -> scaled to 1
    w1, _ = update(w, g, init(w), 1.0, 0)
    # clipped grad 1.0 + decay 0.1*2 = 1.2 -> w = 0.8
    np.testing.assert_allclose(np.asarray(w1["w"]), [0.8], rtol=1e-6)


def test_snapshot_restore_equivalence(tmp_path):
    def loss_fn(params, batch):
        return jnp.sum((params["w"] - batch) ** 2)

    batches = [jnp.full(3, float(i % 5)) for i in range(20)]
    mk = lambda: Solver(  # noqa: E731
        loss_fn, {"w": jnp.zeros(3)},
        SolverParams(lr=LrPolicy("fixed", base_lr=0.1),
                     opt=OptimizerParams("adam"), max_iter=100),
    )
    # uninterrupted
    s1 = mk()
    for b in batches:
        s1.step(b)
    # interrupted + restored at iter 10
    s2 = mk()
    for b in batches[:10]:
        s2.step(b)
    path = s2.snapshot(str(tmp_path / "snap.npz"))
    s3 = mk()
    s3.restore(path)
    assert s3.iter == 10
    for b in batches[10:]:
        s3.step(b)
    np.testing.assert_allclose(
        np.asarray(s1.params["w"]), np.asarray(s3.params["w"]), rtol=1e-6
    )


def test_data_parallel_step_matches_single_device():
    """Sharded-batch gradients must equal the single-device gradients —
    XLA's psum plays P2PSync's role."""
    def loss_fn(params, batch):
        pred = batch @ params["w"]
        return jnp.mean(pred ** 2)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    params = {"w": jnp.asarray(rng.standard_normal(4), jnp.float32)}
    sp = SolverParams(lr=LrPolicy("fixed", base_lr=0.1),
                      opt=OptimizerParams("sgd", momentum=0.0), max_iter=10)

    s_single = Solver(loss_fn, params, sp)
    l_single = s_single.step(batch)

    mesh = make_mesh(n_data=8, n_space=1)
    s_multi = Solver(loss_fn, params, sp, mesh=mesh)
    l_multi = s_multi.step(batch)

    assert l_single == pytest.approx(l_multi, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_single.params["w"]), np.asarray(s_multi.params["w"]),
        rtol=1e-5,
    )
