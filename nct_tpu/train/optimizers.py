"""The six Caffe solver update rules as pure pytree transforms.

Reference: src/caffe/solvers/{sgd,nesterov,adagrad,rmsprop,adadelta,adam}_
solver.cpp (+ their .cu update kernels).  Each optimizer is (init, update)
over arbitrary parameter pytrees; update returns (new_params, new_state).
Regularisation (L2 weight decay, sgd_solver.cpp Regularize), gradient
clipping (ClipGradients) and iter_size normalisation (Normalize) are
applied in the same order as the reference: clip -> normalize -> decay ->
update rule.

These are hand-rolled rather than optax so the update math matches Caffe's
conventions exactly (e.g. Caffe SGD's history IS the applied step, Adam's
single corrected rate) — and each update is a few fused VPU ops under jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class OptimizerParams:
    solver_type: str = "sgd"   # sgd|nesterov|adagrad|rmsprop|adadelta|adam
    momentum: float = 0.9      # also Adam beta1, AdaDelta decay
    momentum2: float = 0.999   # Adam beta2
    delta: float = 1e-8        # adagrad/rmsprop/adadelta/adam epsilon
    rms_decay: float = 0.99
    weight_decay: float = 0.0
    clip_gradients: float = -1.0
    iter_size: int = 1


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _global_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(
        _tmap(lambda g: jnp.sum(g.astype(jnp.float32) ** 2), grads)
    )
    return jnp.sqrt(sum(leaves))


def preprocess_grads(p: OptimizerParams, params, grads):
    """clip (ClipGradients) -> normalize (iter_size) -> L2 decay (Regularize)."""
    if p.clip_gradients > 0:
        norm = _global_norm(grads)
        scale = jnp.where(
            norm > p.clip_gradients, p.clip_gradients / norm, 1.0
        )
        grads = _tmap(lambda g: g * scale, grads)
    if p.iter_size != 1:
        grads = _tmap(lambda g: g / p.iter_size, grads)
    if p.weight_decay:
        grads = _tmap(lambda g, w: g + p.weight_decay * w, grads, params)
    return grads


def make_optimizer(p: OptimizerParams):
    """Returns (init_fn(params) -> state, update_fn(params, grads, state,
    lr, it) -> (params, state))."""
    zeros = lambda params: _tmap(jnp.zeros_like, params)  # noqa: E731

    if p.solver_type == "sgd":
        def init(params):
            return {"h": zeros(params)}

        def update(params, grads, state, lr, it):
            grads = preprocess_grads(p, params, grads)
            h = _tmap(lambda hi, g: p.momentum * hi + lr * g,
                      state["h"], grads)
            params = _tmap(lambda w, hi: w - hi, params, h)
            return params, {"h": h}

    elif p.solver_type == "nesterov":
        def init(params):
            return {"h": zeros(params)}

        def update(params, grads, state, lr, it):
            grads = preprocess_grads(p, params, grads)
            h_new = _tmap(lambda hi, g: p.momentum * hi + lr * g,
                          state["h"], grads)
            step = _tmap(
                lambda hn, ho: (1.0 + p.momentum) * hn - p.momentum * ho,
                h_new, state["h"],
            )
            params = _tmap(lambda w, s: w - s, params, step)
            return params, {"h": h_new}

    elif p.solver_type == "adagrad":
        def init(params):
            return {"h": zeros(params)}

        def update(params, grads, state, lr, it):
            grads = preprocess_grads(p, params, grads)
            h = _tmap(lambda hi, g: hi + g * g, state["h"], grads)
            params = _tmap(
                lambda w, g, hi: w - lr * g / (jnp.sqrt(hi) + p.delta),
                params, grads, h,
            )
            return params, {"h": h}

    elif p.solver_type == "rmsprop":
        def init(params):
            return {"h": zeros(params)}

        def update(params, grads, state, lr, it):
            grads = preprocess_grads(p, params, grads)
            h = _tmap(
                lambda hi, g: p.rms_decay * hi + (1 - p.rms_decay) * g * g,
                state["h"], grads,
            )
            params = _tmap(
                lambda w, g, hi: w - lr * g / (jnp.sqrt(hi) + p.delta),
                params, grads, h,
            )
            return params, {"h": h}

    elif p.solver_type == "adadelta":
        def init(params):
            return {"h": zeros(params), "h2": zeros(params)}

        def update(params, grads, state, lr, it):
            grads = preprocess_grads(p, params, grads)
            mu = p.momentum
            h = _tmap(lambda hi, g: mu * hi + (1 - mu) * g * g,
                      state["h"], grads)
            step = _tmap(
                lambda g, hi, h2i: g * jnp.sqrt(
                    (h2i + p.delta) / (hi + p.delta)
                ),
                grads, h, state["h2"],
            )
            h2 = _tmap(lambda h2i, s: mu * h2i + (1 - mu) * s * s,
                       state["h2"], step)
            params = _tmap(lambda w, s: w - lr * s, params, step)
            return params, {"h": h, "h2": h2}

    elif p.solver_type == "adam":
        def init(params):
            return {"m": zeros(params), "v": zeros(params)}

        def update(params, grads, state, lr, it):
            grads = preprocess_grads(p, params, grads)
            b1, b2 = p.momentum, p.momentum2
            t = jnp.asarray(it, jnp.float32) + 1.0
            m = _tmap(lambda mi, g: b1 * mi + (1 - b1) * g,
                      state["m"], grads)
            v = _tmap(lambda vi, g: b2 * vi + (1 - b2) * g * g,
                      state["v"], grads)
            correction = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
            params = _tmap(
                lambda w, mi, vi: w - lr * correction * mi
                / (jnp.sqrt(vi) + p.delta),
                params, m, v,
            )
            return params, {"m": m, "v": v}

    else:
        raise ValueError(f"unknown solver_type {p.solver_type!r}")

    return init, update
