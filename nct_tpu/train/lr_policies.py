"""Learning-rate schedules — Caffe's seven policies, bit-for-bit formulas.

Reference: src/caffe/solvers/sgd_solver.cpp:27-62 (GetLearningRate), policy
names and parameters from src/caffe/proto/caffe.proto SolverParameter.
Implemented as pure functions of the iteration so they are jit-safe inside
a compiled training step.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp


@dataclass(frozen=True)
class LrPolicy:
    policy: str = "fixed"          # fixed|step|exp|inv|multistep|poly|sigmoid
    base_lr: float = 0.01
    gamma: float = 0.1
    power: float = 0.75
    stepsize: int = 100000
    stepvalues: tuple[int, ...] = field(default_factory=tuple)
    max_iter: int = 100000


def learning_rate(p: LrPolicy, it) -> jnp.ndarray:
    """Rate at iteration ``it`` (int or traced int32); ref :27-62."""
    it = jnp.asarray(it, jnp.float32)
    if p.policy == "fixed":
        return jnp.float32(p.base_lr)
    if p.policy == "step":
        step = jnp.floor(it / p.stepsize)
        return p.base_lr * jnp.power(p.gamma, step)
    if p.policy == "exp":
        return p.base_lr * jnp.power(p.gamma, it)
    if p.policy == "inv":
        return p.base_lr * jnp.power(1.0 + p.gamma * it, -p.power)
    if p.policy == "multistep":
        steps = jnp.asarray(p.stepvalues, jnp.float32)
        current = jnp.sum((it[None] >= steps).astype(jnp.float32)) if steps.size else 0.0
        return p.base_lr * jnp.power(p.gamma, current)
    if p.policy == "poly":
        return p.base_lr * jnp.power(1.0 - it / p.max_iter, p.power)
    if p.policy == "sigmoid":
        return p.base_lr / (1.0 + jnp.exp(-p.gamma * (it - p.stepsize)))
    raise ValueError(f"unknown lr_policy {p.policy!r}")
