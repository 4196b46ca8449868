"""Recurrent layers: RNN and LSTM as lax.scan cells.

TPU-native rebuild of Caffe's recurrent stack (reference:
src/caffe/layers/recurrent_layer.cpp, rnn_layer.cpp, lstm_layer.cpp,
lstm_unit_layer.cpp).  The reference UNROLLS the recurrence into a static
inner NetParameter with one layer set per timestep (recurrent_layer.cpp
LayerSetUp) — a graph-size-per-timestep design that made sense for Caffe's
layer-granular execution.  Here each cell is a ``lax.scan`` body: one
compiled program regardless of sequence length, weights touched once per
step from the same buffers, and XLA fuses the gate nonlinearities into the
matmuls.

Contract (recurrent_layer.hpp):
  * bottoms: ``x`` [T, N, ...] (trailing dims flattened to the input size),
    ``cont`` [T, N] sequence-continuation indicators (0 restarts a stream
    at that step), optional ``x_static`` [N, ...] per-stream input folded
    into every timestep;
  * ``recurrent_param { num_output, expose_hidden }``; with
    ``expose_hidden`` the initial recurrent state arrives as extra bottoms
    (h0 [1, N, H]; LSTM also c0) and the final state leaves as extra tops;
  * top: the output sequence [T, N, num_output].

Cell equations (comments in rnn_layer.hpp:24-26, lstm_layer.hpp:26-31 —
gate order i, f, o, g as in lstm_layer.cpp:209-218):

  RNN:   h_t = tanh(W_hh (cont_t * h_{t-1}) + W_xh x_t + b_h)
         o_t = tanh(W_ho h_t + b_o)
  LSTM:  [i f o g] = W_xc x_t + b_c + W_hc (cont_t * h_{t-1}) [+ W_xc_static x_static]
         c_t = cont_t * (sigmoid(f) * c_{t-1}) + sigmoid(i) * tanh(g)
         h_t = sigmoid(o) * tanh(c_t)

Weights are stored pre-transposed for row-major [N, D] x [D, H] matmuls:
``w_x`` [D, (4)H], ``w_h`` [H, (4)H], ``b`` [(4)H]; RNN adds ``w_o`` [H, H]
and ``b_o`` [H]; LSTM adds ``w_static`` [E, 4H] when x_static is wired.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nct_tpu.nn.layers import register_layer


def _seq(x):
    """[T, N, ...] -> [T, N, D] with trailing dims flattened."""
    return x.reshape(x.shape[0], x.shape[1], -1)


def _recurrent_io(cfg, bottoms):
    """Split bottoms into (x, cont, x_static, init_states) per the
    recurrent_layer.cpp bottom ordering: x, cont[, x_static][, h0[, c0]]."""
    rp = cfg.get("recurrent_param", {}) or {}
    expose = rp.get("expose_hidden") in (True, "true")
    x, cont = _seq(bottoms[0]), bottoms[1]
    rest = list(bottoms[2:])
    n_state = int(rp.get("__num_states__", 1))
    inits = rest[-n_state:] if expose and len(rest) >= n_state else []
    if inits:
        rest = rest[: -n_state]
    x_static = rest[0].reshape(rest[0].shape[0], -1) if rest else None
    return x, cont.astype(x.dtype), x_static, inits, expose


@register_layer("RNN")
def rnn_layer(params, cfg, *bottoms):
    cfg = dict(cfg)
    cfg.setdefault("recurrent_param", {})
    rp = dict(cfg["recurrent_param"] or {})
    rp["__num_states__"] = 1
    cfg["recurrent_param"] = rp
    x, cont, x_static, inits, expose = _recurrent_io(cfg, bottoms)
    t, n, _ = x.shape
    h_dim = params["w_h"].shape[0]
    h0 = (inits[0].reshape(n, h_dim) if inits
          else jnp.zeros((n, h_dim), x.dtype))

    xw = jnp.einsum("tnd,dh->tnh", x, params["w_x"]) + params["b"]
    if x_static is not None and "w_static" in params:
        xw = xw + (x_static @ params["w_static"])[None]

    def step(h_prev, inp):
        xw_t, cont_t = inp
        h_cont = h_prev * cont_t[:, None]
        h = jnp.tanh(h_cont @ params["w_h"] + xw_t)
        o = jnp.tanh(h @ params["w_o"] + params["b_o"])
        return h, o

    h_last, outs = jax.lax.scan(step, h0, (xw, cont))
    if expose:
        return outs, h_last[None]
    return outs


@register_layer("LSTMUnit")
def lstm_unit_layer(params, cfg, c_prev, gate_input, cont):
    """Single LSTM step (lstm_unit_layer.cpp:40-62): bottoms
    c_prev [1, N, H], gate_input [1, N, 4H] (pre-activation, order
    i, f, o, g), cont [1, N]; tops (c [1, N, H], h [1, N, H]).
    f is gated by cont (i = sig(X_i), f = cont * sig(X_f))."""
    h_dim = c_prev.shape[-1]
    i, f, o, g = jnp.split(gate_input, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = cont[..., None] * jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    assert c.shape[-1] == h_dim
    return c, h


@register_layer("LSTM")
def lstm_layer(params, cfg, *bottoms):
    cfg = dict(cfg)
    cfg.setdefault("recurrent_param", {})
    rp = dict(cfg["recurrent_param"] or {})
    rp["__num_states__"] = 2
    cfg["recurrent_param"] = rp
    x, cont, x_static, inits, expose = _recurrent_io(cfg, bottoms)
    t, n, _ = x.shape
    h_dim = params["w_h"].shape[0]
    if inits:
        h0 = inits[0].reshape(n, h_dim)
        c0 = inits[1].reshape(n, h_dim)
    else:
        h0 = jnp.zeros((n, h_dim), x.dtype)
        c0 = jnp.zeros((n, h_dim), x.dtype)

    # W_xc x_t + b_c precomputed for the whole sequence (the reference's
    # single big x_transform InnerProduct, lstm_layer.cpp:107-116)
    xw = jnp.einsum("tnd,dh->tnh", x, params["w_x"]) + params["b"]
    if x_static is not None and "w_static" in params:
        xw = xw + (x_static @ params["w_static"])[None]

    def step(carry, inp):
        h_prev, c_prev = carry
        xw_t, cont_t = inp
        h_cont = h_prev * cont_t[:, None]
        gates = xw_t + h_cont @ params["w_h"]
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        o = jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = cont_t[:, None] * (f * c_prev) + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h_last, c_last), outs = jax.lax.scan(step, (h0, c0), (xw, cont))
    if expose:
        return outs, h_last[None], c_last[None]
    return outs
