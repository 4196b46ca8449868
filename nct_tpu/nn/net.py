"""Net: prototxt-driven DAG execution, the Caffe ``Net<Dtype>`` analogue.

Reference: src/caffe/net.cpp — Init (:49, proto parse -> layer creation ->
setup), ForwardFromTo (:553-565, topological layer loop), blob_by_name
(:977), CopyTrainedLayersFrom (:760-824).  Differences by design:

  * the blob store is a functional dict threaded through a python loop that
    jit-traces into ONE fused XLA program — no per-layer dispatch, no
    SyncedMemory (XLA owns placement);
  * "reshape to the input's actual size" (Classifier.cpp:64-72) is simply
    jit's per-shape specialization;
  * in-place layers (Caffe ReLU writing its bottom) become a plain blob
    rebind: top name == bottom name overwrites the dict entry, so requested
    activations are post-ReLU exactly like the reference (SURVEY §3.3);
  * TEST-phase filtering drops TRAIN-only layers (FilterNet, net.cpp).

Weights load from .caffemodel via the wire-format reader (models/caffe_io),
converted to NHWC/HWIO on ingest.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nct_tpu.nn.layers import LAYER_REGISTRY
from nct_tpu.nn.losses import is_loss_type
from nct_tpu.nn.prototxt import load_prototxt, parse_prototxt


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


class Net:
    """Inference net over NHWC blobs."""

    def __init__(self, prototxt: str | dict, phase: str = "TEST"):
        self.phase = phase
        if isinstance(prototxt, str):
            if "\n" in prototxt or "{" in prototxt:
                net_param = parse_prototxt(prototxt)
            else:
                net_param = load_prototxt(prototxt)
        else:
            net_param = prototxt
        # Legacy definitions (V0 nested-layer / V1 `layers` + enum types /
        # in-data transform fields) upgrade transparently, the reference's
        # ReadNetParamsFromTextFile flow (upgrade_proto.cpp
        # UpgradeNetAsNeeded); modern nets pass through untouched.
        from nct_tpu.nn.upgrade import (
            net_needs_data_upgrade, net_needs_v0_upgrade,
            net_needs_v1_upgrade, upgrade_net,
        )

        if (net_needs_v0_upgrade(net_param)
                or net_needs_v1_upgrade(net_param)
                or net_needs_data_upgrade(net_param)):
            net_param = upgrade_net(net_param)
        self.name = net_param.get("name", "net")
        self.inputs = [str(i) for i in _as_list(net_param.get("input"))]
        # Declared input dims: `input_shape { dim: ... }` repeated per input,
        # or legacy flat `input_dim` (4 ints per input) — caffe.proto
        # NetParameter fields 8 (input_shape) and 4 (input_dim).
        self.input_shapes: dict[str, tuple] = {}
        shapes = _as_list(net_param.get("input_shape"))
        if shapes:
            for name, entry in zip(self.inputs, shapes):
                if isinstance(entry, dict):
                    self.input_shapes[name] = tuple(_as_list(entry.get("dim")))
        else:
            dims = [int(d) for d in _as_list(net_param.get("input_dim"))]
            for i, name in enumerate(self.inputs):
                chunk = dims[4 * i : 4 * i + 4]
                if chunk:
                    self.input_shapes[name] = tuple(chunk)
        layers = _as_list(net_param.get("layer")) or _as_list(
            net_param.get("layers")
        )
        # FilterNet: keep layers whose include/phase matches (net.cpp:282+)
        self.layers = []
        for cfg in layers:
            inc = cfg.get("include")
            if inc is not None:
                phases = {
                    str(e.get("phase"))
                    for e in _as_list(inc)
                    if isinstance(e, dict)
                }
                if phases and phase not in phases:
                    continue
            self.layers.append(cfg)
        self.params: dict[str, dict[str, np.ndarray]] = {}

    # --- weights ---------------------------------------------------------
    def copy_trained_layers_from(self, caffemodel_path: str) -> list[str]:
        """Load weights by layer name (ref net.cpp:760-824); conv blobs are
        re-laid out OIHW -> HWIO, InnerProduct (out, in) -> (in, out)."""
        from nct_tpu.models.caffe_io import read_caffemodel

        blobs_by_name = read_caffemodel(caffemodel_path)
        loaded = []
        for cfg in self.layers:
            name = str(cfg.get("name"))
            if name not in blobs_by_name:
                continue
            blobs = blobs_by_name[name]
            ltype = str(cfg.get("type"))
            entry: dict[str, np.ndarray] = {}
            if ltype == "Convolution" and blobs:
                entry["w"] = np.ascontiguousarray(
                    blobs[0].transpose(2, 3, 1, 0)
                )
                if len(blobs) > 1:
                    entry["b"] = blobs[1].reshape(-1)
            elif ltype == "Deconvolution" and blobs:
                # Caffe deconv blob is (C_in, C_out/g, kh, kw); the layer
                # computes it as an input-dilated forward conv, which needs
                # the spatially-flipped HWIO layout (I=C_in, O=C_out)
                entry["w"] = np.ascontiguousarray(
                    blobs[0][:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
                )
                if len(blobs) > 1:
                    entry["b"] = blobs[1].reshape(-1)
            elif ltype == "PReLU" and blobs:
                entry["w"] = blobs[0].reshape(-1)
            elif ltype == "InnerProduct" and blobs:
                entry["w"] = np.ascontiguousarray(blobs[0].T)
                if len(blobs) > 1:
                    entry["b"] = blobs[1].reshape(-1)
            elif ltype == "BatchNorm" and len(blobs) >= 2:
                entry["mean"] = blobs[0].reshape(-1)
                entry["var"] = blobs[1].reshape(-1)
                if len(blobs) > 2:
                    entry["scale_factor"] = blobs[2].reshape(())
            elif ltype == "Scale" and blobs:
                entry["w"] = blobs[0].reshape(-1)
                if len(blobs) > 1:
                    entry["b"] = blobs[1].reshape(-1)
            elif blobs:
                entry = {str(i): b for i, b in enumerate(blobs)}
            if entry:
                self.params[name] = entry
                loaded.append(name)
        return loaded

    def set_params(self, name: str, entry: dict) -> None:
        self.params[name] = entry

    def init_params(self, input_shapes: dict[str, tuple], seed: int = 0):
        """Create trainable parameters for every param-bearing layer from
        its weight_filler/bias_filler specs (the Layer::SetUp +
        filler.hpp flow of the reference; shapes are inferred by abstract
        evaluation through the DAG, Caffe's Reshape pass).

        ``input_shapes`` maps input blob names to NHWC shapes.  Returns the
        params pytree (also stored on the net), suitable for
        ``forward(..., params=...)`` and jax.grad.
        """
        key = jax.random.PRNGKey(seed)
        blobs = {
            n: jax.ShapeDtypeStruct(tuple(s), jnp.float32)
            for n, s in input_shapes.items()
        }
        for i, cfg in enumerate(self.layers):
            ltype = str(cfg.get("type"))
            name = str(cfg.get("name"))
            if ltype == "Input":
                continue
            bottoms = [blobs[str(b)] for b in _as_list(cfg.get("bottom"))]
            if name not in self.params:
                entry = self._make_layer_params(
                    cfg, ltype, bottoms, jax.random.fold_in(key, i)
                )
                if entry:
                    self.params[name] = entry
            fn = LAYER_REGISTRY[ltype]
            lparams = self.params.get(name, {})
            out = jax.eval_shape(
                lambda *bs: fn(lparams, cfg, *bs), *bottoms
            )
            outs = out if isinstance(out, (tuple, list)) else [out]
            for t, o in zip(
                [str(t) for t in _as_list(cfg.get("top"))], outs
            ):
                blobs[t] = o
        return self.params

    def _make_layer_params(self, cfg, ltype, bottoms, key):
        """Filler-driven parameter creation per layer type (filler.hpp fan
        conventions: fan_in = count/num, fan_out = count/channels of the
        Caffe OIHW blob)."""
        from nct_tpu.nn.fillers import fill

        k1, k2 = jax.random.split(key)
        if ltype in ("Convolution", "Deconvolution"):
            cp = cfg.get("convolution_param", {})
            o = int(cp.get("num_output"))
            ksz = int(cp.get("kernel_size", 1))
            g = int(cp.get("group", 1))
            cin = bottoms[0].shape[-1]
            if ltype == "Convolution":
                shape = (ksz, ksz, cin // g, o)
                fan_in, fan_out = (cin // g) * ksz * ksz, o * ksz * ksz
            else:
                shape = (ksz, ksz, cin, o // g)
                fan_in, fan_out = (o // g) * ksz * ksz, cin * ksz * ksz
            entry = {"w": fill(k1, cp.get("weight_filler"), shape,
                               fan_in, fan_out)}
            if cp.get("bias_term", True) not in (False, "false"):
                entry["b"] = fill(k2, cp.get("bias_filler"), (o,))
            return entry
        if ltype == "InnerProduct":
            ipp = cfg.get("inner_product_param", {})
            o = int(ipp.get("num_output"))
            cin = 1
            for d in bottoms[0].shape[1:]:
                cin *= d
            entry = {"w": fill(k1, ipp.get("weight_filler"), (cin, o),
                               cin, o)}
            if ipp.get("bias_term", True) not in (False, "false"):
                entry["b"] = fill(k2, ipp.get("bias_filler"), (o,))
            return entry
        if ltype == "PReLU":
            pp = cfg.get("prelu_param", {})
            c = (1 if pp.get("channel_shared") in (True, "true")
                 else bottoms[0].shape[-1])
            spec = pp.get("filler") or {"type": "constant", "value": 0.25}
            return {"w": fill(k1, spec, (c,))}
        if ltype == "Scale":
            sp = cfg.get("scale_param", {})
            c = bottoms[0].shape[-1]
            spec = sp.get("filler") or {"type": "constant", "value": 1.0}
            entry = {"w": fill(k1, spec, (c,))}
            if sp.get("bias_term") in (True, "true"):
                entry["b"] = fill(k2, sp.get("bias_filler"), (c,))
            return entry
        if ltype == "Bias":
            c = bottoms[0].shape[-1]
            spec = cfg.get("bias_param", {}).get("filler")
            return {"b": fill(k1, spec, (c,))}
        if ltype == "BatchNorm":
            c = bottoms[0].shape[-1]
            return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
                    "scale_factor": jnp.ones(())}
        if ltype == "Parameter":
            pp = cfg.get("parameter_param", {}) or {}
            shape = pp.get("shape", {})
            dims = shape.get("dim", []) if isinstance(shape, dict) else []
            dims = [int(d) for d in
                    (dims if isinstance(dims, list) else [dims])]
            return {"w": fill(k1, pp.get("filler"), tuple(dims) or (1,))}
        if ltype == "Embed":
            ep = cfg.get("embed_param", {})
            k_dim = int(ep.get("input_dim"))
            n_out = int(ep.get("num_output"))
            entry = {"w": fill(k1, ep.get("weight_filler"), (k_dim, n_out),
                               k_dim, n_out)}
            if ep.get("bias_term", True) not in (False, "false"):
                entry["b"] = fill(k2, ep.get("bias_filler"), (n_out,))
            return entry
        if ltype in ("RNN", "LSTM"):
            rp = cfg.get("recurrent_param", {})
            h = int(rp.get("num_output"))
            gates = 4 * h if ltype == "LSTM" else h
            d = 1
            for s in bottoms[0].shape[2:]:
                d *= s
            wf, bf = rp.get("weight_filler"), rp.get("bias_filler")
            k3, k4, k5 = jax.random.split(k2, 3)
            entry = {
                "w_x": fill(k1, wf, (d, gates), d, gates),
                "w_h": fill(k3, wf, (h, gates), h, gates),
                "b": fill(k4, bf, (gates,)),
            }
            n_state = 2 if ltype == "LSTM" else 1
            expose = rp.get("expose_hidden") in (True, "true")
            n_extra = len(bottoms) - 2 - (n_state if expose else 0)
            if n_extra > 0:  # x_static bottom present
                e = 1
                for s in bottoms[2].shape[1:]:
                    e *= s
                entry["w_static"] = fill(k5, wf, (e, gates), e, gates)
            if ltype == "RNN":
                k6, k7 = jax.random.split(k5)
                entry["w_o"] = fill(k6, wf, (h, h), h, h)
                entry["b_o"] = fill(k7, bf, (h,))
            return entry
        return {}

    # --- execution --------------------------------------------------------
    def forward(
        self,
        inputs: dict[str, jnp.ndarray],
        output_blobs: Sequence[str] | None = None,
        params: dict | None = None,
        rng: jnp.ndarray | None = None,
    ) -> dict[str, jnp.ndarray]:
        """Run the DAG; returns requested blobs (default: all).

        One traced program; under jit this fuses exactly like the
        hand-written VGG path.  ``params`` overrides the net's stored
        parameters (the functional form jax.grad differentiates through);
        ``rng`` enables TRAIN-phase stochastic layers (Dropout) — each such
        layer gets a key folded from its layer index.
        """
        store = self.params if params is None else params
        blobs: dict[str, jnp.ndarray] = dict(inputs)
        wanted = set(output_blobs) if output_blobs else None
        produced_after = None
        if wanted is not None:
            # last layer index that produces a wanted blob (ForwardFromTo end)
            for i, cfg in enumerate(self.layers):
                if wanted & set(map(str, _as_list(cfg.get("top")))):
                    produced_after = i
        for i, cfg in enumerate(self.layers):
            if produced_after is not None and i > produced_after:
                break
            ltype = str(cfg.get("type"))
            if ltype == "Input":
                continue
            fn = LAYER_REGISTRY.get(ltype)
            if fn is None:
                raise NotImplementedError(
                    f"layer type {ltype!r} not registered"
                )
            name = str(cfg.get("name"))
            bottoms = [blobs[str(b)] for b in _as_list(cfg.get("bottom"))]
            tops = [str(t) for t in _as_list(cfg.get("top"))]
            lparams = store.get(name, {})
            if rng is not None and ltype == "Dropout" and self.phase == "TRAIN":
                lparams = dict(lparams, __rng__=jax.random.fold_in(rng, i))
            out = fn(lparams, cfg, *bottoms)
            outs = out if isinstance(out, (tuple, list)) else [out]
            for t, o in zip(tops, outs):
                blobs[t] = o
        if wanted is None:
            return blobs
        return {k: blobs[k] for k in wanted}

    # --- training surface (ref net.cpp AppendTop loss_weight logic) -------
    def loss_tops(self) -> list[tuple[str, float]]:
        """(top blob, weight) for every loss-contributing layer: layers of
        *Loss type get an implicit weight of 1, any layer can opt in via
        ``loss_weight`` (net.cpp:AppendTop)."""
        out = []
        for cfg in self.layers:
            ltype = str(cfg.get("type"))
            tops = [str(t) for t in _as_list(cfg.get("top"))]
            weights = _as_list(cfg.get("loss_weight"))
            for j, t in enumerate(tops):
                if j < len(weights):
                    w = float(weights[j])
                elif is_loss_type(ltype) and j == 0:
                    w = 1.0
                else:
                    w = 0.0
                if w:
                    out.append((t, w))
        return out

    def make_loss_fn(self):
        """loss_fn(params, batch) for train.Solver: runs the DAG with the
        given params, feeding ``batch`` (a dict) as input blobs, and sums
        the weighted loss tops — the role of Net::ForwardBackward."""
        tops = self.loss_tops()
        if not tops:
            raise ValueError("net has no loss layers")
        names = tuple(t for t, _ in tops)

        def loss_fn(params, batch):
            rng = None
            if isinstance(batch, dict) and "__rng__" in batch:
                batch = dict(batch)
                rng = batch.pop("__rng__")
            blobs = self.forward(batch, names, params=params, rng=rng)
            total = 0.0
            for t, w in tops:
                total = total + w * jnp.sum(blobs[t])
            return total

        return loss_fn

    def forward_jit(self, output_blobs: tuple[str, ...] | None = None):
        """Jitted closure over current params (recreate after set_params)."""
        @functools.partial(jax.jit)
        def run(inputs):
            return self.forward(inputs, output_blobs)
        return run

    def blob_names(self) -> list[str]:
        names = set(self.inputs)
        for cfg in self.layers:
            names.update(map(str, _as_list(cfg.get("top"))))
        return sorted(names)
