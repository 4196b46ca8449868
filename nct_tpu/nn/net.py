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
from nct_tpu.nn.prototxt import load_prototxt, parse_prototxt


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


class Net:
    """Inference net over NHWC blobs."""

    def __init__(self, prototxt: str | dict, phase: str = "TEST"):
        if isinstance(prototxt, str):
            if "\n" in prototxt or "{" in prototxt:
                net_param = parse_prototxt(prototxt)
            else:
                net_param = load_prototxt(prototxt)
        else:
            net_param = prototxt
        self.name = net_param.get("name", "net")
        self.inputs = [str(i) for i in _as_list(net_param.get("input"))]
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

    # --- execution --------------------------------------------------------
    def forward(
        self,
        inputs: dict[str, jnp.ndarray],
        output_blobs: Sequence[str] | None = None,
    ) -> dict[str, jnp.ndarray]:
        """Run the DAG; returns requested blobs (default: all).

        One traced program; under jit this fuses exactly like the
        hand-written VGG path.
        """
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
            out = fn(self.params.get(name, {}), cfg, *bottoms)
            outs = out if isinstance(out, (tuple, list)) else [out]
            for t, o in zip(tops, outs):
                blobs[t] = o
        if wanted is None:
            return blobs
        return {k: blobs[k] for k in wanted}

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
