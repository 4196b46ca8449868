#!/usr/bin/env python
"""Net topology renderer: prototxt -> Graphviz DOT or text summary.

Rebuilds the reference's net-drawing tool (code/python/draw_net.py +
code/python/caffe/draw.py:130-244 ``get_pydot_graph``/``draw_net_to_file``)
without the pydot/graphviz dependency: the DOT source is emitted directly
(render it elsewhere with `dot -Tpng`), and a `--format text` mode prints a
topologically ordered layer table — which is also what `Net.forward`
executes, so the listing is the execution order, not just the file order.

Usage:
  python tools/draw_net.py deploy.prototxt net.dot [--rankdir LR]
  python tools/draw_net.py deploy.prototxt -  --format text [--phase TRAIN]
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

from nct_tpu.nn.net import Net


def _layer_detail(cfg: dict) -> str:
    """One-line hyper-parameter note for conv/pool/ip layers (the fields the
    reference surfaces in its node labels, draw.py:46-114)."""
    for key in ("convolution_param", "pooling_param"):
        p = cfg.get(key)
        if isinstance(p, dict):
            k = p.get("kernel_size", p.get("kernel_h", "?"))
            s = p.get("stride", p.get("stride_h", 1))
            pad = p.get("pad", p.get("pad_h", 0))
            parts = [f"k{k}", f"s{s}", f"p{pad}"]
            if "num_output" in p:
                parts.insert(0, f"n{p['num_output']}")
            if key == "pooling_param":
                parts.insert(0, str(p.get("pool", "MAX")))
            return " ".join(str(x) for x in parts)
    p = cfg.get("inner_product_param")
    if isinstance(p, dict) and "num_output" in p:
        return f"n{p['num_output']}"
    return ""


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


# node fill colors by role (original palette; the reference also colors by
# layer type, draw.py:117-127)
_COLORS = {
    "Convolution": "#cde6ff",
    "InnerProduct": "#cde6ff",
    "Pooling": "#ffe4c4",
    "ReLU": "#e6ffe6",
    "Input": "#f0f0f0",
}


def to_dot(net: Net, rankdir: str = "LR") -> str:
    """DOT digraph: box nodes per layer, ellipse nodes per blob."""
    lines = [
        f'digraph "{net.name}" {{',
        f"  rankdir={rankdir};",
        '  node [fontsize=10, fontname="Helvetica"];',
    ]
    # current[blob name] -> node id of its LATEST producer value: in-place
    # layers (Caffe ReLU, top == bottom) rebind the blob, and downstream
    # consumers must read the post-layer value, exactly as Net.forward's
    # dict rebind does
    current: dict[str, str] = {}
    emitted = set()

    def blob_node(node: str, label: str):
        if node not in emitted:
            emitted.add(node)
            lines.append(f'  "blob_{node}" [label="{label}", shape=ellipse];')

    for name in net.inputs:
        current[name] = name
        blob_node(name, name)
    for cfg in net.layers:
        name = str(cfg.get("name", "?"))
        ltype = str(cfg.get("type", "?"))
        detail = _layer_detail(cfg)
        label = f"{name}\\n({ltype})" + (f"\\n{detail}" if detail else "")
        fill = _COLORS.get(ltype, "#ffffff")
        lines.append(
            f'  "layer_{name}" [label="{label}", shape=box, '
            f'style=filled, fillcolor="{fill}"];'
        )
        bottoms = [str(b) for b in _as_list(cfg.get("bottom"))]
        tops = [str(t) for t in _as_list(cfg.get("top"))]
        for b in bottoms:
            src = current.get(b, b)
            blob_node(src, b)
            lines.append(f'  "blob_{src}" -> "layer_{name}";')
        for t in tops:
            node = t if t not in bottoms else f"{t}@{name}"
            current[t] = node
            blob_node(node, t)
            lines.append(f'  "layer_{name}" -> "blob_{node}";')
    lines.append("}")
    return "\n".join(lines) + "\n"


def to_text(net: Net) -> str:
    """Topologically ordered layer table (execution order of Net.forward)."""
    rows = [("LAYER", "TYPE", "BOTTOM -> TOP", "PARAMS")]
    for cfg in net.layers:
        bottoms = ",".join(str(b) for b in _as_list(cfg.get("bottom")))
        tops = ",".join(str(t) for t in _as_list(cfg.get("top")))
        rows.append((
            str(cfg.get("name", "?")), str(cfg.get("type", "?")),
            f"{bottoms or '-'} -> {tops or '-'}", _layer_detail(cfg) or "-",
        ))
    widths = [max(len(r[i]) for r in rows) for i in range(4)]
    return "\n".join(
        "  ".join(c.ljust(w) for c, w in zip(r, widths)) for r in rows
    ) + "\n"


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("prototxt")
    ap.add_argument("output", help="output path, or - for stdout")
    ap.add_argument("--rankdir", default="LR", choices=["LR", "TB", "BT", "RL"])
    ap.add_argument("--format", default="dot", choices=["dot", "text"])
    ap.add_argument("--phase", default="TEST", choices=["TEST", "TRAIN"])
    args = ap.parse_args(argv)

    net = Net(args.prototxt, phase=args.phase)
    out = to_text(net) if args.format == "text" else to_dot(net, args.rankdir)
    if args.output == "-":
        _sys.stdout.write(out)
    else:
        with open(args.output, "w") as f:
            f.write(out)
        print(f"wrote {args.output} ({len(out)} bytes)")


if __name__ == "__main__":
    main()
