"""Proto upgrade shims (upgrade_proto.cpp analogue; mirrors the
reference's test_upgrade_proto.cpp): V0 nested-layer nets, V1 `layers` +
enum types, the data transform split, input->Input conversion, and the
solver_type enum — all must load transparently through Net / the solver
parser."""

import numpy as np
import jax.numpy as jnp

from nct_tpu.nn import Net
from nct_tpu.nn.upgrade import (
    net_needs_v0_upgrade, net_needs_v1_upgrade, upgrade_net,
    upgrade_net_input, upgrade_solver,
)
from nct_tpu.nn.prototxt import parse_prototxt


V0_NET = """
name: "v0net"
input: "data"
layers {
  layer { name: "c1" type: "conv" num_output: 4 kernelsize: 3 pad: 1
          stride: 1 weight_filler { type: "gaussian" std: 0.1 }
          blobs_lr: 1 blobs_lr: 2 }
  bottom: "data" top: "c1"
}
layers {
  layer { name: "r1" type: "relu" }
  bottom: "c1" top: "c1"
}
layers {
  layer { name: "p1" type: "pool" kernelsize: 2 stride: 2 pool: MAX }
  bottom: "c1" top: "p1"
}
layers {
  layer { name: "fc" type: "innerproduct" num_output: 3
          weight_filler { type: "xavier" } }
  bottom: "p1" top: "fc"
}
"""

V1_NET = """
name: "v1net"
input: "data"
layers { name: "c1" type: CONVOLUTION bottom: "data" top: "c1"
  blobs_lr: 1 blobs_lr: 2 weight_decay: 1 weight_decay: 0
  convolution_param { num_output: 4 kernel_size: 3 pad: 1 } }
layers { name: "r1" type: RELU bottom: "c1" top: "c1" }
layers { name: "s1" type: SOFTMAX_LOSS bottom: "c1" bottom: "label"
  top: "loss" }
"""


def test_v0_upgrade_shapes_layer_params():
    msg = parse_prototxt(V0_NET)
    assert net_needs_v0_upgrade(msg)
    up = upgrade_net(msg)
    layers = up["layer"]
    assert [l["type"] for l in layers] == [
        "Convolution", "ReLU", "Pooling", "InnerProduct"]
    assert layers[0]["convolution_param"]["kernel_size"] == 3
    assert layers[0]["convolution_param"]["num_output"] == 4
    assert layers[0]["param"] == [{"lr_mult": 1.0}, {"lr_mult": 2.0}]
    assert layers[2]["pooling_param"]["pool"] == "MAX"
    assert layers[3]["inner_product_param"]["num_output"] == 3


def test_v0_net_forwards_through_net(rng):
    net = Net(V0_NET)
    assert [str(c["type"]) for c in net.layers] == [
        "Convolution", "ReLU", "Pooling", "InnerProduct"]
    net.init_params({"data": (1, 8, 8, 3)})
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    out = net.forward({"data": x})["fc"]
    assert out.shape == (1, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_v1_upgrade_and_forward(rng):
    msg = parse_prototxt(V1_NET)
    assert net_needs_v1_upgrade(msg)
    up = upgrade_net(msg)
    assert "layers" not in up
    assert [l["type"] for l in up["layer"]] == [
        "Convolution", "ReLU", "SoftmaxWithLoss"]
    assert up["layer"][0]["param"] == [
        {"lr_mult": 1.0, "decay_mult": 1.0},
        {"lr_mult": 2.0, "decay_mult": 0.0},
    ]
    net = Net(V1_NET)
    net.init_params({"data": (2, 4, 4, 3), "label": (2, 4, 4)})
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    lab = jnp.zeros((2, 4, 4), jnp.int32)  # per-pixel labels (inner_num)
    loss = net.forward({"data": x, "label": lab})["loss"]
    assert np.isfinite(float(loss))


def test_data_transform_split():
    msg = parse_prototxt("""
    layer { name: "d" type: "Data" top: "data" top: "label"
      data_param { source: "x.ncr" batch_size: 2 scale: 0.5
                   crop_size: 8 mirror: true } }
    """)
    up = upgrade_net(msg)
    layer = up["layer"][0]
    assert "scale" not in layer["data_param"]
    assert layer["transform_param"]["scale"] == 0.5
    assert layer["transform_param"]["crop_size"] == 8
    assert layer["data_param"]["batch_size"] == 2


def test_input_to_input_layer():
    msg = parse_prototxt("""
    input: "data"
    input_dim: 1 input_dim: 3 input_dim: 8 input_dim: 8
    layer { name: "r" type: "ReLU" bottom: "data" top: "o" }
    """)
    up = upgrade_net_input(msg)
    assert up["layer"][0]["type"] == "Input"
    assert up["layer"][0]["top"] == ["data"]
    assert up["layer"][0]["input_param"]["shape"][0]["dim"] == [1, 3, 8, 8]
    assert "input" not in up


def test_solver_type_upgrade():
    assert upgrade_solver({"solver_type": "ADAM"})["type"] == "Adam"
    assert upgrade_solver({"solver_type": 3})["type"] == "RMSProp"
    # idempotent on modern messages
    assert upgrade_solver({"type": "Nesterov"})["type"] == "Nesterov"


def test_solver_prototxt_with_legacy_enum():
    from nct_tpu.train.solver_proto import parse_solver_prototxt

    sp = parse_solver_prototxt("""
net_param { name: "n"
  layer { name: "d" type: "DummyData" top: "x"
    dummy_data_param { shape { dim: 2 dim: 3 }
      data_filler { type: "gaussian" std: 1.0 } } }
  layer { name: "l" type: "Reduction" bottom: "x" top: "loss"
    reduction_param { operation: SUMSQ } loss_weight: 1.0 } }
base_lr: 0.01
solver_type: NESTEROV
""")
    assert sp.solver_params.opt.solver_type == "nesterov"


def test_upgrade_tool_roundtrip(tmp_path):
    import subprocess
    import sys

    src = tmp_path / "v1.prototxt"
    src.write_text(V1_NET)
    dst = tmp_path / "v2.prototxt"
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/upgrade_proto.py", "net",
         str(src), str(dst), "--convert-inputs"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    up = parse_prototxt(dst.read_text())
    assert up["layer"][0]["type"] == "Input"
    assert [l["type"] for l in up["layer"][1:]] == [
        "Convolution", "ReLU", "SoftmaxWithLoss"]
