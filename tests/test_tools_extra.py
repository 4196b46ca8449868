"""Dataset tooling + training observability (reference tools/ and
tools/extra/): compute_image_mean, convert_imageset, parse_log, and the
solver's test_interval evaluation (solver.cpp TestAll)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))

DEMO = "/root/reference/demo/example/"

TEST_SOLVER = """
net_param {
  name: "linreg"
  layer { name: "data" type: "DummyData" top: "x" top: "y"
    dummy_data_param {
      shape { dim: 8 dim: 3 }
      shape { dim: 8 dim: 1 }
      data_filler { type: "gaussian" std: 1.0 }
      data_filler { type: "constant" value: 1.0 } } }
  layer { name: "fc" type: "InnerProduct" bottom: "x" top: "pred"
    inner_product_param { num_output: 1
      weight_filler { type: "gaussian" std: 0.3 } } }
  layer { name: "loss" type: "EuclideanLoss" bottom: "pred" bottom: "y"
    top: "loss" }
}
base_lr: 0.1
lr_policy: "step"
stepsize: 4
gamma: 0.5
type: "SGD"
max_iter: 8
display: 2
test_interval: 4
test_iter: 2
random_seed: 3
"""


def test_net_solver_test_interval_prints_and_scores(capsys):
    from nct_tpu.train.solver_proto import NetSolver

    ns = NetSolver(TEST_SOLVER)
    assert ns.test_net is not None
    ns.solve()
    cap = capsys.readouterr()
    out = cap.out + cap.err      # training lines log through glog (stderr)
    # test_initialization eval at iter 0 plus every 4 iters
    assert out.count("Testing net (#0)") == 3, out
    assert "Test net output #0: loss =" in out
    assert "Iteration 2, loss =" in out
    assert "Iteration 2, lr =" in out
    scores = ns.test()
    assert set(scores) == {"loss"} and np.isfinite(scores["loss"])


def test_parse_log_extracts_train_and_test_tables(tmp_path, capsys):
    from nct_tpu.train.solver_proto import NetSolver

    import parse_log

    ns = NetSolver(TEST_SOLVER)
    ns.solve()
    log = tmp_path / "train.log"
    cap = capsys.readouterr()
    log.write_text(cap.out + cap.err)   # glog lines land on stderr
    train_rows, test_rows = parse_log.parse_log(str(log))
    iters = [r["NumIters"] for r in train_rows]
    assert iters == [2, 4, 6, 8]
    assert all(np.isfinite(r["loss"]) for r in train_rows)
    # step policy: lr halves at iter 4 (base 0.1, stepsize 4, gamma 0.5)
    by_iter = {r["NumIters"]: r for r in train_rows}
    assert by_iter[2]["LearningRate"] == pytest.approx(0.1)
    assert by_iter[6]["LearningRate"] == pytest.approx(0.05)
    assert [r["NumIters"] for r in test_rows] == [0, 4, 8]
    assert all("loss" in r for r in test_rows)
    # CSV writer end-to-end
    assert parse_log.main([str(log), str(tmp_path)]) == 0
    header = (tmp_path / "train.log.train").read_text().splitlines()[0]
    assert header == "NumIters,LearningRate,loss"


def test_compute_image_mean_matches_manual(tmp_path):
    import compute_image_mean

    from nct_tpu.data.image_data import _imread_bgr

    lst = tmp_path / "list.txt"
    lst.write_text("in/in0.png 0\nin/tar0.png 1\n")
    mean = compute_image_mean.mean_from_image_list(
        str(lst), DEMO, new_h=16, new_w=16)
    a = _imread_bgr(DEMO + "in/in0.png", 16, 16).astype(np.float64)
    b = _imread_bgr(DEMO + "in/tar0.png", 16, 16).astype(np.float64)
    np.testing.assert_allclose(mean, ((a + b) / 2).astype(np.float32))

    out = tmp_path / "mean.npz"
    rc = compute_image_mean.main([
        str(lst), str(out), "--root-folder", DEMO,
        "--new-height", "16", "--new-width", "16"])
    assert rc == 0 and out.exists()

    # DataTransformer mean_file consumes it (crop offsets match the image)
    from nct_tpu.data.image_data import DataTransformer

    tr = DataTransformer(
        {"mean_file": str(out), "crop_size": 8}, phase="TEST")
    img = _imread_bgr(DEMO + "in/in0.png", 16, 16)
    got = tr(img)
    np.testing.assert_allclose(
        got, img[4:12, 4:12].astype(np.float32) - mean[4:12, 4:12],
        rtol=1e-6)

    with pytest.raises(ValueError):
        DataTransformer({"mean_file": str(out), "mean_value": [1.0]})


def test_convert_imageset_roundtrip_through_hdf5_source(tmp_path):
    h5py = pytest.importorskip("h5py")
    del h5py

    import convert_imageset

    from nct_tpu.data.hdf5_data import HDF5DataSource

    lst = tmp_path / "list.txt"
    lst.write_text("in/in0.png 0\nin/tar0.png 1\nin/in1.png 2\n")
    outdir = tmp_path / "ds"
    source = convert_imageset.convert(
        str(lst), str(outdir), root=DEMO, new_h=12, new_w=12,
        shard_size=2)
    # 3 entries at shard_size 2 -> 2 shards
    shards = (tmp_path / "ds" / "source.txt").read_text().split()
    assert len(shards) == 2

    cfg = {
        "top": ["data", "label"],
        "hdf5_data_param": {"source": source, "batch_size": 4},
    }
    src = HDF5DataSource(cfg, phase="TEST")
    data, label = src.next_batch()
    assert data.shape == (4, 12, 12, 3)       # NCHW on disk -> NHWC out
    np.testing.assert_allclose(label[:3], [0.0, 1.0, 2.0])

    from nct_tpu.data.image_data import _imread_bgr

    want = _imread_bgr(DEMO + "in/in0.png", 12, 12).astype(np.float32)
    np.testing.assert_allclose(data[0], want)


VGG_PROTOTXT = ("/root/reference/demo/model/vgg19/"
                "VGG_ILSVRC_19_layers_deploy.prototxt")


def test_draw_net_dot_and_text(tmp_path):
    """draw_net (reference python/caffe/draw.py analogue): the DOT graph
    must chain in-place rebinds so consumers read post-ReLU values, and the
    text table lists the execution order."""
    import draw_net

    from nct_tpu.nn.net import Net

    net = Net(VGG_PROTOTXT)
    dot = draw_net.to_dot(net)
    # conv1_2 consumes the post-relu1_1 value of blob conv1_1, never the raw
    # conv output (in-place rebind semantics, net.py module docstring)
    assert '"blob_conv1_1@relu1_1" -> "layer_conv1_2";' in dot
    assert '"blob_conv1_1" -> "layer_conv1_2";' not in dot
    assert dot.count("shape=box") == len(net.layers)

    text = draw_net.to_text(net)
    first_rows = [l.split()[0] for l in text.splitlines()[1:4]]
    assert first_rows == ["conv1_1", "relu1_1", "conv1_2"]
    assert "n64 k3 s1 p1" in text

    # CLI writes a file
    out = tmp_path / "net.dot"
    draw_net.main([VGG_PROTOTXT, str(out)])
    assert out.read_text().startswith("digraph")
