"""HDF5 data layer + HDF5 snapshot format (hdf5_data_layer.cpp,
solver.cpp SnapshotToHDF5/RestoreSolverStateFromHDF5)."""

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from nct_tpu.data.hdf5_data import HDF5DataSource
from nct_tpu.train.lr_policies import LrPolicy
from nct_tpu.train.optimizers import OptimizerParams
from nct_tpu.train.solver import Solver, SolverParams


def _write_h5(path, n, seed, h=4, w=4, c=2):
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        # Caffe layout: N x C x H x W
        f.create_dataset(
            "data", data=rng.standard_normal((n, c, h, w)).astype(np.float32)
        )
        f.create_dataset(
            "label", data=rng.integers(0, 2, (n,)).astype(np.float32)
        )


def _source(tmp_path, files, batch_size, shuffle=False, seed=0):
    lst = tmp_path / "h5list.txt"
    lst.write_text("\n".join(str(p) for p in files) + "\n")
    cfg = {
        "top": ["data", "label"],
        "hdf5_data_param": {
            "source": str(lst),
            "batch_size": batch_size,
            "shuffle": shuffle,
        },
    }
    return HDF5DataSource(cfg, seed=seed)


def test_hdf5_source_layout_and_wraparound(tmp_path):
    f1 = tmp_path / "a.h5"
    _write_h5(f1, n=3, seed=0)
    src = _source(tmp_path, [f1], batch_size=2)
    data, label = src.next_batch()
    # NCHW -> NHWC transpose on load
    assert data.shape == (2, 4, 4, 2)
    assert label.shape == (2,)
    with h5py.File(f1, "r") as f:
        want = np.asarray(f["data"][:2]).transpose(0, 2, 3, 1)
        lbl = np.asarray(f["label"])
    np.testing.assert_allclose(data, want)
    # batch 2 of 3 rows: second batch wraps to row 0
    data2, label2 = src.next_batch()
    np.testing.assert_allclose(label2, [lbl[2], lbl[0]])


def test_hdf5_source_multiple_files_cover_all_rows(tmp_path):
    f1, f2 = tmp_path / "a.h5", tmp_path / "b.h5"
    _write_h5(f1, n=2, seed=1)
    _write_h5(f2, n=3, seed=2)
    src = _source(tmp_path, [f1, f2], batch_size=5, shuffle=True, seed=7)
    _, label = src.next_batch()
    with h5py.File(f1, "r") as a, h5py.File(f2, "r") as b:
        want = sorted(
            np.concatenate([a["label"][:], b["label"][:]]).tolist()
        )
    # shuffled, but one full epoch covers every row exactly once
    assert sorted(label.tolist()) == want


def test_hdf5_source_row_count_mismatch(tmp_path):
    f1 = tmp_path / "bad.h5"
    with h5py.File(f1, "w") as f:
        f.create_dataset("data", data=np.zeros((3, 2), np.float32))
        f.create_dataset("label", data=np.zeros((2,), np.float32))
    with pytest.raises(ValueError, match="rows"):
        _source(tmp_path, [f1], batch_size=1)


def test_net_solver_trains_from_hdf5_layer(tmp_path):
    f1 = tmp_path / "train.h5"
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 2, 4, 4)).astype(np.float32)
    y = (x.mean(axis=(1, 2, 3)) > 0).astype(np.float32)
    with h5py.File(f1, "w") as f:
        f.create_dataset("data", data=x)
        f.create_dataset("label", data=y)
    lst = tmp_path / "h5list.txt"
    lst.write_text(f"{f1}\n")
    solver_text = f"""
net_param {{
  name: "h5net"
  layer {{ name: "data" type: "HDF5Data" top: "data" top: "label"
    hdf5_data_param {{ source: "{lst}" batch_size: 8 }} }}
  layer {{ name: "fc" type: "InnerProduct" bottom: "data" top: "score"
    inner_product_param {{ num_output: 2
      weight_filler {{ type: "xavier" }} }} }}
  layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "score"
    bottom: "label" top: "loss" }}
}}
base_lr: 0.1
lr_policy: "fixed"
momentum: 0.9
max_iter: 60
random_seed: 3
"""
    from nct_tpu.train.solver_proto import NetSolver

    ns = NetSolver(solver_text)
    loss = ns.solve()
    assert loss < 0.2, loss


def test_hdf5_snapshot_restore_equivalence(tmp_path):
    def loss_fn(params, batch):
        return jnp.sum((params["w"] - batch) ** 2)

    batches = [jnp.full(3, float(i % 5)) for i in range(20)]
    mk = lambda: Solver(  # noqa: E731
        loss_fn, {"w": jnp.zeros(3)},
        SolverParams(lr=LrPolicy("fixed", base_lr=0.1),
                     opt=OptimizerParams("adam"), max_iter=100,
                     snapshot_format="hdf5",
                     snapshot_prefix=str(tmp_path / "snap")),
    )
    s1 = mk()
    for b in batches:
        s1.step(b)
    s2 = mk()
    for b in batches[:10]:
        s2.step(b)
    path = s2.snapshot()
    assert path.endswith(".h5")
    s3 = mk()
    s3.restore(path)
    assert s3.iter == 10
    for b in batches[10:]:
        s3.step(b)
    np.testing.assert_allclose(
        np.asarray(s1.params["w"]), np.asarray(s3.params["w"]), rtol=1e-6
    )


def test_solver_proto_parses_snapshot_format():
    from nct_tpu.train.solver_proto import parse_solver_prototxt

    sp = parse_solver_prototxt(
        'net: "x.prototxt"\nsnapshot_format: HDF5\n'
    )
    assert sp.solver_params.snapshot_format == "hdf5"
