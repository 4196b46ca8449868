"""Tests: visualization, profiling, bucketing, warm-start sequence API."""

import numpy as np
import jax
import jax.numpy as jnp

from nct_tpu.config import Config
from nct_tpu.models import vgg19
from nct_tpu.parallel.bucket import bucket_dims, group_pairs, pad_to
from nct_tpu.pipeline import transfer_pair, transfer_sequence
from nct_tpu.utils.profiling import StageTimer
from nct_tpu.utils.vis import (
    cluster_image,
    coefficient_images,
    flow_image,
    heat_image,
)


def test_flow_image_encoding():
    nnf = jnp.asarray([[[10, 20]]], jnp.int32)  # x=10, y=20
    img = np.asarray(flow_image(nnf, bh=40, bw=20))
    assert img[0, 0, 0] == int(255 * 10 / 20)   # B from x
    assert img[0, 0, 1] == 0
    assert img[0, 0, 2] == int(255 * 20 / 40)   # R from y


def test_heat_image_endpoints():
    img = np.asarray(heat_image(jnp.asarray([[0.0, 1.0]])))
    # v=0: blue-ish (db=0.504), no red/green
    assert img[0, 0, 0] == int(255 * 0.504)
    assert img[0, 0, 1] == 0 and img[0, 0, 2] == 0
    # v=1: red-ish (dr=0.504), no blue/green
    assert img[0, 1, 2] == int(255 * 0.504)
    assert img[0, 1, 0] == 0 and img[0, 1, 1] == 0


def test_cluster_image_first_colors():
    img = np.asarray(cluster_image(jnp.asarray([[0, 1, 2]], jnp.int32)))
    # Reference unpack: r = val%256, g = (val>>8)%256, b = (val>>16)%256,
    # stored as Vec3b(r, g, b) — i.e. channel0 = r (ColorTransfer.cpp:231-242).
    np.testing.assert_array_equal(img[0, 0], [0, 0, 255])   # 0xFF0000
    np.testing.assert_array_equal(img[0, 1], [0, 255, 0])   # 0x00FF00
    np.testing.assert_array_equal(img[0, 2], [255, 0, 0])   # 0x0000FF


def test_coefficient_images_ranges():
    a, b = coefficient_images(jnp.asarray([[2.0]]), jnp.asarray([[0.0]]))
    assert np.asarray(a)[0, 0] == 100
    assert np.asarray(b)[0, 0] == 127


def test_stage_timer():
    t = StageTimer()
    with t.stage("Patch Match"):
        _ = jnp.ones((4, 4)) * 2
    out = t.timed("Nonlocal Solve", lambda: jnp.zeros(3))
    assert out.shape == (3,)
    rep = t.report()
    assert "Patch Match Time" in rep and "**Finished Time" in rep


def test_bucket_dims_and_grouping(rng):
    assert bucket_dims(452, 680) == (512, 704)
    items = [
        (rng.integers(0, 255, (100, 120, 3)).astype(np.uint8),
         rng.integers(0, 255, (90, 110, 3)).astype(np.uint8), 2.0),
        (rng.integers(0, 255, (110, 100, 3)).astype(np.uint8),
         rng.integers(0, 255, (80, 100, 3)).astype(np.uint8), 2.0),
    ]
    buckets = group_pairs(items, quantum=64)
    # both content dims round to (128, 128), style to (128, 128) -> one bucket
    assert len(buckets) == 1
    (key, members), = buckets.items()
    assert key.cnt_hw == (128, 128)
    assert members[0][1].shape == (128, 128, 3)
    assert members[0][3] == (100, 120)


def test_pad_to_edge_replicates():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    out = pad_to(img, 3, 4)
    np.testing.assert_array_equal(out[2], out[1])
    np.testing.assert_array_equal(out[:, 3], out[:, 2])


def test_transfer_sequence_warm_start():
    rng = np.random.default_rng(5)
    frames = [
        rng.integers(0, 256, (36, 40, 3)).astype(np.uint8) for _ in range(2)
    ]
    stl = rng.integers(0, 256, (36, 40, 3)).astype(np.uint8)
    params = vgg19.init_params()
    config = Config(
        pm_iters=1, cg_iters=4, cg_iters_final=4, wls_cg_iters=4,
        kmeans_iters=2,
    )
    outs = list(
        transfer_sequence(params, frames, stl, 2.0, config,
                          key=jax.random.PRNGKey(0))
    )
    assert len(outs) == 2
    for o in outs:
        assert np.asarray(o).shape == (36, 40, 3)
