"""Data pipeline tests on synthetic fixtures."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.data import (
    SimColDataModule, C3VDDataModule, CombinedDataModule, PoseDataModule,
)
from e3d_tpu.data.preprocess import DevicePreprocessor
from e3d_tpu.data.synthetic import make_simcol_fixture, make_c3vd_fixture
from e3d_tpu.ops.augment import AugmentConfig


@pytest.fixture(scope="module")
def simcol_root(tmp_path_factory):
    return make_simcol_fixture(str(tmp_path_factory.mktemp("simcol")),
                               n_procedures=2, frames_per_proc=6, hw=64)


@pytest.fixture(scope="module")
def c3vd_root(tmp_path_factory):
    return make_c3vd_fixture(str(tmp_path_factory.mktemp("c3vd")),
                             n_scenes=1, frames=4, hw=64)


def _lists(root):
    return dict(train_list=f"{root}/train.txt", val_list=f"{root}/val.txt",
                test_list=f"{root}/test.txt")


def test_simcol_pipeline(simcol_root):
    dm = SimColDataModule(simcol_root, **_lists(simcol_root), batch_size=4,
                          num_workers=2, size=56)
    dm.setup()
    assert len(dm.train_dataset) == 6
    batches = list(dm.train_loader())
    assert len(batches) == 1  # 6 samples, bs 4, drop_last
    b = batches[0]
    assert b["image"].shape == (4, 64, 64, 3) and b["image"].dtype == np.uint8
    assert b["depth"].shape == (4, 64, 64) and b["depth"].dtype == np.uint16

    pre = DevicePreprocessor(size=56, augment_cfg=AugmentConfig())
    out = pre(b, train=True, rng=jax.random.PRNGKey(0))
    assert out["image"].shape == (4, 56, 56, 3)
    assert out["depth"].shape == (4, 56, 56, 1)
    assert np.isfinite(np.asarray(out["image"])).all()
    dep = np.asarray(out["depth"])
    assert dep.min() >= -0.2 and dep.max() <= 1.2  # ~[0,1] after resize

    out_eval = pre(b, train=False)
    assert out_eval["image"].shape == (4, 56, 56, 3)


def test_c3vd_pipeline(c3vd_root):
    dm = C3VDDataModule(c3vd_root, **_lists(c3vd_root), batch_size=2,
                        num_workers=2, size=56)
    dm.setup()
    assert len(dm.train_dataset) == 4
    b = next(iter(dm.val_loader()))
    assert b["image"].dtype == np.uint8
    assert b["depth"].dtype == np.uint16


def test_combined_pipeline(simcol_root, c3vd_root):
    dm = CombinedDataModule(
        simcol_data_dir=simcol_root,
        simcol_train_list=f"{simcol_root}/train.txt",
        simcol_val_list=f"{simcol_root}/val.txt",
        simcol_test_list=f"{simcol_root}/test.txt",
        c3vd_data_dir=c3vd_root,
        c3vd_train_list=f"{c3vd_root}/train.txt",
        c3vd_val_list=f"{c3vd_root}/val.txt",
        batch_size=10, num_workers=2, size=56)
    dm.setup("fit")
    assert len(dm.train_dataset) == 10  # 6 simcol + 4 c3vd
    loader = iter(dm.train_loader())
    b = next(loader)
    assert b["image"].shape == (10, 56, 56, 3)
    assert b["image"].dtype == np.float32  # host-resized
    assert set(np.unique(b["source"])) <= {0, 1}

    pre = DevicePreprocessor(size=56)
    out = pre(b, train=True, rng=jax.random.PRNGKey(0),
              max_depths=(20.0, 10.0))
    md = np.asarray(out["max_depth"])
    src = np.asarray(b["source"])
    assert (md[src == 0] == 20.0).all()
    assert (md[src == 1] == 10.0).all()


def test_pose_pipeline(simcol_root):
    dm = PoseDataModule(simcol_root, **_lists(simcol_root), batch_size=4,
                        num_workers=2, size=56)
    dm.setup("fit")
    # 1 train procedure x 6 frames -> 5 pairs
    assert len(dm.train_dataset) == 5
    b = next(iter(dm.train_loader()))
    assert b["input"].shape == (4, 56, 56, 8)
    t = b["target"]
    assert t.shape == (4, 7)
    np.testing.assert_allclose(np.linalg.norm(t[:, :3], axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t[:, 3:], axis=1), 1.0,
                               atol=1e-5)


def test_pose_relative_matches_jax(simcol_root):
    """Host relative-pose == ops.quaternion.relative_pose."""
    from e3d_tpu.data.pose import relative_pose_np
    from e3d_tpu.ops import quaternion as quat

    rng = np.random.default_rng(1)
    p1, p2 = rng.normal(size=(2, 3)).astype(np.float32)
    q1, q2 = rng.normal(size=(2, 4)).astype(np.float32)
    q1 /= np.linalg.norm(q1)
    q2 /= np.linalg.norm(q2)
    host = relative_pose_np(p1, q1, p2, q2)
    dev = np.asarray(quat.relative_pose(jnp.asarray(p1), jnp.asarray(q1),
                                        jnp.asarray(p2), jnp.asarray(q2)))
    np.testing.assert_allclose(host, dev, atol=1e-6)
