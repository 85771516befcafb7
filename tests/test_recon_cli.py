"""Reconstruction CLI flows on the synthetic fixture (in-suite coverage of
cli.pointcloud and cli.pointcloud_model)."""

import glob
import os
import shutil

import numpy as np
import pytest

import e3d_tpu  # noqa: F401
from e3d_tpu.data.synthetic import make_simcol_fixture
from e3d_tpu.recon import read_ply


@pytest.fixture(scope="module")
def simcol_with_op(tmp_path_factory):
    root = make_simcol_fixture(str(tmp_path_factory.mktemp("sc")),
                               n_procedures=1, frames_per_proc=4, hw=48)
    for frames in glob.glob(os.path.join(root, "SyntheticColon_I",
                                         "Frames_S*")):
        op = frames + "_OP"
        os.makedirs(op, exist_ok=True)
        for d in glob.glob(os.path.join(frames, "Depth_*.png")):
            shutil.copy(d, os.path.join(
                op, os.path.basename(d).replace("Depth", "FrameBuffer")))
    return root


def test_pointcloud_cli(simcol_with_op, tmp_path):
    from e3d_tpu.cli import pointcloud

    out = str(tmp_path / "recon")
    pointcloud.main(["-i", simcol_with_op, "-o", out,
                     "--mesh-depth", "5", "--voxel-size", "0.005"])
    pc = read_ply(os.path.join(out, "combined_point_cloud.ply"))
    assert len(pc["points"]) > 50
    assert "colors" in pc
    mesh_path = os.path.join(out, "combined_mesh.ply")
    if os.path.exists(mesh_path):  # random depths may produce empty meshes
        mesh = read_ply(mesh_path)
        if len(mesh["points"]):
            assert mesh["triangles"].max() < len(mesh["points"])


def test_pointcloud_model_cli(simcol_with_op, tmp_path):
    from e3d_tpu.cli import pointcloud_model

    out = str(tmp_path / "frames")
    pointcloud_model.main(["--encoder", "vitt", "-i", simcol_with_op,
                           "-o", out, "--input-size", "42",
                           "--max-frames", "1"])
    plys = glob.glob(os.path.join(out, "*.ply"))
    assert len(plys) == 1
    pc = read_ply(plys[0])
    assert pc["points"].shape[1] == 3
    assert np.isfinite(pc["points"]).all()
