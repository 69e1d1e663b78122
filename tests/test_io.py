import numpy as np

from se3_icp_tpu.utils import ply


def test_read_golden_fixture(golden_problem):
    src, tgt, T_gt = golden_problem
    assert src.shape == (4167, 3)
    assert tgt.shape == (4167, 3)
    # GT fixture: R = rot_3d(pi/9, pi/8, -pi/7), t = (1,2,3)
    # (examples/create_and_save_reg_problem.cpp:31-35)
    np.testing.assert_allclose(T_gt[:3, 3], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(T_gt[3], [0, 0, 0, 1])
    # target = T_gt * source (GT text file is truncated to 6 decimals)
    mapped = src @ T_gt[:3, :3].T + T_gt[:3, 3]
    np.testing.assert_allclose(mapped, tgt, atol=1e-5)


def test_read_bunny_with_faces():
    cloud = ply.read_ply("/root/reference/stanford_bunny.ply")
    assert cloud.points.shape == (208353, 3)
    assert np.isfinite(cloud.points).all()


def test_write_read_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3))
    nrm = rng.normal(size=(100, 3))
    p = tmp_path / "c.ply"
    ply.write_ply(p, ply.PointCloud(points=pts, normals=nrm))
    back = ply.read_ply(p)
    np.testing.assert_allclose(back.points, pts)
    np.testing.assert_allclose(back.normals, nrm)
    # float roundtrip
    ply.write_ply(p, pts, dtype="float")
    back32 = ply.read_ply(p)
    np.testing.assert_allclose(back32.points, pts.astype(np.float32))


def test_transform_txt_roundtrip(tmp_path):
    T = ply.read_transform_txt(
        "/root/reference/created_example_reg_problem/transformation_gt.txt")
    assert T.shape == (4, 4)
    p = tmp_path / "t.txt"
    np.savetxt(p, T[:3])  # 3x4 form
    T2 = ply.read_transform_txt(p)
    np.testing.assert_allclose(T2, T, atol=1e-12)


def test_trajectory_12col_roundtrip(tmp_path, rng):
    mats = np.tile(np.eye(4), (5, 1, 1))
    mats[:, :3, :4] = rng.normal(size=(5, 3, 4))
    p = tmp_path / "traj.txt"
    ply.write_trajectory_12col(p, mats)
    back = ply.read_trajectory_12col(p)
    np.testing.assert_allclose(back, mats, atol=1e-9)


def test_redwood_log_roundtrip(tmp_path, rng):
    ids = np.array([[0, 1, 2], [1, 2, 3]])
    mats = np.tile(np.eye(4), (2, 1, 1))
    mats[:, :3, 3] = rng.normal(size=(2, 3))
    p = tmp_path / "traj.log"
    ply.write_redwood_log(p, ids, mats)
    ids2, mats2 = ply.read_redwood_log(p)
    np.testing.assert_array_equal(ids2, ids)
    np.testing.assert_allclose(mats2, mats, atol=1e-8)


def test_voxel_downsample():
    from se3_icp_tpu.datasets import synthetic

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, size=(5000, 3))
    out = synthetic.voxel_downsample(pts, 0.25)
    # 4x4x4 grid fully occupied at this density
    assert out.shape == (64, 3)
    # each centroid lies inside its voxel
    idx = np.floor((out - pts.min(axis=0)) / 0.25)
    assert (idx >= 0).all() and (idx <= 3).all()
    # centroid property: mean of all points is preserved under
    # count-weighted recombination
    counts = []
    for v in idx:
        sel = np.all(np.floor((pts - pts.min(axis=0)) / 0.25) == v, axis=1)
        counts.append(sel.sum())
        np.testing.assert_allclose(out[len(counts)-1], pts[sel].mean(axis=0))
    assert sum(counts) == len(pts)
    import pytest
    with pytest.raises(ValueError):
        synthetic.voxel_downsample(pts, 0.0)


def test_native_io_builds_and_matches_fallback(tmp_path):
    """The C++ host-IO library auto-builds on first use (fresh checkouts
    have no .so) and reads byte-identically to the numpy fallback."""
    import subprocess
    import sys

    code = r'''
import sys, os, numpy as np
sys.path.insert(0, sys.argv[1])
from se3_icp_tpu.utils import native, ply
assert native.available(), "native lib did not auto-build"
p = sys.argv[2]
a = ply.read_ply(p).points
os.environ["SE3_ICP_TPU_NO_NATIVE"] = "1"
import importlib; importlib.reload(native)
b = ply.read_ply(p).points
assert np.array_equal(a, b), "native vs fallback mismatch"
print("NATIVE_OK")
'''
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(repo, "native", "libse3io.so")
    # exercise the auto-build: remove the artifact first
    if os.path.exists(so):
        os.remove(so)
    ply_path = os.path.join(
        "/root/reference/created_example_reg_problem", "source.ply")
    out = subprocess.run([sys.executable, "-c", code, repo, ply_path],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "NATIVE_OK" in out.stdout
    assert os.path.exists(so)
