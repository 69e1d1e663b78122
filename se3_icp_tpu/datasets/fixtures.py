"""Synthetic stand-in datasets in the EXACT on-disk layouts of the
reference's benchmark inputs (the real lounge/KITTI bundles come from
the paper's gdrive link, README.md:70-80, which this environment cannot
fetch).  These generators simulate a sensor moving through a static
scene so the full `bench-lounge` / `bench-kitti` protocols -- loaders,
GT parsing conventions, pair construction, metrics -- run end-to-end
and can be regression-tested.

Layouts produced:
  lounge:  <folder>/lounge_data/%06d.ply         (frames 1..n, 1-based)
           <folder>/lounge_data/lounge_trajectory.log  (redwood format)
  kitti:   <folder>/Sequence_07/Downsampled/%06d.ply   (i = 0,2,4,...)
           <folder>/Sequence_07/07.txt  (12-number rows, EVERY line;
           the loader reads every other row, matching
           examples/benchmark_kitti.cpp:79-98)
"""

from __future__ import annotations

import os

import numpy as np

from se3_icp_tpu.utils import ply


def _scene(rng: np.random.Generator, n: int, kind: str) -> np.ndarray:
    """A static 'world' cloud with structure (walls/floor-ish planes +
    blobs) so normals, LRFs, and GICP covariances are informative."""
    if kind == "room":  # indoor, meters, in front of the camera
        wall = np.column_stack([
            rng.uniform(-2, 2, n // 3), rng.uniform(-1.5, 1.5, n // 3),
            np.full(n // 3, 3.0)])
        floor = np.column_stack([
            rng.uniform(-2, 2, n // 3), np.full(n // 3, -1.5),
            rng.uniform(0.8, 3.0, n // 3)])
        m = n - 2 * (n // 3)
        blob = rng.normal((0.5, 0.0, 2.0), 0.35, (m, 3))
        pts = np.concatenate([wall, floor, blob])
    else:  # "road": outdoor LiDAR-ish, tens of meters
        ground = np.column_stack([
            rng.uniform(-30, 30, n // 2), rng.uniform(-10, 10, n // 2),
            rng.normal(-1.6, 0.05, n // 2)])
        m = n - n // 2
        n_centers = max(-(-m // 25), 1)  # ceil: repeat covers all m rows
        posts = rng.normal(0, 1, (m, 3)) * (1.5, 1.5, 2.0) + np.repeat(
            rng.uniform((-25, -8, 0), (25, 8, 1), (n_centers, 3)),
            25, axis=0)[:m]
        pts = np.concatenate([ground, posts])
    # surface jitter so clouds are not perfectly planar
    return pts + rng.normal(scale=0.01, size=pts.shape)


def _pose(R_axis, ang, t):
    c, s = np.cos(ang), np.sin(ang)
    if R_axis == "y":
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    else:
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def _frame_cloud(scene, pose, rng, keep=0.85):
    """World scene viewed from ``pose`` (cam->world): world->cam points,
    independently subsampled per frame (acts like sensor resampling)."""
    Rw, tw = pose[:3, :3], pose[:3, 3]
    cam = (scene - tw) @ Rw  # R^T (p - t)
    sel = rng.random(len(cam)) < keep
    return cam[sel] + rng.normal(scale=0.004, size=(sel.sum(), 3))


def make_lounge_fixture(folder: str, n_frames: int = 21,
                        n_points: int = 2000, seed: int = 7) -> None:
    """Write a lounge-layout dataset: slowly rotating/translating RGB-D
    camera in a room; positive depths so the with_cf confidence model
    (ref:cpp:16-30) gets realistic z values."""
    rng = np.random.default_rng(seed)
    scene = _scene(rng, n_points, "room")
    out = os.path.join(folder, "lounge_data")
    os.makedirs(out, exist_ok=True)
    mats = []
    for i in range(n_frames):
        ang = 0.012 * i
        t = np.array([0.02 * i, 0.002 * i, 0.01 * i])
        pose = _pose("y", ang, t)
        mats.append(pose)
        cloud = _frame_cloud(scene, pose, rng)
        ply.write_ply(os.path.join(out, f"{i + 1:06d}.ply"), cloud)
    ids = np.arange(len(mats))
    ply.write_redwood_log(
        os.path.join(out, "lounge_trajectory.log"),
        np.stack([ids, ids, ids + 1], axis=1), np.asarray(mats))


def make_kitti_fixture(folder: str, max_index: int = 20,
                       n_points: int = 3000, seed: int = 8) -> None:
    """Write a KITTI-seq-07-layout dataset: forward-driving LiDAR with a
    slow yaw.  07.txt gets one 12-number row per RAW frame index (the
    loader keeps every other row, matching the step-2 clouds)."""
    rng = np.random.default_rng(seed)
    scene = _scene(rng, n_points, "road")
    out = os.path.join(folder, "Sequence_07")
    os.makedirs(os.path.join(out, "Downsampled"), exist_ok=True)
    poses_all = []
    for raw in range(max_index + 2):
        ang = 0.004 * raw
        t = np.array([0.25 * raw, 0.01 * raw, 0.0])
        poses_all.append(_pose("z", ang, t))
    for i in range(0, max_index + 1, 2):
        cloud = _frame_cloud(scene, poses_all[i], rng)
        ply.write_ply(
            os.path.join(out, "Downsampled", f"{i:06d}.ply"), cloud)
    ply.write_trajectory_12col(os.path.join(out, "07.txt"),
                               np.asarray(poses_all))
