"""Cross-route LRF quality evaluation.

The reference validates LRFs with ``cc::evaluate_LRF_quality``
(ref:cc:63-114): SO(3) error between GT-transformed source frames and
matched target frames.  This module packages that oracle for comparing
the engine's two TOLDI setup routes -- the sort-free threshold
bisection (the TPU default) vs the exact-rank sorted kNN -- across
independently sampled, noisy, partially overlapping cloud pairs, the
regime the 12-D correspondence search actually matches frames in
(VERDICT r3 item 3).  Consumed by tests/test_thr_validation.py (CPU
interpret CI) and tpu_tests/test_thr_validation.py (real chip).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from se3_icp_tpu.utils import metrics


def _pad(pts, dtype=np.float32):
    from se3_icp_tpu.models import registration as reg
    pts = np.asarray(pts, dtype)
    n = len(pts)
    out = np.zeros((reg._bucket(n), 3), dtype)
    out[:n] = pts
    return jnp.asarray(out), n


def toldi_frames_thr_route(pts, k: int) -> np.ndarray:
    """TOLDI frames via the sort-free threshold route (the engine's TPU
    setup path; requires a Pallas-capable backend or interpret mode)."""
    from se3_icp_tpu.ops import knn, lrf
    pp, n = _pad(pts)
    rz = k // 3
    counts = sorted({rz, rz + 1, k}, reverse=True)
    pos = {c: i for i, c in enumerate(counts)}
    thr = knn.neighborhood_thresholds(
        pp, jnp.asarray(counts, jnp.int32), jnp.asarray(n, jnp.int32))
    rot, _ = lrf.toldi_frames_thr(pp, thr[pos[rz]], thr[pos[rz + 1]],
                                  thr[pos[k]], k,
                                  jnp.asarray(n, jnp.int32))
    return np.asarray(rot)[:n]


def toldi_frames_exact_route(pts, k: int) -> np.ndarray:
    """TOLDI frames via the exact-rank sorted-kNN route."""
    from se3_icp_tpu.ops import lrf
    rot, _ = lrf.toldi_frames(jnp.asarray(np.asarray(pts, np.float32)),
                              k)
    return np.asarray(rot)


def cross_cloud_lrf_errors(src, tgt, T_gt, k: int = 90, inlier=None):
    """Per-route LRF angular errors (degrees) over GT correspondences,
    restricted to the true overlap region when ``inlier`` (a distance)
    is given.  Returns {"thr": errors, "exact": errors}."""
    from scipy.spatial import cKDTree
    src = np.asarray(src, np.float64)
    tgt = np.asarray(tgt, np.float64)
    moved = src @ T_gt[:3, :3].T + T_gt[:3, 3]
    d, nn = cKDTree(tgt).query(moved)
    keep = np.ones(len(src), bool) if inlier is None else d < inlier
    out = {}
    for name, fr in (("thr", toldi_frames_thr_route),
                     ("exact", toldi_frames_exact_route)):
        rs = fr(src, k)
        rt = fr(tgt, k)
        err = np.asarray(metrics.angular_error_so3_alt(
            jnp.asarray(T_gt[:3, :3]) @ jnp.asarray(rs[keep]),
            jnp.asarray(rt[nn[keep]])))
        out[name] = err
    return out
