"""Direct real-chip tests for the Pallas SETUP kernels (VERDICT r1
item 7): neighborhood thresholds, TOLDI moments/axis sums, and the
threshold-driven consumers, against the XLA dense paths / numpy oracles
on random clouds including n_valid < k."""

import numpy as np
import jax
import jax.numpy as jnp

from se3_icp_tpu.ops import lrf


def _exact_d2(pts):
    return ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)


def test_neighborhood_thresholds_counts_on_tpu():
    from se3_icp_tpu.ops import pallas_moments as pm

    rng = np.random.default_rng(0)
    B, N = 4, 4608
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    n_valid = np.asarray([N, 4167, 400, 90], np.int32)
    counts = np.broadcast_to(
        np.asarray([20, 30, 31, 90], np.int32), (B, 4)).copy()
    thr = jax.device_get(pm.neighborhood_thresholds_batched(
        jnp.asarray(pts), jnp.asarray(n_valid), jnp.asarray(counts)))
    for b in range(B):
        nv = int(n_valid[b])
        d2 = _exact_d2(pts[b][:nv].astype(np.float64))
        for t, c in enumerate(counts[b]):
            got = (d2 <= thr[b, :nv, t][:, None] * (1 + 1e-6)).sum(1)
            c_eff = min(int(c), nv)
            # candidate-fold collisions only ever ENLARGE the ball;
            # boundary f32 rounding can lose a couple of members
            assert got.min() >= c_eff - 2, (b, c, got.min())
            assert got.max() <= c_eff + 45, (b, c, got.max())
            assert np.median(got) <= c_eff + 15, (b, c, np.median(got))


def test_moments_kernel_vs_oracle_on_tpu():
    """moments_batched against a numpy masked reduction with the same
    thresholds (self term removed), incl. a short row block."""
    from se3_icp_tpu.ops import pallas_moments as pm

    rng = np.random.default_rng(1)
    B, N = 2, 1536
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    n_valid = np.asarray([N, 700], np.int32)
    d2s = np.stack([np.sort(_exact_d2(p.astype(np.float64)), axis=1)
                    for p in pts])
    thr_cen = d2s[:, :, 29].astype(np.float32) * (1 + 1e-6)
    thr_cov = d2s[:, :, 30].astype(np.float32) * (1 + 1e-6)
    thr_all = d2s[:, :, 89].astype(np.float32) * (1 + 1e-6)
    out = jax.device_get(pm.moments_batched(
        jnp.asarray(pts), jnp.asarray(n_valid),
        jnp.asarray(thr_cen), jnp.asarray(thr_cov),
        jnp.asarray(thr_all)))
    for b in range(B):
        nv = int(n_valid[b])
        p64 = pts[b].astype(np.float64)
        d2 = _exact_d2(p64)
        d2[:, nv:] = np.inf
        for name, thr, width in (("cen", thr_cen, 3), ("cov", thr_cov, 3),
                                 ("all", thr_all, 3)):
            mask = d2 <= thr[b][:, None]
            np.fill_diagonal(mask, False)            # self removed
            ref_sum = mask.astype(np.float64) @ p64
            ref_cnt = mask.sum(1)
            got_sum = out[f"{name}_sum"][b]
            got_cnt = out[f"{name}_cnt"][b]
            # boundary flips perturb O(1) members of ~30; compare
            # counts within slack and sums loosely row-wise
            assert np.median(np.abs(got_cnt[:nv] - ref_cnt[:nv])) <= 1
            close = np.abs(got_sum[:nv] - ref_sum[:nv]).max(-1) < 0.5
            assert close.mean() > 0.95, (name, close.mean())


def test_toldi_thr_matches_dense_on_tpu():
    """The full sort-free TOLDI route (bisected thresholds + fused
    moments) against the exact-kNN dense path: frames must agree for
    the overwhelming bulk of points (boundary-membership flips only)."""
    from se3_icp_tpu.ops import knn

    rng = np.random.default_rng(2)
    N, k = 4167, 90
    pts = rng.normal(size=(N, 3)).astype(np.float32)
    pj = jnp.asarray(pts)
    nv = jnp.asarray(N, jnp.int32)

    rz = k // 3
    thr = knn.neighborhood_thresholds(
        pj, jnp.asarray([rz, rz + 1, k], jnp.int32), nv)
    rot_thr, _ = lrf.toldi_frames_thr(pj, thr[:, 0], thr[:, 1],
                                      thr[:, 2], k, nv)
    idx, d2 = knn.knn_self(pj, k + 1, nv, method="exact")
    rot_ref, _ = lrf.toldi_frames_dense(pj, d2[:, :k], nv)
    Ra, Rb = jax.device_get((rot_thr, rot_ref))
    rel = np.einsum("nij,nkj->nik", Ra, Rb)
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    ang = np.degrees(np.arccos(tr))
    assert np.median(ang) < 0.5, np.median(ang)
    assert (ang < 5.0).mean() > 0.97, (ang >= 5.0).sum()


def test_points_route_fused_on_tpu():
    """Model-parallel route on a 1-device mesh (the fused sharded hot
    loop, VERDICT r1 item 4): transforms must match the non-sharded
    engine's within f32 accumulation noise on the golden problem."""
    from jax.sharding import Mesh
    from se3_icp_tpu.models import registration as reg
    from se3_icp_tpu.parallel import points as mp
    from se3_icp_tpu.utils import metrics_host, ply
    from se3_icp_tpu.utils.config import GOLDEN

    base = "/root/reference/created_example_reg_problem"
    src = ply.read_ply(base + "/source.ply").points
    tgt = ply.read_ply(base + "/target.ply").points
    T_gt = ply.read_transform_txt(base + "/transformation_gt.txt")
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("points",))
    r = mp.register_pair_model_parallel(src, tgt, "se3_pt2pl", GOLDEN,
                                        mesh=mesh)
    rot = metrics_host.angular_error_so3(r.transformation[:3, :3],
                                         T_gt[:3, :3])
    assert rot < 0.01, rot
    r0 = reg.register_pair(src, tgt, "se3_pt2pl", GOLDEN)
    rel = metrics_host.angular_error_so3(r.transformation[:3, :3],
                                         r0.transformation[:3, :3])
    assert rel < 0.01, rel


def test_shot_dense_matches_oracle_on_tpu():
    """shot_frames_dense (exact radius semantics, f32 on chip) against
    the literal numpy oracle -- including neighborhoods beyond the old
    128 cap.  f32 eigenvectors of well-conditioned covariances are good
    to ~1e-3; the sign disambiguation is discrete and must agree
    exactly away from ties."""
    import sys
    sys.path.insert(0, "tests")
    import oracles

    rng = np.random.default_rng(11)
    pts = rng.normal(size=(400, 3))
    radius = 2.0
    assert lrf.shot_truncated_count(pts, radius, 128) > 0
    rot, _ = lrf.shot_frames_dense(jnp.asarray(pts, jnp.float32), radius)
    rot = np.asarray(jax.device_get(rot))
    ref = np.stack([oracles.shot_frame_oracle(pts, i, radius)
                    for i in range(len(pts))])
    np.testing.assert_allclose(rot, ref, atol=2e-3)
