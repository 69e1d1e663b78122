"""Tests for the sort-free setup/trim paths (VERDICT r1 items 1 & 3).

Both paths are TPU-gated in production (``knn.use_thr_knn`` /
``trim.trim_mask``'s backend dispatch), so these tests exercise the
underlying kernels directly: the Pallas threshold/moment kernels run
under ``pltpu.force_tpu_interpret_mode`` (bit-faithful interpreter on
CPU), and the trim bisection is plain jnp.  Real-chip coverage lives in
``tpu_tests/test_tpu_kernels.py``.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from se3_icp_tpu.ops import lrf, trim
from tests import oracles


# --------------------------------------------------------------- trim

def _bisect_mask(d, valid, count):
    return np.asarray(trim._trim_mask_bisect(
        jnp.asarray(d, jnp.float32), jnp.asarray(valid),
        jnp.asarray(count, jnp.int32)))


def test_trim_bisect_matches_stable_argsort(rng):
    d = rng.uniform(0.0, 2.0, size=501).astype(np.float32)
    valid = np.ones(501, bool)
    for ratio in (0.25, 0.5, 0.75, 0.9):
        count = int(np.floor(ratio * 501))
        ours = _bisect_mask(d, valid, count)
        ref = oracles.trimmed_mask_oracle(d.astype(np.float64), ratio)
        assert (ours == ref).all(), ratio


def test_trim_bisect_ties_break_toward_lower_index():
    # heavy exact ties: equal values must resolve by index like the
    # stable sort (the engine's determinism contract)
    d = np.asarray([0.5, 0.1, 0.5, 0.1, 0.5, 0.1, 0.9, 0.5], np.float32)
    valid = np.ones(8, bool)
    got = _bisect_mask(d, valid, 5)
    # sorted: 0.1@1, 0.1@3, 0.1@5, then 0.5@0, 0.5@2 (ties by index)
    exp = np.asarray([1, 1, 1, 1, 0, 1, 0, 0], bool)
    assert (got == exp).all(), got


def test_trim_bisect_all_equal():
    d = np.full(64, 0.7, np.float32)
    valid = np.ones(64, bool)
    got = _bisect_mask(d, valid, 10)
    assert got[:10].all() and not got[10:].any()


def test_trim_bisect_respects_padding(rng):
    d = rng.uniform(size=100).astype(np.float32)
    valid = np.arange(100) < 60
    count = 30
    got = _bisect_mask(d, valid, count)
    assert not got[60:].any()
    assert got.sum() == count
    ref = oracles.trimmed_mask_oracle(d[:60].astype(np.float64),
                                      count / 60.0)
    assert (got[:60] == ref).all()


# ---------------------------------------- threshold kernel (interpret)

def _exact_d2(pts):
    return ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)


def test_neighborhood_thresholds_counts(rng):
    """|{j : d2 <= thr_c}| must be ~c: never more than the lane-collision
    slack plus the search-and-rounding tail, never more than ~2 short.

    The +4 upper tail (r5): the rank-search kernel converges each count
    to within +2 CANDIDATE members in the worst case over random clouds
    (prototyped over 600 draws per shape; the pre-r5 pure bisection was
    search-exact but cost 2x the probes), and the boundary f32 rounding
    between the limb-packed distance form and the exact one adds up to
    ~2 more.  The consumers are ball-semantics (a few extra boundary
    members perturb weighted moments at noise level -- gated end-to-end
    by tests/test_thr_validation.py and the golden interpret runs)."""
    from se3_icp_tpu.ops import pallas_moments as pm

    for n, n_valid, slack_hi in [(512, 512, 0), (512, 400, 0),
                                 (1536, 1536, 40)]:
        pts = rng.normal(size=(1, n, 3)).astype(np.float32)
        counts = np.asarray([[20, 30, 31, 90]], np.int32)
        with pltpu.force_tpu_interpret_mode():
            thr = np.asarray(pm.neighborhood_thresholds_batched(
                jnp.asarray(pts), jnp.asarray([n_valid], jnp.int32),
                jnp.asarray(counts)))
        d2 = _exact_d2(pts[0][:n_valid].astype(np.float64))
        for t, c in enumerate(counts[0]):
            got = (d2 <= thr[0, t, :n_valid][:, None]).sum(1)
            assert got.min() >= c - 2, (n, c, got.min())
            assert got.max() <= c + slack_hi + 4, (n, c, got.max())
            assert np.median(got) <= c + slack_hi + 2, (n, c)


def test_neighborhood_thresholds_clamp_to_valid(rng):
    """count > n_valid clamps: the ball must contain ALL valid points
    (the old sentinel-threshold behavior)."""
    from se3_icp_tpu.ops import pallas_moments as pm

    pts = rng.normal(size=(1, 512, 3)).astype(np.float32)
    n_valid = 50
    with pltpu.force_tpu_interpret_mode():
        thr = np.asarray(pm.neighborhood_thresholds_batched(
            jnp.asarray(pts), jnp.asarray([n_valid], jnp.int32),
            jnp.asarray([[90]], jnp.int32)))
    d2 = _exact_d2(pts[0][:n_valid].astype(np.float64))
    got = (d2 <= thr[0, 0, :n_valid][:, None] * (1 + 1e-6)).sum(1)
    assert got.min() >= n_valid - 1, got.min()


# ----------------------------- threshold-driven consumers (interpret)

def _frame_angles_deg(Ra, Rb):
    rel = np.einsum("nij,nkj->nik", Ra, Rb)
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(tr))


def test_toldi_thr_matches_gathered_oracle(rng):
    """With EXACT thresholds (from sorted true distances), the
    threshold-driven fused TOLDI must reproduce the gathered-oracle
    frames -- isolates the rank-set -> threshold mapping and the fused
    moment math from the threshold approximation."""
    n, k = 512, 90
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    d2s = np.sort(_exact_d2(pts.astype(np.float64)), axis=1)
    rz = k // 3
    eps = 1e-6  # nudge up so the boundary member stays inside in f32
    thr_cen = (d2s[:, rz - 1] * (1 + eps)).astype(np.float32)
    thr_cov = (d2s[:, rz] * (1 + eps)).astype(np.float32)
    thr_k = (d2s[:, k - 1] * (1 + eps) + 1e-30).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        rot_thr, _ = lrf.toldi_frames_thr(
            jnp.asarray(pts), jnp.asarray(thr_cen), jnp.asarray(thr_cov),
            jnp.asarray(thr_k), k, jnp.asarray(n, jnp.int32))
    rot_ref, _ = lrf.toldi_frames(jnp.asarray(pts), k)
    ang = _frame_angles_deg(np.asarray(rot_thr), np.asarray(rot_ref))
    # a handful of rows may sit on eigen-degenerate neighborhoods; the
    # bulk must match tightly
    assert np.median(ang) < 0.05, np.median(ang)
    assert (ang < 1.0).mean() > 0.98, (ang > 1.0).sum()


def test_normals_thr_matches_oracle(rng):
    n, k = 512, 30
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    d2s = np.sort(_exact_d2(pts.astype(np.float64)), axis=1)
    thr = (d2s[:, k - 1] * (1 + 1e-6)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        nrm = np.asarray(lrf.normals_thr(
            jnp.asarray(pts), jnp.asarray(thr), k,
            jnp.asarray(n, jnp.int32)))
    ref = np.asarray(lrf.estimate_normals(jnp.asarray(pts), k))
    dots = np.abs(np.einsum("ni,ni->n", nrm, ref))
    assert np.median(dots) > 0.9999, np.median(dots)
    assert (dots > 0.99).mean() > 0.98


def test_threshold_query_slice_matches_full(rng):
    """The model-parallel row-sliced variants must reproduce the
    corresponding rows of the full-cloud computation exactly (the
    kernels see identical operands, just fewer query rows)."""
    from se3_icp_tpu.ops import knn, pallas_moments as pm

    n, k = 512, 90
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pj = jnp.asarray(pts)
    nv = jnp.asarray(n, jnp.int32)
    counts = jnp.asarray([30, 31, k], jnp.int32)
    lo, hi = 128, 256
    with pltpu.force_tpu_interpret_mode():
        thr_full = np.asarray(knn.neighborhood_thresholds(pj, counts, nv))
        thr_slice = np.asarray(knn.neighborhood_thresholds_q(
            pj, pj[lo:hi], counts, nv))
    np.testing.assert_allclose(thr_slice, thr_full[:, lo:hi], rtol=1e-6)

    with pltpu.force_tpu_interpret_mode():
        rot_full, _ = lrf.toldi_frames_thr(
            pj, jnp.asarray(thr_full[0]), jnp.asarray(thr_full[1]),
            jnp.asarray(thr_full[2]), k, nv)
        rot_slice, _ = lrf.toldi_frames_thr(
            pj, jnp.asarray(thr_full[0, lo:hi]),
            jnp.asarray(thr_full[1, lo:hi]),
            jnp.asarray(thr_full[2, lo:hi]), k, nv,
            queries=pj[lo:hi])
        nrm_full = lrf.normals_thr(pj, jnp.asarray(thr_full[0]), 30,
                                   nv)
        nrm_slice = lrf.normals_thr(pj, jnp.asarray(thr_full[0, lo:hi]),
                                    30, nv, queries=pj[lo:hi])
    np.testing.assert_allclose(np.asarray(rot_slice),
                               np.asarray(rot_full)[lo:hi], atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrm_slice),
                               np.asarray(nrm_full)[lo:hi], atol=1e-5)


def test_gicp_covariances_thr_matches_oracle(rng):
    n, k = 512, 20
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    d2s = np.sort(_exact_d2(pts.astype(np.float64)), axis=1)
    thr = (d2s[:, k - 1] * (1 + 1e-6)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        cov = np.asarray(lrf.gicp_covariances_thr(
            jnp.asarray(pts), jnp.asarray(thr), k, 1e-3,
            jnp.asarray(n, jnp.int32)))
    ref = np.asarray(lrf.gicp_covariances(jnp.asarray(pts), k, 1e-3))
    err = np.abs(cov - ref).reshape(n, -1).max(1)
    assert np.median(err) < 1e-3, np.median(err)
    assert (err < 0.05).mean() > 0.98
