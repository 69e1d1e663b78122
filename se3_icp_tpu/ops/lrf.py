"""Local-reference-frame estimation + normals + GICP covariances.

Batched TPU re-design of the reference's per-point OpenMP loops:

  * TOLDI SE(3) frames (C3, ref:cpp:241-331) -- the core geometric
    novelty.  One gather of [N,k,3] neighborhoods, then fully vectorized
    centroid/covariance/eigh/arrow-weighting math on the VPU; the kNN
    itself is the MXU brute-force search in ``ops.knn``.
  * SHOT SE(3) frames (C4, ref:cpp:121-239) -- the dormant alternate LRF,
    radius-based; implemented with a masked fixed-k neighborhood.
  * PCA normal estimation (Open3D ``EstimateNormals`` analog; kNN-30 for
    pt2pl at ref:cpp:643, kNN-20 inside GICP init at ref:cpp:43).
  * GICP covariance initialization (C14, ref:cpp:4-52), including the
    reference's ``c < -0.99 -> identity`` quirk in GetRotationFromE1ToX.

Intentional parity quirks (SURVEY.md §5):
  * TOLDI centroid off-by-one: neighbors ranked 1..k//3-1 are summed but
    the sum is divided by k//3 (ref:cpp:259-265), while the covariance
    uses ranks 1..k//3 (ref:cpp:268-272).  Reproduced exactly by default.
    NOTE (discovered by the equivariance test): because the divisor makes
    the centroid a non-affine combination (coefficients sum to
    (rz-1)/rz != 1), the reference's TOLDI covariance is NOT
    translation-invariant -- frames depend on the cloud's absolute
    position.  The reference gets away with it by centering clouds before
    frame estimation (ref:cpp:576-582).  ``exact_centroid=True`` divides
    by rz-1 instead, restoring full rigid equivariance; default stays
    reference-faithful.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from se3_icp_tpu.ops import eigh3, knn


def _gather_neighbors(points, idx):
    """points [N,3], idx [N,k] -> [N,k,3]."""
    return points[idx]


@functools.partial(jax.jit, static_argnames=("k", "exact_centroid"))
def toldi_frames(points, k: int, n_valid=None, exact_centroid: bool = False):
    """TOLDI SE(3) frames for every point of a cloud.

    Returns (rot [N,3,3] with columns x,y,z, origin [N,3]).
    Mirrors ``computeSingleTOLDISE3Frame`` (ref:cpp:241-316) with kNN
    search (k = ``number_of_nn_for_LRF_``, benchmarks use 90).
    """
    idx, d2 = knn.knn_self(points, k, n_valid)
    return toldi_frames_from_neighbors(points, idx,
                                       exact_centroid=exact_centroid)


@functools.partial(jax.jit, static_argnames=("exact_centroid",))
def toldi_frames_from_neighbors(points, idx, exact_centroid: bool = False):
    """TOLDI given precomputed ascending-by-distance neighbor indices.

    ``idx[:, 0]`` is the query point itself (FLANN convention,
    ref:cpp:253-256).  ``idx`` may cover a row SLICE of ``points``
    (model-parallel setup): the query is recovered from rank 0.
    """
    dtype = points.dtype
    n, k = idx.shape
    nb = _gather_neighbors(points, idx)                  # [N,k,3]
    p = nb[:, 0:1, :]                                    # query = rank-0 self

    # radius = distance to the farthest of the k neighbors (ref:cpp:256)
    radius = jnp.linalg.norm(nb[:, -1, :] - p[:, 0, :], axis=-1)

    rz = k // 3
    rank = jnp.arange(k)
    # centroid: ranks 1..rz-1 summed, divided by rz (off-by-one kept for
    # parity, ref:cpp:259-265; exact_centroid divides by rz-1, restoring
    # translation invariance -- see module docstring)
    cen_mask = ((rank >= 1) & (rank < rz)).astype(dtype)[None, :, None]
    divisor = (rz - 1) if exact_centroid else rz
    centroid = jnp.sum(nb * cen_mask, axis=1) / jnp.asarray(divisor, dtype)

    # covariance: ranks 1..rz about the centroid (ref:cpp:268-272)
    cov_mask = ((rank >= 1) & (rank < rz + 1)).astype(dtype)[None, :, None]
    diff = (nb - centroid[:, None, :]) * cov_mask
    cov = jnp.einsum("nki,nkj->nij", diff, diff)

    normal = eigh3.smallest_eigvec3(cov)                 # [N,3]

    # arrow accumulation over ranks 1..k-1 (ref:cpp:286-297)
    v = nb - p                                           # [N,k,3]
    arrow_mask = (rank >= 1).astype(dtype)[None, :, None]
    v = v * arrow_mask
    arrow_sum = jnp.sum(v, axis=1)
    vnorm = jnp.linalg.norm(v, axis=-1)                  # [N,k]
    ndot = jnp.einsum("ni,nki->nk", normal, v)
    w1 = (radius[:, None] - vnorm) ** 2
    w2 = ndot ** 2
    # masked ranks contribute v=0 already, but w1 would be radius^2*0=0 ok
    scaled_sum = jnp.sum((w1 * w2)[..., None] * v, axis=1)

    # z sign fix (ref:cpp:298)
    flip = jnp.sum(normal * arrow_sum, axis=-1) < 0.0
    z = jnp.where(flip[:, None], -normal, normal)

    # Gram-Schmidt x-axis (ref:cpp:300-303)
    x = scaled_sum - jnp.sum(scaled_sum * z, -1, keepdims=True) * z
    xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
    eps = jnp.asarray(1e-30, dtype)
    x = x / jnp.maximum(xn, eps)

    y = jnp.cross(z, x)
    rot = jnp.stack([x, y, z], axis=-1)                  # columns x,y,z
    return rot, nb[:, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("exact_centroid", "chunk"))
def toldi_frames_dense(points, d2sorted, n_valid=None,
                       exact_centroid: bool = False, chunk: int = 1024,
                       queries=None, row_offset=None):
    """See the docstring below.  ``queries``/``row_offset``: optional
    row SLICE of ``points`` (model-parallel setup) -- queries are the
    slice, ``row_offset`` its starting global row, so self-exclusion
    still matches ``col != global_row``.  ``d2sorted`` then has one row
    per query."""
    return _toldi_frames_dense_impl(points, d2sorted, n_valid,
                                    exact_centroid, chunk, queries,
                                    row_offset)


def _toldi_frames_dense_impl(points, d2sorted, n_valid,
                             exact_centroid, chunk, queries_slice,
                             row_offset):
    """Gather-free TOLDI: identical math to
    ``toldi_frames_from_neighbors`` but every neighborhood reduction is
    a masked [C,N]x[N,*] matmul instead of a [N,k,3] row gather.

    Motivation (measured, TPU v5e, 16x4608 batch): the neighbor gather
    is 42 ms of the 57 ms gather-based kernel -- random row gathers are
    scalar-bound on TPU, while the MXU eats the equivalent masked
    matmuls.  Rank membership is recovered from the SORTED kNN
    distances: ranks 1..r == {j : 0 < d2_ij <= d2sorted[i, r]}, with
    midpoint thresholds so a last-ulp difference between the distance
    matrix here and the one inside the kNN cannot flip boundary
    membership.  Query rows are processed in chunks so the [C,N]
    distance block never exceeds VMEM-friendly sizes and KITTI-scale
    clouds (15k+) stay within HBM.

    ``d2sorted [N,k]``: ascending squared neighbor distances with self
    at rank 0 (from ``knn.knn_self``).  Under the approx top-k the
    thresholds come from the approximate order statistics, so the
    resulting sets can be (slightly) CLOSER to the exact neighborhoods
    than the gathered approximate index lists.
    """
    dtype = points.dtype
    n = points.shape[0]
    k = d2sorted.shape[1]
    rz = k // 3
    divisor = jnp.asarray((rz - 1) if exact_centroid else rz, dtype)
    colv = jnp.ones(n, bool) if n_valid is None else (
        jnp.arange(n) < n_valid)
    # outer products p p^T flattened once: Sum_j m_ij p_j p_j^T by matmul
    P9 = (points[:, :, None] * points[:, None, :]).reshape(n, 9)

    if queries_slice is None:
        queries_slice = points
        gidx = jnp.arange(n, dtype=jnp.int32)
    else:
        off = jnp.asarray(0 if row_offset is None else row_offset,
                          jnp.int32)
        gidx = off + jnp.arange(queries_slice.shape[0], dtype=jnp.int32)
    nq = queries_slice.shape[0]
    pad = (-nq) % chunk
    qs = jnp.pad(queries_slice, ((0, pad), (0, 0)))
    qis = jnp.pad(gidx, (0, pad))
    d2s = jnp.pad(d2sorted, ((0, pad), (0, 0)))
    col = jnp.arange(n, dtype=jnp.int32)

    def one(args):
        q, qi, d2row = args                       # [C,3],[C],[C,k]
        c = q.shape[0]
        D2 = knn._pairwise_d2(q, points)          # [C,N]
        base = (col[None, :] != qi[:, None]) & colv[None, :]
        # midpoint thresholds: rank sets {1..rz-1}, {1..rz}, {1..k-1}
        thr_cen = 0.5 * (d2row[:, rz - 1] + d2row[:, rz])
        thr_cov = 0.5 * (d2row[:, rz] + d2row[:, rz + 1])
        # radius = distance to the k-th neighbor; when the cloud has
        # fewer than k valid points the k-th slot holds the masked-kNN
        # _BIG sentinel, and (radius - d)^2 overflows f32 to inf and
        # poisons every frame -- clamp to the last VALID neighbor.
        # (The reference would read FLANN garbage here; this is a
        # deliberate robustness improvement, exercised by
        # test_toldi_small_cloud_k_exceeds_n.)
        if n_valid is None:
            r2 = d2row[:, k - 1]
        else:
            last = jnp.minimum(k - 1,
                               jnp.maximum(n_valid - 1, 1)).astype(
                jnp.int32)
            r2 = jnp.take(d2row, last, axis=1)
        thr_all = r2 * (1.0 + 1e-6) + jnp.asarray(1e-30, dtype)
        f = lambda m: m.astype(dtype)             # noqa: E731
        Mcen = f(base & (D2 <= thr_cen[:, None]))
        Mcov = f(base & (D2 <= thr_cov[:, None]))
        Mall = f(base & (D2 <= thr_all[:, None]))

        cen = (Mcen @ points) / divisor           # [C,3]
        S1 = Mcov @ points                        # [C,3]
        S2 = (Mcov @ P9).reshape(c, 3, 3)
        m = jnp.sum(Mcov, axis=1)
        cov = (S2
               - S1[:, :, None] * cen[:, None, :]
               - cen[:, :, None] * S1[:, None, :]
               + m[:, None, None] * cen[:, :, None] * cen[:, None, :])
        normal = eigh3.smallest_eigvec3(cov)      # [C,3]

        cnt = jnp.sum(Mall, axis=1)
        arrow = Mall @ points - cnt[:, None] * q
        d = jnp.sqrt(jnp.maximum(D2, 0.0))
        radius = jnp.sqrt(jnp.maximum(r2, 0.0))
        w1 = (radius[:, None] - d) ** 2
        # (n_i . v_ij) = n_i . p_j - n_i . p_i  -- one [C,3]x[3,N] matmul
        zdot = normal @ points.T - jnp.sum(normal * q, -1, keepdims=True)
        W = Mall * w1 * zdot * zdot
        scaled = W @ points - jnp.sum(W, axis=1)[:, None] * q

        flip = jnp.sum(normal * arrow, axis=-1) < 0.0
        z = jnp.where(flip[:, None], -normal, normal)
        x = scaled - jnp.sum(scaled * z, -1, keepdims=True) * z
        xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.maximum(xn, jnp.asarray(1e-30, dtype))
        y = jnp.cross(z, x)
        return jnp.stack([x, y, z], axis=-1)

    rot = jax.lax.map(one, (qs.reshape(-1, chunk, 3),
                            qis.reshape(-1, chunk),
                            d2s.reshape(-1, chunk, k)))
    return rot.reshape(-1, 3, 3)[:nq], queries_slice


def shot_truncated_count(points, radius: float, max_k: int) -> int:
    """Host-side validation for the SHOT radius-search emulation: number
    of points whose true radius neighborhood exceeds the ``max_k`` cap
    (those neighborhoods are silently truncated to the nearest max_k,
    diverging from the reference's full radius semantics).  Callers
    (register_pair) warn when this is nonzero."""
    import numpy as np
    from scipy.spatial import cKDTree
    pts = np.asarray(points)
    counts = cKDTree(pts).query_ball_point(
        pts, r=float(radius), return_length=True)
    return int((counts > max_k).sum())


@functools.partial(jax.jit, static_argnames=("max_k",))
def shot_frames(points, radius: float, max_k: int = 128, n_valid=None):
    """SHOT LRF frames (C4, ref:cpp:121-223), radius neighborhood
    emulated with a masked top-``max_k`` kNN (neighborhoods denser than
    ``max_k`` are truncated to the nearest max_k -- see
    ``shot_truncated_count`` for the host-side validity check).

    Returns (rot [N,3,3] columns x,y,z, origin [N,3]).
    """
    dtype = points.dtype
    idx, d2 = knn.knn_self(points, max_k, n_valid)
    nb = _gather_neighbors(points, idx)                  # [N,K,3]
    p = points[:, None, :]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    rank = jnp.arange(max_k)
    in_r = (d2 <= radius * radius) & (rank[None, :] >= 1)  # skip self
    w = jnp.where(in_r, radius - d, 0.0)                 # (radius - dist)
    diffs = nb - p                                       # [N,K,3]
    cov = jnp.einsum("nk,nki,nkj->nij", w, diffs, diffs)
    total = jnp.sum(w, axis=1)
    cov = cov / jnp.maximum(total, 1e-30)[:, None, None]

    vals, vecs = eigh3.eigh3(cov)
    x_plus = vecs[..., 2]                                # largest
    z_plus = vecs[..., 0]                                # smallest

    m = jnp.sum(in_r, axis=1)                            # num considered

    def _disambiguate(axis):
        dots = jnp.einsum("nki,ni->nk", diffs, axis)
        s = jnp.sum((dots >= 0) & in_r, axis=1)
        s2 = 2 * s - m
        # median tie-break (ref:cpp:183-194): 5 samples at neighbor
        # positions med-2..med+2 of the SELF-EXCLUSIVE ascending list
        # (diff_vectors[medianIndex - i]); ranks here are self-INCLUSIVE
        # (self at 0, neighbors 1..m), so position q maps to rank q+1.
        med = m // 2
        offs = jnp.arange(-2, 3)
        tie_rank = jnp.clip(med[:, None] + 1 - offs[None, :], 1,
                            max_k - 1)
        tie_dots = jnp.take_along_axis(dots, tie_rank, axis=1)
        s_tie = jnp.sum(tie_dots >= 0, axis=1)
        flip_tie = s_tie < 3
        flip = jnp.where(s2 == 0, flip_tie, s2 < 0)
        return jnp.where(flip[:, None], -axis, axis)

    x_plus = _disambiguate(x_plus)
    z_plus = _disambiguate(z_plus)
    y_plus = jnp.cross(z_plus, x_plus)
    rot = jnp.stack([x_plus, y_plus, z_plus], axis=-1)
    return rot, points


@functools.partial(jax.jit, static_argnames=("chunk", "tie_iters"))
def shot_frames_dense(points, radius: float, n_valid=None,
                      chunk: int = 1024, tie_iters: int = 40):
    """SHOT LRF frames with EXACT radius semantics -- no neighbor cap.

    Replaces ``shot_frames``'s top-``max_k`` radius emulation (which
    silently truncates neighborhoods denser than the cap) with the
    gather-free masked-matmul pattern of the TOLDI/normals dense paths:
      * the (radius - d)-weighted covariance is three [C,N]x[N,*]
        matmuls over the radius mask (reduction expanded about the
        query point, so it equals sum w (p-q)(p-q)^T exactly);
      * the sign-disambiguation counts are masked indicator sums;
      * the 5-sample median-rank tie-break band (neighbor positions
        med-2..med+2 of the self-exclusive ascending list,
        ref:cpp:183-194) is recovered sort-free by bisecting the
        neighbor-count function for the two bracketing order
        statistics -- the same idea as the setup threshold kernel.
    Reference: computeSingleSHOTSE3Frame, ref:cpp:121-223.  Boundary
    deviation (documented): when the band clips at the list ends
    (m < 5) the reference indexes out of bounds; here the band is the
    clipped intersection with valid positions (fewer than 5 samples).
    Ties in distance at the band edge include all tied points.

    Returns (rot [N,3,3] columns x,y,z, origin [N,3]).
    """
    dtype = points.dtype
    n = points.shape[0]
    colv = jnp.ones(n, bool) if n_valid is None else (
        jnp.arange(n) < n_valid)
    r2 = jnp.asarray(radius * radius, dtype)
    P9 = (points[:, :, None] * points[:, None, :]).reshape(n, 9)
    pad = (-n) % chunk
    qs = jnp.pad(points, ((0, pad), (0, 0)))
    gidx = jnp.arange(n + pad)

    def one(args):
        q, gi = args
        c = q.shape[0]
        D2 = knn._pairwise_d2(q, points)                     # [C,N]
        mask = ((D2 <= r2) & colv[None, :]
                & (gi[:, None] != jnp.arange(n)[None, :]))   # skip self
        d = jnp.sqrt(jnp.maximum(D2, 0.0))
        w = jnp.where(mask, radius - d, 0.0).astype(dtype)
        S0 = jnp.sum(w, axis=1)
        S1 = w @ points                                      # [C,3]
        S2 = (w @ P9).reshape(c, 3, 3)
        cov = (S2 - S1[:, :, None] * q[:, None, :]
               - q[:, :, None] * S1[:, None, :]
               + S0[:, None, None] * q[:, :, None] * q[:, None, :])
        cov = cov / jnp.maximum(S0, 1e-30)[:, None, None]
        _, vecs = eigh3.eigh3(cov)
        x_plus = vecs[..., 2]                                # largest
        z_plus = vecs[..., 0]                                # smallest
        m = jnp.sum(mask, axis=1)                            # [C] int32

        # median band thresholds: the c-th smallest neighbor d2 for
        # c = med-2 (below band) and med+3 (through band), by bisection
        med = m // 2
        c_lo = jnp.clip(med - 2, 0, m)
        c_hi = jnp.clip(med + 3, 0, m)

        def thr_for(count):
            def body(_, lh):
                lo, hi = lh
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum(mask & (D2 <= mid[:, None]), axis=1)
                return (jnp.where(cnt < count, mid, lo),
                        jnp.where(cnt >= count, mid, hi))
            lo0 = jnp.zeros(c, dtype)
            hi0 = jnp.full(c, r2, dtype)
            _, hi = jax.lax.fori_loop(0, tie_iters, body, (lo0, hi0))
            # count==0 -> band opens at -inf so d2==0 duplicates stay in
            return jnp.where(count == 0, jnp.full(c, -jnp.inf, dtype), hi)
        t_lo = thr_for(c_lo)
        t_hi = thr_for(c_hi)
        band = mask & (D2 > t_lo[:, None]) & (D2 <= t_hi[:, None])

        def _disambiguate(axis):
            dots = (jnp.einsum("ni,ci->cn", points, axis)
                    - jnp.sum(q * axis, -1)[:, None])
            pos = dots >= 0
            s2 = 2 * jnp.sum(pos & mask, axis=1) - m
            s_tie = jnp.sum(pos & band, axis=1)
            flip = jnp.where(s2 == 0, s_tie < 3, s2 < 0)
            return jnp.where(flip[:, None], -axis, axis)

        x_d = _disambiguate(x_plus)
        z_d = _disambiguate(z_plus)
        y_d = jnp.cross(z_d, x_d)
        return jnp.stack([x_d, y_d, z_d], axis=-1)

    rot = jax.lax.map(one, (qs.reshape(-1, chunk, 3),
                            gidx.reshape(-1, chunk)))
    return rot.reshape(-1, 3, 3)[:n], points


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_normals(points, k: int = 30, n_valid=None):
    """PCA normals via kNN neighborhoods (Open3D ``EstimateNormals``
    analog, default KNN(30)).  Unoriented, like the reference's usage."""
    idx, _ = knn.knn_self(points, k, n_valid)
    return normals_from_neighbors(points, idx)


@jax.jit
def normals_from_neighbors(points, idx):
    """PCA normal from precomputed neighbor indices [N,k].

    The engine computes one sorted kNN per cloud (k = max needed) and
    slices prefixes: the first k' of an ascending kNN ARE the exact
    k'-NN, so normals/covariances reuse the TOLDI neighborhood search
    (the full-width top-k sort dominates setup cost on TPU)."""
    nb = _gather_neighbors(points, idx)                  # [N,k,3]
    mean = jnp.mean(nb, axis=1, keepdims=True)
    diff = nb - mean
    cov = jnp.einsum("nki,nkj->nij", diff, diff) / nb.shape[1]
    return eigh3.smallest_eigvec3(cov)


@functools.partial(jax.jit, static_argnames=("k_use", "chunk"))
def normals_dense(points, d2sorted, k_use: int, n_valid=None,
                  chunk: int = 1024):
    """Gather-free PCA normals: same neighborhoods as
    ``normals_from_neighbors`` over ``idx[:, :k_use]`` (ranks 0..k_use-1
    INCLUDING self), recovered as the masked set
    {j : d2_ij <= midpoint(d2sorted[i, k_use-1], d2sorted[i, k_use])}
    -- so ``d2sorted`` must be at least k_use+1 wide.  Covariance
    reductions are [C,N]x[N,*] matmuls (see ``toldi_frames_dense`` for
    the why)."""
    dtype = points.dtype
    n = points.shape[0]
    if d2sorted.shape[1] <= k_use:
        raise ValueError(f"d2sorted width {d2sorted.shape[1]} must "
                         f"exceed k_use={k_use}")
    colv = jnp.ones(n, bool) if n_valid is None else (
        jnp.arange(n) < n_valid)
    P9 = (points[:, :, None] * points[:, None, :]).reshape(n, 9)
    kinv = jnp.asarray(1.0 / k_use, dtype)

    pad = (-n) % chunk
    qs = jnp.pad(points, ((0, pad), (0, 0)))
    thr = 0.5 * (d2sorted[:, k_use - 1] + d2sorted[:, k_use])
    thrs = jnp.pad(thr, (0, pad))

    def one(args):
        q, t = args
        c = q.shape[0]
        D2 = knn._pairwise_d2(q, points)
        M = ((D2 <= t[:, None]) & colv[None, :]).astype(dtype)
        S1 = M @ points
        S2 = (M @ P9).reshape(c, 3, 3)
        m = jnp.sum(M, axis=1)
        mean = S1 * kinv                       # gather path divides by k
        cov = (S2
               - S1[:, :, None] * mean[:, None, :]
               - mean[:, :, None] * S1[:, None, :]
               + m[:, None, None] * mean[:, :, None] * mean[:, None, :])
        return eigh3.smallest_eigvec3(cov * kinv)

    nrm = jax.lax.map(one, (qs.reshape(-1, chunk, 3),
                            thrs.reshape(-1, chunk)))
    return nrm.reshape(-1, 3)[:n]


@functools.partial(jax.jit, static_argnames=("k_use", "epsilon", "chunk"))
def gicp_covariances_dense(points, d2sorted, k_use: int,
                           epsilon: float = 1e-3, n_valid=None,
                           chunk: int = 1024):
    """Gather-free GICP covariance init (C14): dense normals ->
    Sigma = Rx diag(eps,1,1) Rx^T."""
    normals = normals_dense(points, d2sorted, k_use, n_valid, chunk)
    Rx = rotation_from_e1_to_x(normals)
    C = jnp.diag(jnp.asarray([epsilon, 1.0, 1.0], points.dtype))
    return Rx @ C @ Rx.mT


@jax.jit
def rotation_from_e1_to_x(x):
    """Open3D's private GetRotationFromE1ToX, copied by the reference
    (ref:cpp:4-14) -- INCLUDING the c < -0.99 -> identity quirk."""
    dtype = x.dtype
    e1 = jnp.zeros_like(x).at[..., 0].set(1.0)
    v = jnp.cross(e1, x)
    c = x[..., 0]                                        # e1 . x
    from se3_icp_tpu.utils.se3 import skew
    sv = skew(v)
    factor = 1.0 / (1.0 + jnp.where(c < -0.99, jnp.ones_like(c), c))
    R = (jnp.eye(3, dtype=dtype) + sv
         + (sv @ sv) * factor[..., None, None])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), R.shape)
    return jnp.where((c < -0.99)[..., None, None], eye, R)


@functools.partial(jax.jit, static_argnames=("k", "epsilon"))
def gicp_covariances(points, k: int = 20, epsilon: float = 1e-3,
                     n_valid=None):
    """Per-point GICP covariances Sigma = Rx diag(eps,1,1) Rx^T from
    kNN-20 normals (C14, ref:cpp:33-52)."""
    idx, _ = knn.knn_self(points, k, n_valid)
    return gicp_covariances_from_neighbors(points, idx, epsilon)


@functools.partial(jax.jit, static_argnames=("epsilon",))
def gicp_covariances_from_neighbors(points, idx, epsilon: float = 1e-3):
    normals = normals_from_neighbors(points, idx)
    Rx = rotation_from_e1_to_x(normals)
    C = jnp.diag(jnp.asarray([epsilon, 1.0, 1.0], points.dtype))
    return Rx @ C @ Rx.mT


# ---------------------------------------------------------------------
# Fused-Pallas TOLDI (batched): same math as toldi_frames_dense, with
# the O(N^2) mask/moment reductions in the pallas_moments kernels (the
# XLA chunked path rematerializes [B, chunk, N] distance/mask blocks in
# HBM -- ~115 ms per 64x4608 batch on v5e; the kernels run it in ~10 ms)

def _toldi_fused_batched(points, d2sorted, n_valid):
    dtype = points.dtype
    k = d2sorted.shape[2]
    rz = k // 3

    thr_cen = 0.5 * (d2sorted[:, :, rz - 1] + d2sorted[:, :, rz])
    thr_cov = 0.5 * (d2sorted[:, :, rz] + d2sorted[:, :, rz + 1])
    last = jnp.minimum(k - 1, jnp.maximum(n_valid - 1, 1)).astype(
        jnp.int32)
    r2 = jnp.take_along_axis(d2sorted, last[:, None, None],
                             axis=2)[:, :, 0]
    thr_all = r2 * (1.0 + 1e-6) + jnp.asarray(1e-30, dtype)
    radius = jnp.sqrt(jnp.maximum(r2, 0.0))
    return _rot_t9_to_rot(_toldi_fused_from_thr(
        points, thr_cen, thr_cov, thr_all, radius, rz, n_valid))


def _toldi_fused_from_thr(points, thr_cen, thr_cov, thr_all, radius,
                          rz: int, n_valid, queries=None, packed=None,
                          normals_k=None):
    """Batched fused TOLDI from explicit squared-distance thresholds
    (rank sets {self,1..rz-1} / {self,1..rz} / {self,1..k-1}) and the
    neighborhood radius.  ``rz = k // 3`` is the reference's centroid
    divisor (quirk #2, ref:cpp:259-265).  ``queries`` [B,Nq,3]:
    optional query row slice of ``points`` (model-parallel setup);
    thresholds/radius are then per query row.  ``packed``: optional
    shared operands (pallas_moments.pack_cloud_batched).

    COMPONENT-MAJOR throughout: the moments/axis kernels emit [B,C,Nq]
    sums and all glue (covariance assembly, eigh, sign fix,
    Gram-Schmidt) runs on per-component [B,Nq] arrays, keeping the
    point axis on the TPU vector lanes (the [B,Nq,3] form wastes ~97%
    of each 128-lane register; measured ~25 ms of setup fusions per
    64-pair batch at 4608 points on v5e).  Returns the frames
    TRANSPOSED: [B,9,Nq] with rows (x0,x1,x2, y0,y1,y2, z0,z1,z2) --
    i.e. row j*3+i is component i of axis j, exactly the row-major
    flattening of F^T that the 12-D embedding wants.

    ``normals_k``: when the engine ALSO needs PCA normals for the
    self-inclusive count rz (pt2pl with normals_knn == k//3, the
    benchmark configuration), the mask-0 (centroid) sums this kernel
    pass already accumulated ARE the normals' moments -- set
    ``normals_k`` to the divisor (== the count) and three extra rows
    (n0,n1,n2) are appended ([B,12,Nq]), eliding the separate
    normals moments pass (~7 ms per 64-pair batch on v5e)."""
    from se3_icp_tpu.ops import pallas_moments as pm

    dtype = points.dtype
    divisor = jnp.asarray(rz, dtype)             # exact_centroid=False

    mom = pm.moments_batched(points, n_valid, thr_cen, thr_cov, thr_all,
                             queries=queries, packed=packed)
    q_t = mom["q_t"]                                      # [B,3,Nq]

    cen = mom["cen_sum"] / divisor                        # [B,3,Nq]
    s1 = mom["cov_sum"]
    s2 = mom["cov_p9"]                                    # [B,9,Nq]
    m = mom["cov_cnt"][:, None]                           # [B,1,Nq]

    def covc(i, j):
        return (s2[:, 3 * i + j] - s1[:, i] * cen[:, j]
                - cen[:, i] * s1[:, j] + m[:, 0] * cen[:, i] * cen[:, j])
    nx, ny, nz = eigh3.smallest_eigvec3_c(
        covc(0, 0), covc(0, 1), covc(0, 2),
        covc(1, 1), covc(1, 2), covc(2, 2))               # [B,Nq] each
    normal_t = jnp.stack([nx, ny, nz], axis=1)            # [B,3,Nq]

    arrow = mom["all_sum"] - mom["all_cnt"][:, None] * q_t
    ndotq = nx * q_t[:, 0] + ny * q_t[:, 1] + nz * q_t[:, 2]
    w_p, w_sum = pm.axis_sums_batched(points, n_valid, normal_t, ndotq,
                                      radius, thr_all, queries=queries,
                                      packed=packed)
    scaled = w_p - w_sum[:, None] * q_t                   # [B,3,Nq]

    flip = jnp.sum(normal_t * arrow, axis=1) < 0.0        # [B,Nq]
    z = jnp.where(flip[:, None], -normal_t, normal_t)
    x = scaled - jnp.sum(scaled * z, 1, keepdims=True) * z
    xn = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    x = x / jnp.maximum(xn, jnp.asarray(1e-30, dtype))
    y = jnp.stack([z[:, 1] * x[:, 2] - z[:, 2] * x[:, 1],
                   z[:, 2] * x[:, 0] - z[:, 0] * x[:, 2],
                   z[:, 0] * x[:, 1] - z[:, 1] * x[:, 0]], axis=1)
    if normals_k is None:
        return jnp.concatenate([x, y, z], axis=1)         # [B,9,Nq]

    # PCA normal from the mask-0 sums: identical math (incl. self
    # added back and the k_use divisor) to _normals_fused_batched at
    # the same threshold -- see that function
    p9self = jnp.concatenate(
        [q_t * q_t[:, i:i + 1] for i in range(3)], 1)     # [B,9,Nq]
    s1n = mom["cen_sum"] + q_t
    s2n = mom["cen_p9"] + p9self
    mn = mom["cen_cnt"] + 1.0
    kinv = jnp.asarray(1.0 / normals_k, dtype)
    meann = s1n * kinv

    def ncov(i, j):
        return (s2n[:, 3 * i + j] - s1n[:, i] * meann[:, j]
                - meann[:, i] * s1n[:, j]
                + mn * meann[:, i] * meann[:, j]) * kinv
    nnx, nny, nnz = eigh3.smallest_eigvec3_c(
        ncov(0, 0), ncov(0, 1), ncov(0, 2),
        ncov(1, 1), ncov(1, 2), ncov(2, 2))
    nrm = jnp.stack([nnx, nny, nnz], axis=1)              # [B,3,Nq]
    return jnp.concatenate([x, y, z, nrm], axis=1)        # [B,12,Nq]


def _rot_t9_to_rot(rot_t9):
    """[B,9,Nq] transposed frames -> [B,Nq,3,3] row-major rotation
    matrices with axis j in COLUMN j (one relayout, for the non-packed
    engine routes and oracles)."""
    bsz, _, nq = rot_t9.shape
    return jnp.transpose(rot_t9.reshape(bsz, 3, 3, nq), (0, 3, 2, 1))


@jax.custom_batching.custom_vmap
def _toldi_fused_cv(points, d2sorted, n_valid):
    rot, _ = toldi_frames_dense(points, d2sorted, n_valid)
    return rot


@_toldi_fused_cv.def_vmap
def _toldi_fused_vmap_rule(axis_size, in_batched, points, d2sorted,
                           n_valid):
    pb, db, nb = in_batched

    def bc(x, b):
        return x if b else jnp.broadcast_to(
            x[None], (axis_size,) + jnp.shape(x))
    out = _toldi_fused_batched(bc(points, pb), bc(d2sorted, db),
                               bc(jnp.asarray(n_valid, jnp.int32), nb))
    return out, True


def toldi_frames_dense_fused(points, d2sorted, n_valid):
    """TOLDI frames; under vmap on TPU this lowers to the fused
    pallas_moments kernels, otherwise it is toldi_frames_dense.
    Returns (rot [N,3,3], origins) like toldi_frames_dense."""
    import os
    if jax.default_backend() != "tpu" or os.environ.get(
            "SE3_ICP_TPU_NO_PALLAS"):
        return toldi_frames_dense(points, d2sorted, n_valid)
    rot = _toldi_fused_cv(points, d2sorted,
                          jnp.asarray(n_valid, jnp.int32))
    return rot, points


def _normals_fused_batched(points, thr, n_valid, k_use: int,
                           queries=None, packed=None):
    """Batched gather-free PCA normals via the moments kernel (one
    threshold mask; self INCLUDED like normals_dense -- the kernel
    subtracts the self term, so it is added back here).  ``queries``:
    optional query row slice (model-parallel setup).  Returns the
    normals COMPONENT-MAJOR [B,3,Nq] (see _toldi_fused_from_thr)."""
    from se3_icp_tpu.ops import pallas_moments as pm

    dtype = points.dtype
    mom = pm.moments_batched(points, n_valid, thr, thr, thr,
                             queries=queries, packed=packed)
    # component-major glue (see _toldi_fused_from_thr); the kernel
    # subtracted the self term, add it back (self INCLUDED like
    # normals_dense)
    q_t = mom["q_t"]                                      # [B,3,Nq]
    p9self = jnp.concatenate(
        [q_t * q_t[:, i:i + 1] for i in range(3)], 1)     # [B,9,Nq]
    s1 = mom["cov_sum"] + q_t
    s2 = mom["cov_p9"] + p9self
    m = (mom["cov_cnt"] + 1.0)
    kinv = jnp.asarray(1.0 / k_use, dtype)
    mean = s1 * kinv

    def covc(i, j):
        return (s2[:, 3 * i + j] - s1[:, i] * mean[:, j]
                - mean[:, i] * s1[:, j] + m * mean[:, i] * mean[:, j]
                ) * kinv
    nx, ny, nz = eigh3.smallest_eigvec3_c(
        covc(0, 0), covc(0, 1), covc(0, 2),
        covc(1, 1), covc(1, 2), covc(2, 2))
    return jnp.stack([nx, ny, nz], axis=1)                # [B,3,Nq]


def _make_normals_cv(k_use: int):
    @jax.custom_batching.custom_vmap
    def _cv(points, d2sorted, n_valid):
        return normals_dense(points, d2sorted, k_use, n_valid)

    @_cv.def_vmap
    def _rule(axis_size, in_batched, points, d2sorted, n_valid):
        pb, db, nb = in_batched

        def bc(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size,) + jnp.shape(x))
        d2b = bc(d2sorted, db)
        thr = 0.5 * (d2b[:, :, k_use - 1] + d2b[:, :, k_use])
        out = _normals_fused_batched(
            bc(points, pb), thr, bc(jnp.asarray(n_valid, jnp.int32), nb),
            k_use)
        return jnp.swapaxes(out, 1, 2), True    # [B,3,Nq] -> row-major
    return _cv


_normals_cv_cache: dict = {}


def normals_dense_fused(points, d2sorted, k_use: int, n_valid=None):
    """normals_dense; under vmap on TPU the O(N^2) reduction lowers to
    the pallas_moments kernel."""
    import os
    if jax.default_backend() != "tpu" or os.environ.get(
            "SE3_ICP_TPU_NO_PALLAS") or n_valid is None:
        return normals_dense(points, d2sorted, k_use, n_valid)
    if k_use not in _normals_cv_cache:
        _normals_cv_cache[k_use] = _make_normals_cv(k_use)
    return _normals_cv_cache[k_use](points, d2sorted,
                                    jnp.asarray(n_valid, jnp.int32))


def gicp_covariances_dense_fused(points, d2sorted, k_use: int,
                                 epsilon: float = 1e-3, n_valid=None):
    """gicp_covariances_dense with the fused normals path."""
    normals = normals_dense_fused(points, d2sorted, k_use, n_valid)
    Rx = rotation_from_e1_to_x(normals)
    C = jnp.diag(jnp.asarray([epsilon, 1.0, 1.0], points.dtype))
    return Rx @ C @ Rx.mT


# ---------------------------------------------------------------------
# Threshold-driven setup consumers (TPU fast path): thresholds come
# from knn.neighborhood_thresholds (the sort-free Pallas bisection
# kernel) instead of a sorted kNN -- no index lists, no aggregate
# top-k sort anywhere in setup.  Call sites gate on knn.use_thr_knn().

def _make_batched_cv(batched_impl):
    """custom_vmap wrapper around a natively batched TPU kernel path:
    unbatched calls run as a batch of one; under vmap, unbatched args
    broadcast to the batch and the kernel is invoked ONCE (never
    vmap-of-pallas).  ``batched_impl`` takes every argument batched on
    axis 0 and returns one batched array; callers pass valid counts
    already coerced to int32."""
    @jax.custom_batching.custom_vmap
    def _cv(*args):
        return batched_impl(*(a[None] for a in args))[0]

    @_cv.def_vmap
    def _rule(axis_size, in_batched, *args):
        def bc(x, b):
            return x if b else jnp.broadcast_to(
                x[None], (axis_size,) + jnp.shape(x))
        out = batched_impl(*(bc(a, b) for a, b in zip(args, in_batched)))
        return out, True
    return _cv


def _make_toldi_thr_cv(rz: int):
    def impl(points, thr_cen, thr_cov, thr_k, n_valid):
        return _toldi_fused_from_thr(
            points, thr_cen, thr_cov, thr_k,
            jnp.sqrt(jnp.maximum(thr_k, 0.0)), rz, n_valid)
    return _make_batched_cv(impl)


def _make_toldi_thr_packed_cv(rz: int):
    def impl(points, thr_cen, thr_cov, thr_k, n_valid, *packed):
        return _toldi_fused_from_thr(
            points, thr_cen, thr_cov, thr_k,
            jnp.sqrt(jnp.maximum(thr_k, 0.0)), rz, n_valid,
            packed=packed)
    return _make_batched_cv(impl)


def _make_toldi_thr_q_cv(rz: int):
    def impl(points, queries, thr_cen, thr_cov, thr_k, n_valid):
        return _toldi_fused_from_thr(
            points, thr_cen, thr_cov, thr_k,
            jnp.sqrt(jnp.maximum(thr_k, 0.0)), rz, n_valid,
            queries=queries)
    return _make_batched_cv(impl)


def _make_toldi_thr_packed_nrm_cv(rz: int, normals_k: int):
    def impl(points, thr_cen, thr_cov, thr_k, n_valid, *packed):
        return _toldi_fused_from_thr(
            points, thr_cen, thr_cov, thr_k,
            jnp.sqrt(jnp.maximum(thr_k, 0.0)), rz, n_valid,
            packed=packed if packed else None, normals_k=normals_k)
    return _make_batched_cv(impl)


_toldi_thr_cv_cache: dict = {}
_toldi_thr_q_cv_cache: dict = {}
_toldi_thr_packed_cv_cache: dict = {}
_toldi_thr_packed_nrm_cv_cache: dict = {}


def toldi_frames_normals_thr_t(points, thr_cen, thr_cov, thr_k, k: int,
                               normals_k: int, n_valid, packed=None):
    """``toldi_frames_thr_t`` that ALSO returns PCA normals for the
    self-inclusive count rz = k//3 from the same moments pass
    (requires ``normals_k == k // 3`` -- the benchmark configuration
    normals_knn=30, LRF k=90/92).  Returns [12,Nq]: rows 0-8 the
    transposed frames, rows 9-11 the normal components."""
    rz = k // 3
    assert normals_k == rz, (normals_k, rz)
    nv = jnp.asarray(n_valid, jnp.int32)
    key = (rz, normals_k)
    if key not in _toldi_thr_packed_nrm_cv_cache:
        _toldi_thr_packed_nrm_cv_cache[key] = (
            _make_toldi_thr_packed_nrm_cv(rz, normals_k))
    if packed is None:
        packed = ()
    return _toldi_thr_packed_nrm_cv_cache[key](
        points, thr_cen, thr_cov, thr_k, nv, *packed)


def toldi_frames_thr_t(points, thr_cen, thr_cov, thr_k, k: int, n_valid,
                       queries=None, packed=None):
    """TOLDI frames from neighborhood thresholds, TRANSPOSED (TPU
    only): returns rot_t9 [9,Nq] with rows (x0,x1,x2,y0,y1,y2,z0,z1,z2)
    -- the row-major flattening of F^T, which is directly the rotation
    block of the 12-D embedding / affine-kernel feature rows.

    ``thr_cen``/``thr_cov``/``thr_k`` [Nq]: squared-distance thresholds
    for the self-inclusive counts rz, rz+1, k (rz = k//3); ``thr_k``
    doubles as radius^2 (it converges to the k-th neighbor distance
    from above).  ``queries`` [Nq,3]: optional query row slice of
    ``points`` (model-parallel setup)."""
    rz = k // 3
    nv = jnp.asarray(n_valid, jnp.int32)
    if queries is None:
        if packed is not None:
            if rz not in _toldi_thr_packed_cv_cache:
                _toldi_thr_packed_cv_cache[rz] = (
                    _make_toldi_thr_packed_cv(rz))
            return _toldi_thr_packed_cv_cache[rz](
                points, thr_cen, thr_cov, thr_k, nv, *packed)
        if rz not in _toldi_thr_cv_cache:
            _toldi_thr_cv_cache[rz] = _make_toldi_thr_cv(rz)
        return _toldi_thr_cv_cache[rz](points, thr_cen, thr_cov, thr_k,
                                       nv)
    if rz not in _toldi_thr_q_cv_cache:
        _toldi_thr_q_cv_cache[rz] = _make_toldi_thr_q_cv(rz)
    return _toldi_thr_q_cv_cache[rz](points, queries, thr_cen, thr_cov,
                                     thr_k, nv)


def toldi_frames_thr(points, thr_cen, thr_cov, thr_k, k: int, n_valid,
                     queries=None, packed=None):
    """TOLDI frames from neighborhood thresholds (TPU only).  Row-major
    adapter over ``toldi_frames_thr_t``: returns (rot [Nq,3,3],
    origins) like toldi_frames_dense."""
    rot_t9 = toldi_frames_thr_t(points, thr_cen, thr_cov, thr_k, k,
                                n_valid, queries=queries, packed=packed)
    rot = _rot_t9_to_rot(rot_t9[None])[0]
    return rot, (points if queries is None else queries)


def _make_normals_thr_cv(k_use: int):
    def impl(points, thr, n_valid):
        return _normals_fused_batched(points, thr, n_valid, k_use)
    return _make_batched_cv(impl)


def _make_normals_thr_packed_cv(k_use: int):
    def impl(points, thr, n_valid, *packed):
        return _normals_fused_batched(points, thr, n_valid, k_use,
                                      packed=packed)
    return _make_batched_cv(impl)


def _make_normals_thr_q_cv(k_use: int):
    def impl(points, queries, thr, n_valid):
        return _normals_fused_batched(points, thr, n_valid, k_use,
                                      queries=queries)
    return _make_batched_cv(impl)


_normals_thr_cv_cache: dict = {}
_normals_thr_q_cv_cache: dict = {}
_normals_thr_packed_cv_cache: dict = {}


def normals_thr_t(points, thr, k_use: int, n_valid, queries=None,
                  packed=None):
    """PCA normals from a neighborhood threshold, TRANSPOSED [3,Nq]
    (TPU only).  ``thr`` [Nq]: squared-distance threshold for the
    self-inclusive count ``k_use`` (the mean still divides by k_use,
    like normals_dense).  ``queries`` [Nq,3]: optional query row slice
    of ``points``.  ``packed``: optional shared operands
    (knn.pack_setup_cloud)."""
    nv = jnp.asarray(n_valid, jnp.int32)
    if queries is None:
        if packed is not None:
            if k_use not in _normals_thr_packed_cv_cache:
                _normals_thr_packed_cv_cache[k_use] = (
                    _make_normals_thr_packed_cv(k_use))
            return _normals_thr_packed_cv_cache[k_use](points, thr, nv,
                                                       *packed)
        if k_use not in _normals_thr_cv_cache:
            _normals_thr_cv_cache[k_use] = _make_normals_thr_cv(k_use)
        return _normals_thr_cv_cache[k_use](points, thr, nv)
    if k_use not in _normals_thr_q_cv_cache:
        _normals_thr_q_cv_cache[k_use] = _make_normals_thr_q_cv(k_use)
    return _normals_thr_q_cv_cache[k_use](points, queries, thr, nv)


def normals_thr(points, thr, k_use: int, n_valid, queries=None,
                packed=None):
    """Row-major [Nq,3] adapter over ``normals_thr_t``."""
    return normals_thr_t(points, thr, k_use, n_valid, queries=queries,
                         packed=packed).T


def gicp_cov6_from_normals_t(normals_t, epsilon: float = 1e-3):
    """Component-major GICP covariance init from unit normals [3,Nq].

    Closed form of Rx diag(eps,1,1) Rx^T with Rx the Rodrigues rotation
    taking e1 to n (ref:cpp:4-14, 33-52):
        C = I - (1 - eps) n n^T
    INCLUDING the reference's c < -0.99 -> identity-rotation quirk,
    where C degenerates to diag(eps,1,1) regardless of n.  Returns
    [6,Nq] rows (xx, xy, xz, yy, yz, zz) -- no per-point 3x3 matmuls.
    """
    dtype = normals_t.dtype
    nx, ny, nz = normals_t[0], normals_t[1], normals_t[2]
    f = jnp.asarray(1.0 - epsilon, dtype)
    one = jnp.ones_like(nx)
    comps = [one - f * nx * nx, -f * nx * ny, -f * nx * nz,
             one - f * ny * ny, -f * ny * nz, one - f * nz * nz]
    quirk = nx < -0.99
    eps_a = jnp.full_like(nx, epsilon)
    zeros = jnp.zeros_like(nx)
    quirk_comps = [eps_a, zeros, zeros, one, zeros, one]
    return jnp.stack([jnp.where(quirk, qc, c)
                      for c, qc in zip(comps, quirk_comps)])


def _cov6_to_mat(cov6):
    """[6,Nq] symmetric components -> [Nq,3,3] (one relayout, for the
    row-major engine routes and oracles)."""
    rows = jnp.stack([
        jnp.stack([cov6[0], cov6[1], cov6[2]]),
        jnp.stack([cov6[1], cov6[3], cov6[4]]),
        jnp.stack([cov6[2], cov6[4], cov6[5]])])          # [3,3,Nq]
    return jnp.transpose(rows, (2, 0, 1))


def gicp_covariances_thr_t(points, thr, k_use: int,
                           epsilon: float = 1e-3, n_valid=None,
                           queries=None, packed=None):
    """Component-major GICP covariance init from a neighborhood
    threshold (TPU only): [6,Nq] rows (xx, xy, xz, yy, yz, zz)."""
    normals_t = normals_thr_t(points, thr, k_use, n_valid,
                              queries=queries, packed=packed)
    return gicp_cov6_from_normals_t(normals_t, epsilon)


def gicp_covariances_thr(points, thr, k_use: int,
                         epsilon: float = 1e-3, n_valid=None,
                         queries=None, packed=None):
    """GICP covariance init from a neighborhood threshold (TPU only)."""
    return _cov6_to_mat(gicp_covariances_thr_t(
        points, thr, k_use, epsilon, n_valid, queries=queries,
        packed=packed))
