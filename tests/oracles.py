"""Pure numpy/scipy oracles transcribing the reference algorithms for
unit-testing the JAX kernels.  Straightforward per-point loops -- slow,
readable, and independent of the library code under test."""

import numpy as np
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation


def toldi_frame_oracle(points, query, k, tree=None):
    """computeSingleTOLDISE3Frame (ref:cpp:241-316), incl. quirks."""
    if tree is None:
        tree = cKDTree(points)
    d, idx = tree.query(query, k=k)
    radius = np.linalg.norm(query - points[idx[-1]])

    rz = k // 3
    centroid = points[idx[1:rz]].sum(axis=0) / rz  # off-by-one kept
    diff = points[idx[1:rz + 1]] - centroid
    cov = diff.T @ diff
    w_eig, v_eig = np.linalg.eigh(cov)
    normal = v_eig[:, 0]

    v = points[idx[1:]] - query
    arrow = v.sum(axis=0)
    w1 = (radius - np.linalg.norm(v, axis=1)) ** 2
    w2 = (v @ normal) ** 2
    scaled = ((w1 * w2)[:, None] * v).sum(axis=0)
    if normal @ arrow < 0:
        normal = -normal
    z = normal
    x = scaled - (scaled @ z) * z
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, y, z, query
    return T


def normals_oracle(points, k):
    tree = cKDTree(points)
    _, idx = tree.query(points, k=k)
    normals = np.zeros_like(points)
    for i in range(len(points)):
        nb = points[idx[i]]
        nb = nb - nb.mean(axis=0)
        cov = nb.T @ nb / k
        w, v = np.linalg.eigh(cov)
        normals[i] = v[:, 0]
    return normals


def rotation_from_e1_to_x_oracle(x):
    """GetRotationFromE1ToX (ref:cpp:4-14) incl. the c<-0.99 quirk."""
    e1 = np.array([1.0, 0, 0])
    v = np.cross(e1, x)
    c = e1 @ x
    if c < -0.99:
        return np.eye(3)
    sv = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + sv + sv @ sv / (1 + c)


def gicp_cov_oracle(points, k=20, eps=1e-3):
    normals = normals_oracle(points, k)
    covs = np.zeros((len(points), 3, 3))
    C = np.diag([eps, 1.0, 1.0])
    for i, n in enumerate(normals):
        Rx = rotation_from_e1_to_x_oracle(n)
        covs[i] = Rx @ C @ Rx.T
    return covs


def umeyama_oracle(src, tgt):
    """Eigen::umeyama without scaling (Open3D pt2pt)."""
    mu_s, mu_t = src.mean(axis=0), tgt.mean(axis=0)
    H = (tgt - mu_t).T @ (src - mu_s)
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    R = U @ np.diag([1.0, 1.0, d]) @ Vt
    t = mu_t - R @ mu_s
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    return T


def euler_zyx_to_T(xi):
    """Open3D TransformVector6dToMatrix4d."""
    R = (Rotation.from_euler("z", xi[2]).as_matrix()
         @ Rotation.from_euler("y", xi[1]).as_matrix()
         @ Rotation.from_euler("x", xi[0]).as_matrix())
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, xi[3:6]
    return T


def pt2pl_oracle(src, tgt, normals):
    """Open3D TransformationEstimationPointToPlane GN step."""
    r = np.einsum("ni,ni->n", src - tgt, normals)
    J = np.concatenate([np.cross(src, normals), normals], axis=1)
    JTJ = J.T @ J
    JTr = J.T @ r
    xi = np.linalg.solve(JTJ, -JTr)
    return euler_zyx_to_T(xi)


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _inv_sqrt(M):
    w, v = np.linalg.eigh(M)
    return v @ np.diag(1.0 / np.sqrt(w)) @ v.T


def gicp_oracle(src, tgt, cov_s, cov_t, weights=None):
    """optimize_generalizedICP_manual (ref:cpp:57-110)."""
    n = len(src)
    if weights is None:
        weights = np.ones(n)
    JTJ = np.zeros((6, 6))
    JTr = np.zeros(6)
    for i in range(n):
        W = weights[i] * _inv_sqrt(cov_s[i] + cov_t[i])
        J = W @ np.concatenate([-_skew(src[i]), np.eye(3)], axis=1)
        r = W @ (src[i] - tgt[i])
        JTJ += J.T @ J
        JTr += J.T @ r
    xi = np.linalg.solve(JTJ, -JTr)
    return euler_zyx_to_T(xi)


def trimmed_mask_oracle(distances, ratio):
    """PCL CorrespondenceRejectorTrimmed: keep floor(ratio*N) smallest."""
    n = len(distances)
    count = int(ratio * n)
    order = np.argsort(distances, kind="stable")
    mask = np.zeros(n, dtype=bool)
    mask[order[:count]] = True
    return mask


def shot_frame_oracle(points, query_idx, radius):
    """computeSingleSHOTSE3Frame (ref:cpp:121-223), literal: ascending
    radius list with the center at position 0 skipped, (radius - d)
    covariance weights, sign disambiguation with the 5-sample
    median-rank tie-break (out-of-range samples skipped -- the
    reference indexes out of bounds there).  Returns rot [3,3]."""
    p = np.asarray(points, np.float64)
    center = p[query_idx]
    d2 = np.sum((p - center) ** 2, axis=1)
    order = [j for j in np.argsort(d2, kind="stable")
             if d2[j] <= radius * radius and j != query_idx]
    diffs = p[order] - center                    # ascending by distance
    d = np.sqrt(d2[order])
    w = radius - d
    cov = (w[:, None, None] * diffs[:, :, None] * diffs[:, None, :]
           ).sum(0) / max(w.sum(), 1e-30)
    _, vecs = np.linalg.eigh(cov)
    x_plus, z_plus = vecs[:, 2], vecs[:, 0]
    m = len(order)

    def disamb(a):
        dots = diffs @ a
        s2 = 2 * int((dots >= 0).sum()) - m
        if s2 == 0:
            med = m // 2
            s_tie = sum(int(dots[med - i] >= 0) for i in range(-2, 3)
                        if 0 <= med - i < m)
            return -a if s_tie < 3 else a
        return -a if s2 < 0 else a

    x_plus = disamb(x_plus)
    z_plus = disamb(z_plus)
    return np.stack([x_plus, np.cross(z_plus, x_plus), z_plus], -1)
