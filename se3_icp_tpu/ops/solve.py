"""Per-iteration rigid-transform estimators (C12/C13).

Masked/weighted re-designs of the Open3D estimators the reference
delegates to (ref:hpp:76-78, invoked at ref:cpp:524-532, 691-699,
1091-1099) plus the reference's own weighted GICP Gauss-Newton solve
(``optimize_generalizedICP_manual``, ref:cpp:57-110):

  * pt2pt: Umeyama/Kabsch without scale (Open3D
    ``TransformationEstimationPointToPoint::ComputeTransformation``).
  * pt2pl: linearized 6-DoF Gauss-Newton with J = [p x n ; n],
    r = (p - q) . n, solved via 6x6 normal equations and retracted with
    Open3D's Euler-ZYX ``TransformVector6dToMatrix4d`` convention.
  * gicp: per-correspondence whitening W = w * (Cs + Ct)^(-1/2)
    (3x3 inverse sqrt via the closed-form eigh), J = W [-skew(p) | I],
    r = W (p - q).  ``w`` is the confidence weight of the with_cf
    variant (ref:cpp:78 applies it INSIDE W, so it enters the normal
    equations quadratically -- reproduced).

TPU-first: instead of selecting a compacted subset of correspondences,
every estimator takes a full-length 0/1 (or confidence) mask so shapes
stay static; the JtJ/Jtr reductions are single [6,3N]x[3N,6]-shaped
matmuls that land on the MXU.  Failure of the 6x6 solve (singular /
non-finite) degrades to identity like Open3D's
``SolveJacobianSystemAndObtainExtrinsicMatrix``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from se3_icp_tpu.ops import eigh3
from se3_icp_tpu.utils import se3


def _identity_like(dtype):
    return jnp.eye(4, dtype=dtype)


def _safe_transform(T, ok):
    eye = jnp.eye(4, dtype=T.dtype)
    ok = ok & jnp.isfinite(T).all()
    return jnp.where(ok, T, eye)


def solve_normal_equations(JTJ, JTr):
    """Solve JTJ xi = -JTr, retract via Euler-ZYX; identity on failure.

    Mirrors Open3D ``SolveJacobianSystemAndObtainExtrinsicMatrix``.
    """
    xi = jnp.linalg.solve(JTJ, -JTr)
    ok = jnp.isfinite(xi).all()
    xi = jnp.where(jnp.isfinite(xi), xi, 0.0)
    T = se3.euler_zyx_retract(xi)
    return _safe_transform(T, ok)


def solve_pt2pt(src, tgt, weights):
    """Weighted Umeyama (no scale): argmin_R,t sum w ||R s + t - q||^2.

    With 0/1 trim weights this equals Open3D's unweighted Umeyama over
    the selected correspondence subset.
    """
    dtype = src.dtype
    w = weights.astype(dtype)[:, None]
    wsum = jnp.sum(w)
    ok = wsum > 2.5  # need >= 3 points for a rigid fit
    wsafe = jnp.maximum(wsum, jnp.asarray(1e-30, dtype))
    mu_s = jnp.sum(src * w, axis=0) / wsafe
    mu_t = jnp.sum(tgt * w, axis=0) / wsafe
    ds = (src - mu_s) * w
    dt = tgt - mu_t
    # Sigma_{ts} = sum w (t - mu_t)(s - mu_s)^T
    H = dt.T @ ds
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], dtype)).at[2, 2].set(d)
    R = U @ D @ Vt
    t = mu_t - R @ mu_s
    return _safe_transform(se3.rt_to_T(R, t), ok)


def solve_pt2pl(src, tgt, tgt_normals, weights):
    """Point-to-plane GN step (Open3D TransformationEstimationPointToPlane).

    J_i = [s_i x n_i ; n_i],  r_i = (s_i - q_i) . n_i
    """
    dtype = src.dtype
    w = weights.astype(dtype)
    r = jnp.sum((src - tgt) * tgt_normals, axis=-1)          # [N]
    J = jnp.concatenate([jnp.cross(src, tgt_normals), tgt_normals],
                        axis=-1)                              # [N,6]
    Jw = J * w[:, None]
    JTJ = Jw.T @ J
    JTr = Jw.T @ r
    ok = jnp.sum(w) > 5.5  # 6 dof
    return _safe_transform(solve_normal_equations(JTJ, JTr), ok)


def solve_gicp(src, tgt, cov_src, cov_tgt, weights, conf=None):
    """(Weighted) generalized-ICP GN step.

    ``weights``: 0/1 trim mask.  ``conf``: optional per-correspondence
    confidence applied inside the whitening matrix exactly like the
    reference's ``optimize_generalizedICP_manual`` (ref:cpp:78).
    """
    dtype = src.dtype
    w = weights.astype(dtype)
    M = cov_src + cov_tgt
    W = eigh3.inv_sqrt_sym3(M)                               # [N,3,3]
    if conf is not None:
        W = W * conf.astype(dtype)[:, None, None]
    # J3 = W @ [-skew(s) | I]  -> [N,3,6]
    S = se3.skew(src)                                        # [N,3,3]
    J_rot = -(W @ S)                                         # W @ (-skew)
    J3 = jnp.concatenate([J_rot, W], axis=-1)                # [N,3,6]
    r3 = jnp.einsum("nij,nj->ni", W, src - tgt)              # [N,3]
    J3w = J3 * w[:, None, None]
    n = src.shape[0]
    JTJ = J3w.reshape(3 * n, 6).T @ J3.reshape(3 * n, 6)
    JTr = J3w.reshape(3 * n, 6).T @ r3.reshape(3 * n)
    ok = jnp.sum(w) > 5.5
    return _safe_transform(solve_normal_equations(JTJ, JTr), ok)


def rotate_sym3_T(R, cov6):
    """(R C R^T) on component-major symmetric operands.

    ``cov6`` [6,N]: rows (xx, xy, xz, yy, yz, zz); ``R`` [3,3].
    Returns the rotated components in the same layout -- the per-point
    [N,3,3] einsum this replaces runs with a 3-wide minor dim (per-
    iteration cost in the GICP loop)."""
    idx = {(0, 0): 0, (0, 1): 1, (1, 0): 1, (0, 2): 2, (2, 0): 2,
           (1, 1): 3, (1, 2): 4, (2, 1): 4, (2, 2): 5}
    out = []
    for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        acc = None
        for k in range(3):
            for l in range(3):
                term = (R[i, k] * R[j, l]) * cov6[idx[(k, l)]]
                acc = term if acc is None else acc + term
        out.append(acc)
    return jnp.stack(out)


def solve_gicp_T(srcT, tgtT, cov_src6, cov_tgt6, weights, conf=None):
    """``solve_gicp`` on feature-major operands (see solve_pt2pl_T).

    srcT/tgtT [3,N]; cov_src6/cov_tgt6 [6,N] symmetric components
    (xx, xy, xz, yy, yz, zz).  The whitening eigendecomposition and all
    per-point 3x3 algebra run component-wise (wide vector lanes)
    instead of on [N,3,3] tiles; same math as solve_gicp.
    """
    dtype = srcT.dtype
    w = weights.astype(dtype)
    M = cov_src6 + cov_tgt6
    W6 = eigh3.inv_sqrt_sym3_c(M[0], M[1], M[2], M[3], M[4], M[5])
    if conf is not None:
        c = conf.astype(dtype)
        W6 = tuple(x * c for x in W6)
    W = ((W6[0], W6[1], W6[2]),
         (W6[1], W6[3], W6[4]),
         (W6[2], W6[4], W6[5]))
    s = (srcT[0], srcT[1], srcT[2])
    d = (srcT[0] - tgtT[0], srcT[1] - tgtT[1], srcT[2] - tgtT[2])

    def wdot(row, v):
        return row[0] * v[0] + row[1] * v[1] + row[2] * v[2]

    # r = W (s - t); J = W @ [-skew(s) | I]:
    # (-skew(s)) columns: c0 = (0, -s2, s1), c1 = (s2, 0, -s0),
    #                     c2 = (-s1, s0, 0)
    zero = jnp.zeros_like(s[0])
    cols = (((zero, -s[2], s[1]), (s[2], zero, -s[0]),
             (-s[1], s[0], zero)))
    r = [wdot(W[i], d) for i in range(3)]                 # 3 x [N]
    J = [[wdot(W[i], cols[a]) for a in range(3)]
         + [W[i][0], W[i][1], W[i][2]] for i in range(3)]  # [3][6] of [N]
    Jarr = jnp.stack([jnp.stack(Ji) for Ji in J])          # [3,6,N]
    rarr = jnp.stack(r)                                    # [3,N]
    Jw = Jarr * w[None, None, :]
    JTJ = jnp.einsum("ian,ibn->ab", Jw, Jarr)
    JTr = jnp.einsum("ian,in->a", Jw, rarr)
    ok = jnp.sum(w) > 5.5
    return _safe_transform(solve_normal_equations(JTJ, JTr), ok)


def solve_pt2pl_T(srcT, tgtT, nT, weights):
    """``solve_pt2pl`` on feature-major [3,N] operands.

    The TPU hot loop keeps per-point data TRANSPOSED ([3,N] / [6,N]) so
    every elementwise op and reduction runs with the large N axis on
    the vector lanes; the row-major [N,3] form wastes ~90% of each
    128-lane transaction (measured ~4 ms/iter of narrow-dim fusions at
    64x4608 on v5e).  Same math as solve_pt2pl.
    """
    dtype = srcT.dtype
    w = weights.astype(dtype)
    r = jnp.sum((srcT - tgtT) * nT, axis=0)               # [N]
    cx = srcT[1] * nT[2] - srcT[2] * nT[1]
    cy = srcT[2] * nT[0] - srcT[0] * nT[2]
    cz = srcT[0] * nT[1] - srcT[1] * nT[0]
    JT = jnp.stack([cx, cy, cz, nT[0], nT[1], nT[2]])     # [6,N]
    JTw = JT * w[None, :]
    JTJ = jnp.einsum("in,jn->ij", JTw, JT)
    JTr = JTw @ r
    ok = jnp.sum(w) > 5.5
    return _safe_transform(solve_normal_equations(JTJ, JTr), ok)


def solve_pt2pt_T(srcT, tgtT, weights):
    """``solve_pt2pt`` on feature-major [3,N] operands (see
    solve_pt2pl_T)."""
    dtype = srcT.dtype
    w = weights.astype(dtype)[None, :]
    wsum = jnp.sum(w)
    ok = wsum > 2.5
    wsafe = jnp.maximum(wsum, jnp.asarray(1e-30, dtype))
    mu_s = jnp.sum(srcT * w, axis=1) / wsafe
    mu_t = jnp.sum(tgtT * w, axis=1) / wsafe
    dsw = (srcT - mu_s[:, None]) * w
    dt = tgtT - mu_t[:, None]
    H = jnp.einsum("in,jn->ij", dt, dsw)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], dtype)).at[2, 2].set(d)
    R = U @ D @ Vt
    t = mu_t - R @ mu_s
    return _safe_transform(se3.rt_to_T(R, t), ok)


def solve_from_normal(JTJ, JTr, wsum):
    """Finish a pt2pl/gicp step whose JtJ/Jtr reduction already ran in
    the fused loop-epilogue kernel (ops/pallas_loop.py): 6x6 solve +
    Euler-ZYX retraction, identity on failure / under-determined fits."""
    ok = wsum > 5.5
    return _safe_transform(solve_normal_equations(JTJ, JTr), ok)


def solve_pt2pt_from_moments(H, mu_s, mu_t, wsum):
    """Finish a pt2pt (Umeyama) step from the fused epilogue kernel's
    weighted moments: H = sum w (t - mu_t)(s - mu_s)^T, plus the
    weighted means.  Same SVD/sign logic as solve_pt2pt."""
    dtype = H.dtype
    ok = wsum > 2.5
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], dtype)).at[2, 2].set(d)
    R = U @ D @ Vt
    t = mu_t - R @ mu_s
    return _safe_transform(se3.rt_to_T(R, t), ok)


def estimate_transform(variant: str, src, tgt, weights, *,
                       tgt_normals=None, cov_src=None, cov_tgt=None,
                       conf=None):
    """Dispatch on the reference's variant-name surface
    ('pt2pt' | 'pt2pl' | 'gicp', ref:cpp:691-699)."""
    if variant == "pt2pt":
        return solve_pt2pt(src, tgt, weights)
    if variant == "pt2pl":
        return solve_pt2pl(src, tgt, tgt_normals, weights)
    if variant == "gicp":
        return solve_gicp(src, tgt, cov_src, cov_tgt, weights, conf)
    raise ValueError(f"Invalid ICP variant name: {variant!r}. "
                     "Valid names are pt2pt, pt2pl and gicp.")
