"""Batched closed-form 3x3 symmetric eigendecomposition.

Replaces Eigen's ``SelfAdjointEigenSolver<Matrix3d>`` used per point by the
reference's LRF estimation (ref:cpp:275-281, 158-167) and the matrix
inverse-sqrt in the weighted GICP solve (ref:cpp:78).

TPU-first: no LAPACK-style iteration per matrix -- a branch-free
Cardano + cross-product/2x2-reduction scheme (Eberly's robust 3x3
eigensolver shape) that vmaps/fuses across millions of matrices on the
VPU.  Eigenvalues are returned ascending, like Eigen; eigenvector signs
are arbitrary (as with Eigen), which every consumer here tolerates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _det3(M):
    return (M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2]
                            - M[..., 1, 2] * M[..., 2, 1])
            - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2]
                              - M[..., 1, 2] * M[..., 2, 0])
            + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1]
                              - M[..., 1, 1] * M[..., 2, 0]))


@jax.jit
def eigvalsh3(A):
    """Eigenvalues of symmetric [...,3,3], ascending (Cardano)."""
    dtype = A.dtype
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)),
                        jnp.asarray(1e-30, dtype))
    As = A / scale[..., None, None]
    q = (As[..., 0, 0] + As[..., 1, 1] + As[..., 2, 2]) / 3.0
    B = As - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    eps = jnp.asarray(1e-12 if dtype != jnp.float32 else 1e-7, dtype)
    p_safe = jnp.where(p < eps, jnp.ones_like(p), p)
    r = jnp.clip(_det3(B / p_safe[..., None, None]) * 0.5, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_p = jnp.where(p < eps, jnp.zeros_like(p), 2.0 * p)
    e2 = q + two_p * jnp.cos(phi)
    e0 = q + two_p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e1 = 3.0 * q - e0 - e2
    vals = jnp.stack([e0, e1, e2], -1) * scale[..., None]
    return vals


def _null_vec(M, eps):
    """Unit vector in the (approx) null space of symmetric M: max-norm
    cross product of row pairs, with a basis fallback when M ~ 0."""
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    # pick the largest-norm candidate with pure selects (argmax +
    # take_along_axis lowered to a scalar-bound gather: 2.75 ms per
    # 196k-point batch on v5e, in the GICP per-iteration path)
    v12 = jnp.where((n02 >= n12)[..., None], c02, c12)  # ties: lower pair
    nb12 = jnp.maximum(n02, n12)
    v = jnp.where((n01 >= nb12)[..., None], c01, v12)
    nbest = jnp.maximum(n01, nb12)
    ok = nbest > eps * eps
    v = jnp.where(ok[..., None], v, jnp.zeros_like(v).at[..., 0].set(1.0))
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(nrm, eps)


def _complement(w, eps):
    """Orthonormal (U, V) spanning the plane perpendicular to unit w."""
    abs_w = jnp.abs(w)
    use_x = abs_w[..., 0] > abs_w[..., 2]
    inv1 = 1.0 / jnp.maximum(
        jnp.sqrt(w[..., 0] ** 2 + w[..., 1] ** 2), eps)
    inv2 = 1.0 / jnp.maximum(
        jnp.sqrt(w[..., 1] ** 2 + w[..., 2] ** 2), eps)
    u_a = jnp.stack([-w[..., 1] * inv1, w[..., 0] * inv1,
                     jnp.zeros_like(w[..., 0])], -1)
    u_b = jnp.stack([jnp.zeros_like(w[..., 0]), -w[..., 2] * inv2,
                     w[..., 1] * inv2], -1)
    U = jnp.where(use_x[..., None], u_a, u_b)
    V = jnp.cross(w, U)
    return U, V


@jax.jit
def eigh3(A):
    """Symmetric [...,3,3] -> (eigvals [...,3] ascending,
    eigvecs [...,3,3] with the k-th COLUMN the k-th eigenvector),
    mirroring Eigen's ``SelfAdjointEigenSolver`` layout."""
    dtype = A.dtype
    eps = jnp.asarray(1e-7 if dtype == jnp.float32 else 1e-14, dtype)
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)),
                        jnp.asarray(1e-30, dtype))
    As = A / scale[..., None, None]
    vals_s = eigvalsh3(As)                       # unscaled eigenvalues
    e0, e1, e2 = vals_s[..., 0], vals_s[..., 1], vals_s[..., 2]
    eye = jnp.eye(3, dtype=dtype)

    # Choose the better-isolated extreme eigenvalue first.
    first_is_low = (e1 - e0) >= (e2 - e1)
    lam_first = jnp.where(first_is_low, e0, e2)
    w = _null_vec(As - lam_first[..., None, None] * eye, eps)

    # Reduce the complement to a 2x2 symmetric problem.
    U, V = _complement(w, eps)
    AU = jnp.einsum("...ij,...j->...i", As, U)
    AV = jnp.einsum("...ij,...j->...i", As, V)
    a = jnp.sum(U * AU, -1)
    b = jnp.sum(U * AV, -1)
    c = jnp.sum(V * AV, -1)
    # 2x2 eigvec for the *other* extreme eigenvalue.
    lam_other = jnp.where(first_is_low, e2, e0)
    # (a - lam) x + b y = 0  -> direction (b, lam - a) or (lam - c, b)
    d1 = jnp.stack([b, lam_other - a], -1)
    d2 = jnp.stack([lam_other - c, b], -1)
    n1 = jnp.sum(d1 * d1, -1)
    n2 = jnp.sum(d2 * d2, -1)
    d = jnp.where((n1 >= n2)[..., None], d1, d2)
    nd = jnp.linalg.norm(d, axis=-1, keepdims=True)
    # Degenerate 2x2 (equal remaining eigvals): any direction works.
    d = jnp.where(nd > eps, d / jnp.maximum(nd, eps),
                  jnp.zeros_like(d).at[..., 0].set(1.0))
    v_other = d[..., 0:1] * U + d[..., 1:2] * V
    v_mid = jnp.cross(w, v_other)

    v0 = jnp.where(first_is_low[..., None], w, v_other)
    v2 = jnp.where(first_is_low[..., None], v_other, w)
    vecs = jnp.stack([v0, v_mid, v2], -1)        # columns
    return vals_s * scale[..., None], vecs


@jax.jit
def smallest_eigvec3(A):
    """Unit eigenvector of the smallest eigenvalue (normal direction)."""
    _, vecs = eigh3(A)
    return vecs[..., 0]


def _cardano_cos(r):
    """Cardano's two cosines: (cos(acos(r)/3), cos(acos(r)/3 + 2pi/3))."""
    phi = jnp.arccos(r) / 3.0
    return jnp.cos(phi), jnp.cos(phi + 2.0 * jnp.pi / 3.0)


# acos(x)/sqrt(1-x) on [0,1], degree-7 least-squares fit; the resulting
# acos approximation is |err| <= 2.5e-8 over [-1,1] -- below f32 ulp
_ACOS_C = (1.5707963018, -0.2145984945, 0.0889741021, -0.0501450367,
           0.0308082776, -0.0169654979, 0.0065808987, -0.0012370074)


def cardano_cos_kernel_safe(r):
    """``_cardano_cos`` without acos/atan2/large-angle cos, none of
    which lower on Mosaic TC: polynomial acos (|err| 2.5e-8) + Taylor
    cos/sin on phi in [0, pi/3] (|err| < 4e-8), combined with the
    angle-addition identity.  End-to-end error vs jnp is ~3e-8 --
    below f32 roundoff of the downstream eigenvalues."""
    xa = jnp.abs(r)
    p = jnp.asarray(_ACOS_C[7], r.dtype)
    for k in range(6, -1, -1):
        p = p * xa + _ACOS_C[k]
    u_pos = jnp.sqrt(jnp.maximum(1.0 - xa, 0.0)) * p
    u = jnp.where(r < 0, jnp.pi - u_pos, u_pos)
    phi = u * (1.0 / 3.0)
    x2 = phi * phi
    cosp = 1.0 + x2 * (-1.0 / 2 + x2 * (1.0 / 24 + x2 * (
        -1.0 / 720 + x2 * (1.0 / 40320 - x2 * (1.0 / 3628800)))))
    sinp = phi * (1.0 + x2 * (-1.0 / 6 + x2 * (1.0 / 120 + x2 * (
        -1.0 / 5040 + x2 * (1.0 / 362880)))))
    return cosp, -0.5 * cosp - 0.8660254037844386 * sinp


def eigh3_c(a00, a01, a02, a11, a12, a22, cardano=_cardano_cos):
    """``eigh3`` on COMPONENT-MAJOR operands.

    Plain function (not jit-wrapped): every call site is already inside
    a jitted program, and the component form is what the Pallas loop
    epilogue kernel traces INSIDE the kernel body (pallas_loop.py) --
    pass ``cardano=cardano_cos_kernel_safe`` there.

    Each argument is one symmetric-matrix component of shape [...]
    (typically [N] or [B, N]); returns ``(vals, vecs)`` where ``vals``
    is a 3-tuple of eigenvalue arrays (ascending) and ``vecs`` a
    3-tuple of eigenvector component 3-tuples ``vecs[k][i]`` (component
    i of the k-th eigenvector), matching ``eigh3``'s column layout.

    Same Cardano + null-space/2x2-reduction scheme as ``eigh3``, but
    expressed on per-component arrays so every elementwise op runs with
    the large point axis on the TPU's vector lanes.  The [..., 3]/
    [..., 3, 3] layout of ``eigh3`` puts a 3-wide minor dim on the
    128-lane registers (~97% waste) -- measured ~10 ms of setup fusions
    per 64-pair batch at 4608 points on v5e for the LRF normals alone.
    Consumers that use only part of the output (e.g. the smallest
    eigenvector) rely on XLA dead-code elimination -- unused components
    cost nothing.
    """
    dtype = a00.dtype
    eps = jnp.asarray(1e-7 if dtype == jnp.float32 else 1e-14, dtype)

    def _dot3(x, y):
        return x[0] * y[0] + x[1] * y[1] + x[2] * y[2]

    def _cross3(x, y):
        return (x[1] * y[2] - x[2] * y[1],
                x[2] * y[0] - x[0] * y[2],
                x[0] * y[1] - x[1] * y[0])

    def _where3(c, x, y):
        return tuple(jnp.where(c, a, b) for a, b in zip(x, y))

    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a01)),
                    jnp.maximum(jnp.abs(a02), jnp.abs(a11))),
        jnp.maximum(jnp.maximum(jnp.abs(a12), jnp.abs(a22)),
                    jnp.asarray(1e-30, dtype)))
    s00, s01, s02 = a00 / scale, a01 / scale, a02 / scale
    s11, s12, s22 = a11 / scale, a12 / scale, a22 / scale

    # --- Cardano eigenvalues (eigvalsh3 on components)
    q = (s00 + s11 + s22) / 3.0
    b00, b11, b22 = s00 - q, s11 - q, s22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (s01 * s01 + s02 * s02 + s12 * s12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    peps = jnp.asarray(1e-12 if dtype != jnp.float32 else 1e-7, dtype)
    p_safe = jnp.where(p < peps, jnp.ones_like(p), p)
    pinv = 1.0 / p_safe
    d00, d11, d22 = b00 * pinv, b11 * pinv, b22 * pinv
    d01, d02, d12 = s01 * pinv, s02 * pinv, s12 * pinv
    det = (d00 * (d11 * d22 - d12 * d12)
           - d01 * (d01 * d22 - d12 * d02)
           + d02 * (d01 * d12 - d11 * d02))
    r = jnp.clip(det * 0.5, -1.0, 1.0)
    cos0, cos_plus = cardano(r)
    two_p = jnp.where(p < peps, jnp.zeros_like(p), 2.0 * p)
    e2 = q + two_p * cos0
    e0 = q + two_p * cos_plus
    e1 = 3.0 * q - e0 - e2

    # --- better-isolated extreme eigenvalue first
    first_is_low = (e1 - e0) >= (e2 - e1)
    lam_first = jnp.where(first_is_low, e0, e2)

    # null vector of (A - lam I): max-norm cross of row pairs
    r0 = (s00 - lam_first, s01, s02)
    r1 = (s01, s11 - lam_first, s12)
    r2 = (s02, s12, s22 - lam_first)
    c01 = _cross3(r0, r1)
    c02 = _cross3(r0, r2)
    c12 = _cross3(r1, r2)
    n01 = _dot3(c01, c01)
    n02 = _dot3(c02, c02)
    n12 = _dot3(c12, c12)
    v12 = _where3(n02 >= n12, c02, c12)
    nb12 = jnp.maximum(n02, n12)
    v = _where3(n01 >= nb12, c01, v12)
    nbest = jnp.maximum(n01, nb12)
    ok = nbest > eps * eps
    v = _where3(ok, v, (jnp.ones_like(v[0]), jnp.zeros_like(v[1]),
                        jnp.zeros_like(v[2])))
    nrm = jnp.sqrt(_dot3(v, v))
    winv = 1.0 / jnp.maximum(nrm, eps)
    w = (v[0] * winv, v[1] * winv, v[2] * winv)

    # orthonormal complement (U, V) of w
    use_x = jnp.abs(w[0]) > jnp.abs(w[2])
    inv1 = 1.0 / jnp.maximum(jnp.sqrt(w[0] * w[0] + w[1] * w[1]), eps)
    inv2 = 1.0 / jnp.maximum(jnp.sqrt(w[1] * w[1] + w[2] * w[2]), eps)
    zero = jnp.zeros_like(w[0])
    U = _where3(use_x, (-w[1] * inv1, w[0] * inv1, zero),
                (zero, -w[2] * inv2, w[1] * inv2))
    V = _cross3(w, U)

    def _matvec(x):
        return (s00 * x[0] + s01 * x[1] + s02 * x[2],
                s01 * x[0] + s11 * x[1] + s12 * x[2],
                s02 * x[0] + s12 * x[1] + s22 * x[2])

    AU = _matvec(U)
    AV = _matvec(V)
    a = _dot3(U, AU)
    b = _dot3(U, AV)
    c = _dot3(V, AV)
    lam_other = jnp.where(first_is_low, e2, e0)
    d1x, d1y = b, lam_other - a
    d2x, d2y = lam_other - c, b
    n1 = d1x * d1x + d1y * d1y
    n2 = d2x * d2x + d2y * d2y
    pick1 = n1 >= n2
    dx = jnp.where(pick1, d1x, d2x)
    dy = jnp.where(pick1, d1y, d2y)
    nd = jnp.sqrt(dx * dx + dy * dy)
    dinv = 1.0 / jnp.maximum(nd, eps)
    good = nd > eps
    dx = jnp.where(good, dx * dinv, 1.0)
    dy = jnp.where(good, dy * dinv, 0.0)
    v_other = (dx * U[0] + dy * V[0], dx * U[1] + dy * V[1],
               dx * U[2] + dy * V[2])
    v_mid = _cross3(w, v_other)

    v0 = _where3(first_is_low, w, v_other)
    v2 = _where3(first_is_low, v_other, w)
    vals = (e0 * scale, e1 * scale, e2 * scale)
    return vals, (v0, v_mid, v2)


def smallest_eigvec3_c(a00, a01, a02, a11, a12, a22,
                       cardano=_cardano_cos):
    """Unit eigenvector of the smallest eigenvalue, component-major:
    returns (v0, v1, v2) arrays (see ``eigh3_c``)."""
    _, vecs = eigh3_c(a00, a01, a02, a11, a12, a22, cardano=cardano)
    return vecs[0]


def inv_sqrt_sym3_c(a00, a01, a02, a11, a12, a22, eps_clamp=1e-12,
                    cardano=_cardano_cos):
    """``inv_sqrt_sym3`` on component-major operands: returns the six
    components (w00, w01, w02, w11, w12, w22) of M^(-1/2) =
    sum_k lam_k^(-1/2) v_k v_k^T."""
    vals, vecs = eigh3_c(a00, a01, a02, a11, a12, a22, cardano=cardano)
    dtype = a00.dtype
    out = [jnp.zeros_like(a00) for _ in range(6)]
    pairs = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    for lam, v in zip(vals, vecs):
        s = 1.0 / jnp.sqrt(jnp.maximum(lam, jnp.asarray(eps_clamp,
                                                        dtype)))
        for m, (i, j) in enumerate(pairs):
            out[m] = out[m] + s * v[i] * v[j]
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("eps_clamp",))
def inv_sqrt_sym3(A, eps_clamp=1e-12):
    """M^(-1/2) for symmetric PSD [...,3,3] via eigh (ref:cpp:78 uses
    Eigen ``M.inverse().sqrt()``)."""
    vals, vecs = eigh3(A)
    inv_sqrt = 1.0 / jnp.sqrt(jnp.maximum(vals, eps_clamp))
    return jnp.einsum("...ik,...k,...jk->...ij", vecs, inv_sqrt, vecs)
