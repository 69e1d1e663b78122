"""SO(3)/SE(3) utilities (pure JAX, batched, dtype-polymorphic).

Replaces the Eigen pieces the reference leans on: ``AngleAxis`` rotation
composition (ref:cc:22-30), matrix log + vee (ref:cc:32-37), skew
matrices, Open3D's Euler-ZYX retraction ``TransformVector6dToMatrix4d``
(used by every Gauss-Newton estimator), and homogeneous transform
application/accumulation (ref:cpp:541-544, 705-716).

All functions accept numpy or jax arrays and preserve the input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def rot_3d(roll, pitch, yaw, dtype=jnp.float64):
    """Rotation from roll/pitch/yaw: R = Rz(yaw) @ Ry(pitch) @ Rx(roll).

    Matches ``cc::rot_3d`` (ref:cc:22-30): quaternion composition
    yaw*pitch*roll about unit Z/Y/X axes.
    """
    return (_axis_rot(yaw, 2, dtype) @ _axis_rot(pitch, 1, dtype)
            @ _axis_rot(roll, 0, dtype))


def _axis_rot(angle, axis: int, dtype):
    angle = jnp.asarray(angle, dtype=dtype)
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == 0:
        rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
    elif axis == 1:
        rows = [[c, zero, s], [zero, one, zero], [-s, zero, c]]
    else:
        rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def skew(v):
    """[..., 3] -> [..., 3, 3] cross-product matrix (o3d utility::SkewMatrix)."""
    v = jnp.asarray(v)
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([z, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], z, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)


def euler_zyx_retract(xi):
    """6-vector (rx, ry, rz, tx, ty, tz) -> 4x4 transform.

    Matches Open3D ``TransformVector6dToMatrix4d``: R = Rz(rz) Ry(ry) Rx(rx)
    -- an Euler-angle retraction, NOT the exp map.  Every reference
    Gauss-Newton estimator (pt2pl, GICP) retracts this way, so parity
    requires matching it (SURVEY.md quirk note on C13).
    """
    xi = jnp.asarray(xi)
    dtype = xi.dtype
    R = (_axis_rot(xi[..., 2], 2, dtype) @ _axis_rot(xi[..., 1], 1, dtype)
         @ _axis_rot(xi[..., 0], 0, dtype))
    return rt_to_T(R, xi[..., 3:6])


def rt_to_T(R, t):
    """[...,3,3] + [...,3] -> [...,4,4] homogeneous."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], -1)
    bottom = jnp.zeros(batch + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], -2)


def transform_points(T, pts):
    """Apply [...,4,4] (or [...,3,3]+t) transform to [...,N,3] points."""
    T = jnp.asarray(T)
    pts = jnp.asarray(pts)
    return pts @ T[..., :3, :3].mT + T[..., None, :3, 3]


def so3_exp(w):
    """Rodrigues: [...,3] axis-angle -> [...,3,3] rotation."""
    w = jnp.asarray(w)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = theta[..., None]
    small = theta < jnp.asarray(1e-8, w.dtype)
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    K = skew(w / jnp.squeeze(safe, -1))
    s, c = jnp.sin(safe), jnp.cos(safe)
    eye = jnp.eye(3, dtype=w.dtype)
    R = eye + s * K + (1.0 - c) * (K @ K)
    R_small = eye + skew(w)  # first order
    return jnp.where(small, R_small, R)


def so3_log_vee(R):
    """[...,3,3] rotation -> [...,3] rotation vector (vee of matrix log).

    Numerically-robust closed form (quaternion-free): theta from the
    clamped trace, axis from the antisymmetric part, with a symmetric-part
    fallback near theta = pi.  Matches Eigen's ``.log()`` + the vee
    convention used by ``cc::angularErrorSO3`` (ref:cc:32-37).
    """
    R = jnp.asarray(R)
    dtype = R.dtype
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # antisymmetric part -> axis * sin(theta)
    a = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1) * 0.5
    sin_t = jnp.sin(theta)
    eps = jnp.asarray(1e-7 if dtype == jnp.float32 else 1e-12, dtype)
    # Generic branch: w = theta / sin(theta) * a
    factor = jnp.where(jnp.abs(sin_t) < eps, jnp.ones_like(sin_t),
                       theta / jnp.where(jnp.abs(sin_t) < eps,
                                         jnp.ones_like(sin_t), sin_t))
    w_generic = factor[..., None] * a
    # Near pi: axis from diagonal of (R + I)/2 = I - (1-cos)* (I - nn^T) ...
    # (R + I)/2 has columns proportional to n n^T scaled; take sqrt of diag.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    nn = jnp.clip((diag - cos_t[..., None]) / jnp.maximum(
        1.0 - cos_t[..., None], eps), 0.0, 1.0)
    n = jnp.sqrt(nn)
    # sign disambiguation from off-diagonal sums (n_i n_j terms)
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    # pick the largest component positive, fix the others' signs from it
    i_max = jnp.argmax(n, axis=-1)
    off = jnp.stack([
        jnp.stack([jnp.ones_like(s01), s01, s02], -1),
        jnp.stack([s01, jnp.ones_like(s01), s12], -1),
        jnp.stack([s02, s12, jnp.ones_like(s01)], -1),
    ], -2)
    row = jnp.take_along_axis(off, i_max[..., None, None].repeat(3, -1),
                              -2)[..., 0, :]
    sign = jnp.where(row < 0, -jnp.ones_like(n), jnp.ones_like(n))
    axis = n * sign
    # overall sign: align with the antisymmetric part (a = axis*sin(theta),
    # sin(theta) >= 0 for theta in [0, pi]); ambiguous only at exactly pi.
    s_tot = jnp.where(jnp.sum(axis * a, -1, keepdims=True) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * s_tot
    near_pi = (jnp.pi - theta) < jnp.asarray(1e-3, dtype)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def T_inverse(T):
    """Rigid inverse of [...,4,4]."""
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = R.mT
    return rt_to_T(Rt, -(Rt @ t[..., None])[..., 0])


def se3_exp(xi):
    """[...,6] twist (w, v) -> [...,4,4] rigid transform.

    t = V(w) v with the standard left-Jacobian V; exact small-angle
    limit V -> I."""
    xi = jnp.asarray(xi)
    dtype = xi.dtype
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    small = theta < jnp.asarray(1e-6, dtype)
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    K = skew(w / jnp.squeeze(safe, -1))
    A = (1.0 - jnp.cos(safe)) / (safe * safe) * safe  # (1-cos)/theta
    B = (safe - jnp.sin(safe)) / (safe * safe)        # (th-sin)/th^2
    eye = jnp.eye(3, dtype=dtype)
    V = eye + A * K + B * safe * (K @ K)
    V = jnp.where(small, eye + 0.5 * skew(w), V)
    t = jnp.einsum("...ij,...j->...i", V, v)
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T.at[..., 3, 3].set(1.0)


def se3_log(T):
    """[...,4,4] rigid transform -> [...,6] twist (w, v): inverse of
    ``se3_exp`` (v = V(w)^-1 t)."""
    T = jnp.asarray(T)
    dtype = T.dtype
    w = so3_log_vee(T[..., :3, :3])
    t = T[..., :3, 3]
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    small = theta < jnp.asarray(1e-6, dtype)
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    K = skew(w / jnp.squeeze(safe, -1))
    half = 0.5 * safe
    # V^-1 = I - th/2 K + (1 - th/2 * cot(th/2)) K^2
    cot = jnp.cos(half) / jnp.sin(jnp.where(small, jnp.ones_like(half),
                                            half))
    coef = 1.0 - half * cot
    eye = jnp.eye(3, dtype=dtype)
    Vinv = eye - half * K + coef * (K @ K)
    Vinv = jnp.where(small, eye - 0.5 * skew(w), Vinv)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)
