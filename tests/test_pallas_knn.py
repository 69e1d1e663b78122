"""Interpret-mode tests for the fused correspondence kernels
(ops/pallas_knn.py) — ``pltpu.force_tpu_interpret_mode`` runs the real
kernel logic bit-faithfully on CPU, so the hot match path is guarded in
CPU CI even when no chip is reachable.  Real-chip counterparts live in
tpu_tests/test_tpu_kernels.py."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from se3_icp_tpu.ops import pallas_knn as pk


def _exact_nn(q, t, n_t):
    d2 = ((q[:, None, :].astype(np.float64)
           - t[None, :n_t, :].astype(np.float64)) ** 2).sum(-1)
    return d2.argmin(1), d2.min(1)


def _assert_matches_exact(q, t, n_t, idx, d2, rtol=1e-4):
    """idx/d2 agree with the exact search; the 6-limb bf16 dot drops
    the three smallest limb products (~1e-6 relative), so an index may
    differ only where two targets are within tolerance of each other."""
    ei, ed = _exact_nn(q, t, n_t)
    np.testing.assert_allclose(d2, ed, rtol=rtol, atol=1e-6)
    diff = idx != ei
    if diff.any():
        d_alt = ((q[diff].astype(np.float64)
                  - t[idx[diff]].astype(np.float64)) ** 2).sum(-1)
        np.testing.assert_allclose(d_alt, ed[diff], rtol=rtol)


def test_split3_limbs_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=(64, 8)) * 1e3).astype(np.float32))
    h, m, lo = pk._split3_limbs(x)
    assert h.dtype == jnp.bfloat16
    re = (h.astype(jnp.float32) + m.astype(jnp.float32)
          + lo.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(re), np.asarray(x))


def test_nn_argmin_batched_interpret():
    rng = np.random.default_rng(1)
    B, Nq, Nt, D = 2, 96, 130, 12
    q = rng.normal(size=(B, Nq, D)).astype(np.float32)
    t = rng.normal(size=(B, Nt, D)).astype(np.float32)
    n_t = np.asarray([Nt, 100], np.int32)
    with pltpu.force_tpu_interpret_mode():
        idx, d2 = pk.nn_argmin_pallas_batched(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(n_t))
    idx, d2 = np.asarray(idx), np.asarray(d2)
    for b in range(B):
        _assert_matches_exact(q[b], t[b], int(n_t[b]), idx[b], d2[b])
        assert (idx[b] < n_t[b]).all()   # poisoned rows never win


def test_nn_match_payload_interpret():
    """The fused match returns the winning target's payload row
    BIT-EXACTLY (argmin one-hot contraction over exact 3-limb splits)."""
    rng = np.random.default_rng(2)
    B, Nq, Nt, D, P = 2, 64, 120, 12, 16
    q = rng.normal(size=(B, Nq, D)).astype(np.float32)
    t = rng.normal(size=(B, Nt, D)).astype(np.float32)
    pay = (rng.normal(size=(B, Nt, P)) * 37.0).astype(np.float32)
    n_t = np.asarray([Nt, 90], np.int32)
    with pltpu.force_tpu_interpret_mode():
        idx, d2, matched = pk.nn_match_pallas_batched(
            jnp.asarray(q), jnp.asarray(t), jnp.asarray(pay),
            jnp.asarray(n_t))
    idx, d2 = np.asarray(idx), np.asarray(d2)
    matched = np.asarray(matched)
    for b in range(B):
        _assert_matches_exact(q[b], t[b], int(n_t[b]), idx[b], d2[b])
        np.testing.assert_array_equal(matched[b], pay[b, idx[b]])


def test_nn_match_affine_interpret():
    """The affine-factored hot kernel (r5 form): q = feat @ W built
    in-kernel, tn limbs inside the dot, NO index output -- returns
    (d2_shifted, matchedT) with matchedT[b,:,q] == pay[b, argmin, :]
    and ties averaged via the ones-column count."""
    rng = np.random.default_rng(7)
    B, Nq, Nt, P = 2, 64, 120, 9
    feat = rng.normal(size=(B, Nq, 16)).astype(np.float32)
    w = (rng.normal(size=(B, 16, 16)) * 0.3).astype(np.float32)
    t_a = rng.normal(size=(B, Nt, 12)).astype(np.float32)
    t_b = t_a.copy()
    t_b[:, :, :9] = 0.0
    pay = (rng.normal(size=(B, Nt, P)) * 13.0).astype(np.float32)
    n_t = np.asarray([Nt, 90], np.int32)
    phase = np.asarray([[0, 0], [1, 0]], np.int32)

    packed = jax.vmap(pk.pack_match_targets, in_axes=(0, 0, 0, 0, None))(
        jnp.asarray(t_a), jnp.asarray(t_b), jnp.asarray(pay),
        jnp.asarray(n_t), Nq)
    with pltpu.force_tpu_interpret_mode():
        d2, matched_t = pk.nn_match_affine(
            jnp.asarray(feat), jnp.asarray(w), *packed,
            jnp.asarray(phase))
    d2 = np.asarray(d2)
    matched_t = np.asarray(matched_t)
    assert matched_t.shape == (B, P, Nq)
    q = np.einsum("bqf,bfk->bqk", feat, w)[:, :, :12]
    for b, t_sel in ((0, t_a[0]), (1, t_b[1])):
        ei, ed = _exact_nn(q[b], t_sel, int(n_t[b]))
        qn = (q[b].astype(np.float64) ** 2).sum(-1)
        np.testing.assert_allclose(d2[b] + qn, ed, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(matched_t[b].T, pay[b, ei],
                                   rtol=1e-6, atol=1e-6)


def test_nn_match_affine_tie_average_interpret():
    """Exactly tied targets: the min-mask payload contraction averages
    the tied rows (documented r5 contract)."""
    rng = np.random.default_rng(8)
    B, Nq, Nt, P = 1, 8, 16, 4
    feat = np.zeros((B, Nq, 16), np.float32)
    feat[:, :, 9:12] = rng.normal(size=(B, Nq, 3))
    feat[:, :, 12] = 1.0
    w = np.zeros((B, 16, 16), np.float32)
    w[:, 9, 9] = w[:, 10, 10] = w[:, 11, 11] = 1.0
    t_b = np.zeros((B, Nt, 12), np.float32)
    t_b[:, :, 9:12] = rng.normal(size=(B, Nt, 3))
    t_b[0, 1, 9:12] = t_b[0, 0, 9:12]        # duplicate of target 0
    pay = rng.normal(size=(B, Nt, P)).astype(np.float32)
    # force every query to match target 0/1 (far-away others)
    t_b[0, 2:, 9:12] += 100.0
    feat[0, :, 9:12] = t_b[0, 0, 9:12] + 1e-3 * rng.normal(size=(Nq, 3))
    n_t = np.asarray([Nt], np.int32)
    phase = np.asarray([[1, 0]], np.int32)
    packed = jax.vmap(pk.pack_match_targets, in_axes=(0, 0, 0, 0, None))(
        jnp.asarray(t_b), jnp.asarray(t_b), jnp.asarray(pay),
        jnp.asarray(n_t), Nq)
    with pltpu.force_tpu_interpret_mode():
        _, matched_t = pk.nn_match_affine(
            jnp.asarray(feat), jnp.asarray(w), *packed,
            jnp.asarray(phase))
    avg = 0.5 * (pay[0, 0] + pay[0, 1])
    np.testing.assert_allclose(np.asarray(matched_t)[0].T,
                               np.broadcast_to(avg, (Nq, P)), rtol=1e-5)


def test_nn_match_packed_dual_phase_interpret():
    """Pre-packed dual-phase targets: the scalar-prefetched phase flag
    must route each batch entry to its own target embedding (A = SE(3),
    B = R3-like), with bit-exact payload rows for both phases."""
    rng = np.random.default_rng(3)
    B, Nq, Nt, D, P = 2, 64, 120, 12, 10
    q = rng.normal(size=(B, Nq, D)).astype(np.float32)
    t_a = rng.normal(size=(B, Nt, D)).astype(np.float32)
    t_b = t_a.copy()
    t_b[:, :, :9] = 0.0                     # zeroed rotation block
    pay = (rng.normal(size=(B, Nt, P)) * 11.0).astype(np.float32)
    n_t = np.asarray([Nt, 90], np.int32)
    phase = np.asarray([0, 1], np.int32)

    packed = jax.vmap(pk.pack_match_targets, in_axes=(0, 0, 0, 0, None))(
        jnp.asarray(t_a), jnp.asarray(t_b), jnp.asarray(pay),
        jnp.asarray(n_t), Nq)
    with pltpu.force_tpu_interpret_mode():
        idx, d2, matched = pk.nn_match_packed(
            jnp.asarray(q), *packed, jnp.asarray(phase))
    idx, d2 = np.asarray(idx), np.asarray(d2)
    matched = np.asarray(matched)
    for b, t_sel in ((0, t_a[0]), (1, t_b[1])):
        _assert_matches_exact(q[b], t_sel, int(n_t[b]), idx[b], d2[b])
        np.testing.assert_array_equal(matched[b], pay[b, idx[b]])
