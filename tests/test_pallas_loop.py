"""Fused loop-epilogue kernel (ops/pallas_loop.py) vs the XLA route.

Interpret mode evaluates the exact kernel program on CPU; the oracles
are the engine's own XLA building blocks (trim._trim_mask_bisect +
solve.solve_*_T), so these tests pin the fused epilogue to the path it
replaces: same kept set (via wsum + identical reductions), same MSE,
same per-iteration transform, and -- end-to-end -- the same golden
registration at iteration parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from se3_icp_tpu.ops import pallas_loop, solve, trim

pytestmark = pytest.mark.usefixtures("interpret_mode")


@pytest.fixture()
def interpret_mode(monkeypatch):
    monkeypatch.setenv("SE3_ICP_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("SE3_ICP_TPU_PALLAS_INTERPRET", "1")


def _rand_rot(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def _mk_problem(rng, b, n, p_rows, overlap):
    srcT = rng.normal(size=(b, 3, n)).astype(np.float32)
    mt = rng.normal(size=(b, p_rows, n)).astype(np.float32)
    pf = np.zeros((b, pallas_loop.PF_WIDTH), np.float32)
    Rs = np.stack([_rand_rot(rng) for _ in range(b)])
    pf[:, pallas_loop.PF_T:pallas_loop.PF_T + 3] = rng.normal(size=(b, 3))
    pf[:, pallas_loop.PF_BETA] = 1.25
    pf[:, pallas_loop.PF_SWITCHED] = (np.arange(b) % 2).astype(np.float32)
    ns = rng.integers(n // 2, n + 1, size=b).astype(np.float32)
    pf[:, pallas_loop.PF_NSRC] = ns
    pf[:, pallas_loop.PF_COUNT] = np.floor(overlap * ns)
    pf[:, pallas_loop.PF_R:pallas_loop.PF_R + 9] = Rs.reshape(b, 9)
    return srcT, mt, pf, Rs, ns


def _xla_oracle(b, srcT, mt, pf, Rs, ns, overlap, variant, is_se3,
                use_cf, off, cov6=None, conf_src=None):
    """One pair's reference T/mse/wsum through the engine's XLA ops."""
    R = jnp.asarray(Rs[b])
    t = jnp.asarray(pf[b, 0:3])
    beta = pf[b, pallas_loop.PF_BETA]
    sw = bool(pf[b, pallas_loop.PF_SWITCHED])
    x = jnp.asarray(srcT[b])
    sm = R @ x + t[:, None]
    m = jnp.asarray(mt[b])
    d_b = jnp.sqrt(jnp.sum((sm - m[0:3]) ** 2, axis=0))
    if is_se3:
        ct = beta * (R @ x) + t[:, None]
        d_a = jnp.sqrt(jnp.sum((ct - m[off["tr"]:off["tr"] + 3]) ** 2,
                               axis=0))
        dist = d_b if sw else d_a
    else:
        dist = d_b
    valid = jnp.arange(srcT.shape[2]) < int(ns[b])
    if overlap < 1.0:
        kept = trim._trim_mask_bisect(
            dist, valid, jnp.asarray(int(np.floor(overlap * ns[b])),
                                     jnp.int32))
    else:
        kept = valid
    w = kept.astype(jnp.float32)
    mse = trim.masked_mean(d_b if use_cf else dist, kept)
    if variant == "pt2pt":
        T = solve.solve_pt2pt_T(sm, m[0:3], w)
    elif variant == "pt2pl":
        T = solve.solve_pt2pl_T(sm, m[0:3],
                                m[off["nrm"]:off["nrm"] + 3], w)
    else:
        conf = None
        if use_cf:
            conf = 0.5 * (jnp.asarray(conf_src[b])
                          + m[off["conf"]])
        cov_s_cur6 = solve.rotate_sym3_T(R, jnp.asarray(cov6[b]))
        T = solve.solve_gicp_T(sm, m[0:3], cov_s_cur6,
                               m[off["cov"]:off["cov"] + 6], w, conf)
    return (np.asarray(T), float(mse), float(w.sum()))


@pytest.mark.parametrize("overlap", [0.75, 1.0])
@pytest.mark.parametrize("variant,is_se3,use_cf", [
    ("pt2pt", True, False),
    ("pt2pl", True, False),
    ("pt2pl", False, False),   # vanilla icp payload layout (no tr_beta)
    ("gicp", True, False),
    ("gicp", True, True),      # with_cf
])
def test_epilogue_matches_xla_route(variant, is_se3, use_cf, overlap):
    rng = np.random.default_rng(7)
    b, n = 4, 640
    off = {"tr": 3 if is_se3 else 0}
    p_rows = 3 + (3 if is_se3 else 0)
    if variant == "pt2pl":
        off["nrm"] = p_rows
        p_rows += 3
    if variant == "gicp":
        off["cov"] = p_rows
        p_rows += 6
        if use_cf:
            off["conf"] = p_rows
            p_rows += 1
    srcT, mt, pf, Rs, ns = _mk_problem(rng, b, n, p_rows, overlap)
    cov6 = conf_src = None
    if variant == "pt2pl":
        nr = mt[:, off["nrm"]:off["nrm"] + 3]
        mt[:, off["nrm"]:off["nrm"] + 3] = (
            nr / np.linalg.norm(nr, axis=1, keepdims=True))
    if variant == "gicp":
        # SPD-ish covariance components xx,xy,xz,yy,yz,zz for both sides
        def spd6(a):
            return np.stack([a[:, 0] ** 2 + 0.5, a[:, 0] * a[:, 1] * .1,
                             a[:, 0] * a[:, 2] * .1, a[:, 1] ** 2 + 0.7,
                             a[:, 1] * a[:, 2] * .1, a[:, 2] ** 2 + 0.9],
                            axis=1).astype(np.float32)
        cov6 = spd6(rng.normal(size=(b, 3, n)))
        mt[:, off["cov"]:off["cov"] + 6] = spd6(rng.normal(size=(b, 3, n)))
        if use_cf:
            conf_src = rng.uniform(0.2, 1.0, size=(b, n)).astype(np.float32)
            mt[:, off["conf"]] = rng.uniform(0.2, 1.0, (b, n))

    A66, b8, st = jax.device_get(pallas_loop.loop_epilogue_batched(
        jnp.asarray(srcT), jnp.asarray(mt), jnp.asarray(pf),
        cov6=None if cov6 is None else jnp.asarray(cov6),
        conf=None if conf_src is None else jnp.asarray(conf_src),
        variant=variant, is_se3=is_se3, use_cf=use_cf,
        do_trim=overlap < 1.0, off_tr=off.get("tr", 0),
        off_nrm=off.get("nrm", 0), off_cov=off.get("cov", 0),
        off_conf=off.get("conf", 0)))

    for i in range(b):
        T_ref, mse_ref, wsum_ref = _xla_oracle(
            i, srcT, mt, pf, Rs, ns, overlap, variant, is_se3, use_cf,
            off, cov6, conf_src)
        assert abs(st[i, 1] - wsum_ref) < 1e-3, (
            "kept-count mismatch", i, st[i, 1], wsum_ref)
        assert abs(st[i, 0] - mse_ref) <= 1e-5 * max(1.0, abs(mse_ref))
        if variant == "pt2pt":
            T_fused = solve.solve_pt2pt_from_moments(
                jnp.asarray(A66[i, :3, :3]), jnp.asarray(b8[i, 0:3]),
                jnp.asarray(b8[i, 3:6]), jnp.asarray(st[i, 1]))
        else:
            T_fused = solve.solve_from_normal(
                jnp.asarray(A66[i]), jnp.asarray(b8[i, :6]),
                jnp.asarray(st[i, 1]))
        T_fused = np.asarray(T_fused)
        assert np.allclose(T_fused, T_ref, rtol=1e-4, atol=1e-4), (
            variant, i, np.abs(T_fused - T_ref).max())


def test_engine_fused_epilogue_parity(monkeypatch, golden_problem):
    """Full engine, fused epilogue ON vs OFF, interpret mode: iteration
    parity and matching transforms on the golden problem."""
    from se3_icp_tpu.parallel import pairs as par
    from se3_icp_tpu.utils import metrics_host
    from se3_icp_tpu.utils.config import RegistrationConfig

    src, tgt, T_gt = golden_problem
    cfg = RegistrationConfig(number_of_nn_for_lrf=90,
                             max_num_iterations=43,
                             max_num_se3_iterations=7,
                             estimated_overlap=0.8)
    pair_list = [(src, tgt)]
    res_fused = par.register_pairs(pair_list, "se3_pt2pl", cfg,
                                   mesh=None)
    monkeypatch.setenv("SE3_ICP_TPU_NO_FUSED_EPILOGUE", "1")
    cfg_off = cfg.replace(max_num_iterations=44)  # fresh trace
    res_xla = par.register_pairs(pair_list, "se3_pt2pl", cfg_off,
                                 mesh=None)
    rf, rx = res_fused[0], res_xla[0]
    assert metrics_host.success(T_gt, rf.transformation)
    assert metrics_host.success(T_gt, rx.transformation)
    assert rf.num_iterations == rx.num_iterations
    assert metrics_host.angular_error_so3(
        rf.transformation[:3, :3], rx.transformation[:3, :3]) < 0.02
    assert np.linalg.norm(rf.transformation[:3, 3]
                          - rx.transformation[:3, 3]) < 2e-3
