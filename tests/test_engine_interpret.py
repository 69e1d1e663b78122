"""End-to-end engine run on the FULL TPU trace, on CPU.

``SE3_ICP_TPU_FORCE_PALLAS=1`` flips the trace-time kernel gates and
``SE3_ICP_TPU_PALLAS_INTERPRET=1`` evaluates every pallas_call in
interpret mode — so this exercises exactly the program the chip runs
(sort-free threshold setup, fused moment consumers, pre-packed
dual-phase match loop, sharded over the 8-device CPU mesh) without TPU
hardware.  Unique iteration caps force a fresh trace: the engine's jit
cache keys on static config, not on the env gates.
"""

import numpy as np

from se3_icp_tpu.datasets import synthetic
from se3_icp_tpu.utils import metrics_host
from se3_icp_tpu.utils.config import RegistrationConfig


def test_engine_full_tpu_trace_interpret(monkeypatch):
    probs = [synthetic.synthetic_problem("easy", 0.002, seed=s)
             for s in (31, 32)]
    pair_list = [(p.source, p.target) for p in probs]
    # unique caps -> unique static config -> fresh trace under the gate
    cfg = RegistrationConfig(number_of_nn_for_lrf=90,
                             max_num_iterations=41,
                             max_num_se3_iterations=7)

    from se3_icp_tpu.parallel import pairs as par
    monkeypatch.setenv("SE3_ICP_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("SE3_ICP_TPU_PALLAS_INTERPRET", "1")
    from se3_icp_tpu.ops import knn
    assert knn.use_thr_knn() and knn.use_fused_match()
    res_tpu = par.register_pairs(pair_list, "se3_pt2pl", cfg)
    monkeypatch.delenv("SE3_ICP_TPU_FORCE_PALLAS")
    monkeypatch.delenv("SE3_ICP_TPU_PALLAS_INTERPRET")

    # reference: the plain XLA CPU route (fresh trace via distinct cap)
    cfg_x = cfg.replace(max_num_iterations=42)
    res_xla = par.register_pairs(pair_list, "se3_pt2pl", cfg_x,
                                 mesh=None)

    for p, rt, rx in zip(probs, res_tpu, res_xla):
        assert metrics_host.success(p.T_gt, rt.transformation)
        assert metrics_host.success(p.T_gt, rx.transformation)
        # thr-setup neighborhoods are approximate (ball >= the exact
        # kNN ball), so the two routes agree at trajectory tolerance
        assert metrics_host.angular_error_so3(
            rt.transformation[:3, :3], rx.transformation[:3, :3]) < 0.5
        assert np.linalg.norm(rt.transformation[:3, 3]
                              - rx.transformation[:3, 3]) < 0.05


def test_engine_tpu_trace_trimmed_interpret(monkeypatch):
    """The trimmed-overlap TPU trace (sort-free count-bisection trim
    inside the loop, KITTI-style config) on CPU: registers and matches
    the XLA route."""
    from se3_icp_tpu.parallel import pairs as par

    prob = synthetic.synthetic_problem("easy", 0.002, seed=33)
    pair_list = [(prob.source, prob.target)]
    cfg = RegistrationConfig(number_of_nn_for_lrf=90,
                             estimated_overlap=0.75,
                             max_num_iterations=43,
                             max_num_se3_iterations=7)
    monkeypatch.setenv("SE3_ICP_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("SE3_ICP_TPU_PALLAS_INTERPRET", "1")
    res_t = par.register_pairs(pair_list, "se3_pt2pl", cfg)
    monkeypatch.delenv("SE3_ICP_TPU_FORCE_PALLAS")
    monkeypatch.delenv("SE3_ICP_TPU_PALLAS_INTERPRET")
    res_x = par.register_pairs(pair_list, "se3_pt2pl",
                               cfg.replace(max_num_iterations=44))
    assert metrics_host.success(prob.T_gt, res_t[0].transformation)
    assert metrics_host.angular_error_so3(
        res_t[0].transformation[:3, :3],
        res_x[0].transformation[:3, :3]) < 0.5


def _small_problem(seed, depth_shift=False):
    """~1k-point bunny problem (interpret mode is slow; the full trace
    still covers every kernel at this size).  ``depth_shift`` scales
    into an RGB-D-plausible depth range for the with_cf confidence
    model (mirrors tests/test_registration_e2e.py::test_se3_gicp_with_cf)."""
    rng = np.random.default_rng(seed)
    bunny = synthetic.load_bunny()
    src = synthetic.random_downsample(bunny, 0.005, rng)
    t = rng.uniform(-0.5, 0.5, 3)
    R = synthetic._rot_3d(*rng.uniform(-0.3, 0.3, 3))
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    if depth_shift:
        src = src * 0.1
        src[:, 2] += 2.0
        T[:3, 3] *= 0.1
    tgt = src @ T[:3, :3].T + T[:3, 3]
    return src, tgt, T


# every driver variant through the FULL forced-Pallas trace (VERDICT r4
# item 5): the fused epilogue's estimator reductions (pt2pt Umeyama
# moments, pt2pl JtJ, gicp in-kernel Cardano inverse-sqrt, with_cf
# confidence weighting) each gate end-to-end, with an XLA-route
# cross-check.  Caps are unique per row: the jit cache keys on static
# config, not the env gates.  Match: driver variants ref:cpp:473-1128.
import pytest


@pytest.mark.parametrize(
    "alg,cap,cfg_kw,cross_tol",
    [("pt2pt", 51, {}, 1e-3),                      # run_icp, ref:cpp:473
     ("gicp", 52, {}, 1e-3),                       # in-kernel Cardano
     ("se3_pt2pt", 53, {}, 0.5),
     ("se3_gicp", 54, {"estimated_overlap": 0.9}, 0.5),
     ("se3_gicp_with_cf", 55, {"estimated_overlap": 0.9}, 0.5),
     ("se3_pure_pt2pl", 56,
      {"alpha_rot": 0.1, "max_num_se3_iterations": 30}, 0.5)])
def test_engine_all_modes_full_trace_interpret(monkeypatch, alg, cap,
                                               cfg_kw, cross_tol):
    from se3_icp_tpu.parallel import pairs as par

    src, tgt, T_gt = _small_problem(seed=60 + cap,
                                    depth_shift=alg.endswith("with_cf"))
    kw = dict(cfg_kw)
    cfg = RegistrationConfig(number_of_nn_for_lrf=90,
                             max_num_iterations=cap,
                             max_num_se3_iterations=kw.pop(
                                 "max_num_se3_iterations", 7),
                             **kw)
    monkeypatch.setenv("SE3_ICP_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("SE3_ICP_TPU_PALLAS_INTERPRET", "1")
    res_t = par.register_pairs([(src, tgt)], alg, cfg)
    monkeypatch.delenv("SE3_ICP_TPU_FORCE_PALLAS")
    monkeypatch.delenv("SE3_ICP_TPU_PALLAS_INTERPRET")
    res_x = par.register_pairs(
        [(src, tgt)], alg, cfg.replace(max_num_iterations=cap + 49))
    assert metrics_host.success(T_gt, res_t[0].transformation), alg
    assert metrics_host.success(T_gt, res_x[0].transformation), alg
    assert metrics_host.angular_error_so3(
        res_t[0].transformation[:3, :3],
        res_x[0].transformation[:3, :3]) < cross_tol, alg
    assert np.linalg.norm(res_t[0].transformation[:3, 3]
                          - res_x[0].transformation[:3, 3]) < (
        0.05 if cross_tol >= 0.5 else 1e-3), alg


def test_golden_headline_program_interpret(monkeypatch):
    """The HEADLINE program (golden protocol clouds, GOLDEN config)
    through the full TPU trace on CPU: the same accuracy gate the
    real-chip test applies (tpu_tests: < 0.01 deg)."""
    from se3_icp_tpu.parallel import pairs as par
    from se3_icp_tpu.utils import ply

    base = "/root/reference/created_example_reg_problem"
    src = ply.read_ply(f"{base}/source.ply").points
    tgt = ply.read_ply(f"{base}/target.ply").points
    T_gt = ply.read_transform_txt(f"{base}/transformation_gt.txt")
    from se3_icp_tpu.utils.config import GOLDEN
    monkeypatch.setenv("SE3_ICP_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("SE3_ICP_TPU_PALLAS_INTERPRET", "1")
    res = par.register_pairs([(src, tgt)], "se3_pt2pl",
                             GOLDEN.replace(max_num_iterations=45))
    err = metrics_host.angular_error_so3(T_gt[:3, :3],
                                         res[0].transformation[:3, :3])
    tra = np.linalg.norm(T_gt[:3, 3] - res[0].transformation[:3, 3])
    assert err < 0.01, err
    assert tra < 1e-3, tra
