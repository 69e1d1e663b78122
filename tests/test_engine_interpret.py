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
