"""On-chip thr-route validation (VERDICT r3 item 3): cross-cloud LRF
quality and a success-rate A/B (thr vs exact-sorted setup) over a
WIDER difficult-seed set than the CPU interpret CI can afford, on the
real kernels at serving dtype.  Prints the measured rates so the doc
numbers (docs/PARITY.md thr-route section) are reproducible.
"""

import numpy as np
import pytest

from se3_icp_tpu.datasets import fixtures, synthetic
from se3_icp_tpu.utils import metrics_host
from se3_icp_tpu.utils.config import RegistrationConfig

N_DIFFICULT = 12


def _difficult_cases():
    rng = np.random.default_rng(5)
    cases = []
    for seed in range(21, 21 + N_DIFFICULT):
        p = synthetic.synthetic_problem("difficult", 0.002, seed=seed)
        sub_s = rng.permutation(len(p.source))[:1400]
        sub_t = rng.permutation(len(p.target))[:1400]
        cases.append(((p.source[sub_s], p.target[sub_t]), p.T_gt))
    return cases


def _kitti_cases(tmp_path):
    from se3_icp_tpu.bench import kitti_bench
    d = str(tmp_path / "kh")
    fixtures.make_kitti_fixture(d, max_index=8, n_points=1200, hard=True)
    clouds, poses = kitti_bench.load_kitti(d, max_index=8)
    return [((clouds[i + 1], clouds[i]),
             np.linalg.inv(poses[i]) @ poses[i + 1])
            for i in range(len(clouds) - 1)]


def _run_batch(cases, cfg, monkeypatch, no_thr):
    from se3_icp_tpu.parallel import pairs as par
    if no_thr:
        monkeypatch.setenv("SE3_ICP_TPU_NO_THR_KNN", "1")
    try:
        res = par.register_pairs([c[0] for c in cases], "se3_pt2pl",
                                 cfg, mesh=None)
    finally:
        if no_thr:
            monkeypatch.delenv("SE3_ICP_TPU_NO_THR_KNN")
    return [bool(metrics_host.success(T_gt, r.transformation))
            for (_, T_gt), r in zip(cases, res)]


def test_thr_success_ab_wide(monkeypatch, tmp_path):
    diff = _difficult_cases()
    kitti = _kitti_cases(tmp_path)
    out = {}
    for route, no_thr, cap in (("thr", False, 61), ("exact", True, 62)):
        cfg_d = RegistrationConfig(number_of_nn_for_lrf=90,
                                   max_num_iterations=cap,
                                   max_num_se3_iterations=10)
        cfg_k = cfg_d.replace(estimated_overlap=0.7, mse=1e-7,
                              mse_switch_error=5e-7)
        out[route] = (_run_batch(diff, cfg_d, monkeypatch, no_thr),
                      _run_batch(kitti, cfg_k, monkeypatch, no_thr))
    t_d, t_k = out["thr"]
    e_d, e_k = out["exact"]
    print(f"difficult({N_DIFFICULT}): thr {sum(t_d)}/{len(t_d)} vs "
          f"exact {sum(e_d)}/{len(e_d)}")
    print(f"kitti-hard({len(t_k)}): thr {sum(t_k)}/{len(t_k)} vs "
          f"exact {sum(e_k)}/{len(e_k)}")
    # kitti-hard is the protocol regime: per-case parity
    for i, (t_ok, e_ok) in enumerate(zip(t_k, e_k)):
        assert t_ok or not e_ok, f"kitti-hard case {i}"
    # difficult +/-pi is single-start basin roulette for both routes:
    # aggregate parity within 2 of N_DIFFICULT
    assert sum(t_d) >= sum(e_d) - 2, (t_d, e_d)


def test_thr_lrf_quality_cross_cloud_on_chip(tmp_path):
    """Same cross-cloud LRF-quality parity bound as the CPU test, on
    the real kernels (tests/test_thr_validation.py documents the
    interpret-mode numbers)."""
    from se3_icp_tpu.utils.lrf_eval import cross_cloud_lrf_errors

    prob = synthetic.synthetic_problem("moderate", 0.002, seed=11)
    rng = np.random.default_rng(0)
    sub_s = rng.permutation(len(prob.source))[:1400]
    sub_t = rng.permutation(len(prob.target))[:1400]
    errs = cross_cloud_lrf_errors(prob.source[sub_s],
                                   prob.target[sub_t], prob.T_gt)
    med_thr = float(np.median(errs["thr"]))
    med_ex = float(np.median(errs["exact"]))
    print(f"on-chip resampled LRF deg: thr median {med_thr:.2f} | "
          f"exact median {med_ex:.2f}")
    assert med_thr <= med_ex * 1.25 + 2.0, (med_thr, med_ex)
