#!/usr/bin/env python
"""Headline benchmark: se3_pt2pl registration throughput on the golden
problem (created_example_reg_problem, 4167-point clouds, the reference's
primary entry-point protocol).

Prints ONE JSON line:
  {"metric": "se3_pt2pl_golden_pairs_per_s", "value": N,
   "unit": "pairs/s", "vs_baseline": R}

vs_baseline methodology: the reference C++ stack (Open3D/PCL/FLANN) is
not buildable in this image, so the baseline is the measured CPU
reference-proxy in ``baselines/numpy_icp.py`` -- the identical algorithm
with C-compiled cKDTree nearest-neighbor search and numpy-vectorized
per-point math, single process (the reference is single-process OpenMP).
The proxy's per-pair time is measured on this machine and cached in
``.bench_cpu_baseline.json``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from se3_icp_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from se3_icp_tpu.utils import ply  # noqa: E402
from se3_icp_tpu.utils import metrics_host  # noqa: E402
from se3_icp_tpu.utils.config import GOLDEN  # noqa: E402
from se3_icp_tpu.parallel import pairs as par  # noqa: E402

GOLDEN_DIR = "/root/reference/created_example_reg_problem"
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_cpu_baseline.json")
# 64 saturates one v5e chip (64: 64.2 pairs/s, 128: 65.0; 16: 52.9)
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
REPS = int(os.environ.get("BENCH_REPS", "10"))


def load_problem():
    src = ply.read_ply(os.path.join(GOLDEN_DIR, "source.ply")).points
    tgt = ply.read_ply(os.path.join(GOLDEN_DIR, "target.ply")).points
    T_gt = ply.read_transform_txt(
        os.path.join(GOLDEN_DIR, "transformation_gt.txt"))
    return src, tgt, T_gt


def cpu_baseline_pairs_per_s(src, tgt):
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["pairs_per_s"]
    from baselines import numpy_icp
    t0 = time.time()
    T, iters = numpy_icp.run_se3_icp_np(src, tgt)
    dt = time.time() - t0
    rate = 1.0 / dt
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"pairs_per_s": rate, "seconds_per_pair": dt,
                   "iters": iters}, f)
    return rate


def main():
    src, tgt, T_gt = load_problem()

    # jitter each batched pair slightly so no trivial cross-pair reuse
    rng = np.random.default_rng(0)
    pair_list = []
    for i in range(BATCH):
        j = rng.normal(scale=1e-4, size=src.shape)
        pair_list.append((src + j, tgt))

    mesh = par.default_mesh() if jax.device_count() > 1 else None

    # warm-up / compile
    results = par.register_pairs(pair_list, "se3_pt2pl", GOLDEN, mesh=mesh)
    # correctness gate: every pair must satisfy the reference's success
    # thresholds (2 deg / 0.25) -- a fast wrong answer doesn't count
    for r in results:
        assert metrics_host.success(T_gt, r.transformation), (
            "benchmark result failed the 2deg/0.25 success bound")

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        import contextlib
        prof_ctx = jax.profiler.trace(profile_dir)
    else:
        import contextlib
        prof_ctx = contextlib.nullcontext()
    # double-buffered serving loop: pack/dispatch batch N+1 while the
    # device runs batch N; every rep's results land on the host inside
    # the timed region (one fused fetch each).  Per-rep times are
    # recorded and the MEDIAN is reported: the tunnel/shared-host
    # environment has multi-hundred-ms noise spikes that would swamp a
    # total-time average now that a rep is ~400 ms.
    with prof_ctx:
        rep_times = []
        pending = None
        last = None
        t_prev = time.time()
        for _ in range(REPS):
            nxt = par.register_pairs_async(pair_list, "se3_pt2pl", GOLDEN,
                                           mesh=mesh)
            if pending is not None:
                last = pending.result()
                now = time.time()
                rep_times.append(now - t_prev)
                t_prev = now
            pending = nxt
        last = pending.result()
        now = time.time()
        rep_times.append(now - t_prev)
    pairs_per_s = BATCH / float(np.median(rep_times))
    for r in last:
        assert metrics_host.success(T_gt, r.transformation)

    base = cpu_baseline_pairs_per_s(src, tgt)
    print(json.dumps({
        "metric": "se3_pt2pl_golden_pairs_per_s",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / base, 3),
    }))


if __name__ == "__main__":
    main()
