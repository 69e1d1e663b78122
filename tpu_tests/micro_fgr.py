"""Per-stage device attribution of the FGR pipeline (VERDICT r4 item
8): times cumulative prefixes of the jitted pipeline at the serving
batch, so stage cost = difference of adjacent prefixes (each prefix is
one jitted program; the tunnel RTT cancels in differences).

Stages: kNN(101) x2 (shipping method; SE3_ICP_TPU_FGR_EXACT_KNN=1 for
the exact-sort baseline) | normals x2 | FPFH x2 | reciprocal 33-D
match | tuple test | 64-step GNC loop.

Run: python tpu_tests/micro_fgr.py [BATCH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3_icp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from se3_icp_tpu.models import fgr as fgr_mod
from se3_icp_tpu.ops import fpfh as fpfh_ops
from se3_icp_tpu.ops import knn, lrf

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = 4608
NV = 4167


def timeit(fn, args_list, reps=6, warmup=2):
    for i in range(warmup):
        out = fn(*args_list[i % len(args_list)])
        float(jax.device_get(sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree.leaves(out))))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_list[(warmup + i) % len(args_list)])
        float(jax.device_get(sum(jnp.sum(x.astype(jnp.float32))
                                 for x in jax.tree.leaves(out))))
    return (time.perf_counter() - t0) / reps * 1e3


def make_prefix(stage: int, cfg):
    """Jitted pipeline prefix over a [B,N,3] batch (vmap like serving)."""

    def one(src, tgt):
        n_src = jnp.asarray(NV, jnp.int32)
        n_tgt = jnp.asarray(NV, jnp.int32)
        ns = src.shape[0]
        src_valid = jnp.arange(ns) < n_src
        tgt_valid = jnp.arange(ns) < n_tgt
        src_ = jnp.where(src_valid[:, None], src, 0.0)
        tgt_ = jnp.where(tgt_valid[:, None], tgt, 0.0)
        kw = max(cfg.fpfh_knn, cfg.normals_knn) + 1
        meth = ("exact" if os.environ.get("SE3_ICP_TPU_FGR_EXACT_KNN")
                else "approx_f32")  # mirror models/fgr.py
        idx_s, d2_s = knn.knn_self(src_, kw, n_src, method=meth,
                                   recall=0.95)
        idx_t, d2_t = knn.knn_self(tgt_, kw, n_tgt, method=meth,
                                   recall=0.95)
        if stage == 0:
            return d2_s.sum() + d2_t.sum()
        nrm_s = lrf.normals_dense(src_, d2_s, cfg.normals_knn, n_src)
        nrm_t = lrf.normals_dense(tgt_, d2_t, cfg.normals_knn, n_tgt)
        if stage == 1:
            return nrm_s.sum() + nrm_t.sum()

        def nb_mask(nq, n_valid, k):
            m = jnp.arange(k)[None, :] < jnp.minimum(n_valid, k)
            return m & (jnp.arange(nq)[:, None] < n_valid)

        kf = cfg.fpfh_knn
        feat_s = fpfh_ops.fpfh_from_neighbors(
            src_, nrm_s, idx_s[:, :kf], d2_s[:, :kf],
            nb_mask(ns, n_src, kf), n_valid=n_src)
        feat_t = fpfh_ops.fpfh_from_neighbors(
            tgt_, nrm_t, idx_t[:, :kf], d2_t[:, :kf],
            nb_mask(ns, n_tgt, kf), n_valid=n_tgt)
        if stage == 2:
            return feat_s.sum() + feat_t.sum()
        feat_s = jnp.where(src_valid[:, None], feat_s, 1e6)
        feat_t = jnp.where(tgt_valid[:, None], feat_t, 1e6)
        fwd, _ = knn.nn_argmin(feat_s, feat_t, n_tgt)
        bwd, _ = knn.nn_argmin(feat_t, feat_s, n_src)
        recip = (bwd[fwd] == jnp.arange(ns)) & src_valid
        if stage == 3:
            return fwd.sum() + recip.sum()
        corr_w = fgr_mod._tuple_test(src_, tgt_, fwd, recip, cfg)
        if stage == 4:
            return corr_w.sum()
        return None

    def full(src, tgt):
        return fgr_mod.fgr_register_arrays(
            src, jnp.asarray(NV, jnp.int32), tgt,
            jnp.asarray(NV, jnp.int32), cfg)

    if stage == 5:
        return jax.jit(jax.vmap(full))
    return jax.jit(jax.vmap(one))


def main():
    cfg = fgr_mod.FGRConfig()
    rng = np.random.default_rng(0)
    src = rng.normal(size=(BATCH, N, 3)).astype(np.float32) * 2.0
    R = np.asarray([[0.936, -0.275, 0.218], [0.290, 0.956, -0.037],
                    [-0.199, 0.098, 0.975]], np.float32)
    tgt = src @ R.T + np.float32([0.1, -0.2, 0.3])

    names = ["kNN(101) x2        ", "+ normals x2", "+ FPFH x2",
             "+ reciprocal 33-D match", "+ tuple test",
             "full (+ 64-step GNC)"]
    prev = 0.0
    for stage in range(6):
        fn = make_prefix(stage, cfg)
        args = [(jnp.asarray(src + 1e-4 * i), jnp.asarray(tgt))
                for i in range(8)]
        ms = timeit(fn, args)
        print(f"{names[stage]:26s}: {ms:8.1f} ms/batch cumulative "
              f"(stage ~{ms - prev:+7.1f})")
        prev = ms


if __name__ == "__main__":
    main()
