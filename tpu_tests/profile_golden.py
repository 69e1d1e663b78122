"""Breakdown profiling of the golden-problem se3_pt2pl registration on
the real TPU: setup (kNN/LRF/embeddings) vs per-iteration loop cost.

Platform note (axon tunnel): ``block_until_ready`` does not reliably
synchronize and identical executions may be served from a cache, so
every measured call (a) perturbs its inputs per rep and (b) syncs by
fetching a small scalar reduction of the outputs to host.

Run:  python tpu_tests/profile_golden.py [BATCH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se3_icp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from se3_icp_tpu.models import registration as reg
from se3_icp_tpu.ops import knn, lrf
from se3_icp_tpu.utils import ply
from se3_icp_tpu.utils.config import GOLDEN

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
GOLDEN_DIR = "/root/reference/created_example_reg_problem"


def _scalarize(out):
    leaves = jax.tree.leaves(out)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)


def timeit(make_fn, reps=5, warmup=2):
    """make_fn(i) -> a traced callable invocation with rep-dependent
    inputs; returns ms per call, synced via scalar host fetch."""
    for i in range(warmup):
        float(jax.device_get(_scalarize(make_fn(i))))
    t0 = time.perf_counter()
    for i in range(reps):
        s = float(jax.device_get(_scalarize(make_fn(warmup + i))))
    dt = (time.perf_counter() - t0) / reps * 1e3
    del s
    return dt


def main():
    src = ply.read_ply(os.path.join(GOLDEN_DIR, "source.ply")).points
    tgt = ply.read_ply(os.path.join(GOLDEN_DIR, "target.ply")).points
    ns = len(src)
    npad = reg._bucket(ns)
    print(f"cloud {ns} -> padded {npad}, batch {BATCH}, "
          f"device {jax.devices()[0]}")

    sp = np.zeros((BATCH, npad, 3), np.float32)
    tp = np.zeros((BATCH, npad, 3), np.float32)
    sp[:, :ns] = src
    tp[:, :ns] = tgt
    narr = jnp.full(BATCH, ns, jnp.int32)
    sp, tp = jnp.asarray(sp), jnp.asarray(tp)
    eps = [jnp.full((1, 1, 3), 1e-6 * (i + 1), jnp.float32)
           for i in range(16)]

    cfg = GOLDEN
    k = cfg.number_of_nn_for_lrf

    full = jax.jit(jax.vmap(functools.partial(
        reg.register_arrays, cfg=cfg, mode="se3", variant="pt2pl")))
    out = full(sp, narr, tp, narr)
    iters = int(np.asarray(out[1])[0])
    ms = timeit(lambda i: full(sp + eps[i], narr, tp + eps[i], narr))
    print(f"full se3_pt2pl: {ms:.1f} ms/batch = {ms/BATCH:.2f} ms/pair "
          f"({BATCH/(ms/1e3):.1f} pairs/s), iters={iters}")

    kk = max(k, cfg.normals_knn)
    kb = jax.jit(jax.vmap(lambda p, n: knn.knn_self(p, kk, n)))
    # reduce on device so tunnel transfer of [B,N,90] doesn't pollute
    kbr = jax.jit(lambda p, n: _scalarize(kb(p, n)))
    ms = timeit(lambda i: kbr(sp + eps[i], narr))
    print(f"knn_self top-{kk} (one cloud): {ms:.1f} ms/batch")

    idx = kb(sp, narr)[0]
    toldi = jax.jit(lambda p, ix: _scalarize(jax.vmap(
        lrf.toldi_frames_from_neighbors)(p, ix)))
    ms = timeit(lambda i: toldi(sp + eps[i], idx[:, :, :k]))
    print(f"toldi frames:   {ms:.1f} ms/batch")

    nrm = jax.jit(lambda p, ix: _scalarize(jax.vmap(
        lrf.normals_from_neighbors)(p, ix)))
    ms = timeit(lambda i: nrm(sp + eps[i], idx[:, :, :cfg.normals_knn]))
    print(f"normals:        {ms:.1f} ms/batch")

    q12 = jnp.ones((BATCH, npad, 12), jnp.float32)
    e12b = [jnp.full((1, 1, 12), 1e-6 * (i + 1), jnp.float32)
            for i in range(16)]
    nn12 = jax.jit(lambda q, e, n: _scalarize(jax.vmap(
        knn.nn_argmin)(q, e, n)))
    ms = timeit(lambda i: nn12(q12 + e12b[i], q12 * 0.5 + e12b[i], narr))
    print(f"12-D 1-NN:      {ms:.1f} ms/batch (x {iters} iters = "
          f"{ms*iters:.0f} ms)")


if __name__ == "__main__":
    main()
