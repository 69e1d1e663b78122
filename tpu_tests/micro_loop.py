"""Microbenchmark of the per-iteration loop pieces on the real chip:
match kernel alone, epilogue kernel alone, and their sum vs the
engine-measured iter_ms.  Run: python tpu_tests/micro_loop.py [BATCH]
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

from se3_icp_tpu.ops import pallas_knn, pallas_loop

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4608
NS_VALID = 4167 if N == 4608 else int(N * 0.9)


def timeit(fn, args_list, reps=8, warmup=2):
    for i in range(warmup):
        out = fn(*args_list[i % len(args_list)])
        s = float(jax.device_get(sum(jnp.sum(x.astype(jnp.float32))
                                     for x in jax.tree.leaves(out))))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_list[(warmup + i) % len(args_list)])
        s = float(jax.device_get(sum(jnp.sum(x.astype(jnp.float32))
                                     for x in jax.tree.leaves(out))))
    del s
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    rtt_probe = jax.jit(lambda x: x * 2.0)
    xs = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    rtt = timeit(rtt_probe, [(xs + i,) for i in range(16)])
    print(f"fixed RTT ~ {rtt:.1f} ms  (batch {BATCH}, N {N})")

    # --- match kernel (se3 pt2pl payload: P = 9)
    feat = rng.normal(size=(BATCH, N, 16)).astype(np.float32)
    w16 = rng.normal(size=(BATCH, 16, 16)).astype(np.float32) * 0.1
    tgt_a = rng.normal(size=(N, 12)).astype(np.float32)
    tgt_b = rng.normal(size=(N, 12)).astype(np.float32)
    payload = rng.normal(size=(N, 9)).astype(np.float32)
    t6, tn, pay3 = jax.vmap(
        lambda a, b, p: pallas_knn.pack_match_targets(
            a, b, p, jnp.asarray(NS_VALID, jnp.int32), N))(
        jnp.broadcast_to(tgt_a, (BATCH, N, 12)),
        jnp.broadcast_to(tgt_b, (BATCH, N, 12)),
        jnp.broadcast_to(payload, (BATCH, N, 9)))
    phase = jnp.zeros((BATCH, 2), jnp.int32)

    CH = 10  # chained calls amortize RTT jitter (see micro_thresholds)

    def match_chained(f, w):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CH):
            d2, mt = pallas_knn.nn_match_affine(f, w, t6, tn, pay3,
                                                phase)
            s = jnp.sum(d2) * 1e-30
            acc = acc + jnp.sum(mt[:, :, :8])
            w = w + s
        return acc
    match = jax.jit(match_chained)
    args = [(jnp.asarray(feat + 1e-4 * i), jnp.asarray(w16))
            for i in range(16)]
    ms = timeit(match, args)
    print(f"match kernel:            {(ms - rtt) / CH:7.2f} ms/batch "
          f"(chained x{CH})")

    # --- epilogue kernel, pt2pl, trim off and on
    srcT = jnp.asarray(rng.normal(size=(BATCH, 3, N)).astype(np.float32))
    mt = rng.normal(size=(BATCH, 9, N)).astype(np.float32)
    pf = np.zeros((BATCH, pallas_loop.PF_WIDTH), np.float32)
    pf[:, 3] = 1.0
    pf[:, 5] = NS_VALID
    pf[:, 6] = int(0.75 * NS_VALID)
    pf[:, 8:17] = np.eye(3).reshape(-1)
    pfj = jnp.asarray(pf)

    for do_trim, label in ((False, "epilogue pt2pl (no trim)"),
                           (True, "epilogue pt2pl (trim)   ")):
        ep = jax.jit(lambda m, do_trim=do_trim: pallas_loop.loop_epilogue_batched(
            srcT, m, pfj, variant="pt2pl", is_se3=True, use_cf=False,
            do_trim=do_trim, off_tr=3, off_nrm=6))
        args = [(jnp.asarray(mt + 1e-4 * i),) for i in range(16)]
        ms = timeit(ep, args)
        print(f"{label}: {ms - rtt:7.2f} ms/batch")

    # --- epilogue gicp (in-kernel eigh), P = 12 payload
    mtg = rng.normal(size=(BATCH, 12, N)).astype(np.float32)
    mtg[:, 6] = np.abs(mtg[:, 6]) + 0.5
    mtg[:, 9] = np.abs(mtg[:, 9]) + 0.7
    mtg[:, 11] = np.abs(mtg[:, 11]) + 0.9
    cov6 = np.zeros((BATCH, 6, N), np.float32)
    cov6[:, 0] = 1.0
    cov6[:, 3] = 1.0
    cov6[:, 5] = 1e-3
    cov6 = jnp.asarray(cov6)
    epg = jax.jit(lambda m: pallas_loop.loop_epilogue_batched(
        srcT, m, pfj, cov6=cov6, variant="gicp", is_se3=True,
        use_cf=False, do_trim=True, off_tr=3, off_cov=6))
    args = [(jnp.asarray(mtg + 1e-4 * i),) for i in range(16)]
    ms = timeit(epg, args)
    print(f"epilogue gicp (trim)    : {ms - rtt:7.2f} ms/batch")


if __name__ == "__main__":
    main()
