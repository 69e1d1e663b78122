"""Microbenchmark of the neighborhood-thresholds kernel on the real
chip (the top r4 setup lever): one jitted 64-cloud call at the golden
shape, TOLDI count set, per CLAUDE.md timing rules (jit end to end,
perturbed inputs per rep, fixed RTT subtracted).

Run: python tpu_tests/micro_thresholds.py [BATCH] [N]
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

from se3_icp_tpu.ops import pallas_moments as pm

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4608
NV = 4167 if N == 4608 else int(N * 0.9)


def timeit(fn, args_list, reps=8, warmup=2):
    for i in range(warmup):
        out = fn(*args_list[i % len(args_list)])
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_list[(warmup + i) % len(args_list)])
        float(jax.device_get(jnp.sum(out.astype(jnp.float32))))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    rtt_probe = jax.jit(lambda x: x * 2.0)
    xs = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    rtt = timeit(rtt_probe, [(xs + i,) for i in range(16)])
    print(f"fixed RTT ~ {rtt:.1f} ms  (batch {BATCH}, N {N}, "
          f"plan {pm._thr_plan(3)})")

    pts = rng.normal(size=(BATCH, N, 3)).astype(np.float32)
    nv = jnp.full((BATCH,), NV, jnp.int32)
    CH = 10   # chained calls per dispatch: amortizes the ~27 ms RTT
              # whose per-rep jitter otherwise swamps a ~9 ms kernel

    def chained(counts):
        def one(p):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(CH):
                thr = pm.neighborhood_thresholds_batched(p, nv, counts)
                s = jnp.sum(thr) * 1e-30
                acc = acc + jnp.sum(thr[:, 0, :8])
                p = p + s          # serialize: next call depends on prev
            return acc
        return jax.jit(one)

    for t_n, cts in ((3, [90, 31, 30]), (4, [90, 31, 30, 20])):
        counts = jnp.broadcast_to(jnp.asarray(cts, jnp.int32),
                                  (BATCH, t_n))
        fn = chained(counts)
        args = [(jnp.asarray(pts + 1e-4 * i),) for i in range(16)]
        ms = timeit(fn, args)
        print(f"thresholds kernel (T={t_n}): {(ms - rtt) / CH:7.2f} ms "
              f"per {BATCH}-cloud call  (chained x{CH})")


if __name__ == "__main__":
    main()
