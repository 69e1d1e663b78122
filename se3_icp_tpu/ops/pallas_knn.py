"""Fused Pallas TPU kernel for brute-force 1-NN argmin.

The per-iteration hot loop of the registration engine (C5/C6 in
SURVEY.md: ref:cpp:402-470).  For each query tile the kernel streams
target tiles through VMEM, computes the distance tile on the MXU
(``|q|^2 - 2 q.t^T + |t|^2``), and folds it into a running
(min, argmin) accumulator that stays VMEM-resident across the inner
grid dimension -- the [Nq, Nt] distance matrix never exists in HBM.

Tuning notes (measured on TPU v5e via slope of a 50x chained scan,
15000x15000x12 f32):
  * runtime is VPU/tile-overhead bound, not MXU bound: D-padding
    (12 -> 16 vs 128) and bf16-vs-f32 dot barely matter;
  * tile size dominates: 256x512 = 5.1 ms, 512x1024 = 2.2 ms,
    1024x2048 = 1.07 ms;
  * XLA's own fused matmul+argmin path (ops.knn.nn_argmin_xla) measures
    0.82 ms on the same problem, so it is the default; this kernel is
    kept as an alternative (``SE3_ICP_TPU_PALLAS=1``) and as the
    foundation for the sharded-target variant.

Results match the XLA path exactly (including low-index tie-breaking).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38
_D_PAD = 16          # feature dim rounded up (12 -> 16); zero padding
TILE_Q = 1024
TILE_T = 2048


def _kernel(n_ref, q_ref, t_ref, best_d2_ref, best_idx_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile_t = t_ref.shape[0]

    q = q_ref[:]
    t = t_ref[:]
    # full-f32 cross term (multi-pass on the MXU): near-tie argmins must
    # match the exact XLA path -- bf16's ~0.4% relative error flipped
    # ~1% of matches at 4k x 4k x 12, and the kernel is VPU/tile-bound,
    # so the extra MXU passes are free
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    tn = jnp.sum(t * t, axis=1)[None, :]
    prod = jax.lax.dot_general(
        q, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    d2 = qn - 2.0 * prod + tn

    col = j * tile_t + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2 = jnp.where(col < n_ref[0], d2, _BIG)

    tile_min = jnp.min(d2, axis=1)
    tile_arg = (jnp.argmin(d2, axis=1) + j * tile_t).astype(jnp.int32)

    @pl.when(j == 0)
    def _init():
        best_d2_ref[i, :] = tile_min
        best_idx_ref[i, :] = tile_arg

    @pl.when(j != 0)
    def _combine():
        cur = best_d2_ref[i, :]
        better = tile_min < cur
        best_d2_ref[i, :] = jnp.where(better, tile_min, cur)
        best_idx_ref[i, :] = jnp.where(better, tile_arg,
                                       best_idx_ref[i, :])


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_t"))
def _nn_argmin_padded(queries, targets, n_targets,
                      tile_q: int, tile_t: int):
    nq, d = queries.shape
    nt = targets.shape[0]
    grid = (nq // tile_q, nt // tile_t)
    n_arr = jnp.asarray([n_targets], dtype=jnp.int32)

    best_d2, best_idx = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # whole output stays VMEM-resident (a few KB): block = array
            pl.BlockSpec((nq // tile_q, tile_q), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq // tile_q, tile_q), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq // tile_q, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((nq // tile_q, tile_q), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * nt * d,
            bytes_accessed=4 * (nq * d + nt * d * grid[0] + 2 * nq),
            transcendentals=0,
        ),
    )(n_arr, queries, targets)
    return best_idx.reshape(-1), best_d2.reshape(-1)


def nn_argmin_pallas(queries, targets, n_targets=None,
                     tile_q: int = TILE_Q, tile_t: int = TILE_T):
    """1-NN (idx, d2) via the fused kernel; pads shapes as needed."""
    nq, dim = queries.shape
    nt = targets.shape[0]
    if n_targets is None:
        n_targets = nt
    qp = jnp.pad(queries.astype(jnp.float32),
                 ((0, (-nq) % tile_q), (0, _D_PAD - dim)))
    tp = jnp.pad(targets.astype(jnp.float32),
                 ((0, (-nt) % tile_t), (0, _D_PAD - dim)))
    idx, d2 = _nn_argmin_padded(qp, tp, n_targets, tile_q, tile_t)
    return idx[:nq], d2[:nq].astype(queries.dtype)
