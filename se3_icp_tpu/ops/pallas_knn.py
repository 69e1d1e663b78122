"""Fused Pallas TPU kernel for brute-force 1-NN argmin.

The per-iteration hot loop of the registration engine (C5/C6 in
SURVEY.md: ref:cpp:402-470).  For each query tile the kernel streams
target tiles through VMEM, computes the distance tile on the MXU
(``|q|^2 - 2 q.t^T + |t|^2``), and folds it into a running
(min, argmin) accumulator that lives in the output VMEM block across the
inner grid dimension -- the [Nq, Nt] distance matrix never exists in HBM.

Feature dim D (3 or 12) is zero-padded to 128 lanes; the padding
contributes exactly zero to the dot product.  Ties break toward the
lowest target index (strict-less combine + first-occurrence argmin),
matching the XLA path bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38
_LANES = 128


def _kernel(n_ref, q_ref, t_ref, best_d2_ref, best_idx_ref):
    j = pl.program_id(1)
    tile_t = t_ref.shape[0]

    q = q_ref[:]
    t = t_ref[:]
    prod = jax.lax.dot_general(
        q, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    tn = jnp.sum(t * t, axis=1)[None, :]
    d2 = qn - 2.0 * prod + tn

    col = j * tile_t + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2 = jnp.where(col < n_ref[0], d2, _BIG)

    tile_min = jnp.min(d2, axis=1)
    tile_arg = (jnp.argmin(d2, axis=1) + j * tile_t).astype(jnp.int32)

    @pl.when(j == 0)
    def _init():
        best_d2_ref[0, :] = tile_min
        best_idx_ref[0, :] = tile_arg

    @pl.when(j != 0)
    def _combine():
        cur = best_d2_ref[0, :]
        better = tile_min < cur
        best_d2_ref[0, :] = jnp.where(better, tile_min, cur)
        best_idx_ref[0, :] = jnp.where(better, tile_arg,
                                       best_idx_ref[0, :])


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
            pl.BlockSpec((1, tile_q), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda i, j: (i, 0),
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
                     tile_q: int = 256, tile_t: int = 512):
    """1-NN (idx, d2) via the fused kernel; pads shapes as needed."""
    nq, dim = queries.shape
    nt = targets.shape[0]
    if n_targets is None:
        n_targets = nt
    qp = jnp.pad(queries.astype(jnp.float32),
                 ((0, (-nq) % tile_q), (0, _LANES - dim)))
    tp = jnp.pad(targets.astype(jnp.float32),
                 ((0, (-nt) % tile_t), (0, _LANES - dim)))
    idx, d2 = _nn_argmin_padded(qp, tp, n_targets, tile_q, tile_t)
    return idx[:nq], d2[:nq].astype(queries.dtype)
