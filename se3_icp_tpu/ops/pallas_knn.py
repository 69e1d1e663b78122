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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38
_D_PAD = 16          # feature dim rounded up (12 -> 16); zero padding
TILE_Q = 1024
TILE_T = 2048



def _interpret() -> bool:
    """Plain-interpret pallas evaluation (trace-time gate): unlike
    ``pltpu.force_tpu_interpret_mode`` it carries no ordered IO
    effects, so the kernels can sit inside the engine's vmapped
    ``lax.while_loop`` -- the CPU-CI route for running the full TPU
    trace without a chip (tests/test_engine_interpret.py)."""
    return bool(os.environ.get("SE3_ICP_TPU_PALLAS_INTERPRET"))

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
        interpret=_interpret(),
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


# ---------------------------------------------------------------------
# Natively batched variant: the registration engine runs vmapped over a
# pair axis (parallel/pairs.py), and per-iteration the XLA path's
# batched matmul+argmin materializes the [B, Nq, Nt] distance matrix in
# HBM -- measured ~20 ms per iteration at 64x4608x4608x12 on v5e, i.e.
# ~3 full HBM passes over 5.4 GB.  This kernel puts the batch on the
# OUTER grid dimension (no vmap involved), keeps the (min, argmin)
# accumulator VMEM-resident across target tiles, and drops per-iteration
# NN cost to the input-read + MXU floor.

def _kernel_batched(q_ref, t_ref, tn_ref, best_d2_ref, best_idx_ref):
    """Lean body: every pass over the [tile_q, tile_t] block counts.

      * padded/invalid target rows are pre-poisoned to huge coordinates
        by the wrapper, so no per-tile column iota/mask pass;
      * ``tn = |t|^2`` is precomputed once per cloud and streamed in as
        a [1, tile_t] block instead of being recomputed per query tile;
      * the per-row constant ``|q|^2`` cannot change the argmin, so the
        reduction runs over ``tn - 2 q.t`` and the wrapper adds |q|^2
        back to the returned min distance afterwards;
      * the cross term arrives as ONE bf16 dot: the wrapper splits each
        f32 operand into three bf16 limbs and packs the six largest
        limb products along K (see _pack_nn_operands), so an f32-exact
        expansion accumulates in a single MXU pass group with one
        output buffer -- ~2.5x faster than an f32 HIGHEST dot at
        64x4608x4608x16 on v5e and argmin-identical to the f64 oracle
        on realistic data.
    """
    i = pl.program_id(1)
    j = pl.program_id(2)
    tile_t = t_ref.shape[1]

    prod = jax.lax.dot_general(
        q_ref[0], t_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    d2 = tn_ref[0] - 2.0 * prod  # tn block is [1, 1, tile_t]

    tile_min = jnp.min(d2, axis=1)
    tile_arg = (jnp.argmin(d2, axis=1) + j * tile_t).astype(jnp.int32)

    @pl.when(j == 0)
    def _init():
        best_d2_ref[0, i, :] = tile_min
        best_idx_ref[0, i, :] = tile_arg

    @pl.when(j != 0)
    def _combine():
        cur = best_d2_ref[0, i, :]
        better = tile_min < cur
        best_d2_ref[0, i, :] = jnp.where(better, tile_min, cur)
        best_idx_ref[0, i, :] = jnp.where(better, tile_arg,
                                          best_idx_ref[0, i, :])


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_t"))
def _nn_argmin_padded_batched(queries, targets, tn, tile_q: int,
                              tile_t: int):
    bsz, nq, d = queries.shape
    nt = targets.shape[1]
    ni = nq // tile_q
    grid = (bsz, ni, nt // tile_t)

    best_d2, best_idx = pl.pallas_call(
        _kernel_batched,
        grid=grid,
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, tile_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # one batch row's full output stays VMEM-resident while its
            # (i, j) tiles run (j innermost revisits it; a few KB)
            pl.BlockSpec((1, ni, tile_q), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ni, tile_q), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, ni, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ni, tile_q), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * nq * nt * d,
            bytes_accessed=4 * bsz * (nq * d + nt * d * ni + 2 * nq),
            transcendentals=0,
        ),
    )(queries, targets, tn)
    return (best_idx.reshape(bsz, -1), best_d2.reshape(bsz, -1))


def _pick_tiles(nq: int, nt: int, budget: int | None = None
                ) -> tuple[int, int]:
    """Tile selection for the batched kernel.

    ``budget`` (bytes, default 10 MiB, override via
    SE3_ICP_TPU_TILE_BUDGET): cap on the f32 [tile_q, tile_t] distance
    block; raising it trades VMEM for wider query tiles at large N
    (15360-point clouds pick tile_q=256 at 10 MiB, 512 at 20 MiB).

    Targets stream in minimal-padding chunks of at most 4608 rows (a
    4608-point cloud runs ONE pass with zero padding; 15360 runs 4x3840
    instead of 8x2048); tile_q is then the largest power-of-two
    multiple of 128 whose [tile_q, tile_t] f32 d2 block fits the VMEM
    budget -- powers of two only, because 384-row tiles measured ~8x
    slower than 512 on v5e (pathological Mosaic layout)."""
    if budget is None:
        budget = int(os.environ.get("SE3_ICP_TPU_TILE_BUDGET",
                                    str(10 * 1024 * 1024)))
    nt_p = -(-nt // 128) * 128
    steps = -(-nt_p // 4608)
    tile_t = -(-(-(-nt_p // steps)) // 128) * 128  # ceil/steps, to x128
    tile_q = 128
    while tile_q * 2 * 4 * tile_t <= budget and tile_q < 2048:
        tile_q *= 2
    return tile_q, tile_t


_POISON = 1e17  # poisoned coordinate: |t|^2 ~ 3e34 stays finite in f32


def _split3_limbs(x):
    """f32 -> (hi, mid, lo) bf16 limbs, hi+mid+lo == x exactly (three
    8-bit mantissa windows cover f32's 24 bits; the sums are exact
    because the windows are disjoint).

    The roundings MUST be ``lax.reduce_precision``, not converts: under
    ``--xla_allow_excess_precision`` (on by default in this toolchain)
    XLA may elide f32->bf16->f32 convert round-trips inside a fused
    program, which silently zeroes the residual limbs and degrades the
    packed dot to plain bf16 (observed: ~3% flipped argmins and broken
    engine convergence when this used ``astype``)."""
    hi_f = jax.lax.reduce_precision(x, 8, 7)
    r = x - hi_f
    mid_f = jax.lax.reduce_precision(r, 8, 7)
    lo_f = jax.lax.reduce_precision(r - mid_f, 8, 7)
    return (hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16),
            lo_f.astype(jnp.bfloat16))


def _pack_nn_operands(qp, tp):
    """Pack the f32 cross term q.t as ONE bf16 dot along K.

    q = qh+qm+ql, t = th+tm+tl (exact 3-limb splits); keeping the six
    largest limb products -- hh, hm, mh, hl, lh, mm -- reproduces the
    f32 product to ~2^-24 relative (the dropped ml/lm/ll terms are
    <= 2^-40), i.e. the same error class as XLA's f32 HIGHEST 6-pass
    emulation, at ONE bf16 MXU pass group over K=6D: measured ~2.5x
    faster than a HIGHEST dot at 64x4608x4608x16 on v5e.  Each bf16
    limb product is exact in the f32 accumulator (8x8-bit mantissas).
    """
    qh, qm, ql = _split3_limbs(qp)
    th, tm, tl = _split3_limbs(tp)
    q6 = jnp.concatenate([qh, qh, qm, qh, ql, qm], axis=-1)
    t6 = jnp.concatenate([th, tm, th, tl, th, tm], axis=-1)
    return q6, t6


def nn_argmin_pallas_batched(queries, targets, n_targets=None):
    """Batched 1-NN: queries [B,Nq,D], targets [B,Nt,D],
    n_targets [B] -> (idx [B,Nq] int32, d2 [B,Nq]).

    Invalid/padded target rows (index >= n_targets) are poisoned to a
    huge coordinate BEFORE the kernel, so the O(B*Nq*Nt) inner loop
    carries no masking pass; |q|^2 is added back outside the reduction
    (a per-row constant cannot change the argmin); the f32 operands are
    limb-split to bf16 and packed along K so the kernel's one bf16 dot
    computes the full f32 cross-term expansion (see _kernel_batched)."""
    bsz, nq, dim = queries.shape
    nt = targets.shape[1]
    dp = max(_D_PAD, -(-dim // 8) * 8)
    tile_q, tile_t = _pick_tiles(nq, nt)
    qp = jnp.pad(queries.astype(jnp.float32),
                 ((0, 0), (0, (-nq) % tile_q), (0, dp - dim)))
    tp = jnp.pad(targets.astype(jnp.float32),
                 ((0, 0), (0, (-nt) % tile_t), (0, dp - dim)))
    row = jax.lax.broadcasted_iota(jnp.int32, tp.shape[:2], 1)
    if n_targets is None:
        n_arr = jnp.full((bsz,), nt, jnp.int32)
    else:
        n_arr = jnp.asarray(n_targets, jnp.int32)
    tp = jnp.where((row < n_arr[:, None])[:, :, None], tp, _POISON)
    tn = jnp.sum(tp * tp, axis=-1)[:, None, :]           # [B, 1, Ntp]
    q6, t6 = _pack_nn_operands(qp, tp)                   # [B, *, 6dp]
    idx, d2 = _nn_argmin_padded_batched(q6, t6, tn, tile_q, tile_t)
    qn = jnp.sum(qp[:, :nq] * qp[:, :nq], axis=-1)
    return idx[:, :nq], (d2[:, :nq] + qn).astype(queries.dtype)


# ---------------------------------------------------------------------
# Fused 1-NN + matched-payload selection.
#
# The registration loop consumes the MATCH's data, not its index:
# tgt_c[midx], tgt_normals[midx], tgt_tr_beta[midx], cov_tgt[midx] --
# random row gathers that are scalar-bound on TPU (measured ~13 ms per
# iteration at 64x4608x3 in the engine's while loop, dwarfing the NN
# itself).  This kernel returns the winning target's payload row
# directly: per tile it builds the argmin one-hot [tile_q, tile_t]
# (exact 0/1 bf16) and contracts it with the payload block on the MXU.
# Payload rows travel as exact 3-limb bf16 splits (see _split3_limbs),
# so the reconstruction hi+mid+lo is bit-exact f32.

def _kernel_match(q_ref, t_ref, tn_ref, pay_ref,
                  best_d2_ref, best_idx_ref, best_pay_ref):
    i = pl.program_id(1)
    j = pl.program_id(2)
    tile_t = t_ref.shape[1]

    prod = jax.lax.dot_general(
        q_ref[0], t_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    d2 = tn_ref[0] - 2.0 * prod

    tile_min = jnp.min(d2, axis=1)
    am = jnp.argmin(d2, axis=1).astype(jnp.int32)        # [tile_q] local
    tile_arg = am + j * tile_t

    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    onehot = (col == am[:, None]).astype(jnp.bfloat16)
    pay3 = jax.lax.dot_general(
        onehot, pay_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)              # [tile_q, 3P]
    # fold the exact limb triple back to f32 in VMEM (hi+mid+lo sums
    # are exact; doing it here saves an XLA pass over [B,Nq,3P] per
    # engine iteration and shrinks the output 3x)
    p_w = pay3.shape[1] // 3
    pay = pay3[:, :p_w] + pay3[:, p_w:2 * p_w] + pay3[:, 2 * p_w:]

    @pl.when(j == 0)
    def _init():
        best_d2_ref[0, i, :] = tile_min
        best_idx_ref[0, i, :] = tile_arg
        best_pay_ref[0, :, :] = pay

    @pl.when(j != 0)
    def _combine():
        cur = best_d2_ref[0, i, :]
        better = tile_min < cur
        best_d2_ref[0, i, :] = jnp.where(better, tile_min, cur)
        best_idx_ref[0, i, :] = jnp.where(better, tile_arg,
                                          best_idx_ref[0, i, :])
        best_pay_ref[0, :, :] = jnp.where(better[:, None], pay,
                                          best_pay_ref[0, :, :])


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_t"))
def _nn_match_padded_batched(q6, t6, tn, pay3, tile_q: int, tile_t: int):
    bsz, nq, _ = q6.shape
    nt = t6.shape[1]
    p3 = pay3.shape[2]
    ni = nq // tile_q
    grid = (bsz, ni, nt // tile_t)

    best_d2, best_idx, best_pay = pl.pallas_call(
        _kernel_match,
        grid=grid,
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, tile_q, q6.shape[2]),
                         lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, t6.shape[2]),
                         lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_t), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, p3), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ni, tile_q), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ni, tile_q), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # payload block follows the query tile (revisited across j)
            pl.BlockSpec((1, tile_q, p3 // 3), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, ni, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ni, tile_q), jnp.int32),
            jax.ShapeDtypeStruct((bsz, nq, p3 // 3), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * nq * nt * (q6.shape[2] + p3),
            bytes_accessed=4 * bsz * (nq * q6.shape[2]
                                      + (nt * (t6.shape[2] + p3)) * ni
                                      + nq * (2 + p3)),
            transcendentals=0,
        ),
    )(q6, t6, tn, pay3)
    return (best_idx.reshape(bsz, -1), best_d2.reshape(bsz, -1),
            best_pay)


def nn_match_pallas_batched(queries, targets, payload, n_targets=None):
    """Fused batched 1-NN + payload gather.

    queries [B,Nq,D], targets [B,Nt,D], payload [B,Nt,P] f32 ->
    (idx [B,Nq] int32, d2 [B,Nq], matched [B,Nq,P] f32) with
    matched[b, q] == payload[b, idx[b, q]] bit-exactly.
    """
    bsz, nq, dim = queries.shape
    nt = targets.shape[1]
    p = payload.shape[2]
    dp = max(_D_PAD, -(-dim // 8) * 8)
    tile_q, tile_t = _pick_tiles(nq, nt)
    qp = jnp.pad(queries.astype(jnp.float32),
                 ((0, 0), (0, (-nq) % tile_q), (0, dp - dim)))
    tp = jnp.pad(targets.astype(jnp.float32),
                 ((0, 0), (0, (-nt) % tile_t), (0, dp - dim)))
    row = jax.lax.broadcasted_iota(jnp.int32, tp.shape[:2], 1)
    if n_targets is None:
        n_arr = jnp.full((bsz,), nt, jnp.int32)
    else:
        n_arr = jnp.asarray(n_targets, jnp.int32)
    tp = jnp.where((row < n_arr[:, None])[:, :, None], tp, _POISON)
    tn = jnp.sum(tp * tp, axis=-1)[:, None, :]
    q6, t6 = _pack_nn_operands(qp, tp)

    payp = jnp.pad(payload.astype(jnp.float32),
                   ((0, 0), (0, (-nt) % tile_t), (0, 0)))
    ph, pm, plo = _split3_limbs(payp)
    pay3 = jnp.concatenate([ph, pm, plo], axis=-1)       # [B, Ntp, 3P]

    idx, d2, matched = _nn_match_padded_batched(q6, t6, tn, pay3,
                                                tile_q, tile_t)
    qn = jnp.sum(qp[:, :nq] * qp[:, :nq], axis=-1)
    return (idx[:, :nq], (d2[:, :nq] + qn).astype(queries.dtype),
            matched[:, :nq].astype(payload.dtype))


# ---------------------------------------------------------------------
# Pre-packed dual-phase match: the engine's target embedding switches
# between the SE(3) (phase A) and R3 (phase B) forms per pair per
# iteration.  Packing both phases ONCE before the loop and letting the
# kernel's index maps pick the phase via a scalar-prefetched per-pair
# flag removes the per-iteration [B,Nt,12] select, target limb-split,
# |t|^2 and poison passes entirely (~2.5 ms/iter at batch 64).

def _kernel_match_packed(phase_ref, q_ref, t_ref, pay_ref,
                         best_d2_ref, best_idx_ref, best_pay_ref):
    del phase_ref  # consumed by the index maps
    i = pl.program_id(1)
    j = pl.program_id(2)
    tile_t = t_ref.shape[2]

    # whole shifted distance -2 q.t + |t|^2 off ONE MXU pass (the tn
    # limbs ride the K axis against constant-1 query columns)
    d2 = jax.lax.dot_general(
        q_ref[0], t_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    tile_min = jnp.min(d2, axis=1)
    am = jnp.argmin(d2, axis=1).astype(jnp.int32)
    tile_arg = am + j * tile_t

    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    onehot = (col == am[:, None]).astype(jnp.bfloat16)
    pay3 = jax.lax.dot_general(
        onehot, pay_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    p_w = pay3.shape[1] // 3
    pay = pay3[:, :p_w] + pay3[:, p_w:2 * p_w] + pay3[:, 2 * p_w:]

    @pl.when(j == 0)
    def _init():
        best_d2_ref[0, i, :] = tile_min
        best_idx_ref[0, i, :] = tile_arg
        best_pay_ref[0, :, :] = pay

    @pl.when(j != 0)
    def _combine():
        cur = best_d2_ref[0, i, :]
        better = tile_min < cur
        best_d2_ref[0, i, :] = jnp.where(better, tile_min, cur)
        best_idx_ref[0, i, :] = jnp.where(better, tile_arg,
                                          best_idx_ref[0, i, :])
        best_pay_ref[0, :, :] = jnp.where(better[:, None], pay,
                                          best_pay_ref[0, :, :])


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_t"))
def _nn_match_packed_padded(phase, q6, t6_pair, pay3,
                            tile_q: int, tile_t: int):
    bsz, nq, _ = q6.shape
    nt = t6_pair.shape[2]
    p3 = pay3.shape[2]
    ni = nq // tile_q
    grid = (bsz, ni, nt // tile_t)

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, q6.shape[2]),
                         lambda b, i, j, ph: (b, i, 0)),
            # phase-selected target block: dim 1 indexed by the
            # prefetched per-pair flag
            pl.BlockSpec((1, 1, tile_t, t6_pair.shape[3]),
                         lambda b, i, j, ph: (b, ph[b], j, 0)),
            pl.BlockSpec((1, tile_t, p3),
                         lambda b, i, j, ph: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ni, tile_q), lambda b, i, j, ph: (b, 0, 0)),
            pl.BlockSpec((1, ni, tile_q), lambda b, i, j, ph: (b, 0, 0)),
            pl.BlockSpec((1, tile_q, p3 // 3),
                         lambda b, i, j, ph: (b, i, 0)),
        ],
    )
    best_d2, best_idx, best_pay = pl.pallas_call(
        _kernel_match_packed,
        grid_spec=spec,
        interpret=_interpret(),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, ni, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ni, tile_q), jnp.int32),
            jax.ShapeDtypeStruct((bsz, nq, p3 // 3), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * nq * nt * (q6.shape[2] + p3),
            bytes_accessed=2 * bsz * (nq * q6.shape[2]
                                      + (nt * (t6_pair.shape[3] + p3))
                                      * ni + 4 * nq * (2 + p3)),
            transcendentals=0,
        ),
    )(phase.astype(jnp.int32), q6, t6_pair, pay3)
    return (best_idx.reshape(bsz, -1), best_d2.reshape(bsz, -1),
            best_pay)


# Affine-factored query variant: the engine's per-iteration query
# embedding is AFFINE in static per-point features --
#   q[3i:3i+3] = alpha*ph * (F^T)_i R^T   (SE(3) rotation block)
#   q[9:12]    = c_s * s R^T + t          (translation block)
# -- so instead of rebuilding/limb-splitting [B,Nq,12] queries in XLA
# every iteration (select + concat + convert fusions measured ~2.5
# ms/iter at 64x4608 on v5e, all narrow-minor-dim HBM passes), the
# kernel takes the STATIC feature block  feat = [F^T(9) | s(3) | 1 |
# 0(3)]  packed once in setup and a tiny per-pair [16,16] matrix
# W(R, t, alpha, beta, phase); it computes q = feat @ W and the exact
# bf16 limb split IN KERNEL, where the intermediates never touch HBM.

def _kernel_match_affine(phase_ref, feat_ref, w_ref, t_ref,
                         pay_ref, best_d2_ref, best_pay_ref):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # phase_ref [B,2]: column 0 picks the phase block (index maps),
    # column 1 is the pair's DONE flag -- converged pairs skip the
    # whole body (their outputs are stale garbage, which the engine's
    # done-masked carry discards anyway).  The batch loops until every
    # pair converges, so this refunds (max_iters - iters_b) match
    # passes per pair -- ~17% of loop compute at the golden batch,
    # more under heterogeneous real batches.
    @pl.when(phase_ref[b, 1] == 0)
    def _active():
        _kernel_match_affine_body(feat_ref, w_ref, t_ref, pay_ref,
                                  best_d2_ref, best_pay_ref, i, j)


def _kernel_match_affine_body(feat_ref, w_ref, t_ref, pay_ref,
                              best_d2_ref, best_pay_ref, i, j):
    q = jax.lax.dot_general(
        feat_ref[0], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # [tile_q, 16] f32
    # exact 3-limb bf16 split of -2q with plain converts
    # (reduce_precision is not lowerable in-kernel; XLA's
    # excess-precision elision does not reach inside -- see
    # _kernel_axis); the -2 scale and the |t|^2 shift ride the dot
    # itself (three tn limb columns against constant-1 query columns,
    # r5), so d2 needs no VPU pass at all
    q2 = -2.0 * q
    qh = q2.astype(jnp.bfloat16)
    r1 = q2 - qh.astype(jnp.float32)
    qm = r1.astype(jnp.bfloat16)
    ql = (r1 - qm.astype(jnp.float32)).astype(jnp.bfloat16)
    tile_q = q.shape[0]
    ones = jnp.ones((tile_q, 3), jnp.bfloat16)
    zpad = jnp.zeros((tile_q, 5), jnp.bfloat16)
    q6 = jnp.concatenate([qh, qh, qm, qh, ql, qm, ones, zpad], axis=-1)

    d2 = jax.lax.dot_general(
        q6, t_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)       # -2 q.t + |t|^2

    tile_min = jnp.min(d2, axis=1)
    # r5: the engine's loop is payload-driven -- the match INDEX is
    # never consumed -- so the argmin/iota chain is gone.  The min-mask
    # may be multi-hot on exact f32 distance ties; the payload's
    # trailing ones column counts the ties through the same MXU dot and
    # the sum is normalized to their average (distinct targets only tie
    # exactly when co-located, where payload rows coincide anyway).
    mmask = (d2 <= tile_min[:, None]).astype(jnp.bfloat16)
    # matched payload emitted TRANSPOSED [3(P+1), tile_q]: the loop-body
    # consumers (distance norms, pt2pl residual/Jacobian) reduce over
    # the small feature axis, so a [P, N] layout keeps their minor dim
    # at N (full lanes) instead of P (~90% wasted vectors)
    pay3 = jax.lax.dot_general(
        pay_ref[0], mmask, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)      # [3(P+1), tile_q]
    p_w1 = pay3.shape[0] // 3
    pay = pay3[:p_w1] + pay3[p_w1:2 * p_w1] + pay3[2 * p_w1:]
    pay = pay[:p_w1 - 1] * (1.0 / pay[p_w1 - 1:])  # tie-average

    @pl.when(j == 0)
    def _init():
        best_d2_ref[0, i, :] = tile_min
        best_pay_ref[0, :, :] = pay

    @pl.when(j != 0)
    def _combine():
        cur = best_d2_ref[0, i, :]
        better = tile_min < cur
        best_d2_ref[0, i, :] = jnp.where(better, tile_min, cur)
        best_pay_ref[0, :, :] = jnp.where(better[None, :], pay,
                                          best_pay_ref[0, :, :])


@functools.partial(jax.jit, static_argnames=("tile_q", "tile_t"))
def _nn_match_affine_padded(phase, feat, w, t6_pair, pay3,
                            tile_q: int, tile_t: int):
    bsz, nqp, fdim = feat.shape
    nt = t6_pair.shape[2]
    p3 = pay3.shape[2]
    p_w = p3 // 3 - 1          # payload width sans the tie-count column
    ni = nqp // tile_q
    grid = (bsz, ni, nt // tile_t)

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_q, fdim),
                         lambda b, i, j, ph: (b, i, 0)),
            pl.BlockSpec((1, fdim, fdim),
                         lambda b, i, j, ph: (b, 0, 0)),
            pl.BlockSpec((1, 1, tile_t, t6_pair.shape[3]),
                         lambda b, i, j, ph: (b, ph[b, 0], j, 0)),
            pl.BlockSpec((1, tile_t, p3),
                         lambda b, i, j, ph: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ni, tile_q), lambda b, i, j, ph: (b, 0, 0)),
            pl.BlockSpec((1, p_w, tile_q),
                         lambda b, i, j, ph: (b, 0, i)),
        ],
    )
    best_d2, best_pay = pl.pallas_call(
        _kernel_match_affine,
        grid_spec=spec,
        interpret=_interpret(),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, ni, tile_q), jnp.float32),
            jax.ShapeDtypeStruct((bsz, p_w, nqp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * nqp * nt * (6 * fdim + p3),
            bytes_accessed=2 * bsz * (nqp * fdim
                                      + (nt * (t6_pair.shape[3] + p3))
                                      * ni + 4 * nqp * (2 + p3)),
            transcendentals=0,
        ),
    )(phase.astype(jnp.int32), feat, w, t6_pair, pay3)
    return best_d2.reshape(bsz, -1), best_pay


def nn_match_affine(feat, w, t6_pair, tn_pair, pay3, phase):
    """Batched fused match with the query embedding built IN KERNEL
    from static features and a per-pair affine matrix.

    feat [B,Nq,16] f32 static per-point features, w [B,16,16] f32
    per-iteration affine (q = feat @ w), targets/payload as packed by
    ``pack_match_targets`` (tn_pair unused -- the tn limbs ride inside
    t6_pair since r5), phase [B,2] int: column 0 the phase flag
    (0 = SE(3), 1 = R3), column 1 the DONE flag (1 = skip this pair's
    compute entirely; ALL outputs are then stale garbage -- only the
    engine's done-masked carry may consume them; see registration.py).
    Returns (d2_shifted [B,Nq] f32, matchedT [B,P,Nq] f32 -- the
    payload rows TRANSPOSED so downstream feature-axis reductions run
    with N on the lanes).  NOTE: d2 omits the +|q|^2 shift
    (argmin-equivalent; the engine discards it), and the match INDEX
    is not produced at all -- the engine's loop is payload-driven, so
    the argmin/iota/one-hot index chain was removed from the hot
    kernel (r5; exact-tie payloads average, see _kernel_match_affine).
    """
    del tn_pair
    bsz, nq, fdim = feat.shape
    ntp = t6_pair.shape[2]
    tile_q, tile_t = _pick_tiles(nq, ntp)
    featp = jnp.pad(feat.astype(jnp.float32),
                    ((0, 0), (0, (-nq) % tile_q), (0, 0)))
    d2, matched_t = _nn_match_affine_padded(
        phase, featp, w.astype(jnp.float32), t6_pair, pay3,
        tile_q, tile_t)
    return d2[:, :nq], matched_t[:, :, :nq].astype(feat.dtype)


def pack_match_targets(targets_a, targets_b, payload, n_targets, nq):
    """Pre-pack BOTH phase variants of the target embedding + the
    (phase-independent) payload for ``nn_match_affine`` /
    ``nn_match_packed``.

    targets_* [Nt,D] f32 (unbatched; vmap-compatible), payload [Nt,P],
    n_targets scalar, nq static query count (tile selection).
    Returns (t6_pair [2,Ntp,6dp+8] bf16, tn_pair [2,1,Ntp] f32,
    pay3 [Ntp,3(P+1)] bf16).

    r5 layout: |t|^2 rides INSIDE the limb pack as three extra bf16
    limb columns (paired with constant-1 query columns), so the match
    kernels read the whole shifted distance  -2 q.t + |t|^2  off one
    MXU pass with no VPU shift pass; the returned ``tn_pair`` is kept
    only for checksums/oracles.  The payload gains a trailing
    ones column: the affine kernel contracts its min-mask against it
    to count exact distance ties and normalize the summed payload
    (ties average instead of picking the lowest index; exact f32
    distance ties between distinct targets only occur for duplicate
    points, where the payload rows coincide anyway)."""
    nt, dim = targets_a.shape
    dp = max(_D_PAD, -(-dim // 8) * 8)
    tile_q, tile_t = _pick_tiles(nq, nt)

    def prep(t):
        tp = jnp.pad(t.astype(jnp.float32),
                     ((0, (-nt) % tile_t), (0, dp - dim)))
        row = jax.lax.broadcasted_iota(jnp.int32, tp.shape[:1], 0)
        tp = jnp.where((row < n_targets)[:, None], tp, _POISON)
        tn = jnp.sum(tp * tp, axis=-1)[None, :]
        _, t6 = _pack_nn_operands(jnp.zeros_like(tp), tp)
        tnh, tnm, tnl = _split3_limbs(tn)
        zpad = jnp.zeros((t6.shape[0], 5), jnp.bfloat16)
        t6 = jnp.concatenate([t6, tnh.T, tnm.T, tnl.T, zpad], axis=-1)
        return t6, tn
    t6a, tna = prep(targets_a)
    t6b, tnb = prep(targets_b)

    payp = jnp.pad(payload.astype(jnp.float32),
                   ((0, (-nt) % tile_t), (0, 0)))
    payp = jnp.concatenate(
        [payp, jnp.ones((payp.shape[0], 1), jnp.float32)], axis=-1)
    ph, pm, plo = _split3_limbs(payp)
    pay3 = jnp.concatenate([ph, pm, plo], axis=-1)
    return (jnp.stack([t6a, t6b]), jnp.stack([tna, tnb]), pay3)


def _pack_query_shifted(qp):
    """Query-side companion of the r5 target layout: limbs of -2q plus
    three constant-1 columns (multiplying the tn limbs) and zero pad,
    so  q6' . t6' = -2 q.t + |t|^2  off one MXU pass.  Any leading
    batch dims."""
    q6, _ = _pack_nn_operands(-2.0 * qp, jnp.zeros_like(qp))
    lead = q6.shape[:-1]
    ones = jnp.ones(lead + (3,), jnp.bfloat16)
    zpad = jnp.zeros(lead + (5,), jnp.bfloat16)
    return jnp.concatenate([q6, ones, zpad], axis=-1)


def nn_match_packed(queries, t6_pair, tn_pair, pay3, phase):
    """Batched fused match against pre-packed dual-phase targets.

    queries [B,Nq,D] f32, t6_pair [B,2,Ntp,6dp+8] bf16 (tn limbs
    inside, see ``pack_match_targets``), tn_pair [B,2,1,Ntp] f32
    (unused here; kept for checksums/oracles), pay3 [B,Ntp,3(P+1)]
    bf16, phase [B] int (0 = phase A, 1 = phase B) ->
    (idx, d2, matched [B,Nq,P]).
    """
    del tn_pair
    bsz, nq, dim = queries.shape
    nt = t6_pair.shape[2]
    p_width = pay3.shape[2] // 3 - 1
    dp = max(_D_PAD, -(-dim // 8) * 8)
    tile_q, tile_t = _pick_tiles(nq, nt)
    qp = jnp.pad(queries.astype(jnp.float32),
                 ((0, 0), (0, (-nq) % tile_q), (0, dp - dim)))
    q6 = _pack_query_shifted(qp)
    idx, d2, matched = _nn_match_packed_padded(
        phase, q6, t6_pair, pay3, tile_q, tile_t)
    qn = jnp.sum(qp[:, :nq] * qp[:, :nq], axis=-1)
    return (idx[:, :nq], (d2[:, :nq] + qn).astype(queries.dtype),
            matched[:, :nq, :p_width].astype(queries.dtype))
