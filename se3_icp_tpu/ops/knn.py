"""Brute-force nearest-neighbor search on the MXU.

Replaces every FLANN KD-tree in the reference (ref:hpp:66-68; queries at
ref:cpp:136,253,407,431,458,626): the 3-D euclidean 1-NN correspondence
search (C6), the 12-D SE(3) 1-NN search (C5), the k=90 kNN for TOLDI LRFs
(C3), and normal-estimation neighborhoods.

TPU-first design: at the reference's cloud sizes (~4k-15k points) an
O(N^2) tiled distance matrix is a single large matmul --
``d2 = |q|^2 - 2 q.t^T + |t|^2`` -- which the MXU eats; tree traversal
would serialize.  Two code paths compute identical results:

  * a plain-XLA chunked path (works everywhere; the oracle for tests),
  * a fused Pallas kernel (``pallas_knn.py``) that never materializes the
    distance matrix in HBM: per query tile it keeps a running
    (min, argmin) accumulator in VMEM while streaming target tiles.

All functions take an optional traced ``n_targets`` so padded clouds mask
correctly, and break distance ties toward the lowest target index.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_BIG = 3.4e38  # ~f32 max; used instead of inf so masked math stays finite


def _use_pallas() -> bool:
    """UNBATCHED dispatch policy.  Measured on TPU v5e (15k x 15k x 12):
    XLA's fused matmul+argmin = 0.82 ms vs the best Pallas tiling =
    1.07 ms, so XLA is the default for single queries; set
    SE3_ICP_TPU_PALLAS=1 to opt into the Pallas kernel.  BATCHED
    (vmapped) calls are a different story -- see ``nn_argmin``."""
    return bool(os.environ.get("SE3_ICP_TPU_PALLAS")) and (
        jax.default_backend() == "tpu")


def _use_pallas_batched() -> bool:
    """Batched calls default to the fused Pallas kernel on TPU: XLA's
    batched matmul+argmin materializes the [B,Nq,Nt] distance matrix in
    HBM (~3 passes over 5.4 GB per engine iteration at 64x4608) --
    measured ~20 ms/iter vs ~2 ms fused.  SE3_ICP_TPU_NO_PALLAS=1
    reverts to XLA.  SE3_ICP_TPU_FORCE_PALLAS=1 turns the kernels on
    off-TPU (CPU CI runs the full TPU trace under
    ``pltpu.force_tpu_interpret_mode`` -- see
    tests/test_engine_interpret.py)."""
    if os.environ.get("SE3_ICP_TPU_NO_PALLAS"):
        return False     # the XLA escape hatch wins over FORCE_PALLAS
    if os.environ.get("SE3_ICP_TPU_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def _chunk_starts(n: int, chunk: int):
    return list(range(0, n, chunk))


def _pairwise_d2(q, t):
    """[Cq,D] x [Nt,D] -> [Cq,Nt] squared distances (matmul form).

    The cross term runs at HIGHEST precision: TPU's default matmul
    precision is bf16, whose ~0.4% relative error can flip nearest
    neighbors between close candidates at fine convergence (the
    reference's FLANN trees are exact f64).
    """
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    tn = jnp.sum(t * t, axis=-1)
    prod = jax.lax.dot_general(
        q, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=q.dtype,
        precision=jax.lax.Precision.HIGHEST)
    return qn - 2.0 * prod + tn[None, :]


def _mask_cols(d2, n_targets):
    if n_targets is None:
        return d2
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    return jnp.where(col < n_targets, d2, jnp.asarray(_BIG, d2.dtype))


@functools.partial(jax.jit, static_argnames=("chunk",))
def nn_argmin_xla(queries, targets, n_targets=None, chunk: int = 4096):
    """1-NN: returns (idx [Nq] int32, d2 [Nq]).  Plain-XLA chunked path.

    ``chunk`` is a TARGET: the actual chunk is nq split into equal
    lane-aligned pieces, so a 4608-point cloud runs 2x2304 instead of
    padding to 3x2048=6144 (33% wasted rows; measured 18.6 -> 11.6 ms
    per 64-pair batch on v5e)."""
    nq = queries.shape[0]
    steps = max(1, -(-nq // chunk))
    chunk = -(-(-(-nq // steps)) // 128) * 128  # ceil(nq/steps) to x128
    pad = (-nq) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qc = qp.reshape(-1, chunk, queries.shape[1])

    def one(q):
        d2 = _mask_cols(_pairwise_d2(q, targets), n_targets)
        return jnp.argmin(d2, axis=1).astype(jnp.int32), jnp.min(d2, axis=1)

    idx, d2 = jax.lax.map(one, qc)
    return idx.reshape(-1)[:nq], d2.reshape(-1)[:nq]


def _bcast(x, b, axis_size):
    return x if b else jnp.broadcast_to(x[None],
                                        (axis_size,) + jnp.shape(x))


@jax.custom_batching.custom_vmap
def _nn_argmin_pallas_or_xla(queries, targets, n_targets):
    from se3_icp_tpu.ops import pallas_knn
    return pallas_knn.nn_argmin_pallas(queries, targets, n_targets)


@jax.custom_batching.custom_vmap
def _nn_argmin_xla_single(queries, targets, n_targets):
    return nn_argmin_xla(queries, targets, n_targets)


def _batched_pallas_rule(axis_size, in_batched, queries, targets,
                         n_targets):
    """vmap rule shared by both dispatch variants: route the whole
    batch through the natively batched Pallas kernel (the batch is an
    outer grid dimension -- no vmap-of-pallas lowering involved)."""
    from se3_icp_tpu.ops import pallas_knn
    qb, tb, nb = in_batched
    out = pallas_knn.nn_argmin_pallas_batched(
        _bcast(queries, qb, axis_size), _bcast(targets, tb, axis_size),
        _bcast(jnp.asarray(n_targets, jnp.int32), nb, axis_size))
    return out, (True, True)


_nn_argmin_pallas_or_xla.def_vmap(_batched_pallas_rule)
_nn_argmin_xla_single.def_vmap(_batched_pallas_rule)


def nn_argmin(queries, targets, n_targets=None):
    """1-NN dispatch.

    On TPU: unbatched calls use XLA's fused matmul+argmin (fastest
    single-problem path; SE3_ICP_TPU_PALLAS=1 opts into the Pallas
    kernel), while vmapped calls -- the engine's batched hot loop --
    lower to the natively batched Pallas kernel via a custom_vmap rule
    (SE3_ICP_TPU_NO_PALLAS=1 reverts).  Elsewhere: plain XLA."""
    if _use_pallas():
        if n_targets is None:
            n_targets = targets.shape[0]
        return _nn_argmin_pallas_or_xla(queries, targets,
                                        jnp.asarray(n_targets, jnp.int32))
    if _use_pallas_batched():
        if n_targets is None:
            n_targets = targets.shape[0]
        return _nn_argmin_xla_single(queries, targets,
                                     jnp.asarray(n_targets, jnp.int32))
    return nn_argmin_xla(queries, targets, n_targets)


@jax.custom_batching.custom_vmap
def _nn_match(queries, targets, payload, n_targets):
    idx, d2 = nn_argmin_xla(queries, targets, n_targets)
    return idx, d2, payload[idx]


@_nn_match.def_vmap
def _nn_match_vmap_rule(axis_size, in_batched, queries, targets, payload,
                        n_targets):
    """Batched matches lower to the fused Pallas NN+payload kernel on
    TPU (index gathers of the matched rows are scalar-bound: ~13 ms per
    engine iteration at 64x4608 -- the kernel selects the winning row
    via an argmin-one-hot matmul on the MXU instead).  Elsewhere: XLA
    argmin + take_along_axis."""
    qb, tb, pb, nb = in_batched
    q = _bcast(queries, qb, axis_size)
    t = _bcast(targets, tb, axis_size)
    p = _bcast(payload, pb, axis_size)
    n = _bcast(jnp.asarray(n_targets, jnp.int32), nb, axis_size)
    if _use_pallas_batched():
        from se3_icp_tpu.ops import pallas_knn
        out = pallas_knn.nn_match_pallas_batched(q, t, p, n)
    else:
        idx, d2 = jax.vmap(nn_argmin_xla)(q, t, n)
        out = (idx, d2,
               jnp.take_along_axis(p, idx[:, :, None], axis=1))
    return out, (True, True, True)


def nn_match(queries, targets, payload, n_targets=None):
    """1-NN + matched-row payload: returns (idx [Nq] int32, d2 [Nq],
    matched [Nq,P]) with matched[i] == payload[idx[i]].

    The registration loop's correspondence search: instead of gathering
    ``tgt_c[midx]``/``tgt_normals[midx]``/... after an index-only NN,
    callers pack every per-target quantity they need into ``payload``
    columns and receive the matched rows fused with the search."""
    if n_targets is None:
        n_targets = targets.shape[0]
    return _nn_match(queries, targets, payload,
                     jnp.asarray(n_targets, jnp.int32))


def nn_distances(queries, targets, tgt_valid=None, chunk: int = 2048):
    """min_j ||q_i - t_j||^2 per query (Open3D ComputePointCloudDistance
    analog returns sqrt of this)."""
    n_targets = None
    if tgt_valid is not None:
        n_targets = jnp.sum(jnp.asarray(tgt_valid).astype(jnp.int32))
    _, d2 = nn_argmin(queries, targets, n_targets)
    return d2


def _topk_method() -> str:
    """Setup-kNN reduction method.

    On TPU the hardware PartialReduce (``jax.lax.approx_min_k``) is
    ~7.7x faster than the full-width sort that dominates registration
    setup (measured on v5e, 16x4608x4608, k=90: 36 ms vs 280 ms per
    batch).  At the default recall target (see ``approx_recall``) it
    misses a few true neighbors, which only perturbs
    TOLDI/normal/covariance neighborhoods -- validated to keep
    golden-problem accuracy at iteration parity.  Exact everywhere
    else, and overridable via SE3_ICP_TPU_EXACT_KNN=1.
    """
    if os.environ.get("SE3_ICP_TPU_EXACT_KNN"):
        return "exact"
    return "approx" if jax.default_backend() == "tpu" else "exact"


def approx_recall() -> float:
    """Recall target for the approx setup-kNN path; neighborhoods only
    (never the correspondence 1-NN, which stays exact).  The
    PartialReduce candidate width l -- and with it the aggregate top-k
    sort that dominates setup -- scales hard with recall (measured
    64x4608, k=92, v5e: recall 0.9 -> 123 ms, 0.65 -> 14 ms per cloud
    batch).  0.8 keeps golden accuracy bit-for-bit at iteration parity
    (1.3e-4 deg, 9-11 iters, same as 0.9 and as exact) while nearly
    halving setup; raise via SE3_ICP_TPU_KNN_RECALL if a dataset proves
    recall-sensitive (read per call, so it may be set after import --
    already-traced programs keep their recall, since it is baked into
    the compiled kernel)."""
    return float(os.environ.get("SE3_ICP_TPU_KNN_RECALL", "0.8"))


@functools.partial(jax.jit,
                   static_argnames=("k", "chunk", "method", "recall"))
def knn_topk(queries, targets, k: int, n_targets=None, chunk: int = 4096,
             method: str | None = None, recall: float | None = None):
    """k smallest-distance neighbors, ascending: (idx [Nq,k], d2 [Nq,k]).

    Mirrors FLANN ``SearchKNN`` ordering (closest first, ref:cpp:253-256).
    Used for TOLDI (k=90), normal estimation (k=20/30), and FPFH
    (k=100); runs once per registration.  ``method``: 'exact' (XLA
    top_k sort) or 'approx' (TPU PartialReduce, see ``_topk_method``);
    None resolves per backend.  ``recall``: approx-path recall target,
    default ``approx_recall()``.
    """
    method = method or _topk_method()
    recall = recall if recall is not None else approx_recall()
    nq = queries.shape[0]
    # minimal-padding chunking (see nn_argmin_xla): ``chunk`` is a
    # target; split into equal lane-aligned pieces instead
    steps = max(1, -(-nq // chunk))
    chunk = -(-(-(-nq // steps)) // 128) * 128
    pad = (-nq) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qc = qp.reshape(-1, chunk, queries.shape[1])

    def one(q):
        if method == "approx":
            # bf16 end-to-end: this path only feeds NEIGHBORHOOD
            # selection (TOLDI/normal/cov rank thresholds, FPFH
            # neighbor lists), which already tolerates the approximate
            # reduction (recall 0.9) -- bf16's 0.4% distance resolution
            # perturbs borderline members the same way.  Halves the
            # PartialReduce + aggregate-sort HBM traffic and runs the
            # distance matmul in one MXU pass instead of six
            # (measured 66 -> ~25 ms per 64x4608x4608 cloud pair on
            # v5e).  The correspondence 1-NN never uses this path.
            qn = jnp.sum(q * q, axis=-1, keepdims=True)
            tn = jnp.sum(targets * targets, axis=-1)
            prod = jax.lax.dot_general(
                q, targets, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            d2 = (qn - 2.0 * prod + tn[None, :]).astype(jnp.bfloat16)
            if n_targets is not None:
                col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                d2 = jnp.where(col < n_targets, d2,
                               jnp.asarray(1e30, jnp.bfloat16))
            mind, idx = jax.lax.approx_min_k(
                d2, k, recall_target=recall, aggregate_to_topk=True)
            return idx.astype(jnp.int32), mind.astype(queries.dtype)
        if method == "approx_f32":
            # approximate RANKS, exact-class VALUES: f32 HIGHEST
            # distances through the PartialReduce top-k.  For consumers
            # that weight by distance VALUES (FPFH's 1/d2) the r4 bf16
            # quantization was the accuracy killer, not the approximate
            # reduction -- this path keeps the values while skipping
            # the full top_k sort that dominates FGR setup (2.0 s of a
            # 4.3 s batch-64 call, tpu_tests/micro_fgr.py).
            d2 = _mask_cols(_pairwise_d2(q, targets), n_targets)
            mind, idx = jax.lax.approx_min_k(
                d2, k, recall_target=recall, aggregate_to_topk=True)
            return idx.astype(jnp.int32), mind
        d2 = _mask_cols(_pairwise_d2(q, targets), n_targets)
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    idx, d2 = jax.lax.map(one, qc)
    return (idx.reshape(-1, k)[:nq], d2.reshape(-1, k)[:nq])


# Batched setup-kNN memory budget: the [B, chunk, Nt] distance block of
# one query chunk.  1.5 GB keeps FGR's kNN(101) + FPFH feature buffers
# inside a 16 GB chip at the serving batch (VERDICT r3 item 6); the
# unbatched path is unaffected.
_TOPK_BATCH_BUDGET = int(os.environ.get("SE3_ICP_TPU_TOPK_BUDGET",
                                        str(1_500_000_000)))


def _knn_topk_batched(queries, targets, n_targets, k: int, method: str,
                      recall: float):
    """Batch-aware chunked top-k: queries [B,Nq,D], targets [B,Nt,D].

    A vmap of ``knn_topk`` multiplies its query chunk by B -- the
    [B, chunk, Nt] distance block of the default 4096-row chunk is
    5.4 GB at 64x4608 (the FGR OOM).  Here the chunk shrinks with the
    batch so the block stays inside ``_TOPK_BATCH_BUDGET``; chunking is
    over QUERIES only, so results are identical to the unbatched path.
    """
    bsz, nq, d = queries.shape
    nt = targets.shape[1]
    # both methods materialize the f32 dot/d2 block before any bf16
    # cast, so peak HBM is 4 bytes/element on the approx path too
    # (ADVICE r4: a 2-byte budget under-counted peak memory ~2x)
    bytes_per = 4
    chunk = max(128, _TOPK_BATCH_BUDGET // max(bsz * nt * bytes_per, 1))
    steps = max(1, -(-nq // chunk))
    chunk = -(-(-(-nq // steps)) // 128) * 128  # ceil(nq/steps) to x128
    pad = steps * chunk - nq
    qp = jnp.pad(queries, ((0, 0), (0, pad), (0, 0)))
    qt = jnp.moveaxis(qp.reshape(bsz, steps, chunk, d), 1, 0)
    n_arr = jnp.asarray(n_targets, jnp.int32)
    tn_f32 = jnp.sum(targets * targets, axis=-1)         # [B, Nt]

    def one(qc):                                          # [B, chunk, D]
        if method == "approx":
            qn = jnp.sum(qc * qc, axis=-1, keepdims=True)
            prod = jax.lax.dot_general(
                qc, targets,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            d2 = (qn - 2.0 * prod + tn_f32[:, None, :]).astype(
                jnp.bfloat16)
            col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
            d2 = jnp.where(col < n_arr[:, None, None], d2,
                           jnp.asarray(1e30, jnp.bfloat16))
            mind, idx = jax.lax.approx_min_k(
                d2, k, recall_target=recall, aggregate_to_topk=True)
            return idx.astype(jnp.int32), mind.astype(queries.dtype)
        qn = jnp.sum(qc * qc, axis=-1, keepdims=True)
        prod = jax.lax.dot_general(
            qc, targets, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=qc.dtype,
            precision=jax.lax.Precision.HIGHEST)
        d2 = qn - 2.0 * prod + tn_f32[:, None, :]
        col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2)
        d2 = jnp.where(col < n_arr[:, None, None], d2,
                       jnp.asarray(_BIG, d2.dtype))
        if method == "approx_f32":   # see the unbatched twin above
            mind, idx = jax.lax.approx_min_k(
                d2, k, recall_target=recall, aggregate_to_topk=True)
            return idx.astype(jnp.int32), mind
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    idx, d2 = jax.lax.map(one, qt)                # [steps, B, chunk, k]
    idx = jnp.moveaxis(idx, 0, 1).reshape(bsz, -1, k)[:, :nq]
    d2 = jnp.moveaxis(d2, 0, 1).reshape(bsz, -1, k)[:, :nq]
    return idx, d2


@functools.lru_cache(maxsize=None)
def _topk_vmap_fn(k: int, method: str, recall: float):
    """custom_vmap wrapper factory (cached per static config): unbatched
    calls run ``knn_topk`` unchanged; vmapped calls use the batch-aware
    chunking above."""

    @jax.custom_batching.custom_vmap
    def fn(queries, targets, n_targets):
        return knn_topk(queries, targets, k, n_targets, method=method,
                        recall=recall)

    @fn.def_vmap
    def _rule(axis_size, in_batched, queries, targets, n_targets):
        qb, tb, nb = in_batched
        out = _knn_topk_batched(
            _bcast(queries, qb, axis_size), _bcast(targets, tb, axis_size),
            _bcast(jnp.asarray(n_targets, jnp.int32), nb, axis_size),
            k, method, recall)
        return out, (True, True)

    return fn


def knn_self(points, k: int, n_valid=None, method: str | None = None,
             recall: float | None = None):
    """kNN of a cloud against itself (self included at rank 0).

    vmap-compatible: batched calls chunk queries with a batch-aware
    VMEM/HBM budget instead of multiplying the unbatched chunk by B."""
    method = method or _topk_method()
    if recall is None:
        recall = approx_recall() if method.startswith("approx") else 1.0
    if n_valid is None:
        n_valid = points.shape[0]
    return _topk_vmap_fn(k, method, recall)(
        points, points, jnp.asarray(n_valid, jnp.int32))


def use_fused_match() -> bool:
    """Trace-time gate for the engine's pre-packed fused-match path."""
    return _use_pallas_batched()


def use_thr_knn() -> bool:
    """Trace-time gate for the sort-free threshold setup path: the
    Pallas bisection kernel (pallas_moments.neighborhood_thresholds)
    replaces the sorted setup kNN entirely on TPU.  SE3_ICP_TPU_EXACT_KNN=1
    (exact sorted neighborhoods) or SE3_ICP_TPU_NO_THR_KNN=1 (A/B the
    old approx_min_k route) opt out."""
    return (_use_pallas_batched()
            and not os.environ.get("SE3_ICP_TPU_EXACT_KNN")
            and not os.environ.get("SE3_ICP_TPU_NO_THR_KNN"))


@jax.custom_batching.custom_vmap
def neighborhood_thresholds(points, counts, n_valid):
    """Per-query squared-distance thresholds for the self-inclusive
    neighborhood sizes ``counts`` [T] -- the sort-free replacement for
    the setup kNN (TPU only; guard call sites with ``use_thr_knn``).
    points [N,3], n_valid scalar -> thr [T,N] f32 COMPONENT-MAJOR; see
    pallas_moments.neighborhood_thresholds_batched.  Unbatched calls
    run as a batch of one."""
    from se3_icp_tpu.ops import pallas_moments as pm
    return pm.neighborhood_thresholds_batched(
        points[None], jnp.asarray(n_valid, jnp.int32)[None],
        counts[None])[0]


@neighborhood_thresholds.def_vmap
def _neighborhood_thresholds_vmap_rule(axis_size, in_batched, points,
                                       counts, n_valid):
    from se3_icp_tpu.ops import pallas_moments as pm
    pb, cb, nb = in_batched
    out = pm.neighborhood_thresholds_batched(
        _bcast(points, pb, axis_size),
        _bcast(jnp.asarray(n_valid, jnp.int32), nb, axis_size),
        _bcast(counts, cb, axis_size))
    return out, True


@jax.custom_batching.custom_vmap
def pack_setup_cloud(points, n_valid):
    """Shared packed kernel operands for one cloud's setup (TPU only;
    guard call sites with ``use_thr_knn``): poisoned positions, limb
    packs, norms, and feature blocks consumed by the thresholds /
    moments / axis kernels -- built ONCE per cloud instead of once per
    kernel (pallas_moments.pack_cloud_batched).  Returns a 7-tuple of
    arrays; pass it as ``packed=`` to neighborhood_thresholds_packed /
    lrf.toldi_frames_thr / lrf.normals_thr / lrf.gicp_covariances_thr."""
    from se3_icp_tpu.ops import pallas_moments as pm
    out = pm.pack_cloud_batched(points[None],
                                jnp.asarray(n_valid, jnp.int32)[None])
    return tuple(x[0] for x in out)


@pack_setup_cloud.def_vmap
def _pack_setup_cloud_vmap_rule(axis_size, in_batched, points, n_valid):
    from se3_icp_tpu.ops import pallas_moments as pm
    pb, nb = in_batched
    out = pm.pack_cloud_batched(
        _bcast(points, pb, axis_size),
        _bcast(jnp.asarray(n_valid, jnp.int32), nb, axis_size))
    return tuple(out), (True,) * len(out)


@jax.custom_batching.custom_vmap
def neighborhood_thresholds_packed(points, counts, n_valid, *packed):
    """``neighborhood_thresholds`` reusing shared packed operands."""
    from se3_icp_tpu.ops import pallas_moments as pm
    return pm.neighborhood_thresholds_batched(
        points[None], jnp.asarray(n_valid, jnp.int32)[None],
        counts[None], packed=tuple(x[None] for x in packed))[0]


@neighborhood_thresholds_packed.def_vmap
def _neighborhood_thresholds_packed_vmap_rule(axis_size, in_batched,
                                              points, counts, n_valid,
                                              *packed):
    from se3_icp_tpu.ops import pallas_moments as pm
    pb, cb, nb = in_batched[:3]
    pk = tuple(_bcast(a, b, axis_size)
               for a, b in zip(packed, in_batched[3:]))
    out = pm.neighborhood_thresholds_batched(
        _bcast(points, pb, axis_size),
        _bcast(jnp.asarray(n_valid, jnp.int32), nb, axis_size),
        _bcast(counts, cb, axis_size), packed=pk)
    return out, True


@jax.custom_batching.custom_vmap
def neighborhood_thresholds_q(points, queries, counts, n_valid):
    """``neighborhood_thresholds`` for a query ROW SLICE of ``points``
    (model-parallel setup): queries [Nq,3] -> thr [T,Nq]."""
    from se3_icp_tpu.ops import pallas_moments as pm
    return pm.neighborhood_thresholds_batched(
        points[None], jnp.asarray(n_valid, jnp.int32)[None],
        counts[None], queries=queries[None])[0]


@neighborhood_thresholds_q.def_vmap
def _neighborhood_thresholds_q_vmap_rule(axis_size, in_batched, points,
                                         queries, counts, n_valid):
    from se3_icp_tpu.ops import pallas_moments as pm
    pb, qb, cb, nb = in_batched
    out = pm.neighborhood_thresholds_batched(
        _bcast(points, pb, axis_size),
        _bcast(jnp.asarray(n_valid, jnp.int32), nb, axis_size),
        _bcast(counts, cb, axis_size),
        queries=_bcast(queries, qb, axis_size))
    return out, True


def pack_match_targets(targets_a, targets_b, payload, n_targets, nq):
    from se3_icp_tpu.ops import pallas_knn
    return pallas_knn.pack_match_targets(targets_a, targets_b, payload,
                                         n_targets, nq)


@jax.custom_batching.custom_vmap
def nn_match_affine(feat, w, t6_pair, tn_pair, pay3, phase):
    """Fused match with the query embedding built in-kernel from
    static per-point features and a per-pair [16,16] affine (TPU only
    -- guard call sites with ``use_fused_match``).  Returns
    (d2_shifted, matchedT) -- no match index; the engine's loop is
    payload-driven (see pallas_knn.nn_match_affine).  When
    phase[..,1] == 1 (done flag) the outputs are STALE GARBAGE by
    contract -- only a done-masked consumer may call with it set.
    Unbatched calls run as a batch of one."""
    from se3_icp_tpu.ops import pallas_knn
    d2, matched = pallas_knn.nn_match_affine(
        feat[None], w[None], t6_pair[None], tn_pair[None], pay3[None],
        phase[None])
    return d2[0], matched[0]


@nn_match_affine.def_vmap
def _nn_match_affine_vmap_rule(axis_size, in_batched, feat, w, t6_pair,
                               tn_pair, pay3, phase):
    from se3_icp_tpu.ops import pallas_knn
    args = [feat, w, t6_pair, tn_pair, pay3, phase]
    args = [_bcast(a, b, axis_size) for a, b in zip(args, in_batched)]
    return pallas_knn.nn_match_affine(*args), (True, True)


@jax.custom_batching.custom_vmap
def nn_match_packed(queries, t6_pair, tn_pair, pay3, phase):
    """Fused match against pre-packed dual-phase targets (TPU only --
    guard call sites with ``use_fused_match``).  Unbatched calls run as
    a batch of one."""
    from se3_icp_tpu.ops import pallas_knn
    idx, d2, matched = pallas_knn.nn_match_packed(
        queries[None], t6_pair[None], tn_pair[None], pay3[None],
        phase[None])
    return idx[0], d2[0], matched[0]


@nn_match_packed.def_vmap
def _nn_match_packed_vmap_rule(axis_size, in_batched, queries, t6_pair,
                               tn_pair, pay3, phase):
    from se3_icp_tpu.ops import pallas_knn
    args = [queries, t6_pair, tn_pair, pay3, phase]
    args = [_bcast(a, b, axis_size) for a, b in zip(args, in_batched)]
    return pallas_knn.nn_match_packed(*args), (True, True, True)
