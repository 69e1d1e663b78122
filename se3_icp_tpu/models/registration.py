"""The SE(3)-ICP registration engine: one jitted, fully on-device driver.

Re-designs the reference's four ``run_*`` methods (ref:cpp:473-1128) as a
single ``lax.while_loop`` program parameterized by static (mode, variant):

  mode='icp'      -> run_icp          (C9,  ref:cpp:473-552)
  mode='se3'      -> run_se3_icp      (C10, ref:cpp:555-739)
  mode='se3_cf'   -> run_se3_icp_with_cf (C11, ref:cpp:742-959)
  mode='se3_pure' -> run_se3_pure     (C15, ref:cpp:962-1128)

TPU-first mechanics:
  * clouds are padded to static bucket sizes with traced valid counts;
  * the SE(3)->R3 "switch to vanilla ICP" annealing is NOT a control-flow
    branch: both phases run through the SAME 12-D NN kernel, with the
    rotation block of the query/target embeddings zeroed after the
    switch (zeroing reduces the 12-D chordal metric exactly to the 3-D
    euclidean one), so batched pairs in different phases share one
    program;
  * per-iteration state updates are masked by a ``done`` flag, so the
    driver vmaps cleanly over a pair axis for data-parallel scale-out;
  * everything between host upload and the final 4x4 download stays on
    device -- no host sync inside the loop.

Behavioral parity notes (SURVEY.md §5 quirks), all reproduced:
  * the 12-D match uses alpha/beta-weighted frames, but trimming/MSE use
    the R3 translation distance (ref:cpp:433-439);
  * with_cf solves with confidence *weights* only -- the hard <0.15
    filter in the reference is dead code due to a precedence bug
    (ref:cpp:915) -- and weights multiply the GICP whitening matrix, so
    they act quadratically (ref:cpp:78);
  * with_cf packs the *unweighted* target points as the 12-D translation
    rows (ref:cpp:834-836) vs the beta-weighted ones in run_se3_icp
    (ref:cpp:622-624);
  * post-switch convergence compares against ``scaling_factor * mse``
    (ref:cpp:726) while vanilla ICP uses plain ``mse`` (ref:cpp:548);
  * "MSE" is a mean of (non-squared) distances (ref:cpp:379-387), and
    with_cf recomputes euclidean point distances instead
    (ref:cpp:897 -> 390).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from se3_icp_tpu.ops import knn, lrf, solve, trim
from se3_icp_tpu.utils import se3
from se3_icp_tpu.utils.config import RegistrationConfig, parse_algorithm

_BIG = 1e7  # reference initializes mse trackers to 1e7 (ref:cpp:485)


@dataclass
class RegistrationResult:
    """Host-side result mirroring the reference's public outputs
    (``current_estimated_T_``, ``num_iterations_``,
    ``num_pure_se3_iterations_``, ref:hpp:92-98)."""

    transformation: np.ndarray          # [4,4]
    num_iterations: int
    num_pure_se3_iterations: int
    # per-iteration accumulated transforms (estimated_history_,
    # ref:hpp:97 / cpp:538); filled when register_pair(...,
    # record_history=True)
    history: np.ndarray | None = None   # [num_iterations,4,4]


def lounge_point_confidence(points):
    """Depth-based RGB-D confidence (ref:cpp:16-30, from LSG-CPD).

    conf = (p1*min_d + p2*min_d + p3) / (p1*d^2 + p2*d + p3); note the
    numerator uses min_depth linearly in the quadratic term too -- that
    is what the reference computes; kept verbatim.
    """
    d = points[..., 2]
    p1, p2, p3, min_d = 0.002203, -0.001028, 0.0005351, 0.4
    err = p1 * d * d + p2 * d + p3
    return (p1 * min_d + p2 * min_d + p3) / err


def _masked_centroid(pts, valid, n):
    w = valid.astype(pts.dtype)[:, None]
    return jnp.sum(pts * w, axis=0) / jnp.maximum(n.astype(pts.dtype), 1.0)


def _largest_radius(pts, center, valid):
    """largestDistanceFromGivenPoint (ref:cpp:112-119), masked."""
    d = jnp.linalg.norm(pts - center, axis=-1)
    return jnp.max(jnp.where(valid, d, -1.0))


def _embed12(rot, trans):
    """[N,3,3] frame rotations (columns x,y,z) + [N,3] translations
    -> [N,12] column-major flattening, matching ref:cpp:423-426."""
    n = rot.shape[0]
    cols = jnp.swapaxes(rot, -1, -2).reshape(n, 9)  # c1,c2,c3 stacked
    return jnp.concatenate([cols, trans], axis=-1)


# Float hyperparameters passed as ONE traced vector so hyperparameter
# sweeps (the reference's alpha grid, makeHybridLGrid) reuse a single
# compiled program instead of recompiling per value.  Fields that shape
# the program (k's, iteration caps, overlap's trim shortcut, epsilon in
# a static argname) stay static.
_TRACED_FIELDS = ("alpha_rot", "beta_transl", "scale_preprocessing",
                  "mse", "mse_switch_error")


def split_cfg(cfg: RegistrationConfig, dtype):
    """(traced float vector, static remainder) -- callers that build
    their own jitted programs pass the floats as a traced argument so
    hyperparameter sweeps share one compilation."""
    floats = jnp.asarray([getattr(cfg, f) for f in _TRACED_FIELDS],
                         dtype)
    static_cfg = cfg.replace(**{f: 0.0 for f in _TRACED_FIELDS})
    return floats, static_cfg


def register_arrays(src, n_src, tgt, n_tgt, cfg: RegistrationConfig,
                    mode: str, variant: str,
                    points_axis: str | None = None,
                    record_history: bool = False,
                    initial_T=None):
    if cfg.anderson_m == 1:
        raise ValueError("anderson_m must be 0 (off) or >= 2 (window)")
    floats, static_cfg = split_cfg(cfg, src.dtype)
    return _register_arrays_jit(src, n_src, tgt, n_tgt, floats,
                                cfg=static_cfg, mode=mode,
                                variant=variant, points_axis=points_axis,
                                record_history=record_history,
                                T0=initial_T)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mode", "variant", "points_axis",
                     "record_history", "setup_only"))
def _register_arrays_jit(src, n_src, tgt, n_tgt, floats,
                         cfg: RegistrationConfig,
                         mode: str, variant: str,
                         points_axis: str | None = None,
                         record_history: bool = False,
                         setup_only: bool = False,
                         T0=None):
    """Register one padded pair.  Returns (T [4,4] in original coords,
    num_iterations, num_pure_se3_iterations), plus the per-iteration
    accumulated-transform history [max_iters, 4, 4] when
    ``record_history`` (the reference's ``estimated_history_``, kept
    only by ``run_icp``, ref:cpp:491,538 -- here available for every
    mode, in ORIGINAL coordinates; entries at index >= num_iterations
    are undefined -- slice by num_iterations on the host).

    ``src [Ns,3]``/``tgt [Nt,3]`` are padded; ``n_src``/``n_tgt`` are the
    true counts.  ``cfg``/``mode``/``variant`` are static.

    ``points_axis``: name of a mesh axis this call is running under (via
    ``shard_map``) over which to model-parallelize ONE registration:
    clouds stay replicated, but the expensive row-wise work (setup kNN,
    frames/normals/covariances, the per-iteration NN search) is computed
    on this device's row slice and combined with ``all_gather``/partial
    argmin -- see parallel/points.py.
    """
    # TPU's default matmul precision is bf16; ICP accumulates transforms
    # over tens of iterations and solves 6x6 normal equations, so every
    # contraction in this trace must be true f32 (GICP literally diverges
    # otherwise -- observed on v5e).
    with jax.default_matmul_precision("highest"):
        return _register_arrays_impl(src, n_src, tgt, n_tgt, floats, cfg,
                                     mode, variant, points_axis,
                                     record_history, setup_only, T0)


def _my_rows(x, axis_name):
    """This device's contiguous row slice of a replicated array."""
    ndev = jax.lax.psum(1, axis_name)
    rank = jax.lax.axis_index(axis_name)
    chunk = x.shape[0] // ndev
    return jax.lax.dynamic_slice_in_dim(x, rank * chunk, chunk, 0)


def _gather_rows(x_local, axis_name):
    return jax.lax.all_gather(x_local, axis_name, tiled=True)


def _register_arrays_impl(src, n_src, tgt, n_tgt, floats, cfg, mode,
                          variant, points_axis=None,
                          record_history=False, setup_only=False,
                          T0=None):
    (f_alpha, f_beta, f_scale_pre, f_mse, f_switch) = floats
    dtype = src.dtype
    ns, nt = src.shape[0], tgt.shape[0]
    src_valid = jnp.arange(ns) < n_src
    tgt_valid = jnp.arange(nt) < n_tgt
    is_se3 = mode != "icp"
    use_cf = mode == "se3_cf"
    eff_variant = "gicp" if use_cf else variant

    # --- confidences (with_cf): on ORIGINAL coordinates (ref:cpp:756-782)
    if use_cf:
        conf_src = lounge_point_confidence(src)
        conf_tgt = lounge_point_confidence(tgt)
    else:
        conf_src = conf_tgt = None

    # --- preprocessing: center at own centroids, scale both by
    #     s = scale_preprocessing / max_radius (ref:cpp:566-583)
    if is_se3:
        cen_s = _masked_centroid(src, src_valid, n_src)
        cen_t = _masked_centroid(tgt, tgt_valid, n_tgt)
        r_s = _largest_radius(src, cen_s, src_valid)
        r_t = _largest_radius(tgt, cen_t, tgt_valid)
        scaling = f_scale_pre / jnp.maximum(
            jnp.maximum(r_s, r_t), jnp.asarray(1e-30, dtype))
        src_c = (src - cen_s) * scaling
        tgt_c = (tgt - cen_t) * scaling
    else:
        cen_s = cen_t = jnp.zeros(3, dtype)
        scaling = jnp.asarray(1.0, dtype)
        src_c, tgt_c = src, tgt

    # keep padded rows away from the valid geometry so masked kNN of
    # valid queries can never pick them up accidentally via NaNs etc.
    src_c = jnp.where(src_valid[:, None], src_c, 0.0)
    tgt_c = jnp.where(tgt_valid[:, None], tgt_c, 0.0)

    # --- one sorted kNN per cloud, prefix-sliced by every consumer
    #     (TOLDI k, normals kNN-30, GICP kNN-20): the full-width top-k
    #     sort dominates setup cost on TPU, so never run it twice
    need_tgt_nrm = eff_variant == "pt2pl"
    need_cov = eff_variant == "gicp"
    # the LRF contributes to the kNN width only for TOLDI (SHOT uses its
    # own radius search and would leave a full-width sorted kNN unused)
    k_lrf = (cfg.number_of_nn_for_lrf
             if (is_se3 and cfg.lrf_method == "toldi") else 0)
    k_src = max(k_lrf, cfg.gicp_normals_knn if need_cov else 0)
    k_tgt = max(k_lrf,
                cfg.normals_knn if need_tgt_nrm else 0,
                cfg.gicp_normals_knn if need_cov else 0)
    # sort-free TPU setup: every consumer needs only the distance
    # threshold of its neighborhood size, so ONE Pallas bisection
    # kernel per cloud (knn.neighborhood_thresholds) replaces the
    # sorted kNN whose aggregate top-k dominated setup cost.  On the
    # model-parallel route each device bisects thresholds for its
    # query-row slice against the replicated cloud and the small
    # per-point products are all_gathered after the consumers.
    use_thr = knn.use_thr_knn() and (
        not (is_se3 and cfg.lrf_method != "toldi"))
    thr_src = thr_tgt = None
    q_src = q_tgt = None
    cpos_src: dict = {}
    cpos_tgt: dict = {}
    packed_src = packed_tgt = None
    if use_thr:
        rz_lrf = k_lrf // 3
        counts_src = ([rz_lrf, rz_lrf + 1, k_lrf] if k_lrf else []) + (
            [cfg.gicp_normals_knn] if need_cov else [])
        counts_tgt = ([rz_lrf, rz_lrf + 1, k_lrf] if k_lrf else []) + (
            [cfg.normals_knn] if need_tgt_nrm else []) + (
            [cfg.gicp_normals_knn] if need_cov else [])

        def _uniq(lst):
            # DESCENDING order engages the thresholds kernel's chained
            # brackets (each smaller count bisects inside the previous
            # threshold at fewer steps -- pallas_moments._kernel_thresholds)
            uniq = sorted(set(lst), reverse=True)
            return uniq, {c: i for i, c in enumerate(uniq)}

        cu_src, cpos_src = _uniq(counts_src)
        cu_tgt, cpos_tgt = _uniq(counts_tgt)
        if points_axis is None:
            # shared packed operands: the thresholds/moments/axis
            # kernels all stream the same poisoned positions + limb
            # packs + feature blocks; build them ONCE per cloud
            if cu_src:
                packed_src = knn.pack_setup_cloud(src_c, n_src)
                thr_src = knn.neighborhood_thresholds_packed(
                    src_c, jnp.asarray(cu_src, jnp.int32), n_src,
                    *packed_src)
            if cu_tgt:
                packed_tgt = knn.pack_setup_cloud(tgt_c, n_tgt)
                thr_tgt = knn.neighborhood_thresholds_packed(
                    tgt_c, jnp.asarray(cu_tgt, jnp.int32), n_tgt,
                    *packed_tgt)
        else:
            q_src = _my_rows(src_c, points_axis)
            q_tgt = _my_rows(tgt_c, points_axis)
            if cu_src:
                thr_src = knn.neighborhood_thresholds_q(
                    src_c, q_src, jnp.asarray(cu_src, jnp.int32), n_src)
            if cu_tgt:
                thr_tgt = knn.neighborhood_thresholds_q(
                    tgt_c, q_tgt, jnp.asarray(cu_tgt, jnp.int32), n_tgt)
        idx_src = d2_src = idx_tgt = d2_tgt = None
    elif points_axis is None:
        # +1 column: the dense (gather-free) neighborhood stats recover
        # rank sets from midpoint thresholds, which needs the first
        # EXCLUDED order statistic too
        idx_src = d2_src = idx_tgt = d2_tgt = None
        if k_src:
            idx_src, d2_src = knn.knn_self(src_c, k_src + 1, n_src)
        if k_tgt:
            idx_tgt, d2_tgt = knn.knn_self(tgt_c, k_tgt + 1, n_tgt)
    else:
        # model-parallel setup: each device runs the kNN for its row
        # slice of queries against the full (replicated) cloud; results
        # below are all_gathered back to full per-point arrays (small)
        idx_src = d2_src = idx_tgt = d2_tgt = None
        if k_src:
            idx_src, d2_src = knn.knn_topk(
                _my_rows(src_c, points_axis), src_c, k_src, n_src)
        if k_tgt:
            idx_tgt, d2_tgt = knn.knn_topk(
                _my_rows(tgt_c, points_axis), tgt_c, k_tgt, n_tgt)

    # --- SE(3) frames + alpha/beta weighting (ref:cpp:586-626)
    # On the thr route the frames travel TRANSPOSED ([9,Nq] rows
    # x0,x1,x2,y0,y1,y2,z0,z1,z2 = the row-major flattening of F^T):
    # all LRF glue, the 12-D embeddings, and the affine-kernel feature
    # rows are component-major, so the setup never runs elementwise
    # passes with a 3-wide minor dim.  rot_s0/rot_t0 (row-major
    # [Nq,3,3]) are materialized only where a consumer needs them.
    rot_t9_s = rot_t9_t = None
    rot_s0 = rot_t0 = None
    tgt_normals_fused_t = None
    if is_se3:
        alpha = f_alpha
        beta = f_beta
        if cfg.lrf_method == "toldi":
            klrf = cfg.number_of_nn_for_lrf
            if use_thr:
                rz_lrf = klrf // 3
                rot_t9_s = lrf.toldi_frames_thr_t(
                    src_c, thr_src[cpos_src[rz_lrf]],
                    thr_src[cpos_src[rz_lrf + 1]],
                    thr_src[cpos_src[klrf]], klrf, n_src,
                    queries=q_src, packed=packed_src)
                if (eff_variant == "pt2pl"
                        and cfg.normals_knn == rz_lrf
                        and points_axis is None):
                    # pt2pl target normals ride the SAME moments pass
                    # as the TOLDI frames: mask 0 (count rz) is
                    # exactly the normals_knn neighborhood when
                    # normals_knn == k//3 (the benchmark configs)
                    fr12 = lrf.toldi_frames_normals_thr_t(
                        tgt_c, thr_tgt[cpos_tgt[rz_lrf]],
                        thr_tgt[cpos_tgt[rz_lrf + 1]],
                        thr_tgt[cpos_tgt[klrf]], klrf,
                        cfg.normals_knn, n_tgt, packed=packed_tgt)
                    rot_t9_t = fr12[:9]
                    tgt_normals_fused_t = fr12[9:12]
                else:
                    rot_t9_t = lrf.toldi_frames_thr_t(
                        tgt_c, thr_tgt[cpos_tgt[rz_lrf]],
                        thr_tgt[cpos_tgt[rz_lrf + 1]],
                        thr_tgt[cpos_tgt[klrf]], klrf, n_tgt,
                        queries=q_tgt, packed=packed_tgt)
                if points_axis is not None:
                    rot_t9_s = jax.lax.all_gather(
                        rot_t9_s, points_axis, axis=1, tiled=True)
                    rot_t9_t = jax.lax.all_gather(
                        rot_t9_t, points_axis, axis=1, tiled=True)
            elif points_axis is None:
                # gather-free path: masked-matmul neighborhood
                # reductions (random row gathers are scalar-bound on
                # TPU); on TPU under vmap this lowers to the fused
                # pallas_moments kernels (lrf.toldi_frames_dense_fused)
                rot_s0, _ = lrf.toldi_frames_dense_fused(
                    src_c, d2_src[:, :klrf], n_src)
                rot_t0, _ = lrf.toldi_frames_dense_fused(
                    tgt_c, d2_tgt[:, :klrf], n_tgt)
            else:
                # row-sliced dense variant: same masked-matmul math on
                # this device's query slice, then gather the frames
                rank = jax.lax.axis_index(points_axis)
                off_s = rank * (ns // jax.lax.psum(1, points_axis))
                off_t = rank * (nt // jax.lax.psum(1, points_axis))
                rot_s0, _ = lrf.toldi_frames_dense(
                    src_c, d2_src[:, :klrf], n_src,
                    queries=_my_rows(src_c, points_axis),
                    row_offset=off_s)
                rot_t0, _ = lrf.toldi_frames_dense(
                    tgt_c, d2_tgt[:, :klrf], n_tgt,
                    queries=_my_rows(tgt_c, points_axis),
                    row_offset=off_t)
                rot_s0 = _gather_rows(rot_s0, points_axis)
                rot_t0 = _gather_rows(rot_t0, points_axis)
        else:  # SHOT LRF (dormant alternative in the reference, C4)
            if cfg.shot_exact:
                rot_s0, _ = lrf.shot_frames_dense(src_c, cfg.lrf_radius,
                                                  n_valid=n_src)
                rot_t0, _ = lrf.shot_frames_dense(tgt_c, cfg.lrf_radius,
                                                  n_valid=n_tgt)
            else:
                rot_s0, _ = lrf.shot_frames(src_c, cfg.lrf_radius,
                                            max_k=cfg.shot_max_k,
                                            n_valid=n_src)
                rot_t0, _ = lrf.shot_frames(tgt_c, cfg.lrf_radius,
                                            max_k=cfg.shot_max_k,
                                            n_valid=n_tgt)
        use_packed_loop = knn.use_fused_match()
        if rot_t9_s is not None and not use_packed_loop:
            # the XLA (non-fused) loop rebuilds queries from row-major
            # frames each iteration; one relayout out of the
            # component-major thr setup
            rot_s0 = lrf._rot_t9_to_rot(rot_t9_s[None])[0]
        if rot_s0 is not None:
            frot_s0 = rot_s0 * alpha                 # [Ns,3,3]
        else:
            frot_s0 = None                           # packed loop: W
        ftra_s0 = src_c * beta                       # [Ns,3]
        # target 12-D embedding, built once: rotation block alpha-weighted;
        # translation rows are beta-weighted points for run_se3_icp /
        # run_se3_pure (ref:cpp:622-624, 1032-1034) but the RAW
        # centered+scaled points for with_cf (quirk, ref:cpp:834-836).
        tgt_tr_A = tgt_c if use_cf else tgt_c * beta
        if rot_t9_t is not None:
            # component-major build + ONE wide transpose (the row-major
            # route pays a [Nt,3,3] minor-dim swapaxes inside _embed12)
            tgt_embed_A = jnp.concatenate(
                [rot_t9_t * alpha, tgt_tr_A.T], axis=0).T
        else:
            tgt_embed_A = _embed12(rot_t0 * alpha, tgt_tr_A)
        # beta-weighted target translations: trimming distance source
        # in phase A (ref:cpp:465 uses target_se3_cloud_.col(3))
        tgt_tr_beta = tgt_c * beta
    else:
        frot_s0 = ftra_s0 = tgt_embed_A = tgt_tr_beta = None

    # phase-B target embedding: zero rotation block + raw points == plain
    # 3-D euclidean NN through the same kernel
    tgt_embed_B = _embed12(jnp.zeros((nt, 3, 3), dtype), tgt_c)

    # --- per-target payload for the fused NN+gather (ops.knn.nn_match):
    #     everything the loop body needs FROM the matched target row is
    #     packed into columns once, so the body never does a scalar-bound
    #     random row gather (measured ~13 ms/iter at 64x4608 on v5e)
    _pay_parts = [tgt_c]
    _pay_off = {"tgt_c": 0}
    _off = 3

    def _pay_add(name, arr, width):
        nonlocal _off
        _pay_parts.append(arr)
        _pay_off[name] = _off
        _off += width

    # --- variant-specific preparation (prefix slices of the shared kNN)
    tgt_normals = cov_src0_6 = cov_tgt_6 = None
    if eff_variant == "pt2pl":
        if use_thr:
            if tgt_normals_fused_t is not None:
                tgt_normals_t = tgt_normals_fused_t
            else:
                tgt_normals_t = lrf.normals_thr_t(
                    tgt_c, thr_tgt[cpos_tgt[cfg.normals_knn]],
                    cfg.normals_knn, n_tgt, queries=q_tgt,
                    packed=packed_tgt)
                if points_axis is not None:
                    tgt_normals_t = jax.lax.all_gather(
                        tgt_normals_t, points_axis, axis=1, tiled=True)
            tgt_normals = tgt_normals_t.T
        elif points_axis is None:
            tgt_normals = lrf.normals_dense_fused(tgt_c, d2_tgt,
                                                  cfg.normals_knn, n_tgt)
        else:
            tgt_normals = lrf.normals_from_neighbors(
                tgt_c, idx_tgt[:, :cfg.normals_knn])
            tgt_normals = _gather_rows(tgt_normals, points_axis)
    elif eff_variant == "gicp":
        # covariances travel COMPONENT-MAJOR [6,N] (symmetric rows
        # xx,xy,xz,yy,yz,zz): the per-iteration whitening/Jacobian math
        # in solve_gicp_T runs on wide component arrays instead of
        # [N,3,3] tiles; row-major forms exist only for the XLA loop
        def _sym_to_6(cov):
            return jnp.stack([cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
                              cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]])
        if use_thr:
            cov_src0_6 = lrf.gicp_covariances_thr_t(
                src_c, thr_src[cpos_src[cfg.gicp_normals_knn]],
                cfg.gicp_normals_knn, cfg.gicp_epsilon, n_src,
                queries=q_src, packed=packed_src)
            cov_tgt_6 = lrf.gicp_covariances_thr_t(
                tgt_c, thr_tgt[cpos_tgt[cfg.gicp_normals_knn]],
                cfg.gicp_normals_knn, cfg.gicp_epsilon, n_tgt,
                queries=q_tgt, packed=packed_tgt)
            if points_axis is not None:
                cov_src0_6 = jax.lax.all_gather(
                    cov_src0_6, points_axis, axis=1, tiled=True)
                cov_tgt_6 = jax.lax.all_gather(
                    cov_tgt_6, points_axis, axis=1, tiled=True)
        elif points_axis is None:
            cov_src0_6 = _sym_to_6(lrf.gicp_covariances_dense_fused(
                src_c, d2_src, cfg.gicp_normals_knn, cfg.gicp_epsilon,
                n_src))
            cov_tgt_6 = _sym_to_6(lrf.gicp_covariances_dense_fused(
                tgt_c, d2_tgt, cfg.gicp_normals_knn, cfg.gicp_epsilon,
                n_tgt))
        else:
            cov_src0 = lrf.gicp_covariances_from_neighbors(
                src_c, idx_src[:, :cfg.gicp_normals_knn],
                cfg.gicp_epsilon)
            cov_tgt = lrf.gicp_covariances_from_neighbors(
                tgt_c, idx_tgt[:, :cfg.gicp_normals_knn],
                cfg.gicp_epsilon)
            cov_src0_6 = _sym_to_6(_gather_rows(cov_src0, points_axis))
            cov_tgt_6 = _sym_to_6(_gather_rows(cov_tgt, points_axis))
        if not knn.use_fused_match():
            # XLA loop consumes the row-major source covariances;
            # materialize ONCE outside the loop
            cov_src0 = lrf._cov6_to_mat(cov_src0_6)

    if is_se3:
        _pay_add("tr_beta", tgt_tr_beta, 3)
    if eff_variant == "pt2pl":
        _pay_add("normals", tgt_normals, 3)
    elif eff_variant == "gicp":
        _pay_add("cov", cov_tgt_6.T, 6)
        if use_cf:
            _pay_add("conf_t", conf_tgt[:, None], 1)
    payload = jnp.concatenate(_pay_parts, axis=-1)       # [Nt, P]

    # pre-packed dual-phase targets for the fused match kernel: both
    # phase embeddings are limb-packed/poisoned ONCE here; the kernel
    # picks the phase per pair via a scalar-prefetched flag, so the
    # loop body carries no target select/pack work at all.  The
    # model-parallel route packs the same (replicated) targets and runs
    # the kernel on its local query-row slice.
    use_packed = knn.use_fused_match()
    # fused loop epilogue (trim + MSE + normal-equation reduction in one
    # Pallas pass): follows the packed-match layout; the model-parallel
    # route keeps the XLA epilogue (its trim is a global reduction over
    # gathered rows)
    from se3_icp_tpu.ops import pallas_loop
    fuse_ep = (use_packed and points_axis is None
               and pallas_loop.use_fused_epilogue())
    if use_packed:
        emb_a = tgt_embed_A if is_se3 else tgt_embed_B
        t6_pair, tn_pair, pay3 = knn.pack_match_targets(
            emb_a, tgt_embed_B, payload, n_tgt, ns)
        # static per-point query features for the affine-factored match
        # kernel: the per-iteration embedding q is affine in
        # [F^T(9) | s(3) | 1], with R/t/alpha/beta/phase folded into a
        # tiny [16,16] matrix built in the loop body -- so the loop
        # carries NO [Ns,12]-scale query rebuild/select/limb work
        # feature-major source positions for the transposed loop math
        src_cT = src_c.T                                  # [3, Ns]
        if is_se3 and rot_t9_s is not None:
            # thr route: frames already component-major == the feature
            # rows; one wide transpose builds the whole block
            feat16 = jnp.concatenate(
                [rot_t9_s, src_cT, jnp.ones((1, ns), dtype),
                 jnp.zeros((3, ns), dtype)], axis=0).T
        else:
            if is_se3:
                feat9 = jnp.swapaxes(rot_s0, -1, -2).reshape(ns, 9)
            else:
                feat9 = jnp.zeros((ns, 9), dtype)
            feat16 = jnp.concatenate(
                [feat9, src_c, jnp.ones((ns, 1), dtype),
                 jnp.zeros((ns, 3), dtype)], axis=-1)

    if setup_only:
        # sharding-consistency oracle: return a checksum that keeps
        # every pre-loop tensor live (kNN/thresholds, LRF frames,
        # normals/covariances, payload + dual-phase target packing), so
        # tests/test_parallel.py can pin sharded==single-device setup
        # bitwise.  (The bench.py BENCH_PHASES setup/loop split instead
        # uses capped-iteration differential timing of the full
        # program; over the axon tunnel a separate setup-only dispatch
        # is RTT-dominated and not end-to-end comparable.)
        chk = jnp.sum(payload) + jnp.sum(tgt_embed_B)
        if is_se3:
            # frot_s0 only exists on the non-fused loop; the packed
            # route keeps the frames transposed (same values)
            fr = (jnp.sum(frot_s0) if frot_s0 is not None
                  else jnp.sum(rot_t9_s * alpha))
            chk = chk + fr + jnp.sum(tgt_embed_A)
        if use_packed:
            chk = chk + jnp.sum(tn_pair) + jnp.sum(
                pay3.astype(jnp.float32)) + jnp.sum(
                t6_pair.astype(jnp.float32))
        return chk

    # --- loop limits per mode
    if mode == "icp":
        start_switched = True       # R3 NN from the start, no SE3 phase
        max_iters = cfg.max_num_iterations
        stop_scale = 1.0            # plain mse_ (ref:cpp:548)
    elif mode == "se3_pure":
        start_switched = False
        max_iters = cfg.max_num_se3_iterations
        stop_scale = None           # uses scaling * mse (ref:cpp:1118)
    else:
        start_switched = False
        max_iters = cfg.max_num_iterations
        stop_scale = None

    # initial carry derived from the inputs so its sharding "varying-ness"
    # matches the body outputs under shard_map/vmap
    zero_f = jnp.zeros((), dtype) * src[0, 0]
    zero_i = jnp.zeros((), jnp.int32) * n_src.astype(jnp.int32)
    false_b = n_src < 0
    big = jnp.asarray(_BIG, dtype) + zero_f

    # --- optional warm start: T0 is in ORIGINAL coordinates; the loop
    #     operates in the preprocessed (centered+scaled) frame, so map
    #     it through the inverse of to_original (beyond-reference
    #     capability: the reference always starts at identity,
    #     ref:cpp:485-489; online odometry / coarse-to-fine warm starts
    #     skip the basin search)
    if T0 is None:
        T_init = jnp.eye(4, dtype=dtype) + zero_f
    else:
        T0 = T0.astype(dtype)
        R0 = T0[:3, :3]
        tp0 = (T0[:3, 3] + R0 @ cen_s - cen_t) * scaling
        T_init = (jnp.zeros((4, 4), dtype)
                  .at[:3, :3].set(R0).at[:3, 3].set(tp0)
                  .at[3, 3].set(1.0) + zero_f)

    state = dict(
        T=T_init,
        it=zero_i,
        pure_it=zero_i,
        mse_prev=big, mse_cur=big,
        switched=jnp.asarray(start_switched) | false_b,
        done=false_b,
    )
    # +1: in hybrid mode the loop can run max(caps)+1 iterations (the
    # done test uses the pre-switch 'switched'), and the final history
    # write must not clamp into the previous slot
    hist_len = max(cfg.max_num_iterations, cfg.max_num_se3_iterations) + 1
    if record_history:
        state["hist"] = jnp.zeros((hist_len, 4, 4), dtype) + zero_f
    if cfg.anderson_m:
        # Anderson-acceleration window buffers (AA-ICP): past iterates
        # and fixed-point residuals in se(3) twist coordinates
        m_aa = cfg.anderson_m
        state["aa_X"] = jnp.zeros((m_aa, 6), dtype) + zero_f
        state["aa_F"] = jnp.zeros((m_aa, 6), dtype) + zero_f
        state["aa_n"] = zero_i
        state["aa_fprev"] = big

    def cond(s):
        return ~s["done"]

    def body(s):
        T = s["T"]
        R = T[:3, :3]
        tvec = T[:3, 3]
        it = s["it"] + 1
        switched = s["switched"]

        # --- correspondence search through the unified 12-D kernel
        if not use_packed:
            src_moving = src_c @ R.T + tvec
            if is_se3:
                # translation block of the current source frames (the
                # R3-metric trim/MSE source in phase A, ref:cpp:465)
                cur_tra = ftra_s0 @ R.T + tvec
        if use_packed:
            # affine-factored query: q = feat @ W with W [16,16] from
            # (R, t, alpha, beta, phase) -- built in-kernel, so the
            # loop body carries no [Ns,12] embed/select/limb work
            Rt = R.T
            if is_se3:
                ph_a = jnp.where(switched, jnp.zeros((), dtype),
                                 f_alpha)
                c_s = jnp.where(switched, jnp.ones((), dtype), f_beta)
                blk = ph_a * Rt
            else:
                c_s = jnp.ones((), dtype)
                blk = jnp.zeros((3, 3), dtype)
            W = (jnp.zeros((16, 16), dtype)
                 .at[0:3, 0:3].set(blk)
                 .at[3:6, 3:6].set(blk)
                 .at[6:9, 6:9].set(blk)
                 .at[9:12, 9:12].set(c_s * Rt)
                 .at[12, 9:12].set(tvec))
            # [phase, done]: done pairs skip the match kernel's compute
            # entirely (the batch loops until ALL pairs converge; their
            # outputs are discarded by the done-masked carry below)
            ph2 = jnp.stack([switched.astype(jnp.int32),
                             s["done"].astype(jnp.int32)])
            if points_axis is None:
                _, matched_T = knn.nn_match_affine(
                    feat16, W, t6_pair, tn_pair, pay3, ph2)
            else:
                # model-parallel hot loop: each device matches its
                # feature-row slice against the (replicated) targets;
                # the matched payload rows ride the all_gather (no
                # scalar-bound gather, VERDICT r1 item 4)
                _, matched_Tl = knn.nn_match_affine(
                    _my_rows(feat16, points_axis), W, t6_pair, tn_pair,
                    pay3, ph2)
                matched_T = jax.lax.all_gather(
                    matched_Tl, points_axis, axis=1, tiled=True)
        else:
            if is_se3:
                # current source frames = T o (weighted initial
                # frames), replicating the per-iteration
                # left-multiplication (ref:cpp:713-716)
                cur_rot = jnp.einsum("ij,njk->nik", R, frot_s0)
                q_A = _embed12(cur_rot, cur_tra)
                q = jnp.where(switched, _embed12(
                    jnp.zeros((ns, 3, 3), dtype), src_moving), q_A)
                e = jnp.where(switched, tgt_embed_B, tgt_embed_A)
            else:
                q = _embed12(jnp.zeros((ns, 3, 3), dtype), src_moving)
                e = tgt_embed_B
            if points_axis is None:
                midx, _, matched = knn.nn_match(q, e, payload, n_tgt)
            else:
                midx_l, _ = knn.nn_argmin(_my_rows(q, points_axis), e,
                                          n_tgt)
                midx = _gather_rows(midx_l, points_axis)
                matched = payload[midx]
        if fuse_ep:
            # --- fused loop epilogue (ops/pallas_loop.py): the trim
            #     metric distances, sort-free trimmed rejection, MSE,
            #     and the estimator's JtJ/Jtr (or Umeyama-moment)
            #     reduction run in ONE Pallas pass over the matched
            #     payload; only the 6x6 solve / 3x3 SVD stays in XLA.
            #     The moving source is rebuilt in-kernel from the
            #     loop-invariant src_cT and the (R, t) scalars.
            if cfg.estimated_overlap < 1.0:
                cnt_f = jnp.floor(
                    cfg.estimated_overlap * n_src).astype(dtype)
            else:
                cnt_f = n_src.astype(dtype)
            pf = jnp.concatenate([
                tvec,
                jnp.stack([f_beta, switched.astype(dtype),
                           n_src.astype(dtype), cnt_f,
                           jnp.zeros((), dtype)]),
                R.reshape(-1),
                jnp.zeros(7, dtype)])
            A66, b8, st = pallas_loop.loop_epilogue(
                src_cT, matched_T, pf,
                cov6=cov_src0_6 if eff_variant == "gicp" else None,
                conf=conf_src if use_cf else None,
                variant=eff_variant, is_se3=is_se3, use_cf=use_cf,
                do_trim=cfg.estimated_overlap < 1.0,
                off_tr=_pay_off.get("tr_beta", 0),
                off_nrm=_pay_off.get("normals", 0),
                off_cov=_pay_off.get("cov", 0),
                off_conf=_pay_off.get("conf_t", 0))
            mse_val = st[0]
            if eff_variant == "pt2pt":
                T_i = solve.solve_pt2pt_from_moments(
                    A66[:3, :3], b8[0:3], b8[3:6], st[1])
            else:
                T_i = solve.solve_from_normal(A66, b8[:6], st[1])
        else:
            # --- stored distance (trim + mse source): R3 metric in both
            #     phases (ref:cpp:411, 436, 465).  On the fused route every
            #     per-point tensor stays feature-major ([3,N]/[6,N]) so the
            #     small feature axis never sits on the vector lanes.
            if use_packed:
                tgt_mT = matched_T[:3]
                src_movingT = R @ src_cT + tvec[:, None]
                diffB = src_movingT - tgt_mT
                d_B = jnp.sqrt(jnp.sum(diffB * diffB, axis=0))
                if is_se3:
                    cur_traT = f_beta * (R @ src_cT) + tvec[:, None]
                    tr_beta_mT = matched_T[_pay_off["tr_beta"]:
                                           _pay_off["tr_beta"] + 3]
                    diffA = cur_traT - tr_beta_mT
                    d_A = jnp.sqrt(jnp.sum(diffA * diffA, axis=0))
                    dist = jnp.where(switched, d_B, d_A)
                else:
                    dist = d_B
            else:
                tgt_m = matched[:, :3]
                if is_se3:
                    tr_beta_m = matched[:, _pay_off["tr_beta"]:
                                        _pay_off["tr_beta"] + 3]
                    d_A = jnp.linalg.norm(cur_tra - tr_beta_m, axis=-1)
                    d_B = jnp.linalg.norm(src_moving - tgt_m, axis=-1)
                    dist = jnp.where(switched, d_B, d_A)
                else:
                    d_B = jnp.linalg.norm(src_moving - tgt_m, axis=-1)
                    dist = d_B

            # --- trimmed rejection (ref:cpp:669-671)
            kept = trim.trim_mask(dist, src_valid, cfg.estimated_overlap, n_src)

            # --- convergence MSE (mean kept distance; with_cf recomputes
            #     euclidean moving-vs-target, ref:cpp:897)
            if use_cf:
                mse_val = trim.masked_mean(d_B, kept)
            else:
                mse_val = trim.masked_mean(dist, kept)

            # --- transform estimation
            w = kept.astype(dtype)
            if eff_variant == "pt2pt":
                if use_packed:
                    T_i = solve.solve_pt2pt_T(src_movingT, tgt_mT, w)
                else:
                    T_i = solve.solve_pt2pt(src_moving, tgt_m, w)
            elif eff_variant == "pt2pl":
                if use_packed:
                    nrm_mT = matched_T[_pay_off["normals"]:
                                       _pay_off["normals"] + 3]
                    T_i = solve.solve_pt2pl_T(src_movingT, tgt_mT, nrm_mT,
                                              w)
                else:
                    nrm_m = matched[:, _pay_off["normals"]:
                                    _pay_off["normals"] + 3]
                    T_i = solve.solve_pt2pl(src_moving, tgt_m, nrm_m, w)
            else:
                conf = None
                if use_cf:
                    conf_t_m = (matched_T[_pay_off["conf_t"]] if use_packed
                                else matched[:, _pay_off["conf_t"]])
                    conf = 0.5 * (conf_src + conf_t_m)
                if use_packed:
                    # fully component-major: whitening eigendecomposition,
                    # R C R^T, and the Jacobian reduction all run on [6,N]
                    # symmetric rows (solve_gicp_T) -- no [N,3,3] tiles in
                    # the loop body
                    cov_t_m6 = matched_T[_pay_off["cov"]:
                                         _pay_off["cov"] + 6]
                    cov_s_cur6 = solve.rotate_sym3_T(R, cov_src0_6)
                    T_i = solve.solve_gicp_T(src_movingT, tgt_mT,
                                             cov_s_cur6, cov_t_m6, w, conf)
                else:
                    cov_t_m = lrf._cov6_to_mat(
                        matched[:, _pay_off["cov"]:_pay_off["cov"] + 6].T)
                    cov_s_cur = jnp.einsum("ij,njk,lk->nil", R, cov_src0, R)
                    T_i = solve.solve_gicp(src_moving, tgt_m, cov_s_cur,
                                           cov_t_m, w, conf)

        mse_prev = s["mse_cur"]
        mse_rel = jnp.abs(mse_val - mse_prev)

        T_new = T_i @ T

        # --- optional Anderson acceleration of the fixed-point
        #     iteration T -> G(T) in se(3) twist coordinates (AA-ICP,
        #     Pavlov et al. 2017; extension beyond the reference).
        #     Type-II AA with Tikhonov-regularized least squares over
        #     the window of residual differences; safeguard restarts
        #     the window whenever the residual norm grows or the
        #     SE(3)->R3 phase switches (a different fixed-point map).
        if cfg.anderson_m:
            m_aa = cfg.anderson_m
            xi_k = se3.se3_log(T)
            g_k = se3.se3_log(T_new)
            f_k = g_k - xi_k
            fnorm = jnp.linalg.norm(f_k)
            grew = fnorm > s["aa_fprev"]
            n_prev = jnp.where(grew, 0, s["aa_n"])
            Xb = jnp.concatenate([s["aa_X"][1:], xi_k[None]], 0)
            Fb = jnp.concatenate([s["aa_F"][1:], f_k[None]], 0)
            dX = Xb[1:] - Xb[:-1]                      # [m-1,6]
            dF = Fb[1:] - Fb[:-1]
            # only the last (n_prev) differences belong to the window
            ok_col = (jnp.arange(m_aa - 1) >= (m_aa - 1) - n_prev)
            dFm = dF * ok_col[:, None]
            dXm = dX * ok_col[:, None]
            A = dFm @ dFm.T                            # [m-1,m-1]
            lam = (jnp.asarray(1e-10, dtype)
                   * jnp.maximum(jnp.trace(A), 1.0))
            A = A + (lam + jnp.asarray(1e-30, dtype)) * jnp.eye(
                m_aa - 1, dtype=dtype)
            gamma = jnp.linalg.solve(A, dFm @ f_k)
            xi_aa = g_k - gamma @ (dXm + dFm)
            # only accelerate the post-switch (R3 refinement) phase:
            # the SE(3) phase's fixed-point map changes as the frames
            # re-weight, and the switch test itself must see parity
            # step sizes
            use_aa = (switched & (n_prev >= 1) & ~grew
                      & jnp.isfinite(xi_aa).all())
            T_new = jnp.where(use_aa, se3.se3_exp(xi_aa), T_new)
            aa_updates = dict(
                aa_X=Xb, aa_F=Fb,
                aa_n=jnp.minimum(n_prev + 1, m_aa - 1),
                aa_fprev=fnorm)
        t_change = jnp.linalg.norm(T - T_new)  # ref:cpp:711 Frobenius

        # --- phase switch / stopping (ref:cpp:718-729)
        stop_thresh = f_mse * (
            jnp.asarray(stop_scale, dtype) if stop_scale is not None
            else scaling)
        if mode == "se3_pure":
            new_switched = switched
            new_done = ((it >= max_iters) | (mse_rel < stop_thresh))
        elif mode == "icp":
            new_switched = switched
            new_done = (it >= max_iters) | (mse_rel < stop_thresh)
        else:
            hit_switch = ((it >= cfg.max_num_se3_iterations)
                          | (t_change < f_switch))
            new_switched = switched | hit_switch
            new_done = switched & ((it >= max_iters)
                                   | (mse_rel < stop_thresh))

        done_before = s["done"]

        def keep(old, new):
            return jax.tree.map(
                lambda o, n: jnp.where(done_before, o, n), old, new)

        out = dict(
            T=keep(s["T"], T_new),
            it=keep(s["it"], it),
            pure_it=keep(s["pure_it"],
                         s["pure_it"] + (~switched).astype(jnp.int32)),
            mse_prev=keep(s["mse_prev"], mse_prev),
            mse_cur=keep(s["mse_cur"], mse_val),
            switched=keep(s["switched"], new_switched),
            done=done_before | new_done,
        )
        if cfg.anderson_m:
            # restart the window when the phase switches (new fixed
            # point); buffers are in the PREPROCESSED frame, consistent
            # across iterations of one phase
            aa_updates["aa_n"] = jnp.where(new_switched != switched,
                                           0, aa_updates["aa_n"])
            for k_aa, v_aa in aa_updates.items():
                out[k_aa] = keep(s[k_aa], v_aa)
        if record_history:
            # per-iteration accumulated transform (estimated_history_,
            # ref:cpp:538); masked writes keep finished pairs' tails
            zero32 = jnp.zeros((), jnp.int32)
            out["hist"] = jax.lax.dynamic_update_slice(
                s["hist"], out["T"][None],
                (jnp.minimum(it - 1, hist_len - 1).astype(jnp.int32),
                 zero32, zero32))
        return out

    state = jax.lax.while_loop(cond, body, state)

    # --- back to original coordinates (ref:cpp:734-738)
    def to_original(T):
        if not is_se3:
            return T
        Rp = T[..., :3, :3]
        tp = T[..., :3, 3]
        t_orig = (tp / scaling
                  - jnp.einsum("...ij,j->...i", Rp, cen_s) + cen_t)
        out = jnp.zeros_like(T).at[..., :3, :3].set(Rp)
        out = out.at[..., :3, 3].set(t_orig)
        return out.at[..., 3, 3].set(1.0)

    T = to_original(state["T"])
    if record_history:
        return T, state["it"], state["pure_it"], to_original(state["hist"])
    return T, state["it"], state["pure_it"]


def _bucket(n: int, quantum: int = 512) -> int:
    """Round up to a bucket size to bound the number of compilations."""
    return max(quantum, -(-n // quantum) * quantum)


def sanitize_cloud(points) -> np.ndarray:
    """Drop non-finite rows host-side: a single NaN point would poison
    every distance-matrix row it appears in (the reference would feed
    it to FLANN with similar garbage-out).  Returns [M,3] float64."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    mask = np.isfinite(pts).all(axis=1)
    if mask.all():
        return pts  # fast path: skip the fancy-index copy (hot in packing)
    return pts[mask]


def register_pair(source_points, target_points, algorithm: str = "se3_pt2pl",
                  cfg: RegistrationConfig | None = None,
                  dtype=jnp.float32,
                  record_history: bool = False,
                  initial_T=None) -> RegistrationResult:
    """Host-facing entry point over the reference's algorithm-name surface
    (pt2pt/pt2pl/gicp, se3_*, se3_gicp_with_cf, se3_pure_*).

    ``initial_T``: optional [4,4] warm start in original coordinates
    (the reference always starts at identity)."""
    mode, variant = parse_algorithm(algorithm)
    cfg = cfg or RegistrationConfig()
    src = sanitize_cloud(source_points)
    tgt = sanitize_cloud(target_points)
    if cfg.lrf_method == "shot" and mode != "icp" and not cfg.shot_exact:
        # the capped SHOT route emulates the radius search with a static
        # top-k; validate against the true radius semantics on the
        # preprocessed (centered+scaled) clouds the engine will see
        # (the default shot_exact path has no cap and needs no check)
        import warnings
        cen_s, cen_t = src.mean(0), tgt.mean(0)
        r = max(np.linalg.norm(src - cen_s, axis=1).max(),
                np.linalg.norm(tgt - cen_t, axis=1).max())
        s = cfg.scale_preprocessing / max(r, 1e-30)
        n_tr = (lrf.shot_truncated_count((src - cen_s) * s,
                                         cfg.lrf_radius, cfg.shot_max_k)
                + lrf.shot_truncated_count((tgt - cen_t) * s,
                                           cfg.lrf_radius,
                                           cfg.shot_max_k))
        if n_tr:
            warnings.warn(
                f"SHOT LRF: {n_tr} points have more than "
                f"shot_max_k={cfg.shot_max_k} neighbors within "
                f"lrf_radius={cfg.lrf_radius}; their neighborhoods are "
                "truncated to the nearest max_k (diverges from the "
                "reference's radius semantics). Raise cfg.shot_max_k "
                "or lower cfg.lrf_radius.", RuntimeWarning)
    ns, nt = len(src), len(tgt)
    src_p = np.zeros((_bucket(ns), 3), dtype)
    src_p[:ns] = src
    tgt_p = np.zeros((_bucket(nt), 3), dtype)
    tgt_p[:nt] = tgt
    out = register_arrays(
        jnp.asarray(src_p), jnp.asarray(ns, jnp.int32),
        jnp.asarray(tgt_p), jnp.asarray(nt, jnp.int32), cfg, mode, variant,
        record_history=record_history,
        initial_T=(None if initial_T is None
                   else jnp.asarray(initial_T, dtype)))
    got = jax.device_get(out)  # one host round trip
    T, it, pure_it = got[:3]
    history = None
    if record_history:
        history = np.asarray(got[3], np.float64)[:int(it)]
    return RegistrationResult(
        transformation=np.asarray(T, np.float64),
        num_iterations=int(it),
        num_pure_se3_iterations=int(pure_it),
        history=history)
