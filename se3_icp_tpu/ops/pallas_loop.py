"""Fused per-iteration loop EPILOGUE: everything the registration loop
does after the correspondence match, in ONE Pallas pass.

The hot loop's per-iteration work after ``nn_match_affine`` is a chain
of [B,*,N]-wide VPU fusions -- moving-source rebuild, the two trim
metric distances (ref:cpp:411,436,465), the sort-free trimmed-rejection
bisection (PCL ``CorrespondenceRejectorTrimmed``, ref:cpp:669-671), the
convergence MSE (ref:cpp:379-400), and the estimator's JtJ/Jtr
normal-equation reduction (ref:cpp:57-110 and the Open3D estimators at
ref:cpp:691-699).  As separate XLA ops each pass streams HBM
(measured ~1.9 ms/iter of the 5.0 ms golden loop iteration at 64x4608
on v5e, r3).  This kernel reads the matched payload ONCE and keeps the
whole chain VMEM-resident:

  * the moving source is rebuilt IN KERNEL from the loop-invariant
    centered source positions [3,N] and the per-iteration (R, t)
    scalars, so no [B,3,N] intermediate ever reaches HBM;
  * trimming is the same count-bisection as ops/trim.py, plus an
    index-bisection tie-break that replaces the cumsum band walk with
    ceil(log2(N)) more halving steps (bit-identical kept set: minimal
    indices within the boundary band);
  * the estimator emits only the 6x6/6 (or 3x3 moment) reductions --
    [BP, 6, 3N]-shaped HIGHEST-precision MXU contractions -- so the
    loop body's remaining XLA work is a 6x6 solve and 4x4 composes.

Grid: one step per BP-pair slab (BP = 8 when the batch allows); every
per-point tensor is [BP, N] with the point axis on the vector lanes.

GICP runs the closed-form 3x3 inverse-sqrt eigendecomposition
(ops/eigh3.eigh3_c) INSIDE the kernel on component-major [BP,N] arrays;
Mosaic TC lowers neither acos nor atan2 nor large-angle cos, so
Cardano's cosines come from the polynomial form
(eigh3.cardano_cos_kernel_safe, ~3e-8 abs error -- below f32 ulp).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from se3_icp_tpu.ops import eigh3, trim
from se3_icp_tpu.ops.pallas_knn import _interpret

_BIG = 3.4e38
# value-bisection halvings on f32 distances: imported so the fused
# epilogue stays bracket-identical with the XLA trim by construction
_VSTEPS = trim._STEPS

# pf row layout (per-pair iteration scalars, one [24] f32 vector)
PF_T = 0          # 0:3   translation
PF_BETA = 3       # beta_transl (phase-A trim metric)
PF_SWITCHED = 4   # 0.0 = SE(3) phase, 1.0 = R3 phase
PF_NSRC = 5       # valid source count (exact integer-valued f32)
PF_COUNT = 6      # trim keep count  = floor(overlap * n_src)
PF_R = 8          # 8:17  R row-major
PF_WIDTH = 24


def use_fused_epilogue() -> bool:
    """Trace-time gate: fuse the loop epilogue whenever the fused match
    kernel runs (same backends), unless explicitly disabled."""
    from se3_icp_tpu.ops.knn import _use_pallas_batched
    return (_use_pallas_batched()
            and not os.environ.get("SE3_ICP_TPU_NO_FUSED_EPILOGUE"))


def _kernel_epilogue(*refs, variant, is_se3, use_cf, do_trim,
                     off_tr, off_nrm, off_cov, off_conf, isteps):
    pos = 0
    src_ref, mt_ref, pf_ref = refs[0], refs[1], refs[2]
    pos = 3
    cov6_ref = conf_ref = None
    if variant == "gicp":
        cov6_ref = refs[pos]
        pos += 1
        if use_cf:
            conf_ref = refs[pos]
            pos += 1
    a_ref, b_ref, st_ref = refs[pos:pos + 3]

    f32 = jnp.float32
    bp = src_ref.shape[0]
    n = src_ref.shape[2]
    x, y, z = src_ref[:, 0, :], src_ref[:, 1, :], src_ref[:, 2, :]
    pf = pf_ref[:, 0, :]

    def col(k):
        return pf[:, k:k + 1]

    t0, t1, t2 = col(PF_T), col(PF_T + 1), col(PF_T + 2)
    beta, sw = col(PF_BETA), col(PF_SWITCHED)
    n_src, count = col(PF_NSRC), col(PF_COUNT)
    R = [[col(PF_R + 3 * i + j) for j in range(3)] for i in range(3)]

    # moving source rows: s = R x + t (rebuilt from loop-invariant x)
    rx = R[0][0] * x + R[0][1] * y + R[0][2] * z
    ry = R[1][0] * x + R[1][1] * y + R[1][2] * z
    rz = R[2][0] * x + R[2][1] * y + R[2][2] * z
    s0, s1, s2 = rx + t0, ry + t1, rz + t2
    g0, g1, g2 = mt_ref[:, 0, :], mt_ref[:, 1, :], mt_ref[:, 2, :]
    dB0, dB1, dB2 = s0 - g0, s1 - g1, s2 - g2
    d_b = jnp.sqrt(dB0 * dB0 + dB1 * dB1 + dB2 * dB2)

    # trim/MSE metric: R3 distance in both phases; phase A measures the
    # beta-weighted frame translations against the matched 12-D row's
    # translation block (ref:cpp:436,465)
    if is_se3:
        c0, c1, c2 = beta * rx + t0, beta * ry + t1, beta * rz + t2
        b0 = mt_ref[:, off_tr, :]
        b1 = mt_ref[:, off_tr + 1, :]
        b2 = mt_ref[:, off_tr + 2, :]
        dA0, dA1, dA2 = c0 - b0, c1 - b1, c2 - b2
        d_a = jnp.sqrt(dA0 * dA0 + dA1 * dA1 + dA2 * dA2)
        dist = jnp.where(sw > 0.5, d_b, d_a)
    else:
        dist = d_b

    colf = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1).astype(f32)
    valid = colf < n_src
    if do_trim:
        # value bisection == trim._trim_mask_bisect (bit-identical
        # brackets: same f32 mids, exact integer-valued counts)
        d = jnp.where(valid, dist, jnp.asarray(_BIG, f32))
        lo0 = jnp.zeros_like(count) - 1.0
        hi0 = jnp.max(jnp.where(valid, dist, 0.0), axis=1, keepdims=True)

        def vstep(_, lh):
            lo_, hi_ = lh
            mid = 0.5 * (lo_ + hi_)
            c = jnp.sum((d <= mid).astype(f32), axis=1, keepdims=True)
            pred = c >= count
            return (jnp.where(pred, lo_, mid), jnp.where(pred, mid, hi_))

        lo, hi = jax.lax.fori_loop(0, _VSTEPS, vstep, (lo0, hi0))
        below = d <= lo
        n_below = jnp.sum(below.astype(f32), axis=1, keepdims=True)
        band = (d > lo) & (d <= hi)
        target = count - n_below
        # index bisection: the minimal index i* whose band prefix
        # reaches the missing count -- the same kept set as the stable
        # cumsum walk (ties toward lower index), without a cumsum
        li0 = jnp.zeros_like(count) - 1.0
        hi_i0 = jnp.full_like(count, float(n - 1))

        def istep(_, lh):
            lo_, hi_ = lh
            mid = jnp.floor(0.5 * (lo_ + hi_))
            c = jnp.sum((band & (colf <= mid)).astype(f32), axis=1,
                        keepdims=True)
            pred = c >= target
            return (jnp.where(pred, lo_, mid), jnp.where(pred, mid, hi_))

        _, hii = jax.lax.fori_loop(0, isteps, istep, (li0, hi_i0))
        kept = below | (band & (colf <= hii))
    else:
        kept = valid

    w = kept.astype(f32)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    # mse: mean kept distance; with_cf recomputes euclidean moving-vs-
    # target (ref:cpp:897 -> 390)
    mse_src = d_b if use_cf else dist
    mse = (jnp.sum(mse_src * w, axis=1, keepdims=True)
           / jnp.maximum(wsum, 1.0))

    hp = jax.lax.Precision.HIGHEST

    def bdot(lhs, rhs):
        """[BP,K,M] x [BP,L,M] -> [BP,K,L] contraction over the wide M."""
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32, precision=hp)

    if variant == "pt2pt":
        wsafe = jnp.maximum(wsum, jnp.asarray(1e-30, f32))
        mu_s = [jnp.sum(s * w, axis=1, keepdims=True) / wsafe
                for s in (s0, s1, s2)]
        mu_t = [jnp.sum(g * w, axis=1, keepdims=True) / wsafe
                for g in (g0, g1, g2)]
        dtw = jnp.stack([(g0 - mu_t[0]) * w, (g1 - mu_t[1]) * w,
                         (g2 - mu_t[2]) * w], axis=1)
        ds = jnp.stack([s0 - mu_s[0], s1 - mu_s[1], s2 - mu_s[2]],
                       axis=1)
        H = bdot(dtw, ds)                                  # [BP,3,3]
        a_ref[...] = jnp.pad(H, ((0, 0), (0, 3), (0, 3)))
        b_ref[:, 0, :] = jnp.concatenate(
            [mu_s[0], mu_s[1], mu_s[2], mu_t[0], mu_t[1], mu_t[2],
             jnp.zeros((bp, 2), f32)], axis=1)
    elif variant == "pt2pl":
        n0 = mt_ref[:, off_nrm, :]
        n1 = mt_ref[:, off_nrm + 1, :]
        n2 = mt_ref[:, off_nrm + 2, :]
        r = dB0 * n0 + dB1 * n1 + dB2 * n2
        jt = jnp.stack([s1 * n2 - s2 * n1, s2 * n0 - s0 * n2,
                        s0 * n1 - s1 * n0, n0, n1, n2], axis=1)
        jtw = jt * w[:, None, :]
        a_ref[...] = bdot(jtw, jt)
        jtr = bdot(jtw, r[:, None, :])                     # [BP,6,1]
        b_ref[:, 0, :] = jnp.pad(jtr[:, :, 0], ((0, 0), (0, 2)))
    else:  # gicp
        # rotated source covariance R C0 R^T on loop-invariant C0 rows
        c6 = [cov6_ref[:, k, :] for k in range(6)]
        cidx = {(0, 0): 0, (0, 1): 1, (1, 0): 1, (0, 2): 2, (2, 0): 2,
                (1, 1): 3, (1, 2): 4, (2, 1): 4, (2, 2): 5}
        m6 = []
        for m, (i, j) in enumerate(((0, 0), (0, 1), (0, 2), (1, 1),
                                    (1, 2), (2, 2))):
            acc = mt_ref[:, off_cov + m, :]                # matched C_t
            for k in range(3):
                for l in range(3):
                    acc = acc + (R[i][k] * R[j][l]) * c6[cidx[(k, l)]]
            m6.append(acc)
        W6 = eigh3.inv_sqrt_sym3_c(
            *m6, cardano=eigh3.cardano_cos_kernel_safe)
        if use_cf:
            cw = 0.5 * (conf_ref[:, 0, :] + mt_ref[:, off_conf, :])
            W6 = tuple(xw * cw for xw in W6)
        Wm = ((W6[0], W6[1], W6[2]), (W6[1], W6[3], W6[4]),
              (W6[2], W6[4], W6[5]))
        dvec = (dB0, dB1, dB2)
        zero = jnp.zeros_like(s0)
        cols = ((zero, -s2, s1), (s2, zero, -s0), (-s1, s0, zero))

        def wdot(row, v):
            return row[0] * v[0] + row[1] * v[1] + row[2] * v[2]

        ji, ri = [], []
        for i in range(3):
            rows = ([wdot(Wm[i], cols[a]) for a in range(3)]
                    + [Wm[i][0], Wm[i][1], Wm[i][2]])
            ji.append(jnp.stack(rows, axis=1))             # [BP,6,N]
            ri.append(wdot(Wm[i], dvec))                   # [BP,N]
        jcat = jnp.concatenate(ji, axis=2)                 # [BP,6,3N]
        rcat = jnp.concatenate(ri, axis=1)[:, None, :]     # [BP,1,3N]
        w3 = jnp.concatenate([w, w, w], axis=1)[:, None, :]
        jw = jcat * w3
        a_ref[...] = bdot(jw, jcat)
        jtr = bdot(jw, rcat)
        b_ref[:, 0, :] = jnp.pad(jtr[:, :, 0], ((0, 0), (0, 2)))

    st_ref[:, 0, :] = jnp.concatenate(
        [mse, wsum, jnp.zeros((bp, 6), f32)], axis=1)


@functools.partial(
    jax.jit, static_argnames=("variant", "is_se3", "use_cf", "do_trim",
                              "off_tr", "off_nrm", "off_cov", "off_conf"))
def loop_epilogue_batched(srcT, matchedT, pf, cov6=None, conf=None, *,
                          variant, is_se3, use_cf, do_trim,
                          off_tr=0, off_nrm=0, off_cov=0, off_conf=0):
    """Batched fused epilogue.

    srcT [B,3,N] loop-invariant centered source (feature-major);
    matchedT [B,P,N] matched payload rows from ``nn_match_affine``;
    pf [B,24] per-iteration scalars (PF_* layout);
    cov6 [B,6,N] loop-invariant source covariance components (gicp);
    conf [B,N] source confidences (with_cf).

    Returns (A [B,6,6], b [B,8], st [B,8]):
      pt2pl/gicp: A = JtJ, b[:6] = Jtr;
      pt2pt:      A[:3,:3] = H (weighted centered cross-covariance),
                  b[0:3] = mu_src, b[3:6] = mu_tgt;
      st = [mse, wsum, 0...].
    """
    bsz, _, n = srcT.shape
    p = matchedT.shape[1]
    # pairs per grid step: 8 fills the f32 sublanes, but the kernel's
    # live temporaries scale with bp*N and must fit Mosaic's ~16 MB
    # scoped VMEM -- gicp holds ~70 [bp,N] rows (J6 [bp,6,3N], the
    # in-kernel eigh intermediates, rotated covariances), pt2pt/pt2pl
    # ~32 (measured: gicp at bp=8, N=15360 overflows by 8.7 MB)
    bp_n_cap = 55_000 if variant == "gicp" else 130_000
    bp = next(b for b in (8, 4, 2, 1)
              if bsz % b == 0 and (b * n <= bp_n_cap or b == 1))
    isteps = int(np.ceil(np.log2(max(n, 2)))) + 2
    grid = (bsz // bp,)

    in_specs = [
        pl.BlockSpec((bp, 3, n), lambda b: (b, 0, 0)),
        pl.BlockSpec((bp, p, n), lambda b: (b, 0, 0)),
        # unit middle dim: a (bp, 1, W) block satisfies Mosaic's
        # sublane rule for any bp (bp < 8 on large-N gicp)
        pl.BlockSpec((bp, 1, PF_WIDTH), lambda b: (b, 0, 0)),
    ]
    args = [srcT.astype(jnp.float32), matchedT.astype(jnp.float32),
            pf.astype(jnp.float32)[:, None, :]]
    if variant == "gicp":
        in_specs.append(pl.BlockSpec((bp, 6, n), lambda b: (b, 0, 0)))
        args.append(cov6.astype(jnp.float32))
        if use_cf:
            in_specs.append(pl.BlockSpec((bp, 1, n),
                                         lambda b: (b, 0, 0)))
            args.append(conf.astype(jnp.float32)[:, None, :])

    kern = functools.partial(
        _kernel_epilogue, variant=variant, is_se3=is_se3, use_cf=use_cf,
        do_trim=do_trim, off_tr=off_tr, off_nrm=off_nrm, off_cov=off_cov,
        off_conf=off_conf, isteps=isteps)
    a, b, st = pl.pallas_call(
        kern,
        grid=grid,
        interpret=_interpret(),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bp, 6, 6), lambda b: (b, 0, 0)),
            pl.BlockSpec((bp, 1, 8), lambda b: (b, 0, 0)),
            pl.BlockSpec((bp, 1, 8), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 6, 6), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, 8), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, 8), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * (40 + 36 * (3 if variant == "gicp"
                                            else 1)),
            bytes_accessed=4 * bsz * n * (3 + p
                                          + (6 if variant == "gicp"
                                             else 0)),
            transcendentals=(2 * bsz * n if variant == "gicp" else 0),
        ),
    )(*args)
    dt = srcT.dtype
    return a.astype(dt), b[:, 0].astype(dt), st[:, 0].astype(dt)


def _bcast(x, b, axis_size):
    return x if b else jnp.broadcast_to(x[None],
                                        (axis_size,) + jnp.shape(x))


@functools.lru_cache(maxsize=None)
def _epilogue_fn(variant, is_se3, use_cf, do_trim, off_tr, off_nrm,
                 off_cov, off_conf):
    """custom_vmap wrapper factory, cached per static configuration:
    the engine body calls the unbatched form; vmapped pair batches
    lower to the natively batched kernel (batch = outer grid dim)."""
    statics = dict(variant=variant, is_se3=is_se3, use_cf=use_cf,
                   do_trim=do_trim, off_tr=off_tr, off_nrm=off_nrm,
                   off_cov=off_cov, off_conf=off_conf)

    def _single(*args):
        out = loop_epilogue_batched(*[a[None] for a in args], **statics)
        return tuple(o[0] for o in out)

    def _rule(axis_size, in_batched, *args):
        args = [_bcast(a, b, axis_size)
                for a, b in zip(args, in_batched)]
        return loop_epilogue_batched(*args, **statics), (True, True,
                                                         True)

    if variant == "gicp" and use_cf:
        @jax.custom_batching.custom_vmap
        def fn(srcT, matchedT, pf, cov6, conf):
            return _single(srcT, matchedT, pf, cov6, conf)
    elif variant == "gicp":
        @jax.custom_batching.custom_vmap
        def fn(srcT, matchedT, pf, cov6):
            return _single(srcT, matchedT, pf, cov6)
    else:
        @jax.custom_batching.custom_vmap
        def fn(srcT, matchedT, pf):
            return _single(srcT, matchedT, pf)
    fn.def_vmap(_rule)
    return fn


def loop_epilogue(srcT, matchedT, pf, cov6=None, conf=None, *,
                  variant, is_se3, use_cf, do_trim,
                  off_tr=0, off_nrm=0, off_cov=0, off_conf=0):
    """Unbatched-signature fused epilogue (vmap-compatible; see
    ``loop_epilogue_batched`` for shapes minus the leading B)."""
    fn = _epilogue_fn(variant, is_se3, use_cf, do_trim, off_tr, off_nrm,
                      off_cov, off_conf)
    args = (srcT, matchedT, pf)
    if variant == "gicp":
        args += (cov6,)
        if use_cf:
            args += (conf,)
    return fn(*args)
