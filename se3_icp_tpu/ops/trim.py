"""Trimmed correspondence rejection as a static-shape rank mask.

Replaces PCL's ``CorrespondenceRejectorTrimmed`` (used at ref:cpp:487-510,
634-671, 846-883, 1044-1071): keep the ``floor(overlap_ratio * N)``
correspondences with the smallest stored distance.  Compaction is
impossible under XLA's static shapes, so the kept subset becomes a 0/1
mask fed to the weight-aware estimators -- mathematically identical.

Two routes, same result:
  * CPU (and oracle): stable argsort + rank compare -- bit-identical to
    PCL's selection, ties toward the lower source index.
  * TPU: sort-free count bisection.  A full [B,N] argsort per loop
    iteration is the one remaining sort in the trimmed hot loop
    (VERDICT r1 item 3); ~26 halving steps on the distance values find
    the count-th distance, then an index-ordered cumsum fills the
    boundary band to the EXACT count (equal values resolve toward the
    lower index, matching the stable sort; only distinct values within
    ~2 ulp of the boundary can swap membership vs the oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 3.4e38
_STEPS = 26


def _trim_mask_bisect(distances, valid, count):
    """Sort-free exact-count trim: keep the ``count`` smallest valid
    distances (ties toward lower index)."""
    dt = distances.dtype
    d = jnp.where(valid, distances, jnp.asarray(_BIG, dt))
    hi0 = jnp.max(jnp.where(valid, distances, jnp.asarray(0.0, dt)))
    lo0 = jnp.asarray(-1.0, dt)  # distances >= 0: c(lo0) = 0 < any count
    cnt_f = count.astype(dt)

    def step(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        c = jnp.sum((d <= mid).astype(dt))
        pred = c >= cnt_f
        return (jnp.where(pred, lo, mid), jnp.where(pred, mid, hi))

    lo, hi = jax.lax.fori_loop(0, _STEPS, step, (lo0, hi0))
    below = d <= lo                             # strictly fewer than count
    n_below = jnp.sum(below.astype(jnp.int32))
    band = (d > lo) & (d <= hi)
    in_rank = jnp.cumsum(band.astype(jnp.int32))  # 1-indexed within band
    kept_band = band & (in_rank <= count - n_below)
    return below | kept_band


def trim_mask(distances, valid, overlap_ratio: float, n_valid):
    """0/1 mask keeping the best floor(ratio * n_valid) valid entries.

    ``overlap_ratio`` is static (config); ``n_valid`` may be traced.
    """
    if overlap_ratio >= 1.0:
        return valid
    count = jnp.floor(overlap_ratio * n_valid).astype(jnp.int32)
    import os
    if (jax.default_backend() == "tpu"
            or os.environ.get("SE3_ICP_TPU_FORCE_PALLAS")):
        # FORCE_PALLAS: CPU CI runs the full TPU trace (pure-jnp
        # bisection, works on any backend) -- see knn._use_pallas_batched
        return _trim_mask_bisect(distances, valid, count)
    d = jnp.where(valid, distances, jnp.asarray(_BIG, distances.dtype))
    order = jnp.argsort(d, stable=True)
    n = distances.shape[0]
    ranks = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return (ranks < count) & valid


def masked_mean(values, mask):
    """Mean over masked entries (ref ``estimate_current_mse``,
    ref:cpp:379-387: mean of the stored correspondence distances)."""
    m = mask.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)
