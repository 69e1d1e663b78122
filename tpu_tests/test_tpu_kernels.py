import numpy as np
import jax
import jax.numpy as jnp

from se3_icp_tpu.ops import knn, pallas_knn


def test_pallas_nn_matches_xla_on_tpu():
    rng = np.random.default_rng(0)
    for nq, nt, d in [(4167, 4167, 12), (1000, 2500, 3), (15000, 15000, 12)]:
        q = jnp.asarray(rng.normal(size=(nq, d)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(nt, d)).astype(np.float32))
        n = jnp.asarray(nt - 7, jnp.int32)
        ip, dp = pallas_knn.nn_argmin_pallas(q, t, n)
        ix, dx = knn.nn_argmin_xla(q, t, n)
        assert (np.asarray(ip) == np.asarray(ix)).mean() > 0.9995, (nq, nt)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dx),
                                   atol=1e-2, rtol=1e-2)


def test_golden_problem_on_tpu():
    from se3_icp_tpu.models import registration as reg
    from se3_icp_tpu.utils import ply, metrics
    from se3_icp_tpu.utils.config import GOLDEN
    base = "/root/reference/created_example_reg_problem"
    src = ply.read_ply(base + "/source.ply").points
    tgt = ply.read_ply(base + "/target.ply").points
    T_gt = ply.read_transform_txt(base + "/transformation_gt.txt")
    res = reg.register_pair(src, tgt, "se3_pt2pl", GOLDEN)
    so3 = float(metrics.angular_error_so3(
        res.transformation[:3, :3], T_gt[:3, :3]))
    tra = float(np.linalg.norm(res.transformation[:3, 3] - T_gt[:3, 3]))
    assert so3 < 0.1 and tra < 0.05, (so3, tra)


def test_golden_accuracy_on_tpu():
    """Full se3_pt2pl registration of the committed golden problem on
    the real accelerator (f32, approx top-k): must be far inside the
    reference's 2 deg / 0.25 success bounds."""
    import numpy as np

    from se3_icp_tpu.models import registration as reg
    from se3_icp_tpu.utils import metrics_host, ply
    from se3_icp_tpu.utils.config import GOLDEN

    base = "/root/reference/created_example_reg_problem"
    src = ply.read_ply(base + "/source.ply").points
    tgt = ply.read_ply(base + "/target.ply").points
    T_gt = ply.read_transform_txt(base + "/transformation_gt.txt")
    r = reg.register_pair(src, tgt, "se3_pt2pl", GOLDEN)
    rot = metrics_host.angular_error_so3(r.transformation[:3, :3],
                                         T_gt[:3, :3])
    tra = metrics_host.translation_error(r.transformation[:3, 3],
                                         T_gt[:3, 3])
    assert rot < 0.01, rot
    assert tra < 0.001, tra


def test_batched_pallas_nn_matches_xla_on_tpu():
    """The engine's vmapped hot loop lowers to the natively batched
    kernel (limb-packed bf16 dot): argmin must agree with the exact XLA
    path up to genuine near-ties (d2 gap at f32 rounding scale)."""
    rng = np.random.default_rng(0)
    B, nq, nt, d = 6, 4608, 4608, 12
    q = jnp.asarray(rng.normal(scale=2.0, size=(B, nq, d)), jnp.float32)
    t = jnp.asarray(rng.normal(scale=2.0, size=(B, nt, d)), jnp.float32)
    n = jnp.asarray(rng.integers(4000, nt + 1, size=B), jnp.int32)
    ip, dp = jax.device_get(pallas_knn.nn_argmin_pallas_batched(q, t, n))
    ix, dx = jax.device_get(jax.vmap(knn.nn_argmin_xla)(q, t, n))
    mm = ip != ix
    assert mm.mean() < 1e-3, mm.mean()
    # any disagreement must be a near-tie, not a material flip
    assert np.abs(dp[mm] - dx[mm]).max(initial=0.0) < 1e-3
    np.testing.assert_allclose(dp, dx, atol=1e-3)


def test_batched_kernel_inside_jit_vmap_on_tpu():
    """Regression: --xla_allow_excess_precision used to elide the
    f32->bf16 limb-split rounding when the kernel wrapper was fused
    into an outer jit, silently degrading the packed dot to plain bf16
    (~3% flipped argmins, engine convergence broken).  The limb split
    now uses lax.reduce_precision; inside jit(vmap(...)) results must
    equal the eager kernel's."""
    rng = np.random.default_rng(1)
    B, nq, nt, d, p = 4, 2304, 2304, 12, 9
    q = jnp.asarray(rng.normal(scale=2.0, size=(B, nq, d)), jnp.float32)
    t = jnp.asarray(rng.normal(scale=2.0, size=(B, nt, d)), jnp.float32)
    pay = jnp.asarray(rng.normal(size=(nt, p)), jnp.float32)
    n = jnp.full((B,), nt, jnp.int32)
    i_direct, _ = jax.device_get(
        pallas_knn.nn_argmin_pallas_batched(q, t, n))
    f = jax.jit(jax.vmap(lambda q_, t_, n_: knn.nn_match(q_, t_, pay, n_)))
    i_jit, _, matched = jax.device_get(f(q, t, n))
    assert (i_direct == i_jit).all()
    # fused payload selection is bit-exact vs indexing
    payn = np.asarray(pay)
    for b in range(B):
        assert (matched[b] == payn[i_jit[b]]).all()


def test_batched_engine_convergence_on_tpu():
    """Batched registrations through the Pallas hot loop must converge
    in reference-like iteration counts (a precision regression in the
    NN kernel once sent 25% of pairs to the 150-iteration cap on
    mse oscillation)."""
    from se3_icp_tpu.parallel import pairs as par
    from se3_icp_tpu.utils import metrics_host, ply
    from se3_icp_tpu.utils.config import GOLDEN

    base = "/root/reference/created_example_reg_problem"
    src = ply.read_ply(base + "/source.ply").points
    tgt = ply.read_ply(base + "/target.ply").points
    T_gt = ply.read_transform_txt(base + "/transformation_gt.txt")
    rng = np.random.default_rng(0)
    pl_ = [(src + rng.normal(scale=1e-4, size=src.shape), tgt)
           for _ in range(8)]
    res = par.register_pairs(pl_, "se3_pt2pl", GOLDEN)
    for r in res:
        assert r.num_iterations <= 20, r.num_iterations
        rot = metrics_host.angular_error_so3(
            r.transformation[:3, :3], T_gt[:3, :3])
        assert rot < 0.01, rot
