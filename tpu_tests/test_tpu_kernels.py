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
