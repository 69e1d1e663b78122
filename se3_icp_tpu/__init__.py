"""se3-icp-tpu: a TPU-native SE(3)-ICP point-cloud registration engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++
reference implementation of "A Generalization of Iterative Closest Point
Registration Algorithms using a Local Reference Frame based SE(3)
Augmentation" (kenahm/se3-icp, IEEE Access 2026).

Design stance (TPU-first, not a port):
  * KD-trees (FLANN) are replaced by brute-force tiled distance search on
    the MXU (Pallas kernels; plain-XLA fallback), for both the 12-D SE(3)
    chordal metric and the 3-D euclidean metric.
  * The whole ICP iteration (correspondence search, trimmed rejection,
    transform estimation, frame update, convergence logic) runs on-device
    inside a single ``lax.while_loop`` -- zero host sync per iteration.
  * Clouds are padded to static bucket sizes with validity masks; the
    "trim to best overlap fraction" step becomes a static-shape rank mask.
  * Scale-out is data-parallel over frame pairs and/or sharded over the
    target-point axis via ``jax.sharding`` / ``shard_map`` with XLA
    collectives -- not threads.

Reference parity citations throughout the code point at
``/root/reference/src/iterative_SE3_registration.cpp`` (abbreviated
``ref:cpp``), ``include/iterative_SE3_registration.hpp`` (``ref:hpp``),
``src/cc.cpp`` (``ref:cc``) and the ``examples/*.cpp`` binaries.
"""

from se3_icp_tpu.utils.config import RegistrationConfig

__version__ = "0.1.0"


def __getattr__(name):
    # late imports so that utils/ops stay importable standalone
    if name in ("RegistrationResult", "register_pair", "register_arrays"):
        from se3_icp_tpu.models import registration
        return getattr(registration, name)
    raise AttributeError(name)

__all__ = [
    "RegistrationConfig",
    "RegistrationResult",
    "register_pair",
    "register_arrays",
    "__version__",
]
