"""TPU-hardware test harness (run manually / by bench: real chip needed).

The main ``tests/`` suite pins itself to an 8-virtual-device CPU platform;
this directory runs on whatever accelerator is present and is skipped
entirely when none is."""

import jax
import pytest

from se3_icp_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="no TPU backend")
        for item in items:
            item.add_marker(skip)
