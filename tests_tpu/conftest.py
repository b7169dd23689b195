"""Real-TPU test lane (VERDICT r1 item 7).

Unlike tests/ (which forces a virtual multi-device CPU mesh as the oracle
lane), this suite runs f32 numerics on the real chip: SpMV engines, SpGEMM
tiers, transpose, the device multifrontal, and the Pallas DIA kernel vs the
XLA oracle. Run explicitly on TPU hardware:

    python -m pytest tests_tpu/ -q

Skips itself entirely when no TPU/axon platform is available. Keep runs
serialized — one TPU process at a time (relay constraint).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _tpu_available():
    try:
        import jax

        ok = jax.devices()[0].platform not in ("cpu",)
        if ok:
            # persistent compile cache: first-compile through the remote
            # service is minutes; reruns of the lane become seconds
            from hpclinalg.config import enable_compile_cache

            enable_compile_cache()  # machine-feature-keyed dir
        return ok
    except Exception:
        return False


collect_ignore_glob = []
if not _tpu_available():
    collect_ignore_glob = ["*"]


@pytest.fixture(scope="session")
def be1():
    import hpclinalg as hl

    return hl.backend_auto(nshards=1, dtype=np.float32)
