"""Test configuration: run everything on CPU with a virtual 8-device mesh.

The TPU analogue of testing multi-GPU code without a cluster: Pallas kernels
run in interpret mode on CPU and sharding tests use XLA's virtual host
devices (SURVEY.md section 4).

NOTE: this environment's axon sitecustomize force-appends the TPU platform
regardless of JAX_PLATFORMS, so we must override via jax.config *after*
import — env vars alone do not stick.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The on-TPU gate (`CUDASIFT_TEST_TPU=1 pytest tests/test_tpu.py`) keeps the
# real backend; everything else runs on CPU (Pallas in interpret mode).
if os.environ.get("CUDASIFT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

# Suite wall time on this 1-core host is ~95% XLA compiles (a cold
# interpret-mode fused-kernel compile is ~45 s; its run is ~0.1 s). Cache
# executables across runs: cold suite unchanged, warm suite is minutes
# faster. The cache dir is gitignored.
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def left_image():
    """The bundled 1280x960 stereo fixture (data/left.pgm in the reference)."""
    import cv2

    img = cv2.imread("/root/reference/data/left.pgm", 0)
    assert img is not None
    return img.astype(np.float32)
