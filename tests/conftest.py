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

jax.config.update("jax_platforms", "cpu")

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
