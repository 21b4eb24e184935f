"""Smoke tests for auxiliary surfaces: printers, device info, utils package."""

import numpy as np
import jax.numpy as jnp


def test_utils_package_paths():
    # Import the subpackages explicitly — `cs.utils` only exists as an
    # attribute after some module imports it, so relying on another test
    # to have done so made this test order-dependent.
    from cudasift_tpu.utils import io, timers, viz

    assert callable(io.imread_gray)
    assert callable(viz.draw_match_data)
    assert callable(timers.time_fn)


def test_print_sift_data(capsys):
    import cudasift_tpu as cs

    d = cs.init_sift_data(64)
    d.num_pts = jnp.int32(1)
    d.xpos = d.xpos.at[0].set(12.34)
    d.data = d.data.at[0].set(1.0 / np.sqrt(128.0))
    cs.print_sift_data(d)
    out = capsys.readouterr().out
    assert "xpos         = 12.34" in out
    assert "Number of available points: 1" in out
    assert "data = " in out


def test_device_info(capsys):
    import cudasift_tpu as cs

    cs.device_info()
    out = capsys.readouterr().out
    assert "Device name:" in out
