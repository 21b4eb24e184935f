"""Smoke tests for auxiliary surfaces: printers, device info, utils package."""

import numpy as np
import jax.numpy as jnp


def test_utils_package_paths():
    import cudasift_tpu as cs

    assert callable(cs.utils.io.imread_gray)
    assert callable(cs.utils.viz.draw_match_data)
    assert callable(cs.utils.timers.time_fn)


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
