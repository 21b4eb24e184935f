"""IO utilities and the native siftio extension (with fallbacks)."""

import numpy as np
import jax.numpy as jnp

from cudasift_tpu.utils import io, native
from cudasift_tpu.sift_data import init_sift_data


def test_pgm_roundtrip(tmp_path, rng):
    img = rng.uniform(0, 255, (37, 53)).astype(np.float32)
    path = str(tmp_path / "t.pgm")
    io.write_pgm(path, img)
    back = io.read_pgm(path)
    np.testing.assert_array_equal(back, np.clip(img, 0, 255).astype(np.uint8))


def test_read_reference_fixture():
    img = io.read_pgm("/root/reference/data/left.pgm")
    assert img.shape == (960, 1280)
    assert img.dtype == np.float32


def test_native_matches_python_reader(tmp_path, rng):
    img = rng.uniform(0, 255, (24, 31)).astype(np.float32)
    path = str(tmp_path / "n.pgm")
    io.write_pgm(path, img)
    a = native.read_pgm_native(path)
    b = io.read_pgm(path)
    np.testing.assert_array_equal(a, b)


def test_cudasift_record_roundtrip(rng):
    d = init_sift_data(256)
    n = 5
    d.num_pts = jnp.int32(n)
    d.xpos = d.xpos.at[:n].set(jnp.asarray(rng.uniform(0, 100, n), jnp.float32))
    d.scale = d.scale.at[:n].set(jnp.asarray(rng.uniform(1, 4, n), jnp.float32))
    d.match = d.match.at[:n].set(jnp.asarray([3, -1, 0, 7, 2], jnp.int32))
    desc = rng.standard_normal((n, 128)).astype(np.float32)
    d.data = d.data.at[:n].set(jnp.asarray(desc))
    blob = native.to_cudasift_records(d)
    assert len(blob) == n * 144 * 4
    # Record layout parity: field offsets match cudaSift.h:6-22.
    rec = np.frombuffer(blob, np.float32).reshape(n, 144)
    np.testing.assert_allclose(rec[:, 0], np.asarray(d.xpos[:n]))
    np.testing.assert_allclose(rec[:, 2], np.asarray(d.scale[:n]))
    np.testing.assert_array_equal(
        rec[:, 8:9].view(np.int32)[:, 0], [3, -1, 0, 7, 2]
    )
    np.testing.assert_allclose(rec[:, 16:], desc)
    back = native.from_cudasift_records(blob)
    assert int(back.num_pts) == n
    np.testing.assert_allclose(np.asarray(back.data[:n]), desc)
    np.testing.assert_array_equal(np.asarray(back.match[:n]), [3, -1, 0, 7, 2])
