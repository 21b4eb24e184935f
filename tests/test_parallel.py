"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import golden
from cudasift_tpu import SiftParams, extract_sift
from cudasift_tpu.parallel import (
    make_mesh,
    extract_sift_batched,
    match_descriptors_sharded,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_batched_extraction_matches_single(left_image, mesh):
    crops = np.stack(
        [left_image[400 + 16 * i : 496 + 16 * i, 500:628] for i in range(8)]
    )
    params = SiftParams(num_octaves=2, thresh=4.0, max_pts=512)
    batched = extract_sift_batched(jnp.asarray(crops), params, mesh)
    single = extract_sift(crops[3], params)
    assert int(batched.num_pts[3]) == int(single.num_pts)
    np.testing.assert_allclose(
        np.asarray(batched.xpos[3]), np.asarray(single.xpos), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(batched.data[3]), np.asarray(single.data), atol=1e-4
    )


def test_sharded_matcher_exact(rng, mesh):
    d1 = rng.standard_normal((200, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = rng.standard_normal((1000, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    n1, n2 = 200, 977  # ragged tail inside the last shard
    best, amb, idx = match_descriptors_sharded(
        jnp.asarray(d1), jnp.asarray(d2), jnp.int32(n1), jnp.int32(n2),
        mesh, tile=64,
    )
    gb, ga, gi = golden.match_brute_force(
        d1.astype(np.float64), d2[:n2].astype(np.float64)
    )
    np.testing.assert_array_equal(np.asarray(idx), gi)
    np.testing.assert_allclose(np.asarray(best), gb, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(amb), ga, rtol=1e-4, atol=1e-5)


def test_throughput_sharded_matches_single(left_image, mesh):
    """Pod config: DP over frames x unrolled throughput layout per device
    must reproduce single-device extraction per frame."""
    from cudasift_tpu.parallel import extract_sift_throughput_sharded
    from cudasift_tpu import extract_sift

    frames = np.stack([
        np.roll(left_image[300:396, 400:528], 7 * i, axis=1)
        for i in range(8)
    ])
    params = SiftParams(num_octaves=2, thresh=4.0, max_pts=512)
    batch = extract_sift_throughput_sharded(frames, params, mesh)
    assert batch.xpos.shape == (8, 512)
    for i in (0, 3, 7):
        single = extract_sift(frames[i], params)
        assert int(batch.num_pts[i]) == int(single.num_pts)
        np.testing.assert_array_equal(
            np.asarray(batch.xpos[i]), np.asarray(single.xpos))

    with pytest.raises(ValueError):
        extract_sift_throughput_sharded(frames[:3], params, mesh)
