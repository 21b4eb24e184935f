"""Fused blur+DoG+extrema kernel vs XLA twins (interpret mode)."""

import numpy as np
import jax.numpy as jnp

import golden
from cudasift_tpu.config import laplace_kernels
from cudasift_tpu.ops import convolve, detect
from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas


def test_dog_and_mask_matches_xla(rng):
    img = (rng.standard_normal((70, 150)) * 25 + 110).astype(np.float32)
    img = golden.sep_conv_clamp(img, golden.gaussian_kernel(2, 1.0)).astype(
        np.float32
    )
    ktab = laplace_kernels(2)[0]
    dog, mask = dog_and_mask_pallas(
        jnp.asarray(img), jnp.asarray(ktab), 0.8, 10.0, interpret=True
    )
    blur = convolve.blur_multi(jnp.asarray(img), ktab)
    dog_ref = blur[1:] - blur[:-1]
    mask_ref = detect.extrema_mask(dog_ref, 0.8, 10.0)
    assert dog.shape == (7, 70, 150)
    np.testing.assert_allclose(
        np.asarray(dog), np.asarray(dog_ref), atol=2e-3, rtol=1e-4
    )
    got = set(zip(*np.nonzero(np.asarray(mask))))
    ref = set(zip(*np.nonzero(np.asarray(mask_ref))))
    # Identical up to float-order ties at the +-thresh boundary.
    assert len(got.symmetric_difference(ref)) <= max(1, len(ref) // 100), (
        len(got), len(ref))


def test_dog_and_mask_mxu_vert_variant(rng):
    """The MXU banded-matmul vertical-conv variant (measured no-win on v5e,
    kept for bigger-MXU parts — ROADMAP 'negative results') must stay within
    its bf16x3-split error envelope of the VPU form."""
    img = (rng.standard_normal((70, 150)) * 25 + 110).astype(np.float32)
    img = golden.sep_conv_clamp(img, golden.gaussian_kernel(2, 1.0)).astype(
        np.float32
    )
    ktab = laplace_kernels(2)[0]
    dog0, mask0 = dog_and_mask_pallas(
        jnp.asarray(img), jnp.asarray(ktab), 0.8, 10.0, interpret=True
    )
    dog1, mask1 = dog_and_mask_pallas(
        jnp.asarray(img), jnp.asarray(ktab), 0.8, 10.0, interpret=True,
        mxu_vert=True,
    )
    scale = float(np.abs(np.asarray(dog0)).max())
    np.testing.assert_allclose(
        np.asarray(dog1), np.asarray(dog0), atol=5e-4 * max(scale, 1.0)
    )
    flips = int((np.asarray(mask0) != np.asarray(mask1)).sum())
    assert flips <= max(2, int(np.asarray(mask0).sum()) // 100), flips


def test_dog_and_mask_wide_image(rng):
    """Wide images use th=8 strips (the th=16 working set exceeds Mosaic's
    scoped-VMEM budget at w>2048 — regression seen at 1440p). The narrow-
    strip kernel must stay bit-identical to the XLA reference."""
    from cudasift_tpu.ops import convolve
    from cudasift_tpu.config import laplace_kernels

    img = rng.uniform(0, 255, (48, 2176)).astype(np.float32)
    kern = laplace_kernels(1)[0]
    dog, mask = dog_and_mask_pallas(
        jnp.asarray(img), jnp.asarray(kern), 3.0, 10.0, interpret=True)
    blur = convolve.blur_multi(jnp.asarray(img), kern)
    ref = blur[1:] - blur[:-1]
    np.testing.assert_allclose(
        np.asarray(dog), np.asarray(ref), atol=2e-3, rtol=1e-4)
