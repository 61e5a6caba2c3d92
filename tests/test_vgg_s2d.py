"""conv1_1 space-to-depth re-layout: numerical equivalence tests.

The s2d path (models/vgg16.py:conv1_1_s2d) must compute exactly the same
function as the plain SAME conv — the block kernel's extra taps carry
literal zeros. Differences between the two implementations are only
XLA summation-order noise (f32 ~1e-6 relative); what matters for the
canvas==cropped exactness guarantees is that the s2d path is itself
deterministic and block-aligned, which test_canvas_parity re-validates
with conv1_s2d on (the shipping default).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densecap_tpu.models.vgg16 import conv1_1_s2d, conv2d_same


@pytest.mark.parametrize("hw", [(16, 16), (17, 13), (32, 18), (15, 16)])
def test_s2d_matches_plain_conv(hw):
    H, W = hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
    }
    ref = jax.jit(lambda a, b: conv2d_same(a, b, jnp.float32))(x, p)
    got = jax.jit(lambda a, b: conv1_1_s2d(a, b, jnp.float32))(x, p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_block_aligned_crop_equality():
    """A block-aligned crop run must equal the canvas run EXACTLY on the
    valid region when the canvas is zero outside the crop — the property
    the per-conv extent masking relies on."""
    rng = np.random.RandomState(1)
    S, h, w = 32, 19, 13
    img = rng.randn(h, w, 3).astype(np.float32)
    canvas = np.zeros((S, S, 3), np.float32)
    canvas[:h, :w] = img
    p = {
        "w": jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
    }
    f = jax.jit(lambda a, b: conv1_1_s2d(a, b, jnp.float32))
    y_canvas = np.asarray(f(jnp.asarray(canvas[None]), p))[0]
    y_crop = np.asarray(f(jnp.asarray(img[None]), p))[0]
    # interior rows/cols (not reading past the crop) must be BIT equal
    np.testing.assert_array_equal(y_canvas[:h - 1, :w - 1],
                                  y_crop[:h - 1, :w - 1])
