"""Fused conv+relu+mask+pool+mask Pallas kernel parity tests
(interpret mode on CPU; the same kernel compiles for TPU).

Oracle: the unfused apply_trunk stage — conv2d_same -> ReLU ->
extent-mask -> max_pool_2x2 -> floor-halved extent-mask — which itself
is pinned to the reference trunk by the canvas==cropped and e2e
transliteration tests. Pattern mirrors the reference's fast-vs-naive
kernel test (BatchBilinearSamplerBHWD_test.lua:3-30).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densecap_tpu.models.vgg16 import (
    TRUNK1_CFG,
    _extent_mask,
    apply_trunk,
    conv2d_same,
    init_trunk,
    max_pool_2x2,
)
from densecap_tpu.ops.pallas.conv_pool_kernel import (
    can_fuse,
    fused_conv_relu_pool,
)


def _ref_stage(x, w, b, ext):
    """Unfused oracle: conv+bias+relu, extent mask, 2x2 pool, floor-
    halved extent mask — exactly apply_trunk's per-stage sequence."""
    N, H, W, C = x.shape
    y = jax.nn.relu(conv2d_same(x, {"w": w, "b": b}, jnp.float32))
    outs = []
    for i in range(N):
        eh, ew = float(ext[i, 0]), float(ext[i, 1])
        yi = y[i] * _extent_mask(H, W, eh, ew, y.dtype)
        yi = max_pool_2x2(yi[None])[0]
        yi = yi * _extent_mask(
            H // 2, W // 2, float(int(eh) // 2), float(int(ew) // 2),
            yi.dtype)
        outs.append(yi)
    return jnp.stack(outs)


def _rand_case(rng, N, H, W, C):
    x = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, C, C) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    return x, w, b


@pytest.mark.parametrize("C,H,W", [(64, 16, 12), (128, 8, 6)])
def test_fused_matches_unfused_full_extent(C, H, W):
    rng = np.random.RandomState(0)
    x, w, b = _rand_case(rng, 2, H, W, C)
    ext = np.tile([[H, W]], (2, 1)).astype(np.float32)
    ref = _ref_stage(x, w, b, ext)
    got = fused_conv_relu_pool(x, w, b, jnp.asarray(ext), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("C,H,W", [(64, 16, 12), (128, 16, 8)])
def test_fused_matches_unfused_ragged_extents(C, H, W):
    # odd AND even extents per image: odd extents exercise the post-pool
    # floor-halved re-mask (the pooled cell at floor(e/2) covers a
    # partial window of valid data and must be zeroed)
    rng = np.random.RandomState(1)
    N = 4
    x, w, b = _rand_case(rng, N, H, W, C)
    ext = np.asarray(
        [[H, W], [H - 3, W - 1], [H - 1, W - 3], [5, 4]], np.float32)
    ref = _ref_stage(x, w, b, ext)
    got = fused_conv_relu_pool(x, w, b, jnp.asarray(ext), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_post_pool_mask_zeroes_partial_windows():
    # regression for the ADVICE finding: with odd eh/ew the pooled cell
    # at floor(e/2) must be ZERO, exactly like apply_trunk's post-pool
    # mask, even though its window contains valid (nonzero) data
    rng = np.random.RandomState(2)
    H, W, C = 16, 12, 64
    x, w, b = _rand_case(rng, 1, H, W, C)
    # all-positive inputs/weights/bias: ReLU keeps every valid cell > 0
    x = jnp.abs(x) + 1.0
    w = jnp.abs(w)
    b = jnp.abs(b) + 1.0
    eh, ew = 13.0, 9.0            # odd extents
    got = fused_conv_relu_pool(
        x, w, b, jnp.asarray([[eh, ew]]), interpret=True)
    got = np.asarray(got)
    # valid pooled region: rows < 6, cols < 4
    assert np.all(got[0, 6:, :, :] == 0.0)
    assert np.all(got[0, :, 4:, :] == 0.0)
    assert np.all(got[0, :6, :4, :] > 0.0)


def test_fused_under_vmap_matches_native_batch():
    rng = np.random.RandomState(3)
    N, H, W, C = 3, 16, 8, 64
    x, w, b = _rand_case(rng, N, H, W, C)
    ext = jnp.asarray([[16.0, 8.0], [13.0, 5.0], [7.0, 8.0]])
    native = fused_conv_relu_pool(x, w, b, ext, interpret=True)
    vmapped = jax.vmap(
        lambda xi, ei: fused_conv_relu_pool(
            xi[None], w, b, ei[None], interpret=True)[0]
    )(x, ext)
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(native),
                               rtol=0, atol=0)


def test_fused_rejects_out_of_contract_shapes():
    x = jnp.zeros((1, 16, 12, 32), jnp.float32)   # C=32 unsupported
    w = jnp.zeros((3, 3, 32, 32), jnp.float32)
    b = jnp.zeros((32,), jnp.float32)
    assert not can_fuse(x.shape, w.shape)
    with pytest.raises(ValueError, match="unsupported geometry"):
        fused_conv_relu_pool(x, w, b, jnp.zeros((1, 2)), interpret=True)
    # odd W
    assert not can_fuse((1, 16, 13, 64), (3, 3, 64, 64))
    # H not a multiple of the row block
    assert not can_fuse((1, 12, 16, 64), (3, 3, 64, 64))
    # Cin != Cout (conv2_1-style widening convs never fuse)
    assert not can_fuse((1, 16, 16, 64), (3, 3, 64, 128))


def test_apply_trunk_fused_matches_unfused():
    # full TRUNK1_CFG (conv1_1, conv1_2+pool1 fused, conv2_1,
    # conv2_2+pool2 fused) with ragged odd extents
    rng = np.random.RandomState(4)
    key = jax.random.PRNGKey(0)
    params, _ = init_trunk(key, TRUNK1_CFG, 3)
    x = jnp.asarray(rng.randn(1, 16, 12, 3).astype(np.float32))
    ref = apply_trunk(params, TRUNK1_CFG, x, jnp.float32,
                      valid_h=13.0, valid_w=9.0)
    got = apply_trunk(params, TRUNK1_CFG, x, jnp.float32,
                      valid_h=13.0, valid_w=9.0,
                      fuse_conv_pool=True, fuse_interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # unmasked path too
    ref_u = apply_trunk(params, TRUNK1_CFG, x, jnp.float32)
    got_u = apply_trunk(params, TRUNK1_CFG, x, jnp.float32,
                        fuse_conv_pool=True, fuse_interpret=True)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=1e-5, atol=1e-5)


def test_fused_trunk_is_grad_safe_and_grads_match():
    # the fused stage stop-gradients its inputs (trunk1 is never
    # trained); jax.grad through the surrounding graph must trace
    # cleanly and trunk2-style downstream grads must match the unfused
    # path (same forward values feeding the differentiable tail)
    rng = np.random.RandomState(5)
    key = jax.random.PRNGKey(1)
    params, cout = init_trunk(key, TRUNK1_CFG, 3)
    head = jnp.asarray((rng.randn(cout) * 0.1).astype(np.float32))
    x = jnp.asarray(rng.randn(1, 16, 12, 3).astype(np.float32))

    def loss(hw, fuse):
        y = apply_trunk(params, TRUNK1_CFG, x, jnp.float32,
                        valid_h=13.0, valid_w=9.0,
                        fuse_conv_pool=fuse, fuse_interpret=True)
        y = jax.lax.stop_gradient(y)  # features() cuts here too
        return jnp.sum(y * hw)

    g_ref = jax.grad(loss)(head, False)
    g_fused = jax.grad(loss)(head, True)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
