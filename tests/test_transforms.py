"""Box transform + anchor tests, incl. numeric gradient checks
(mirroring the reference's gradcheck-based module tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from densecap_tpu.ops.transforms import (
    DENSECAP_ANCHORS,
    VGG16_FIELD_CENTERS,
    apply_box_transform,
    invert_box_transform,
    make_anchors,
    reshape_box_features,
)


def test_apply_identity():
    boxes = jnp.array([[10.0, 20.0, 5.0, 8.0]])
    out = apply_box_transform(boxes, jnp.zeros((1, 4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(boxes))


def test_apply_known_values():
    boxes = jnp.array([[10.0, 20.0, 4.0, 2.0]])
    trans = jnp.array([[0.5, -1.0, jnp.log(2.0), jnp.log(0.5)]])
    out = apply_box_transform(boxes, trans)
    np.testing.assert_allclose(
        np.asarray(out), [[12.0, 18.0, 8.0, 1.0]], rtol=1e-6
    )


def test_invert_is_inverse_of_apply():
    rng = np.random.RandomState(0)
    anchors = np.abs(rng.randn(20, 4)) + 1.0
    trans = rng.randn(20, 4) * 0.5
    targets = apply_box_transform(jnp.asarray(anchors), jnp.asarray(trans))
    rec = invert_box_transform(jnp.asarray(anchors), targets)
    np.testing.assert_allclose(np.asarray(rec), trans, rtol=1e-5, atol=1e-5)


def _numeric_grad(f, x, eps=1e-4):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy()
        xp[i] += eps
        xm = x.copy()
        xm[i] -= eps
        g[i] = (f(xp) - f(xm)) / (2 * eps)
        it.iternext()
    return g


def test_apply_gradcheck():
    rng = np.random.RandomState(1)
    boxes = np.abs(rng.randn(5, 4)) + 1.0
    trans = rng.randn(5, 4) * 0.3
    w = rng.randn(5, 4)  # random cotangent

    def loss_b(b):
        return float(
            jnp.sum(apply_box_transform(jnp.asarray(b), jnp.asarray(trans)) * w)
        )

    def loss_t(t):
        return float(
            jnp.sum(apply_box_transform(jnp.asarray(boxes), jnp.asarray(t)) * w)
        )

    gb = jax.grad(
        lambda b: jnp.sum(apply_box_transform(b, jnp.asarray(trans)) * w)
    )(jnp.asarray(boxes, dtype=jnp.float64))
    gt = jax.grad(
        lambda t: jnp.sum(apply_box_transform(jnp.asarray(boxes), t) * w)
    )(jnp.asarray(trans, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(gb), _numeric_grad(loss_b, boxes),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), _numeric_grad(loss_t, trans),
                               rtol=1e-3, atol=1e-4)


def test_invert_gradcheck():
    rng = np.random.RandomState(2)
    anchors = np.abs(rng.randn(4, 4)) + 1.0
    targets = np.abs(rng.randn(4, 4)) + 1.0
    w = rng.randn(4, 4)

    def loss_a(a):
        return float(
            jnp.sum(invert_box_transform(jnp.asarray(a), jnp.asarray(targets)) * w)
        )

    ga = jax.grad(
        lambda a: jnp.sum(invert_box_transform(a, jnp.asarray(targets)) * w)
    )(jnp.asarray(anchors, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(ga), _numeric_grad(loss_a, anchors),
                               rtol=1e-3, atol=1e-4)


def test_make_anchors_grid():
    anchors = jnp.array([[10.0, 20.0], [30.0, 40.0]])
    out = make_anchors(2, 3, anchors, field_centers=(8.5, 8.5, 16.0, 16.0))
    assert out.shape == (2, 2, 3, 4)
    # anchor 0 at cell (0,0): centered at field center (8.5, 8.5)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [8.5, 8.5, 10, 20])
    # anchor 1 at cell (1,2): x = 8.5 + 2*16, y = 8.5 + 16
    np.testing.assert_allclose(np.asarray(out[1, 1, 2]), [40.5, 24.5, 30, 40])


def test_vgg_field_centers():
    # 4 stride-2 pools: x0 = 1 + 1/2 + 1 + 2 + 4 = 8.5, stride 16
    assert VGG16_FIELD_CENTERS == (8.5, 8.5, 16.0, 16.0)
    assert len(DENSECAP_ANCHORS) == 12


def test_reshape_box_features_ordering():
    # build (H, W, D*k) where channel c = a*D + d encodes (anchor, dim)
    H, W, k, D = 2, 3, 2, 4
    x = np.zeros((H, W, k * D), dtype=np.float32)
    for y in range(H):
        for xx in range(W):
            for a in range(k):
                for d in range(D):
                    x[y, xx, a * D + d] = 1000 * a + 100 * y + 10 * xx + d
    out = np.asarray(reshape_box_features(jnp.asarray(x), k))
    assert out.shape == (k * H * W, D)
    # order must be anchor-major then row-major over cells
    # (MakeAnchors/ReshapeBoxFeatures flattening)
    i = 0
    for a in range(k):
        for y in range(H):
            for xx in range(W):
                np.testing.assert_allclose(
                    out[i], [1000 * a + 100 * y + 10 * xx + d for d in range(D)]
                )
                i += 1
