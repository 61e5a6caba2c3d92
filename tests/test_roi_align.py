"""RoI align tests: fast vs naive parity (the reference's
BatchBilinearSamplerBHWD_test pattern), grid-convention goldens, and
gradient flow into boxes and features."""

import jax
import jax.numpy as jnp
import numpy as np

from densecap_tpu.ops.roi_align import (
    roi_align,
    roi_align_mxu,
    roi_align_naive,
)


def test_fast_matches_naive():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(12, 16, 8).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(20, 200, 10),
                rng.uniform(20, 150, 10),
                rng.uniform(5, 100, 10),
                rng.uniform(5, 80, 10),
            ],
            axis=1,
        ).astype(np.float32)
    )
    a = roi_align(feats, boxes, 192.0, 256.0, 7, 7)
    b = roi_align_naive(feats, boxes, 192.0, 256.0, 7, 7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_mxu_formulation_matches_gather():
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(11, 13, 6).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(-20, 230, 12),   # includes out-of-image boxes
                rng.uniform(-20, 180, 12),
                rng.uniform(1, 120, 12),
                rng.uniform(1, 90, 12),
            ],
            axis=1,
        ).astype(np.float32)
    )
    a = roi_align(feats, boxes, 176.0, 208.0, 7, 7)
    b = roi_align_mxu(feats, boxes, 176.0, 208.0, 7, 7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)


def test_mxu_formulation_cropped_extent():
    rng = np.random.RandomState(5)
    full = rng.randn(10, 10, 4).astype(np.float32)
    crop_h, crop_w = 7, 9
    boxes = jnp.array([[30.0, 25.0, 20.0, 18.0], [10.0, 10.0, 8.0, 8.0]])
    a = roi_align_mxu(jnp.asarray(full), boxes, 70.0, 90.0, 7, 7,
                      feat_h=crop_h, feat_w=crop_w)
    b = roi_align(jnp.asarray(full[:crop_h, :crop_w]), boxes, 70.0, 90.0,
                  7, 7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_full_image_box_recovers_grid():
    """A box covering the whole image samples the whole feature map.

    With the reference grid convention, the box (xc, yc, w, h) =
    ((W+1)/2, (H+1)/2, W, H) has normalized center 0 and scale 1 so the
    sampling grid is linspace(-1, 1) over the full map; with out size ==
    feature size that's exactly the feature grid points.
    """
    H, W = 6, 6
    feats = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W, 1)
    img_h, img_w = 48.0, 48.0
    box = jnp.array([[(img_w + 1) / 2, (img_h + 1) / 2, img_w, img_h]])
    out = roi_align(feats, box, img_h, img_w, H, W)
    np.testing.assert_allclose(np.asarray(out[0, :, :, 0]),
                               np.asarray(feats[:, :, 0]), rtol=1e-5)


def test_point_box_samples_center():
    # tiny box at image center: all samples ~ the center feature value
    H, W = 5, 5
    feats = jnp.zeros((H, W, 1)).at[2, 2, 0].set(42.0)
    img_h = img_w = 40.0
    # image center pixel = (img+1)/2 = 20.5 -> normalized 0 -> feature
    # coord (0+1)*(5-1)/2 = 2.0 exactly the center cell
    box = jnp.array([[20.5, 20.5, 1e-3, 1e-3]])
    out = roi_align(feats, box, img_h, img_w, 3, 3)
    np.testing.assert_allclose(np.asarray(out), 42.0 * np.ones((1, 3, 3, 1)),
                               rtol=1e-4)


def test_cropped_extent_on_padded_canvas():
    """Padded canvas + cropped extent == running on the cropped map."""
    rng = np.random.RandomState(3)
    full = rng.randn(10, 10, 4).astype(np.float32)
    crop_h, crop_w = 7, 9
    padded = jnp.asarray(full)
    cropped = jnp.asarray(full[:crop_h, :crop_w])
    boxes = jnp.array([[30.0, 25.0, 20.0, 18.0], [10.0, 10.0, 8.0, 8.0]])
    a = roi_align(padded, boxes, 70.0, 90.0, 7, 7,
                  feat_h=crop_h, feat_w=crop_w)
    b = roi_align(cropped, boxes, 70.0, 90.0, 7, 7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_grads_flow_into_boxes_and_feats():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(8, 8, 3).astype(np.float32))
    boxes = jnp.array([[30.0, 30.0, 20.0, 24.0]])

    def loss(f, b):
        return jnp.sum(roi_align(f, b, 64.0, 64.0, 7, 7) ** 2)

    gf, gb = jax.grad(loss, argnums=(0, 1))(feats, boxes)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gb)).all()
    assert float(jnp.abs(gf).sum()) > 0
    assert float(jnp.abs(gb).sum()) > 0


def test_boxes_gradcheck_numeric():
    # bilinear sampling is only piecewise differentiable: the analytic
    # gradient is correct away from integer sample positions (knots), so
    # pick an irregular box and verify no sample coordinate sits on one
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(9, 9, 2).astype(np.float64))
    boxes0 = np.array([[33.37, 37.71, 22.29, 17.93]])
    img_h, img_w = 71.0, 73.0
    w = rng.randn(1, 5, 5, 2)

    from densecap_tpu.ops.roi_align import _sample_coords

    yf, xf = _sample_coords(jnp.asarray(boxes0), img_h, img_w, 9, 9, 5, 5)
    for pos in (np.asarray(yf), np.asarray(xf)):
        assert (np.abs(pos - np.round(pos)) > 1e-3).all(), "knot hit"

    def loss_np(b):
        return float(
            jnp.sum(roi_align(feats, jnp.asarray(b), img_h, img_w, 5, 5) * w)
        )

    g = jax.grad(
        lambda b: jnp.sum(roi_align(feats, b, img_h, img_w, 5, 5) * w)
    )(jnp.asarray(boxes0))
    eps = 1e-5
    for j in range(4):
        bp = boxes0.copy()
        bp[0, j] += eps
        bm = boxes0.copy()
        bm[0, j] -= eps
        num = (loss_np(bp) - loss_np(bm)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, j]), num, rtol=1e-3, atol=1e-5)


def test_mxu_grads_match_gather():
    """The MXU einsum formulation (the TPU train default,
    cli/train.py --roi_align auto) must produce the same gradients as
    the gather path — into feats AND boxes."""
    from densecap_tpu.ops.roi_align import roi_align, roi_align_mxu

    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(9, 11, 6).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(20, 120, 5),
                rng.uniform(20, 100, 5),
                rng.uniform(8, 70, 5),
                rng.uniform(8, 60, 5),
            ],
            axis=1,
        ).astype(np.float32)
    )
    w = jnp.asarray(rng.randn(5, 7, 7, 6).astype(np.float32))

    def loss(fn):
        return lambda f, b: jnp.sum(fn(f, b, 130.0, 150.0, 7, 7) * w)

    gf_ref, gb_ref = jax.grad(loss(roi_align), argnums=(0, 1))(feats, boxes)
    gf_mxu, gb_mxu = jax.grad(loss(roi_align_mxu), argnums=(0, 1))(
        feats, boxes)
    np.testing.assert_allclose(np.asarray(gf_mxu), np.asarray(gf_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_mxu), np.asarray(gb_ref),
                               rtol=1e-4, atol=1e-4)
