"""Pallas kernel parity tests (interpret mode on CPU; the same kernels
compile for TPU — the pattern mirrors the reference's fast-vs-naive
sampler test, BatchBilinearSamplerBHWD_test.lua)."""

import jax.numpy as jnp
import numpy as np
import pytest

from densecap_tpu.ops.roi_align import roi_align


def test_roi_align_pallas_matches_jnp():
    from densecap_tpu.ops.pallas.roi_align_kernel import roi_align_pallas

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(12, 14, 8).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(10, 200, 11),
                rng.uniform(10, 170, 11),
                rng.uniform(4, 110, 11),
                rng.uniform(4, 100, 11),
            ],
            axis=1,
        ).astype(np.float32)
    )
    ref = roi_align(feats, boxes, 190.0, 220.0, 7, 7)
    got = roi_align_pallas(
        feats, boxes, 190.0, 220.0, 7, 7, tile_boxes=4, interpret=True,
        compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_roi_align_pallas_cropped_extent():
    from densecap_tpu.ops.pallas.roi_align_kernel import roi_align_pallas

    rng = np.random.RandomState(1)
    full = rng.randn(10, 10, 4).astype(np.float32)
    boxes = jnp.array([[30.0, 25.0, 20.0, 18.0], [10.0, 10.0, 8.0, 8.0]])
    ref = roi_align(jnp.asarray(full[:7, :9]), boxes, 70.0, 90.0, 7, 7)
    got = roi_align_pallas(
        jnp.asarray(full), boxes, 70.0, 90.0, 7, 7,
        feat_h=7, feat_w=9, tile_boxes=2, interpret=True,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_roi_align_pallas_padding_boxes():
    # B not divisible by tile_boxes
    from densecap_tpu.ops.pallas.roi_align_kernel import roi_align_pallas

    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(8, 8, 4).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(10, 100, 5),
                rng.uniform(10, 100, 5),
                rng.uniform(4, 60, 5),
                rng.uniform(4, 60, 5),
            ],
            axis=1,
        ).astype(np.float32)
    )
    ref = roi_align(feats, boxes, 128.0, 128.0, 7, 7)
    got = roi_align_pallas(feats, boxes, 128.0, 128.0, 7, 7,
                           tile_boxes=4, interpret=True,
                           compute_dtype=jnp.float32)
    assert got.shape == (5, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_roi_align_pallas_bf16_close():
    """The serving-default bf16 contractions stay within bf16 rounding
    of the f32 reference (relative ~1e-2; the rest of the test path
    already computes in bf16 so this adds no new error class)."""
    from densecap_tpu.ops.pallas.roi_align_kernel import roi_align_pallas

    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(12, 14, 8).astype(np.float32))
    boxes = jnp.asarray(
        np.stack(
            [
                rng.uniform(10, 200, 23),
                rng.uniform(10, 170, 23),
                rng.uniform(4, 110, 23),
                rng.uniform(4, 100, 23),
            ],
            axis=1,
        ).astype(np.float32)
    )
    ref = roi_align(feats, boxes, 190.0, 220.0, 7, 7)
    got = roi_align_pallas(feats, boxes, 190.0, 220.0, 7, 7,
                           interpret=True)  # default bf16, TB=18
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.03 * scale)


def test_nms_pallas_matches_jnp():
    import jax.numpy as jnp

    from densecap_tpu.ops.nms import nms
    from densecap_tpu.ops.pallas.nms_kernel import nms_pallas

    rng = np.random.RandomState(0)
    for trial in range(3):
        n = 300
        xy = rng.uniform(1, 100, size=(n, 2))
        wh = rng.uniform(1, 60, size=(n, 2))
        boxes = jnp.asarray(
            np.concatenate([xy, xy + wh], axis=1).astype(np.float32))
        scores = jnp.asarray(rng.permutation(n).astype(np.float32))
        for thresh in (0.5, 0.7):
            ref_i, ref_v = nms(boxes, scores, thresh, 60)
            got_i, got_v = nms_pallas(boxes, scores, thresh, 60,
                                      tile_size=64, chunk=128,
                                      interpret=True)
            np.testing.assert_array_equal(np.asarray(got_v),
                                          np.asarray(ref_v))
            np.testing.assert_array_equal(np.asarray(got_i),
                                          np.asarray(ref_i))


def test_nms_pallas_valid_mask():
    import jax.numpy as jnp

    from densecap_tpu.ops.nms import nms
    from densecap_tpu.ops.pallas.nms_kernel import nms_pallas

    rng = np.random.RandomState(1)
    n = 100
    xy = rng.uniform(1, 60, size=(n, 2))
    wh = rng.uniform(1, 40, size=(n, 2))
    boxes = jnp.asarray(
        np.concatenate([xy, xy + wh], axis=1).astype(np.float32))
    scores = jnp.asarray(rng.permutation(n).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) > 0.3)
    ref_i, ref_v = nms(boxes, scores, 0.5, 40, valid=valid)
    got_i, got_v = nms_pallas(boxes, scores, 0.5, 40, valid=valid,
                              tile_size=32, chunk=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
