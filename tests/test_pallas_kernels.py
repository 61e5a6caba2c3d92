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
        feats, boxes, 190.0, 220.0, 7, 7, tile_boxes=4, interpret=True
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
                           tile_boxes=4, interpret=True)
    assert got.shape == (5, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
