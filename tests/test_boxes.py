"""Geometry core golden tests.

Fixture values mirror the reference unit tests (test/nms_test.lua,
test/BoxSampler_test.lua) and hand-computed cases.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from densecap_tpu.ops import boxes as B


def test_xcycwh_roundtrip():
    b = jnp.array([[5.0, 10.0, 3.0, 7.0], [1.0, 1.0, 1.0, 1.0]])
    xyxy = B.xcycwh_to_x1y1x2y2(b)
    np.testing.assert_allclose(
        np.asarray(xyxy), [[4.0, 7.0, 6.0, 13.0], [1.0, 1.0, 1.0, 1.0]]
    )
    back = B.x1y1x2y2_to_xcycwh(xyxy)
    # x1y1x2y2_to_xcycwh uses the w = x1-x0 convention (no +1), matching
    # the reference's asymmetric pair (box_utils.lua:288 vs :402)
    np.testing.assert_allclose(
        np.asarray(back), [[5.0, 10.0, 2.0, 6.0], [1.0, 1.0, 0.0, 0.0]]
    )


def test_xywh_roundtrip():
    b = jnp.array([[2.0, 3.0, 4.0, 5.0]])
    xyxy = B.xywh_to_x1y1x2y2(b)
    np.testing.assert_allclose(np.asarray(xyxy), [[2.0, 3.0, 5.0, 7.0]])
    back = B.x1y1x2y2_to_xywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b))


def test_iou_cwh_identical_and_disjoint():
    b1 = jnp.array([[0.0, 0.0, 4.0, 4.0]])
    b2 = jnp.array([[0.0, 0.0, 4.0, 4.0], [100.0, 100.0, 2.0, 2.0]])
    iou = B.iou_cwh(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), [[1.0, 0.0]])


def test_iou_cwh_reference_goldens():
    # test/BoxIoU_test.lua:13-24 and :40-61 fixtures
    b1 = jnp.array([[10.0, 10.0, 10.0, 10.0]])
    b2 = jnp.array([[15.0, 15.0, 10.0, 10.0]])
    np.testing.assert_allclose(
        np.asarray(B.iou_cwh(b1, b2)), [[25.0 / 175.0]], rtol=1e-6
    )
    b1 = jnp.array([[2.0, 4.0, 2.0, 6.0], [5.0, 7.5, 2.0, 5.0]])
    b2 = jnp.array(
        [[5.0, 8.0, 4.0, 2.0], [4.5, 4.5, 5.0, 3.0], [4.5, 0.0, 5.0, 4.0]]
    )
    want = np.array(
        [[0.0, 3.0 / 24.0, 1.0 / 31.0], [4.0 / 14.0, 2.0 / 23.0, 0.0]]
    )
    np.testing.assert_allclose(np.asarray(B.iou_cwh(b1, b2)), want, rtol=1e-6)


def test_iou_pascal_plus_one():
    # identical integer boxes -> 1; unit boxes (x1==x2) have area 1
    b = jnp.array([[1.0, 1.0, 1.0, 1.0], [1.0, 1.0, 2.0, 2.0]])
    iou = B.iou_pascal(b, b)
    # box0 area 1, box1 area 4, inter(0,1) = 1 -> iou 1/4
    np.testing.assert_allclose(
        np.asarray(iou), [[1.0, 0.25], [0.25, 1.0]], rtol=1e-6
    )


def test_clip_boxes_xyxy():
    bb = jnp.array(
        [
            [-5.0, -5.0, 10.0, 10.0],   # straddles -> clipped, valid
            [20.0, 20.0, 30.0, 30.0],   # fully outside (max 16) -> invalid
            [2.0, 2.0, 8.0, 8.0],       # inside -> untouched
        ]
    )
    bounds = dict(x_min=1, y_min=1, x_max=16, y_max=16)
    clipped, valid = B.clip_boxes(bb, bounds, "x1y1x2y2")
    np.testing.assert_allclose(
        np.asarray(clipped),
        [[1.0, 1.0, 10.0, 10.0], [15.0, 15.0, 16.0, 16.0], [2.0, 2.0, 8.0, 8.0]],
    )
    # note: fully-outside box clamps to a 1px sliver at the border and is
    # still x2 > x1, so the reference's validity rule marks it VALID;
    # replicate exactly (box_utils.lua:505-512)
    assert list(np.asarray(valid)) == [True, True, True]


def test_clip_boxes_invalid_when_degenerate():
    # a box whose x1 clamps to x_max-1 and x2 to x_min+1 can invert
    bb = jnp.array([[10.0, 5.0, 2.0, 8.0]])  # x1 > x2 on purpose
    bounds = dict(x_min=1, y_min=1, x_max=8, y_max=8)
    clipped, valid = B.clip_boxes(bb, bounds, "x1y1x2y2")
    assert not bool(valid[0])


def test_merge_boxes_groups():
    boxes = np.array(
        [
            [1, 1, 10, 10],
            [1, 1, 10, 11],     # overlaps box0 heavily
            [50, 50, 60, 60],
            [51, 50, 60, 60],   # overlaps box2 heavily
            [100, 100, 105, 105],
        ],
        dtype=np.float64,
    )
    groups = B.merge_boxes(boxes, 0.7)
    gsets = sorted([sorted(g.tolist()) for g in groups])
    assert gsets == [[0, 1], [2, 3], [4]]


def test_scale_boxes_xywh():
    b = jnp.array([[1.0, 1.0, 10.0, 10.0]])
    out = B.scale_boxes_xywh(b, 0.5)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 1.0, 5.0, 5.0]])


def test_eval_box_recall_smoke():
    boxes = jnp.array([[5.0, 5.0, 4.0, 4.0]] * 150)
    gt = jnp.array([[5.0, 5.0, 4.0, 4.0], [50.0, 50.0, 4.0, 4.0]])
    stats = B.eval_box_recall(boxes, gt)
    assert stats["0.50_recall_at_100"] == pytest.approx(0.5)


def test_clip_boxes_xcycwh_reference_golden():
    """Input fixture from test/clip_boxes_test.lua:9-45.

    NOTE: like BoxIoU, the reference's clip test is stale — it expects
    the w/2 corner conversion while live box_utils.lua uses (w-1)/2
    with an asymmetric inverse (x1y1x2y2_to_xcycwh has no +1), which
    also shrinks every box by 1 in w/h through the round trip and keeps
    1px border slivers "valid". We match the LIVE code (what the
    released model executes); expectations below are live-code
    semantics, hand-derived.
    """
    boxes = jnp.array(
        [
            [0.5, 8.5, 7, 5],
            [3.5, -0.5, 9, 7],
            [9.5, 14.5, 7, 5],
            [9, 7, 4, 4],
            [11, 1.5, 2, 3],
            [13, 1.5, 2, 2],    # oob x -> sliver
            [1, 16, 3, 1],      # oob y -> sliver
            [-5, 1, 3, 1],      # oob x, h collapses -> invalid
            [-5, -6, 3, 1],     # oob both -> sliver
            [15, 16, 3, 1],     # oob both, other side -> sliver
        ],
        dtype=jnp.float64,
    )
    bounds = dict(x_min=0, x_max=12, y_min=0, y_max=15)
    clipped, valid = B.clip_boxes(boxes, bounds, "xcycwh")
    expected = np.array(
        [
            [1.75, 8.5, 3.5, 4.0],
            [3.75, 1.25, 7.5, 2.5],
            [9.25, 13.75, 5.5, 2.5],
            [9.0, 7.0, 3.0, 3.0],
            [11.0, 1.5, 1.0, 2.0],
            [11.5, 1.5, 1.0, 1.0],
            [1.0, 14.5, 2.0, 1.0],
            [0.5, 1.0, 1.0, 0.0],
            [0.5, 0.5, 1.0, 1.0],
            [11.5, 14.5, 1.0, 1.0],
        ]
    )
    np.testing.assert_allclose(np.asarray(clipped), expected)
    np.testing.assert_array_equal(
        np.asarray(valid),
        np.array([1, 1, 1, 1, 1, 1, 1, 0, 1, 1], dtype=bool),
    )


def test_xywh_x1y1x2y2_inverse_roundtrip():
    """test/box_conversion_test.lua: converting back and forth is stable."""
    rng = np.random.RandomState(0)
    boxes_xywh = rng.randn(100, 4)
    boxes_xywh[:, 2:] = np.abs(boxes_xywh[:, 2:])
    a = B.xywh_to_x1y1x2y2(jnp.asarray(boxes_xywh))
    b = B.x1y1x2y2_to_xywh(a)
    c = B.xywh_to_x1y1x2y2(b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b), boxes_xywh, atol=1e-6)
