"""Geometry core: box coordinate conversions, IoU, clipping, merging.

Pure-jnp re-design of the reference geometry library
(reference: densecap/box_utils.lua, densecap/modules/BoxIoU.lua).

All functions are shape-polymorphic over leading dims, jit-safe, and
differentiable where meaningful. Coordinates follow the reference's
1-indexed image-pixel convention.

The reference uses TWO different IoU conventions and we keep both:

1. "continuous" convention (reference BoxIoU.lua): boxes given as
   (xc, yc, w, h); area = w*h; corners at xc +/- w/2; intersection
   width is (x1-x0) with NO +1, so identical boxes have IoU exactly 1.
   Used by the train-time BoxSampler and box recall eval.
   NOTE: the reference's BoxIoU.lua at HEAD calls
   box_utils.xcycwh_to_x1y1x2y2 (a (w-1)/2 corner offset) while its own
   unit tests (test/BoxIoU_test.lua, test/BoxSampler_test.lua goldens)
   require the w/2 offset of the commented-out local convert_boxes
   (BoxIoU.lua:16-37) — the live code drifted from its tests. We follow
   the test goldens / the mathematically standard w/2 form.

2. "pascal" convention (reference box_utils.lua:154-256 nms,
   box_utils.lua:565 iou_matrix): boxes given as integer-style
   (x1, y1, x2, y2); area = (x2-x1+1)*(y2-y1+1); intersection width
   (xx2-xx1+1), clamped at 0. Used by NMS and the mAP evaluator.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Coordinate conversions (reference box_utils.lua:270-445)
# ---------------------------------------------------------------------------

def xcycwh_to_x1y1x2y2(boxes):
    """(xc, yc, w, h) -> (x1, y1, x2, y2), reference box_utils.lua:270.

    Uses the (w-1)/2 offset so that integer boxes round-trip in the
    1-indexed inclusive-pixel convention.
    """
    xc, yc, w, h = jnp.split(boxes, 4, axis=-1)
    x0 = xc - (w - 1) / 2.0
    x1 = xc + (w - 1) / 2.0
    y0 = yc - (h - 1) / 2.0
    y1 = yc + (h - 1) / 2.0
    return jnp.concatenate([x0, y0, x1, y1], axis=-1)


def x1y1x2y2_to_xcycwh(boxes):
    """(x1, y1, x2, y2) -> (xc, yc, w, h), reference box_utils.lua:382."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    xc = (x0 + x1) / 2.0
    yc = (y0 + y1) / 2.0
    w = x1 - x0
    h = y1 - y0
    return jnp.concatenate([xc, yc, w, h], axis=-1)


def xywh_to_x1y1x2y2(boxes):
    """(x, y, w, h) -> (x1, y1, x2, y2), reference box_utils.lua:311."""
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w - 1, y + h - 1], axis=-1)


def x1y1x2y2_to_xywh(boxes):
    """(x1, y1, x2, y2) -> (x, y, w, h), reference box_utils.lua:351."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x1 - x0 + 1, y1 - y0 + 1], axis=-1)


def xywh_to_xcycwh(boxes):
    """(x, y, w, h) -> (xc, yc, w, h), reference box_utils.lua:412.

    NOTE: the reference adds floor(w/2) via integer-truncating torch.div
    only for integer tensors; for float tensors torch.div is exact. We use
    exact division (float path), matching DataLoader use on float boxes.
    """
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x + w / 2.0, y + h / 2.0, w, h], axis=-1)


def xcycwh_to_xywh(boxes):
    """(xc, yc, w, h) -> (x, y, w, h), reference box_utils.lua:441."""
    return x1y1x2y2_to_xywh(xcycwh_to_x1y1x2y2(boxes))


def scale_boxes_xywh(boxes, frac):
    """Rescale (x, y, w, h) boxes between image scales.

    Reference box_utils.lua:459: moves x,y to 0-based, scales everything
    by `frac`, moves back to 1-based.
    """
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x - 1) * frac + 1, (y - 1) * frac + 1, w * frac, h * frac], axis=-1
    )


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------

def _cwh_corners(boxes):
    """xcycwh -> corners at xc +/- w/2 (continuous IoU convention)."""
    xc, yc, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [xc - w / 2.0, yc - h / 2.0, xc + w / 2.0, yc + h / 2.0], axis=-1
    )


def iou_cwh(boxes1, boxes2):
    """Pairwise IoU between (..., B1, 4) and (..., B2, 4) xcycwh boxes.

    Continuous convention of reference modules/BoxIoU.lua (as pinned by
    its unit tests — see module docstring note on the live-code drift):
    area = w * h; corner coords at xc +/- w/2; intersection width is
    (min_x1 - max_x0) clamped at 0, with NO +1. Identical boxes -> 1.

    Returns (..., B1, B2).
    """
    area1 = boxes1[..., 2] * boxes1[..., 3]  # (..., B1)
    area2 = boxes2[..., 2] * boxes2[..., 3]  # (..., B2)
    b1 = _cwh_corners(boxes1)[..., :, None, :]  # (..., B1, 1, 4)
    b2 = _cwh_corners(boxes2)[..., None, :, :]  # (..., 1, B2, 4)
    x0 = jnp.maximum(b1[..., 0], b2[..., 0])
    y0 = jnp.maximum(b1[..., 1], b2[..., 1])
    x1 = jnp.minimum(b1[..., 2], b2[..., 2])
    y1 = jnp.minimum(b1[..., 3], b2[..., 3])
    iw = jnp.maximum(x1 - x0, 0.0)
    ih = jnp.maximum(y1 - y0, 0.0)
    inter = iw * ih
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / union


def iou_pascal(boxes1, boxes2):
    """Pairwise IoU between (..., B1, 4) and (..., B2, 4) x1y1x2y2 boxes.

    Pascal +1 convention of reference box_utils.lua:154-256 (nms) and
    box_utils.lua:565 (iou_matrix): area = (x2-x1+1)*(y2-y1+1),
    intersection width (xx2-xx1+1) clamped at 0.

    Returns (..., B1, B2).
    """
    b1 = boxes1[..., :, None, :]
    b2 = boxes2[..., None, :, :]
    area1 = (boxes1[..., 2] - boxes1[..., 0] + 1.0) * (
        boxes1[..., 3] - boxes1[..., 1] + 1.0
    )
    area2 = (boxes2[..., 2] - boxes2[..., 0] + 1.0) * (
        boxes2[..., 3] - boxes2[..., 1] + 1.0
    )
    xx1 = jnp.maximum(b1[..., 0], b2[..., 0])
    yy1 = jnp.maximum(b1[..., 1], b2[..., 1])
    xx2 = jnp.minimum(b1[..., 2], b2[..., 2])
    yy2 = jnp.minimum(b1[..., 3], b2[..., 3])
    iw = jnp.maximum(xx2 - xx1 + 1.0, 0.0)
    ih = jnp.maximum(yy2 - yy1 + 1.0, 0.0)
    inter = iw * ih
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / union


# ---------------------------------------------------------------------------
# Clipping (reference box_utils.lua:486-523)
# ---------------------------------------------------------------------------

def clip_boxes(boxes, bounds, fmt):
    """Clip boxes to image bounds; return (clipped, valid_mask).

    bounds: dict with x_min, y_min, x_max, y_max (1-indexed inclusive
    image extent; typically x_min=y_min=1, x_max=W, y_max=H). May be
    python scalars or traced jnp scalars (dynamic image sizes under jit).

    fmt: 'x1y1x2y2' | 'xcycwh' | 'xywh'.

    Matches reference box_utils.lua:486: clamps x1 to [x_min, x_max-1],
    x2 to [x_min+1, x_max] (same for y), then marks boxes valid when
    x2 > x1 and y2 > y1 after clamping. Unlike the reference, we do NOT
    compact valid boxes — callers carry the mask (fixed shapes on TPU).
    """
    if fmt == "x1y1x2y2":
        bb = boxes
    elif fmt == "xcycwh":
        bb = xcycwh_to_x1y1x2y2(boxes)
    elif fmt == "xywh":
        bb = xywh_to_x1y1x2y2(boxes)
    else:
        raise ValueError(f"Unrecognized box format {fmt!r}")

    x_min, x_max = bounds["x_min"], bounds["x_max"]
    y_min, y_max = bounds["y_min"], bounds["y_max"]
    x0 = jnp.clip(bb[..., 0], x_min, x_max - 1)
    y0 = jnp.clip(bb[..., 1], y_min, y_max - 1)
    x1 = jnp.clip(bb[..., 2], x_min + 1, x_max)
    y1 = jnp.clip(bb[..., 3], y_min + 1, y_max)
    clipped = jnp.stack([x0, y0, x1, y1], axis=-1)
    valid = (x1 > x0) & (y1 > y0)

    if fmt == "xcycwh":
        clipped = x1y1x2y2_to_xcycwh(clipped)
    elif fmt == "xywh":
        clipped = x1y1x2y2_to_xywh(clipped)
    return clipped, valid


# ---------------------------------------------------------------------------
# Evaluator-side helpers (numpy-friendly; used off the hot path)
# ---------------------------------------------------------------------------

def iou_matrix(boxes):
    """Symmetric NxN pascal-IoU matrix of x1y1x2y2 boxes.

    Vectorized equivalent of reference box_utils.lua:565-588 (which is an
    O(N^2) Lua loop). Diagonal is 1.
    """
    return iou_pascal(boxes, boxes)


def merge_boxes(boxes, thr):
    """Greedy clustering of x1y1x2y2 boxes by pascal IoU >= thr.

    Host-side (numpy) port of reference box_utils.lua:590-612, used by
    the mAP evaluator to merge overlapping ground-truth boxes. Returns a
    list of integer index arrays (0-indexed), one per group, in the same
    greedy order as the reference: repeatedly take the row with the most
    IoU>=thr partners and absorb them all.
    """
    import numpy as np

    assert thr > 0
    boxes = np.asarray(boxes, dtype=np.float64)
    if len(boxes) == 0:
        return []
    D = np.array(iou_matrix(boxes))  # writable copy
    ix = []
    while True:
        good = D >= thr
        good_sum = good.sum(axis=0)
        topix = int(np.argmax(good_sum))
        if good_sum[topix] == 0:
            break
        mergeix = np.nonzero(good[topix])[0]
        ix.append(mergeix)
        D[mergeix, :] = 0
        D[:, mergeix] = 0
    return ix


def eval_box_recall(boxes, gt_boxes, ns=(100, 200, 300),
                    iou_threshs=(0.5, 0.7, 0.9)):
    """Box recall@N at several IoU thresholds.

    Port of reference box_utils.lua:531-562. boxes and gt_boxes are
    (N,4)/(M,4) xcycwh; uses the continuous IoU convention (BoxIoU).
    Returns {f'{thr:.2f}_recall_at_{n}': recall}.
    """
    ious = iou_cwh(boxes, gt_boxes)  # N x M
    stats = {}
    M = gt_boxes.shape[0]
    for thr in iou_threshs:
        mask = ious > thr
        hit = jnp.cumsum(mask, axis=0) > 0  # N x M
        recalls = jnp.sum(hit, axis=1) / M  # N
        for n in ns:
            if n <= recalls.shape[0]:
                stats[f"{thr:.2f}_recall_at_{n}"] = float(recalls[n - 1])
    return stats
