"""Localization layer: RPN -> (clip/NMS | sampling) -> RoI align.

Functional re-design of reference densecap/LocalizationLayer.lua. The
reference's stateful module (setImageSize/setGroundTruth call-ordering
guards, LocalizationLayer.lua:167-186) becomes two pure functions:

  * localize_train — RPN, out-of-bounds exclusion, fixed-slot sampling,
    RoI align for 3*B/2 slots, mid losses (objectness CE + box-reg
    smooth-L1 with outlier masking) (_forward_train, :383-526).
  * localize_test — RPN, clip + validity mask (no compaction), softmax
    scores, fixed-K masked NMS, RoI align on the K survivors
    (_forward_test, :250-363).

All shapes are static; image size and gt are data. Everything vmaps over
a batch of images, removing the reference's N == 1 restriction
(LocalizationLayer.lua:396).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops.boxes import clip_boxes, xcycwh_to_x1y1x2y2
from ..ops.nms import nms
from ..ops.roi_align import roi_align
from ..ops.sampler import sample_rois
from ..ops.transforms import invert_box_transform
from .rpn import apply_rpn
from .vgg16 import feat_extent


class LocalizeTrainOut(NamedTuple):
    roi_feats: jax.Array     # (P+M, 7, 7, C) pooled features, pos first
    roi_boxes: jax.Array     # (P+M, 4) xcycwh
    pos_boxes: jax.Array     # (P, 4)
    pos_anchors: jax.Array   # (P, 4)
    pos_trans: jax.Array     # (P, 4)
    pos_valid: jax.Array     # (P,) bool
    neg_valid: jax.Array     # (M,) bool
    pos_target_boxes: jax.Array   # (P, 4) gt boxes for positives
    pos_target_labels: jax.Array  # (P, L) gt captions for positives
    num_pos: jax.Array       # () int32
    losses: dict             # mid_objectness / mid_box_reg / box_decay


class LocalizeTestOut(NamedTuple):
    roi_feats: jax.Array     # (K, 7, 7, C)
    roi_boxes: jax.Array     # (K, 4) xcycwh, NMS survivors by score
    roi_scores: jax.Array    # (K,) objectness probabilities
    roi_valid: jax.Array     # (K,) bool
    num_rois: jax.Array      # () int32


def _anchor_center_valid(feat_h, feat_w, num_anchors, fh_valid, fw_valid):
    """Mask over flattened k-major anchors whose RF centers lie on the
    cropped feature extent (padded-canvas columns/rows are dead)."""
    rows = jnp.arange(feat_h)[:, None] < fh_valid
    cols = jnp.arange(feat_w)[None, :] < fw_valid
    cell = rows & cols  # (H', W')
    return jnp.tile(cell.reshape(-1), num_anchors)


def localize_train(
    rpn_params,
    feats,            # (H', W', C) conv features (single image)
    img_h, img_w,     # dynamic scalars: true image size on the canvas
    gt_boxes,         # (G, 4) xcycwh
    gt_labels,        # (G, L) int tokens
    gt_valid,         # (G,) bool
    rng,              # PRNG key for the sampler
    cfg,              # DenseCapConfig
    anchor_sizes,     # (k, 2)
    debug_sampler=None,  # optional dict(pos=(P,), neg=(M,)) ordinal
                         # injection, see ops/sampler.sample_rois
) -> LocalizeTrainOut:
    Hf, Wf, _ = feats.shape
    fh_valid, fw_valid = feat_extent(img_h, img_w)
    center_ok = _anchor_center_valid(
        Hf, Wf, anchor_sizes.shape[0], fh_valid, fw_valid
    )
    rpn_out = apply_rpn(
        rpn_params, feats, anchor_sizes, cfg.field_centers,
        box_reg_decay=cfg.box_reg_decay, compute_dtype=cfg.compute_dtype,
        decay_mask=center_ok,
    )

    bounds = None
    if cfg.train_remove_outbounds_boxes:
        bounds = dict(x_min=1.0, y_min=1.0,
                      x_max=img_w.astype(jnp.float32)
                      if hasattr(img_w, "astype") else float(img_w),
                      y_max=img_h.astype(jnp.float32)
                      if hasattr(img_h, "astype") else float(img_h))

    # Padded-canvas anchors whose centers fall off the true image are
    # treated as out of bounds regardless (the reference never sees them
    # because it runs on the cropped image). Implement by pushing dead
    # anchors far out of bounds so both the bounds mask and IoU reject
    # them.
    boxes_eff = jnp.where(
        center_ok[:, None], rpn_out.boxes,
        jnp.array([-1e6, -1e6, 1.0, 1.0], dtype=rpn_out.boxes.dtype),
    )

    s = sample_rois(
        rng, boxes_eff, gt_boxes, gt_valid,
        batch_size=cfg.sampler_batch_size,
        low_thresh=cfg.sampler_low_thresh,
        high_thresh=cfg.sampler_high_thresh,
        bounds=bounds,
        candidate_mask=center_ok,  # padded-canvas anchors are never
                                   # eligible, even with bounds removal off
        debug_pos_sample_idx=(
            None if debug_sampler is None else debug_sampler["pos"]),
        debug_neg_sample_idx=(
            None if debug_sampler is None else debug_sampler["neg"]),
    )

    pos_boxes = rpn_out.boxes[s.pos_input_idx]
    pos_anchors = rpn_out.anchors[s.pos_input_idx]
    pos_trans = rpn_out.trans[s.pos_input_idx]
    pos_scores = rpn_out.scores[s.pos_input_idx]
    neg_boxes = rpn_out.boxes[s.neg_input_idx]
    neg_scores = rpn_out.scores[s.neg_input_idx]
    pos_target_boxes = gt_boxes[s.pos_target_idx]
    pos_target_labels = gt_labels[s.pos_target_idx]

    roi_boxes = jnp.concatenate([pos_boxes, neg_boxes], axis=0)
    if (cfg.roi_align_impl or "gather") == "mxu":
        # einsum formulation: backward is two more einsums instead of
        # the gather's scatter-add. f32 weights keep training numerics
        # identical to the gather path (same tent weights).
        from ..ops.roi_align import roi_align_mxu

        roi_feats = roi_align_mxu(
            feats, roi_boxes, img_h, img_w,
            cfg.output_height, cfg.output_width,
            feat_h=fh_valid, feat_w=fw_valid,
        )
    else:
        roi_feats = roi_align(
            feats, roi_boxes, img_h, img_w,
            cfg.output_height, cfg.output_width,
            feat_h=fh_valid, feat_w=fw_valid,
        )

    # --- mid losses ----------------------------------------------------
    # objectness CE: positives labeled class 0, negatives class 1 (the
    # reference uses 1/2 1-indexed, LocalizationLayer.lua:464-465)
    obj_pos = L.cross_entropy(
        pos_scores, jnp.zeros_like(s.pos_input_idx), s.pos_valid
    )
    obj_neg = L.cross_entropy(
        neg_scores, jnp.ones_like(s.neg_input_idx), s.neg_valid
    )
    mid_obj = cfg.mid_objectness_weight * (obj_pos + obj_neg)

    # RPN box regression vs inverted transforms, with the reference's
    # outlier masking (LocalizationLayer.lua:474-497)
    tt = invert_box_transform(pos_anchors, pos_target_boxes)
    pt_m, tt_m = L.masked_transform_pair(pos_trans, tt)
    mid_box = cfg.mid_box_reg_weight * L.smooth_l1(pt_m, tt_m, s.pos_valid)

    losses = {
        "mid_objectness_loss": mid_obj,
        "mid_box_reg_loss": mid_box,
        "box_decay_loss": rpn_out.box_decay_loss,
        # diagnostics (reference __GLOBAL_STATS__, utils.lua:139-143):
        # batch-mean rates of sampler anomalies + positive count
        "stats/num_pos": s.num_pos.astype(jnp.float32),
        "stats/sampler_no_negatives": s.no_negatives.astype(jnp.float32),
        "stats/sampler_neg_replaced": s.neg_replaced.astype(jnp.float32),
    }
    return LocalizeTrainOut(
        roi_feats=roi_feats,
        roi_boxes=roi_boxes,
        pos_boxes=pos_boxes,
        pos_anchors=pos_anchors,
        pos_trans=pos_trans,
        pos_valid=s.pos_valid,
        neg_valid=s.neg_valid,
        pos_target_boxes=pos_target_boxes,
        pos_target_labels=pos_target_labels,
        num_pos=s.num_pos,
        losses=losses,
    )


def localize_test(
    rpn_params,
    feats,            # (H', W', C)
    img_h, img_w,
    cfg,
    anchor_sizes,
    *,
    nms_thresh=None,
    max_proposals=None,
    clip=True,
) -> LocalizeTestOut:
    nms_thresh = cfg.test_rpn_nms_thresh if nms_thresh is None else nms_thresh
    K = cfg.test_max_proposals if max_proposals is None else max_proposals
    Hf, Wf, _ = feats.shape

    rpn_out = apply_rpn(
        rpn_params, feats, anchor_sizes, cfg.field_centers,
        compute_dtype=cfg.compute_dtype,
    )

    fh_valid, fw_valid = feat_extent(img_h, img_w)
    valid = _anchor_center_valid(
        Hf, Wf, anchor_sizes.shape[0], fh_valid, fw_valid
    )

    boxes = rpn_out.boxes
    if clip:
        bounds = dict(x_min=1.0, y_min=1.0, x_max=img_w, y_max=img_h)
        boxes, clip_valid = clip_boxes(boxes, bounds, "xcycwh")
        valid = valid & clip_valid

    # objectness softmax: p(box) from the 2-class scores
    # (LocalizationLayer.lua:304-308)
    probs = jax.nn.softmax(rpn_out.scores, axis=-1)[:, 0]

    if cfg.use_pallas_nms:
        from ..ops.pallas.nms_kernel import nms_pallas as nms_fn
    else:
        nms_fn = nms

    # optional pre-NMS top-k (see config.test_pre_nms_topk)
    pre_k = cfg.test_pre_nms_topk
    if 0 < pre_k < boxes.shape[0]:
        masked = jnp.where(valid, probs, -jnp.inf)
        # full sort_key_val + slice instead of lax.top_k: measured 1.46
        # vs 1.94 ms at B=8 x 24300 -> 6000 on v5e (doc/BENCH.md); both
        # are stable (ties in original-index order), identical output.
        neg_sorted, sorted_idx = jax.lax.sort_key_val(
            -masked, jnp.arange(masked.shape[0], dtype=jnp.int32))
        top_scores = -neg_sorted[:pre_k]
        top_idx = sorted_idx[:pre_k]
        nms_boxes = boxes[top_idx]
        nms_valid = top_scores > -jnp.inf
        # descending-sorted with invalid (-inf) at the tail -> the exact
        # NMS can skip its internal re-sort (presorted); the Pallas
        # variant has no such knob and re-sorts
        kw = {} if cfg.use_pallas_nms else {"presorted": True}
        sub_idx, roi_valid = nms_fn(
            xcycwh_to_x1y1x2y2(nms_boxes), top_scores, nms_thresh, K,
            valid=nms_valid, **kw,
        )
        idx = top_idx[sub_idx]
    else:
        idx, roi_valid = nms_fn(
            xcycwh_to_x1y1x2y2(boxes), probs, nms_thresh, K, valid=valid
        )
    roi_boxes = boxes[idx]
    roi_scores = probs[idx]

    impl = cfg.roi_align_impl or (
        "pallas" if cfg.use_pallas_roi_align else "gather")
    if impl == "pallas":
        from ..ops.pallas.roi_align_kernel import roi_align_pallas

        roi_feats = roi_align_pallas(
            feats, roi_boxes, img_h, img_w,
            cfg.output_height, cfg.output_width,
            feat_h=fh_valid, feat_w=fw_valid,
            compute_dtype=cfg.compute_dtype,
        )
    elif impl == "mxu":
        from ..ops.roi_align import roi_align_mxu

        roi_feats = roi_align_mxu(
            feats, roi_boxes, img_h, img_w,
            cfg.output_height, cfg.output_width,
            feat_h=fh_valid, feat_w=fw_valid,
            compute_dtype=cfg.compute_dtype,
        )
    else:
        roi_feats = roi_align(
            feats, roi_boxes, img_h, img_w,
            cfg.output_height, cfg.output_width,
            feat_h=fh_valid, feat_w=fw_valid,
        )
    return LocalizeTestOut(
        roi_feats=roi_feats,
        roi_boxes=roi_boxes,
        roi_scores=roi_scores,
        roi_valid=roi_valid,
        num_rois=jnp.sum(roi_valid.astype(jnp.int32)),
    )
