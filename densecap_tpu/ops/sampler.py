"""Fixed-shape positive/negative RoI sampling.

Re-design of the reference BoxSampler + BoxSamplerHelper
(densecap/modules/BoxSampler.lua:64-167, BoxSamplerHelper.lua:68-129)
for TPU: all the reference's dynamic shapes (variable positive/negative
counts, nonzero() + multinomial index lists) become fixed slot arrays
with validity masks, so the sampler lives inside one jitted program and
vmaps over a batch of images (the reference asserts N == 1,
BoxSampler.lua:107 — that restriction is gone).

Semantics preserved from the reference:
  * IoU between input boxes and gt boxes uses the continuous convention
    (modules/BoxIoU.lua).
  * pos if max IoU > high_thresh; neg if max IoU < low_thresh
    (BoxSampler.lua:77-78).
  * boxes out of image bounds are excluded from both sets
    (BoxSampler.lua:82-98).
  * the best-matching input box for every gt box is forced positive and
    removed from negatives, regardless of thresholds or bounds
    (BoxSampler.lua:104-105).
  * num_pos = min(batch_size/2, total_pos); num_neg = batch_size -
    num_pos (BoxSampler.lua:136-137). Positives are sampled uniformly
    WITHOUT replacement; negatives without replacement unless there are
    too few, in which case ALL negative slots are redrawn iid WITH
    replacement — the reference's exact torch.multinomial(ones,
    num_neg, true) distribution (BoxSampler.lua:145-152).

Fixed-shape encoding: P = batch_size/2 positive slots and M = batch_size
negative slots are always materialized; `pos_valid[k] = k < num_pos` and
`neg_valid[k] = k < num_neg`. Invalid slots point at candidate 0 and must
be masked out of every loss.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import iou_cwh, xcycwh_to_x1y1x2y2


class SamplerOutput(NamedTuple):
    pos_input_idx: jax.Array   # (P,) int32 into input boxes
    pos_target_idx: jax.Array  # (P,) int32 into gt boxes
    pos_valid: jax.Array       # (P,) bool
    neg_input_idx: jax.Array   # (M,) int32 into input boxes
    neg_valid: jax.Array       # (M,) bool
    num_pos: jax.Array         # () int32
    num_neg: jax.Array         # () int32
    # anomaly flags, the jit-able counterpart of the reference's
    # __GLOBAL_STATS__ counters (BoxSampler.lua:125-127, :147-151) —
    # aggregated across steps by the training loop
    no_negatives: jax.Array    # () bool: fallback triggered
    neg_replaced: jax.Array    # () bool: negatives had to repeat


def _gumbel_topk_select(key, mask, k):
    """Uniformly sample up to k items from mask==True without replacement.

    Returns (idx, total) where idx is (k,) int32; slots beyond the number
    of True entries cycle through the selected prefix (callers mask by
    validity or rely on the cycling for with-replacement fallback).
    """
    n = mask.shape[0]
    g = jax.random.gumbel(key, (n,))
    scores = jnp.where(mask, g, -jnp.inf)
    # fewer candidates than slots (tiny images: anchor count < sampler
    # batch size) is legal — top_k caps at n and the cycling below fills
    # the remaining slots with repeats (the reference's with-replacement
    # fallback, BoxSampler.lua:145-152)
    k_eff = min(k, n)
    _, idx = jax.lax.top_k(scores, k_eff)  # candidates first, -inf tail
    if k_eff < k:
        idx = jnp.concatenate(
            [idx, jnp.zeros((k - k_eff,), idx.dtype)])
    total = jnp.sum(mask.astype(jnp.int32))
    # Cycle valid prefix into the tail so every slot indexes a candidate.
    slot = jnp.arange(k, dtype=jnp.int32)
    safe_total = jnp.maximum(total, 1)
    wrapped = jnp.where(slot < safe_total, slot, slot % safe_total)
    return idx[wrapped].astype(jnp.int32), total


def compute_match_masks(
    input_boxes,   # (B1, 4) xcycwh proposals
    gt_boxes,      # (B2, 4) xcycwh ground truth (padded)
    gt_valid,      # (B2,) bool mask over gt padding
    *,
    low_thresh: float = 0.3,
    high_thresh: float = 0.7,
    bounds=None,   # dict(x_min, y_min, x_max, y_max) or None
    candidate_mask=None,  # (B1,) bool: hard-exclude non-candidates
):
    """Positive/negative eligibility masks + best-gt assignment.

    Returns (pos_mask, neg_mask, input_idx) mirroring BoxSampler's
    pos_mask/neg_mask instance state and per-input best-target index
    (BoxSampler.lua:70-128), with gt padding handled by masks.
    candidate_mask hard-excludes rows (e.g. padded-canvas anchors) from
    both sets independent of the bounds option; forced best-match
    positives can still override it, like the reference's bounds
    override (BoxSampler.lua:100-105).
    """
    B1 = input_boxes.shape[0]
    ious = iou_cwh(input_boxes, gt_boxes)          # (B1, B2)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)

    input_max_iou = jnp.max(ious, axis=1)           # (B1,)
    input_idx = jnp.argmax(ious, axis=1)            # (B1,) best gt per input
    target_best_input = jnp.argmax(ious, axis=0)    # (B2,) best input per gt

    pos_mask = input_max_iou > high_thresh
    # padded-out gt rows carry IoU -1, so an image with no gt at all makes
    # everything negative here (the forced-positive scatter below is a
    # no-op in that case)
    neg_mask = input_max_iou < low_thresh

    if bounds is not None:
        bb = xcycwh_to_x1y1x2y2(input_boxes)
        oob = (
            (bb[:, 0] < bounds["x_min"])
            | (bb[:, 1] < bounds["y_min"])
            | (bb[:, 2] > bounds["x_max"])
            | (bb[:, 3] > bounds["y_max"])
        )
        pos_mask = pos_mask & ~oob
        neg_mask = neg_mask & ~oob
    if candidate_mask is not None:
        pos_mask = pos_mask & candidate_mask
        neg_mask = neg_mask & candidate_mask

    # Force the best-match input box for every valid gt to be positive
    # (BoxSampler.lua:104-105), overriding thresholds and bounds.
    # (indices for invalid gt are routed out of bounds and dropped, so a
    # True from a valid gt can never be overwritten)
    forced = jnp.zeros((B1,), dtype=bool).at[
        jnp.where(gt_valid, target_best_input, B1)
    ].set(True, mode="drop")
    pos_mask = pos_mask | forced
    neg_mask = neg_mask & ~forced

    # No-negatives fallback (BoxSampler.lua:111-128): if nothing is
    # negative, everything non-positive becomes negative. The reference's
    # fallback set is "all real anchors not positive"; on a padded canvas
    # the equivalent is ~pos restricted to live candidates — dead
    # padded-canvas anchors only enter if even that set is empty (a
    # degenerate tiny image where every live anchor is a forced positive).
    any_neg = jnp.any(neg_mask)
    fallback = ~pos_mask
    if candidate_mask is not None:
        live_fallback = fallback & candidate_mask
        fallback = jnp.where(jnp.any(live_fallback), live_fallback, fallback)
    neg_mask = jnp.where(any_neg, neg_mask, fallback)
    return pos_mask, neg_mask, input_idx, ~any_neg


def _nth_true_index(mask, ordinals):
    """Index of the n-th True entry of mask (ascending index order).

    The jit-safe analogue of the reference's pos_mask:nonzero() list
    (BoxSampler.lua:131-134): argsort puts True entries first in stable
    ascending-index order, so ordinal n maps to the n-th candidate.
    Ordinals past the candidate count alias into the False tail and must
    be masked by validity downstream.
    """
    order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
    return order[ordinals].astype(jnp.int32)


def sample_rois(
    key,
    input_boxes,   # (B1, 4) xcycwh proposals
    gt_boxes,      # (B2, 4) xcycwh ground truth (padded)
    gt_valid,      # (B2,) bool mask over gt padding
    *,
    batch_size: int = 256,
    low_thresh: float = 0.3,
    high_thresh: float = 0.7,
    bounds=None,   # dict(x_min, y_min, x_max, y_max) or None
    candidate_mask=None,
    debug_pos_sample_idx=None,  # (P,) int32 ordinals into the eligible-
    debug_neg_sample_idx=None,  # (M,) int32  positive/negative lists
) -> SamplerOutput:
    """Sample positive/negative proposals against ground truth boxes.

    debug_pos_sample_idx / debug_neg_sample_idx replicate the reference's
    deterministic test hooks (BoxSampler.lua:154-159): when given, they
    replace the random draw with explicit ORDINALS into the sorted
    eligible candidate lists (the nonzero() order of pos_mask/neg_mask).
    Eligibility masks, forced best-match positives, bounds exclusion and
    the no-negatives fallback still run — only the draw is overridden.
    """
    P = batch_size // 2
    M = batch_size

    pos_mask, neg_mask, input_idx, no_negs = compute_match_masks(
        input_boxes,
        gt_boxes,
        gt_valid,
        low_thresh=low_thresh,
        high_thresh=high_thresh,
        bounds=bounds,
        candidate_mask=candidate_mask,
    )

    kp, kn, kr = jax.random.split(key, 3)
    if debug_pos_sample_idx is not None:
        pos_idx = _nth_true_index(pos_mask, debug_pos_sample_idx)
        total_pos = jnp.sum(pos_mask.astype(jnp.int32))
    else:
        pos_idx, total_pos = _gumbel_topk_select(kp, pos_mask, P)
    if debug_neg_sample_idx is not None:
        neg_idx = _nth_true_index(neg_mask, debug_neg_sample_idx)
        total_neg = jnp.sum(neg_mask.astype(jnp.int32))
    else:
        neg_idx, total_neg = _gumbel_topk_select(kn, neg_mask, M)

    num_pos = jnp.minimum(P, total_pos)
    num_neg = batch_size - num_pos

    if debug_neg_sample_idx is None:
        # Scarce-negative fallback, matching the reference EXACTLY:
        # when total_neg < num_neg the reference redraws ALL num_neg
        # negatives iid WITH replacement (torch.multinomial(ones,
        # num_neg, true), BoxSampler.lua:145-152) — not "unique ones
        # plus repeats". The gumbel top-k prefix is a uniform random
        # permutation of the whole eligible set whenever total_neg <
        # num_neg <= M, so iid uniform ordinals into that prefix are
        # iid uniform draws over the eligible set.
        neg_replace = total_neg < num_neg
        iid = jax.random.randint(kr, (M,), 0,
                                 jnp.maximum(total_neg, 1))
        neg_idx = jnp.where(neg_replace, neg_idx[iid], neg_idx)

    slotP = jnp.arange(P, dtype=jnp.int32)
    slotM = jnp.arange(M, dtype=jnp.int32)
    pos_valid = slotP < num_pos
    neg_valid = slotM < num_neg

    pos_target_idx = input_idx[pos_idx].astype(jnp.int32)

    return SamplerOutput(
        pos_input_idx=pos_idx,
        pos_target_idx=pos_target_idx,
        pos_valid=pos_valid,
        neg_input_idx=neg_idx,
        neg_valid=neg_valid,
        num_pos=num_pos,
        num_neg=num_neg,
        no_negatives=no_negs,
        neg_replaced=total_neg < num_neg,
    )


def gather_rois(data, pos_input_idx, neg_input_idx):
    """Gather parallel (B1, D) arrays into ((P, D), (M, D)) slot arrays.

    Fixed-shape replacement for BoxSamplerHelper's index() calls
    (BoxSamplerHelper.lua:113-129). Gradients flow back to the gathered
    rows automatically (jax scatter-add transpose replaces the
    reference's manual indexCopy backward, BoxSamplerHelper.lua:142-182);
    because the positive/negative index sets never overlap by
    construction, the additive scatter matches the reference exactly.
    """
    return data[pos_input_idx], data[neg_input_idx]
