"""Region proposal network head.

Functional re-design of reference build_rpn (LocalizationLayer.lua:609-690):
3x3 conv (512 -> rpn_filters) + ReLU, then two 1x1 heads:

  * box head: 4k channels of box transforms; weight ZERO-initialized
    (zero_box_conv, LocalizationLayer.lua:645-647) so training starts at
    the anchor prior; an L2 pull toward zero on the transforms
    (RegularizeLayer, weight box_reg_decay) is returned as an explicit
    aux loss term instead of a gradient hack.
  * score head: 2k channels of box/not-box scores, N(0, std) init.

Anchors are generated on the fly from field centers (MakeAnchors) and
combined with the transforms (ApplyBoxTransform); everything is emitted
in the k-major flattened box order the reference uses (see
transforms.reshape_box_features).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.transforms import (
    apply_box_transform,
    make_anchors,
    reshape_box_features,
)


class RPNOut(NamedTuple):
    boxes: jax.Array    # (k*H*W, 4) xcycwh proposals
    anchors: jax.Array  # (k*H*W, 4) xcycwh anchors
    trans: jax.Array    # (k*H*W, 4) transforms
    scores: jax.Array   # (k*H*W, 2) box/not-box scores
    box_decay_loss: jax.Array  # scalar 0.5 * decay * ||trans||^2


def init_rpn(key, *, input_dim=512, num_filters=256, filter_size=3,
             num_anchors=12, std=0.01, zero_box_conv=True):
    k1, k2, k3 = jax.random.split(key, 3)
    conv_w = jax.random.normal(
        k1, (filter_size, filter_size, input_dim, num_filters)) * std
    box_w = jnp.zeros((1, 1, num_filters, 4 * num_anchors))
    if not zero_box_conv:
        box_w = jax.random.normal(
            k2, (1, 1, num_filters, 4 * num_anchors)) * std
    score_w = jax.random.normal(
        k3, (1, 1, num_filters, 2 * num_anchors)) * std
    return {
        "conv": {"w": conv_w.astype(jnp.float32),
                 "b": jnp.zeros((num_filters,), jnp.float32)},
        "box": {"w": box_w.astype(jnp.float32),
                "b": jnp.zeros((4 * num_anchors,), jnp.float32)},
        "score": {"w": score_w.astype(jnp.float32),
                  "b": jnp.zeros((2 * num_anchors,), jnp.float32)},
    }


def _conv(x, p, padding, compute_dtype):
    # no preferred_element_type: see vgg16.conv2d_same
    y = lax.conv_general_dilated(
        x.astype(compute_dtype), p["w"].astype(compute_dtype),
        (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.astype(jnp.float32) + p["b"]


def apply_rpn(params, feats, anchor_sizes, field_centers,
              box_reg_decay=0.0, compute_dtype=jnp.bfloat16,
              decay_mask=None) -> RPNOut:
    """feats: (H', W', C) single-image conv features (vmap for batch).

    anchor_sizes: (k, 2) anchor (w, h) sizes.
    decay_mask: optional (k*H*W,) bool — anchors outside the true image
    extent on a padded canvas are excluded from the RegularizeLayer loss
    (the reference's cropped run never materializes them; without the
    mask the box-conv BIAS at dead positions would leak into the decay
    term and its gradient).
    """
    Hf, Wf, _ = feats.shape
    k = anchor_sizes.shape[0]
    x = feats[None]  # (1, H', W', C)
    hid = jax.nn.relu(_conv(x, params["conv"], "SAME", compute_dtype))
    box_out = _conv(hid, params["box"], "VALID", compute_dtype)[0]
    score_out = _conv(hid, params["score"], "VALID", compute_dtype)[0]

    trans = reshape_box_features(box_out, k)          # (kHW, 4)
    scores = reshape_box_features(score_out, k)       # (kHW, 2)
    anchors = make_anchors(Hf, Wf, anchor_sizes, field_centers)
    anchors = anchors.reshape(-1, 4)                  # (kHW, 4) same order
    boxes = apply_box_transform(anchors, trans)

    # RegularizeLayer (LocalizationLayer.lua:652, RegularizeLayer.lua:11-22)
    sq = jnp.square(trans)
    if decay_mask is not None:
        sq = sq * decay_mask[:, None]
    decay = 0.5 * box_reg_decay * jnp.sum(sq)
    return RPNOut(boxes=boxes, anchors=anchors, trans=trans,
                  scores=scores, box_decay_loss=decay)
