"""Box regression parameterization and anchor generation.

Re-design of reference modules ApplyBoxTransform.lua, InvertBoxTransform.lua,
MakeAnchors.lua, MakeBoxes.lua. The reference hand-writes every backward
pass (e.g. ApplyBoxTransform.lua:93-128); here each op is one jnp
expression and jax autodiff produces the same gradients (verified in
tests against numeric derivatives, mirroring the reference's gradcheck
tests).
"""

from __future__ import annotations

import jax.numpy as jnp

# The 12 DenseCap anchor (width, height) pairs, reference
# LocalizationLayer.lua:613-619 (scaled by anchor_scale at model build).
DENSECAP_ANCHORS = (
    (45, 90), (90, 45), (64, 64),
    (90, 180), (180, 90), (128, 128),
    (181, 362), (362, 181), (256, 256),
    (362, 724), (724, 362), (512, 512),
)

# VGG-16 receptive-field geometry: 4 stride-2 pools under 'same' convs
# give centers x0 = y0 = 8.5 (1-indexed) and strides sx = sy = 16.
# Derived exactly as reference net_utils.compute_field_centers
# (net_utils.lua:106-140) does by walking the conv stack.
VGG16_FIELD_CENTERS = (8.5, 8.5, 16.0, 16.0)


# Safety rails for degenerate inputs. A single spiked transform during
# training used to produce exp() overflow -> inf boxes -> NaN IoU ->
# NaN everything (observed: healthy convergence, then NaN at ~step 2.5k
# on the overfit sanity run). The clamps below are value-identical in
# every sane regime (|t| <= 10 is already masked out of losses by the
# reference's own outlier hack) and keep gradients finite.
MAX_LOG_SCALE = 20.0   # exp(20) ~ 5e8: far beyond any real box ratio
MIN_BOX_SIZE = 1e-8


def apply_box_transform(boxes, trans):
    """R-CNN box regression: anchors + transforms -> boxes.

    boxes: (..., 4) xcycwh anchors; trans: (..., 4) (tx, ty, tw, th).
    x = tx*wa + xa; w = wa*exp(tw) (reference ApplyBoxTransform.lua:84-87).
    Differentiable in both inputs. tw/th are clamped to +-MAX_LOG_SCALE
    before exp (overflow guard; see note above).
    """
    xa, ya, wa, ha = jnp.split(boxes, 4, axis=-1)
    tx, ty, tw, th = jnp.split(trans, 4, axis=-1)
    tw = jnp.clip(tw, -MAX_LOG_SCALE, MAX_LOG_SCALE)
    th = jnp.clip(th, -MAX_LOG_SCALE, MAX_LOG_SCALE)
    return jnp.concatenate(
        [tx * wa + xa, ty * ha + ya, wa * jnp.exp(tw), ha * jnp.exp(th)],
        axis=-1,
    )


def invert_box_transform(anchor_boxes, target_boxes):
    """Inverse parameterization: the transform taking anchors to targets.

    tx = (xt-xa)/wa; tw = log(wt/wa) (reference InvertBoxTransform.lua:50-57).
    Anchor/target sizes are clamped to MIN_BOX_SIZE so zero-size padded
    rows produce large-but-finite transforms (which the |t| > 10 outlier
    mask then zeroes) instead of inf/NaN that poison gradients through
    jnp.where.
    """
    xa, ya, wa, ha = jnp.split(anchor_boxes, 4, axis=-1)
    xt, yt, wt, ht = jnp.split(target_boxes, 4, axis=-1)
    wa = jnp.maximum(wa, MIN_BOX_SIZE)
    ha = jnp.maximum(ha, MIN_BOX_SIZE)
    wt = jnp.maximum(wt, MIN_BOX_SIZE)
    ht = jnp.maximum(ht, MIN_BOX_SIZE)
    return jnp.concatenate(
        [(xt - xa) / wa, (yt - ya) / ha, jnp.log(wt / wa), jnp.log(ht / ha)],
        axis=-1,
    )


def make_anchors(feat_h, feat_w, anchors, field_centers=VGG16_FIELD_CENTERS):
    """Tile k anchor shapes over every feature-map cell.

    Args:
      feat_h, feat_w: static feature map size (H', W').
      anchors: (k, 2) array of (w, h) anchor sizes.
      field_centers: (x0, y0, sx, sy) receptive-field geometry.

    Returns (k, H', W', 4) xcycwh anchors in 1-indexed image coords.

    Layout note: the reference emits N x 4k x H x W (MakeAnchors.lua:40-67)
    and then permutes to N x (k*H*W) x 4 via ReshapeBoxFeatures
    (ReshapeBoxFeatures.lua:24-35); flattening our (k, H', W', 4) with
    .reshape(-1, 4) yields exactly that k-major, row-major box order —
    load-bearing for parity of sampling/NMS tie-breaking.
    """
    x0, y0, sx, sy = field_centers
    anchors = jnp.asarray(anchors, dtype=jnp.float32)
    k = anchors.shape[0]
    xc = x0 + sx * jnp.arange(feat_w, dtype=jnp.float32)  # (W',)
    yc = y0 + sy * jnp.arange(feat_h, dtype=jnp.float32)  # (H',)
    xc = jnp.broadcast_to(xc[None, None, :], (k, feat_h, feat_w))
    yc = jnp.broadcast_to(yc[None, :, None], (k, feat_h, feat_w))
    w = jnp.broadcast_to(anchors[:, 0, None, None], (k, feat_h, feat_w))
    h = jnp.broadcast_to(anchors[:, 1, None, None], (k, feat_h, feat_w))
    return jnp.stack([xc, yc, w, h], axis=-1)


def reshape_box_features(x, k):
    """(D*k, H, W) -> (k*H*W, D), reference ReshapeBoxFeatures.lua:24-35.

    The reference shapes are channel-major NCHW; our conv outputs are NHWC,
    so this helper takes (H, W, D*k) and produces the identical k-major
    (k*H*W, D) ordering.
    """
    H, W, Dk = x.shape
    D = Dk // k
    # NHWC channel layout groups as (k, D) per pixel: transpose to k-major.
    x = x.reshape(H, W, k, D)
    x = jnp.transpose(x, (2, 0, 1, 3))  # (k, H, W, D)
    return x.reshape(k * H * W, D)
