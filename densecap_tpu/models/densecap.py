"""DenseCap model: trunk -> localization -> recognition -> language model.

Functional re-design of reference densecap/DenseCapModel.lua. The
reference wires stateful nn modules into an nngraph gModule
(_buildRecognitionNet, DenseCapModel.lua:127-162) and drives a manual
partial backward (:338-358); here the whole training objective is one
pure function of (params, batch, rng) and jax.grad differentiates it —
the conv1-frozen / conv2-optional-finetune policy is enforced by the
optimizer partition (densecap_tpu/parallel/train_step.py), not by
hand-cut backprop.

Single-image functions are exposed (mirroring the reference API) and the
train step vmaps them over a batch — the reference's N == 1 restriction
(DenseCapModel.lua:244) falls away because every shape is fixed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import DenseCapConfig
from ..ops import losses as L
from ..ops.boxes import clip_boxes, xcycwh_to_x1y1x2y2
from ..ops.nms import nms
from ..ops.transforms import apply_box_transform
from . import lstm
from .localization import localize_test, localize_train
from .rpn import init_rpn
from .vgg16 import (
    TRUNK1_CFG,
    TRUNK2_CFG,
    apply_recog,
    apply_trunk,
    init_recog,
    init_trunk,
)


class TestOutput(NamedTuple):
    boxes: jax.Array       # (K, 4) final xcycwh boxes (padded slots zero)
    scores: jax.Array      # (K,) raw objectness logits
    captions: jax.Array    # (K, T) int32 tokens (1-indexed; END = V+1)
    caption_logprobs: jax.Array  # (K, T) per-token logprobs (greedy path)
    valid: jax.Array       # (K,) bool
    num: jax.Array         # () int32


def lm_config(cfg: DenseCapConfig) -> lstm.LMConfig:
    return lstm.LMConfig(
        vocab_size=cfg.vocab_size,
        seq_length=cfg.seq_length,
        input_encoding_size=cfg.rnn_encoding_size,
        rnn_size=cfg.rnn_size,
        image_vector_dim=cfg.fc_dim,
    )


def init_params(key, cfg: DenseCapConfig):
    """Build the full parameter pytree.

    Branch inits follow DenseCapModel.lua:93-100: objectness N(0, std),
    box-reg zeros (so training starts at the localization prior).
    """
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    trunk1, c1 = init_trunk(k1, TRUNK1_CFG, 3)
    trunk2, c2 = init_trunk(k2, TRUNK2_CFG, c1)
    rpn = init_rpn(
        k3, input_dim=c2, num_filters=cfg.rpn_num_filters,
        filter_size=cfg.rpn_filter_size, num_anchors=cfg.num_anchors,
        std=cfg.std, zero_box_conv=cfg.zero_box_conv,
    )
    recog = init_recog(
        k4, in_dim=cfg.output_height * cfg.output_width * c2,
        fc_dim=cfg.fc_dim,
    )
    objectness = {
        "w": (jax.random.normal(k5, (cfg.fc_dim, 1)) * cfg.std).astype(
            jnp.float32),
        "b": jnp.zeros((1,), jnp.float32),
    }
    box_reg = {
        "w": jnp.zeros((cfg.fc_dim, 4), jnp.float32),
        "b": jnp.zeros((4,), jnp.float32),
    }
    lm = lstm.init_lm(k6, lm_config(cfg))
    return {
        "trunk1": trunk1,
        "trunk2": trunk2,
        "rpn": rpn,
        "recog": recog,
        "objectness": objectness,
        "box_reg": box_reg,
        "lm": lm,
    }


def _linear(p, x, compute_dtype):
    return jnp.dot(
        x.astype(compute_dtype), p["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + p["b"]


def features(params, image, cfg: DenseCapConfig, img_h=None, img_w=None):
    """Conv trunk: (H, W, 3) image -> (H/16, W/16, 512) features.

    img_h/img_w: true image extent on the padded canvas. When given,
    padding activations are zeroed after every conv/pool so the canvas
    run is EXACTLY the reference's cropped run (see apply_trunk).

    With cfg.remat_trunk the trunk recomputes activations in the
    backward pass (jax.checkpoint) instead of keeping ~350 MB/image of
    conv activations alive — the rematerialization lever the reference
    had no equivalent for.
    """

    def run(p1, p2, img, eh, ew):
        x = img[None]
        x = apply_trunk(p1, TRUNK1_CFG, x, cfg.compute_dtype,
                        valid_h=eh, valid_w=ew, s2d_first=cfg.conv1_s2d,
                        fuse_conv_pool=cfg.fuse_conv_pool,
                        fuse_interpret=jax.default_backend() != "tpu")
        # The reference NEVER backprops through conv1_1..pool2: its
        # manual backward starts at layer 11 (DenseCapModel.lua:338-358)
        # regardless of -finetune_cnn_after. Cutting the graph here both
        # matches that exactly and lets XLA delete the conv1/conv2
        # backward (the largest activations in the whole net).
        x = jax.lax.stop_gradient(x)
        x = apply_trunk(p2, TRUNK2_CFG, x, cfg.compute_dtype,
                        valid_h=eh if eh is None else jnp.floor(
                            jnp.asarray(eh, jnp.float32) / 4.0),
                        valid_w=ew if ew is None else jnp.floor(
                            jnp.asarray(ew, jnp.float32) / 4.0))
        return x[0]

    if cfg.remat_trunk:
        run = jax.checkpoint(run)  # None extents are empty pytree leaves
    feats = run(params["trunk1"], params["trunk2"], image, img_h, img_w)
    if cfg.static_freeze_cnn:
        # finetuning off: the trunk contributes no gradients at all, so
        # remove its entire backward from the program (applied OUTSIDE
        # the remat wrapper — no recompute happens either).
        feats = jax.lax.stop_gradient(feats)
    return feats


def forward_train(params, image, img_h, img_w, gt_boxes, gt_labels,
                  gt_valid, rng, cfg: DenseCapConfig, debug_sampler=None):
    """Single-image training objective -> dict of losses.

    image: (S, S, 3) float canvas (BGR, VGG-mean subtracted);
    img_h/img_w: true extent; gt_boxes: (G, 4) xcycwh; gt_labels:
    (G, L) int tokens (0-padded); gt_valid: (G,) bool.

    Loss menu = DenseCapModel:forward_backward (DenseCapModel.lua:401-459)
    plus the RPN mid losses computed inside the localization layer.

    debug_sampler: optional dict(pos=(P,), neg=(M,)) deterministic
    sampler-ordinal injection (the reference's debug hooks,
    BoxSampler.lua:154-159) — used by the training transliteration
    parity test to pin both implementations to identical pos/neg sets.
    """
    k_sample, k_drop = jax.random.split(rng)
    feats = features(params, image, cfg, img_h, img_w)

    loc = localize_train(
        params["rpn"], feats, img_h, img_w,
        gt_boxes, gt_labels, gt_valid, k_sample, cfg, cfg.anchor_array(),
        debug_sampler=debug_sampler,
    )

    P = loc.pos_valid.shape[0]
    roi_codes = apply_recog(
        params["recog"], loc.roi_feats, train=True, dropout_key=k_drop,
        drop_prob=cfg.drop_prob, compute_dtype=cfg.compute_dtype,
    )  # (P+M, 4096)

    roi_valid = jnp.concatenate([loc.pos_valid, loc.neg_valid])

    # final objectness: valid pos slots labeled 1, everything else 0
    obj_scores = _linear(params["objectness"], roi_codes, cfg.compute_dtype)
    obj_labels = jnp.concatenate(
        [loc.pos_valid.astype(jnp.int32),
         jnp.zeros_like(loc.neg_valid, dtype=jnp.int32)]
    )
    end_obj = cfg.end_objectness_weight * L.logistic(
        obj_scores, obj_labels, roi_valid
    )

    # final box regression on positive slots
    pos_codes = roi_codes[:P]
    final_trans = _linear(params["box_reg"], pos_codes, cfg.compute_dtype)
    end_box = L.box_regression(
        loc.pos_boxes, final_trans, loc.pos_target_boxes, loc.pos_valid,
        weight=cfg.end_box_reg_weight,
    )

    # captioning on positive slots
    lmc = lm_config(cfg)
    lm_scores = lstm.forward_train(
        params["lm"], pos_codes, loc.pos_target_labels, lmc,
        compute_dtype=cfg.compute_dtype,
    )
    target = lstm.get_target(loc.pos_target_labels, cfg.vocab_size)
    cap = cfg.captioning_weight * L.temporal_cross_entropy(
        lm_scores, target, loc.pos_valid
    )

    losses = dict(loc.losses)
    losses["end_objectness_loss"] = end_obj
    losses["end_box_reg_loss"] = end_box
    losses["captioning_loss"] = cap
    losses["total_loss"] = (
        losses["mid_objectness_loss"]
        + losses["mid_box_reg_loss"]
        + losses["box_decay_loss"]
        + end_obj + end_box + cap
    )
    return losses


def forward_test(params, image, img_h, img_w, cfg: DenseCapConfig,
                 *,
                 rpn_nms_thresh: Optional[float] = None,
                 final_nms_thresh: Optional[float] = None,
                 max_proposals: Optional[int] = None,
                 use_beam: int = 0) -> TestOutput:
    """Single-image inference (DenseCapModel:forward_test / updateOutput
    test path + final NMS, DenseCapModel.lua:242-327).

    Ordering note: the reference decodes captions for every proposal and
    then applies final NMS to the decoded outputs (:261-278); captions
    are per-RoI independent, so we NMS first and decode only survivors —
    identical outputs, strictly less work.
    """
    final_nms = (cfg.test_final_nms_thresh if final_nms_thresh is None
                 else final_nms_thresh)
    feats = features(params, image, cfg, img_h, img_w)
    loc = localize_test(
        params["rpn"], feats, img_h, img_w, cfg, cfg.anchor_array(),
        nms_thresh=rpn_nms_thresh, max_proposals=max_proposals,
    )
    K = loc.roi_boxes.shape[0]

    roi_codes = apply_recog(
        params["recog"], loc.roi_feats, train=False,
        compute_dtype=cfg.compute_dtype,
    )
    obj_scores = _linear(
        params["objectness"], roi_codes, cfg.compute_dtype)[:, 0]
    final_trans = _linear(params["box_reg"], roi_codes, cfg.compute_dtype)
    final_boxes = apply_box_transform(loc.roi_boxes, final_trans)

    if cfg.clip_final_boxes:
        bounds = dict(x_min=1.0, y_min=1.0, x_max=img_w, y_max=img_h)
        final_boxes, _ = clip_boxes(final_boxes, bounds, "xcycwh")

    valid = loc.roi_valid
    if final_nms > 0:
        idx, valid = nms(
            xcycwh_to_x1y1x2y2(final_boxes), obj_scores, final_nms, K,
            valid=loc.roi_valid,
        )
        final_boxes = final_boxes[idx]
        obj_scores = obj_scores[idx]
        roi_codes = roi_codes[idx]

    lmc = lm_config(cfg)
    if use_beam > 0:
        captions, cap_lps = lstm.beamsearch(
            params["lm"], roi_codes, lmc, beam_size=use_beam,
            compute_dtype=cfg.compute_dtype, return_logprobs=True,
        )
    else:
        captions, cap_lps = lstm.sample_with_logprobs(
            params["lm"], roi_codes, lmc, compute_dtype=cfg.compute_dtype,
        )

    return TestOutput(
        boxes=final_boxes,
        scores=obj_scores,
        captions=captions,
        caption_logprobs=cap_lps,
        valid=valid,
        num=jnp.sum(valid.astype(jnp.int32)),
    )


def forward_train_debug(params, image, img_h, img_w, gt_boxes, gt_labels,
                        gt_valid, rng, cfg: DenseCapConfig):
    """forward_train + intermediate dumps for debugging.

    The fixed-shape analogue of the reference's dump_vars hook
    (LocalizationLayer.lua:511-522, train.lua:86-89): returns (losses,
    vars) where vars holds the RPN predictions and the sampled
    positive/negative boxes with their masks. jit-safe (all arrays).
    """
    k_sample, _ = jax.random.split(rng)
    feats = features(params, image, cfg, img_h, img_w)
    loc = localize_train(
        params["rpn"], feats, img_h, img_w,
        gt_boxes, gt_labels, gt_valid, k_sample, cfg, cfg.anchor_array(),
    )
    losses = forward_train(params, image, img_h, img_w, gt_boxes,
                           gt_labels, gt_valid, rng, cfg)
    # NOTE: the localization runs again inside forward_train with the
    # same rng split, so the dumped sample matches the loss sample.
    varsd = {
        "pos_boxes": loc.pos_boxes,
        "pos_anchors": loc.pos_anchors,
        "pos_trans": loc.pos_trans,
        "pos_valid": loc.pos_valid,
        "neg_valid": loc.neg_valid,
        "pos_target_boxes": loc.pos_target_boxes,
        "roi_boxes": loc.roi_boxes,
        "num_pos": loc.num_pos,
    }
    return losses, varsd


def forward_test_batch(params, images, img_hs, img_ws,
                       cfg: DenseCapConfig, **kw) -> TestOutput:
    """Batched inference: vmap of forward_test over a stack of canvases.

    images: (N, S, S, 3); img_hs/img_ws: (N,). The whole batch is ONE
    XLA program — the reference cannot do this at all (N == 1
    assertions). Serving and bench use it to amortize dispatch and fill
    the MXU.
    """
    return jax.vmap(
        lambda im, hh, ww: forward_test(params, im, hh, ww, cfg, **kw)
    )(images, img_hs, img_ws)


def extract_features(params, image, img_h, img_w, cfg: DenseCapConfig,
                     *, final_nms_thresh=0.4, max_boxes=100):
    """Boxes + 4096-d codes for the top regions after final NMS.

    Port of DenseCapModel:extractFeatures (DenseCapModel.lua:285-304) /
    extract_features.lua defaults (100 boxes, nms 0.4).
    """
    feats = features(params, image, cfg, img_h, img_w)
    loc = localize_test(
        params["rpn"], feats, img_h, img_w, cfg, cfg.anchor_array())
    roi_codes = apply_recog(
        params["recog"], loc.roi_feats, train=False,
        compute_dtype=cfg.compute_dtype,
    )
    obj_scores = _linear(
        params["objectness"], roi_codes, cfg.compute_dtype)[:, 0]
    final_trans = _linear(params["box_reg"], roi_codes, cfg.compute_dtype)
    final_boxes = apply_box_transform(loc.roi_boxes, final_trans)
    idx, valid = nms(
        xcycwh_to_x1y1x2y2(final_boxes), obj_scores, final_nms_thresh,
        max_boxes, valid=loc.roi_valid,
    )
    return final_boxes[idx], roi_codes[idx], valid
