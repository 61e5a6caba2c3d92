"""Central configuration.

Defaults mirror the reference flag set (train_opts.lua:12-98,
run_model.lua:26-61); every knob that exists there exists here. Static
fields participate in jit specialization (shapes / python control flow);
nothing here is traced.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Tuple

import jax.numpy as jnp

from .ops.transforms import DENSECAP_ANCHORS, VGG16_FIELD_CENTERS


@dataclasses.dataclass(frozen=True)
class DenseCapConfig:
    # vocabulary / captions (from dataset json; preprocess.py)
    vocab_size: int = 1000
    seq_length: int = 15

    # canvas: images resized so the longest edge is image_size, placed at
    # the upper-left of a fixed square canvas (preprocess.py pads the
    # same way); one compiled program for every image
    image_size: int = 720

    # conv trunk / recognition
    input_dim: int = 512
    output_height: int = 7
    output_width: int = 7
    fc_dim: int = 4096
    drop_prob: float = 0.5
    field_centers: Tuple[float, float, float, float] = VGG16_FIELD_CENTERS

    # RPN (LocalizationLayer.lua:61-88, train_opts.lua:16)
    rpn_filter_size: int = 3
    rpn_num_filters: int = 256
    zero_box_conv: bool = True
    std: float = 0.01
    anchor_scale: float = 1.0
    anchors: Tuple[Tuple[int, int], ...] = DENSECAP_ANCHORS

    # sampler (train_opts.lua:18-28)
    sampler_batch_size: int = 256
    sampler_high_thresh: float = 0.7
    sampler_low_thresh: float = 0.3
    train_remove_outbounds_boxes: bool = True

    # loss weights (train_opts.lua:32-42)
    mid_box_reg_weight: float = 0.05
    mid_objectness_weight: float = 0.1
    end_box_reg_weight: float = 0.1
    end_objectness_weight: float = 0.1
    captioning_weight: float = 1.0
    box_reg_decay: float = 5e-5
    weight_decay: float = 1e-6

    # language model (train_opts.lua:20-22)
    rnn_size: int = 512
    rnn_encoding_size: int = 512

    # gt padding (fixed-shape replacement for per-image region counts)
    max_gt_boxes: int = 128

    # test-time (train_opts.lua:76-80, DenseCapModel.lua:185-191)
    test_rpn_nms_thresh: float = 0.7
    test_final_nms_thresh: float = 0.3
    test_max_proposals: int = 1000
    # NOTE: the reference DECLARES -clip_final_boxes (train_opts.lua:95)
    # but never uses it anywhere — final boxes are NOT clipped. Default
    # False for parity; True clips them to the image (and, through the
    # reference's asymmetric corner conversions, shrinks w/h by 1).
    clip_final_boxes: bool = False
    # NMS runs over only the top-K scored proposals (standard Faster
    # R-CNN practice; the reference scans all ~24k anchors serially).
    # -1 = all anchors (exact reference semantics). Measured on a
    # TRAINED flagship-geometry model (scripts/prenms_topk_check.py):
    # topk=6000 emits the IDENTICAL post-NMS survivor set (IoU>=0.9
    # overlap 1.0000, mAP delta 0.0000) at ~1/3 the NMS cost; even 2000
    # moves mAP by only +0.0001.
    test_pre_nms_topk: int = 6000
    # Serve RoI align from the fused Pallas kernel (TPU only; the jnp
    # gather path remains the autodiff/train and CPU path).
    # DEPRECATED alias for roi_align_impl="pallas"; ignored when
    # roi_align_impl is set explicitly.
    use_pallas_roi_align: bool = False
    # Test-path RoI-align implementation: "" (derive from the legacy
    # bool above), "gather" (jnp gathers; autodiff/CPU default), "mxu"
    # (two einsum contractions; fastest measured on TPU v5e — 10.2 vs
    # pallas-bf16 15.7 vs gather ~60 ms at B=8x1000, doc/BENCH.md), or
    # "pallas" (the fused kernel). CLI auto-resolution picks "mxu" on
    # TPU at the standard 512ch/7x7 geometry.
    roi_align_impl: str = ""
    # Run the NMS suppression sweep as one Pallas kernel (TPU only)
    use_pallas_nms: bool = False

    # Fuse trunk1's conv1_2+pool1 and conv2_2+pool2 into single Pallas
    # kernels (ops/pallas/conv_pool_kernel.py): the pre-pool activation
    # (531 MB bf16 at B=8 720px for conv1_2) never round-trips HBM.
    # OFF by default: MEASURED SLOWER on v5e (scripts/
    # conv_pool_fused_check.py — 9.1 vs 6.1 ms at conv1_2+pool1, 6.3 vs
    # 3.0 at conv2_2+pool2, scan-amplified): the w-paired formulation
    # pays 2x nominal conv FLOPs to keep the 128-wide MXU full at C=64,
    # which outweighs the saved pool round-trip (XLA's reduce_window
    # pool is already near its bandwidth envelope — measured fastest of
    # three pool formulations, doc/BENCH.md round-4 section). Numerics
    # are proven: f32 parity rtol 1e-4, bf16 error no worse than
    # unfused vs an f32 oracle. Known limit: the ANY-memory-space
    # operand doesn't lower under vmap, so the flag only runs on the
    # single-image path on real TPU (interpret mode composes fully).
    # Trunk1-only by construction (C in {64,128}); the kernel has no
    # VJP and stop-gradients its inputs — trunk1 is never trained
    # (DenseCapModel.lua:338-358).
    fuse_conv_pool: bool = False

    # conv1_1 via 2x2 space-to-depth (EXACT same outputs). Off by
    # default: measured on v5e, the s2d conv itself is ~1.7x faster than
    # the plain C=3 conv (1.25 vs 2.14 ms/step at B=8 720px) but the
    # input space-to-depth + 531 MB output depth-to-space shuffles cost
    # more than the saving — conv1_1 is bandwidth-bound, not MXU-bound
    # (scripts/conv1_variants.py sweep, doc/BENCH.md).
    conv1_s2d: bool = False

    # numerics: conv/matmul compute dtype (params & accums stay f32)
    compute_dtype: Any = jnp.bfloat16

    # rematerialize the conv trunk in backward (trade FLOPs for HBM;
    # enables larger per-chip batches at 720px)
    remat_trunk: bool = False

    # statically remove the WHOLE conv trunk from the backward graph.
    # The reference with -finetune_cnn_after < 0 (the default) never
    # backprops into the CNN at all (DenseCapModel.lua:338-358 starts
    # backward at the localization layer); the recompile-free scalar
    # `finetune_cnn` switch zeroes those grads but still COMPUTES the
    # trunk backward (~2x the trunk FLOPs) — this knob deletes it from
    # the program instead. cli/train.py sets it automatically and
    # recompiles ONCE when finetuning kicks in.
    static_freeze_cnn: bool = False

    @property
    def num_anchors(self) -> int:
        return len(self.anchors)

    def anchor_array(self):
        return (jnp.asarray(self.anchors, dtype=jnp.float32)
                * self.anchor_scale)

    def replace(self, **kw) -> "DenseCapConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["compute_dtype"] = jnp.dtype(self.compute_dtype).name
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "DenseCapConfig":
        d = json.loads(s)
        d["compute_dtype"] = jnp.dtype(d["compute_dtype"]).type
        d["anchors"] = tuple(tuple(a) for a in d["anchors"])
        d["field_centers"] = tuple(d["field_centers"])
        return cls(**d)


# VGG-mean BGR pixel offsets used by the whole reference pipeline
# (DataLoader.lua:64-65, run_model.lua:72-74). Our canvas is RGB-ordered
# HWC; subtract the mean per channel in RGB order.
VGG_MEAN_BGR = (103.939, 116.779, 123.68)
VGG_MEAN_RGB = (123.68, 116.779, 103.939)
