"""Bilinear RoI pooling (RoI align) for TPU.

Re-design of the reference RoI feature extraction stack — BoxToAffine ->
AffineGridGeneratorBHWD -> BatchBilinearSamplerBHWD (stnbhwd CUDA
kernels) — as a single vectorized gather-interpolate, with the grid math
folded in (reference modules/BilinearRoiPooling.lua:42-60,
BoxToAffine.lua:69-93, BatchBilinearSamplerBHWD.lua:114-154).

Grid semantics (verified against the conventions documented at
BoxToAffine.lua:13-47): boxes are (xc, yc, w, h) in 1-indexed IMAGE
coordinates. A box maps to normalized coords n in [-1, 1] via
n = (2p - 1 - S) / (S - 1) for image size S; the normalized coordinate
system of the conv feature map coincides with the image's, so sampling
positions on a feature map of size Sf are p_f(0-indexed) =
(n + 1) * (Sf - 1) / 2. Output sample points are an HH x WW grid over
linspace(-1, 1) in box-normalized space (AffineGridGeneratorBHWD uses
inclusive linspace endpoints), i.e. the grid corners sit ON the box
corners. Out-of-range sample positions clamp to the feature-map border,
matching stnbhwd's coordinate clamping.

The backward pass is jax autodiff of the gather: XLA turns it into
scatter-adds, replacing stnbhwd's atomicAdd backward
(BatchBilinearSamplerBHWD.lua:30-54).

Two implementations with identical numerics (parity-tested like the
reference's fast-vs-naive sampler test, BatchBilinearSamplerBHWD_test.lua):
  * roi_align      — pure jnp gathers; XLA-fused; the default.
  * roi_align_pallas — Pallas TPU kernel (densecap_tpu/ops/pallas/)
    used on the serving path where gather fusion falls short.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sample_coords(boxes, img_h, img_w, feat_h, feat_w, out_h, out_w):
    """Per-box feature-map sampling positions.

    Returns (yf, xf): (B, out_h) and (B, out_w) 0-indexed float positions
    on the feature map.
    """
    xc, yc, w, h = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
    # BoxToAffine.lua:84-92 (normalized box center and scale):
    th13 = (2.0 * yc - img_h - 1.0) / (img_h - 1.0)   # y center
    th23 = (2.0 * xc - img_w - 1.0) / (img_w - 1.0)   # x center
    th11 = h / img_h                                   # y scale
    th22 = w / img_w                                   # x scale
    gy = jnp.linspace(-1.0, 1.0, out_h)
    gx = jnp.linspace(-1.0, 1.0, out_w)
    y_norm = th11[:, None] * gy[None, :] + th13[:, None]  # (B, out_h)
    x_norm = th22[:, None] * gx[None, :] + th23[:, None]  # (B, out_w)
    yf = (y_norm + 1.0) * (feat_h - 1.0) / 2.0
    xf = (x_norm + 1.0) * (feat_w - 1.0) / 2.0
    # border-replicate: clamp sample positions to the map (out-of-image
    # samples only occur for boxes poking past the clipped image edge)
    yf = jnp.clip(yf, 0.0, jnp.asarray(feat_h, yf.dtype) - 1.0)
    xf = jnp.clip(xf, 0.0, jnp.asarray(feat_w, xf.dtype) - 1.0)
    return yf, xf


def roi_align(feats, boxes, img_h, img_w, out_h=7, out_w=7,
              feat_h=None, feat_w=None):
    """Bilinearly pool a fixed-size window of features for each box.

    Args:
      feats: (H', W', C) conv feature map (NHWC single image). May be a
        padded canvas larger than the image's real feature extent.
      boxes: (B, 4) xcycwh boxes in 1-indexed image coordinates.
      img_h, img_w: image size the boxes live in (python or traced
        scalars; the feature map's normalized coords coincide with the
        image's so only ratios matter).
      out_h, out_w: static output window (7x7 for VGG).
      feat_h, feat_w: the feature extent that actually corresponds to the
        img_h x img_w image (dynamic scalars allowed). Defaults to the
        full feats shape. When images are padded onto a fixed canvas,
        pass the cropped extent (e.g. floor-chain H//2//2//2//2 for
        VGG-16) so normalized coordinates line up exactly as they do in
        the reference, which always runs on the cropped image.

    Returns (B, out_h, out_w, C). Differentiable in feats AND boxes
    (the reference also backprops into box coordinates through
    BoxToAffine.lua:96-118).
    """
    Hf, Wf, C = feats.shape
    if feat_h is None:
        feat_h = Hf
    if feat_w is None:
        feat_w = Wf
    fdt = jnp.promote_types(boxes.dtype, jnp.float32)
    yf, xf = _sample_coords(
        boxes.astype(fdt), img_h, img_w, feat_h, feat_w, out_h, out_w
    )

    # Border-clamped bilinear interpolation, separable gather:
    # gather rows then columns (grid is axis-aligned: y depends only on
    # the output row, x only on the output column).
    def interp_axis(pos, size):
        p0 = jnp.floor(pos)
        frac = pos - p0
        i0 = jnp.clip(p0.astype(jnp.int32), 0, size - 1)
        i1 = jnp.clip(i0 + 1, 0, size - 1)
        return i0, i1, frac

    # clamp to the CROPPED extent so padded canvas rows/cols are never read
    y0, y1, fy = interp_axis(yf, feat_h)  # (B, out_h)
    x0, x1, fx = interp_axis(xf, feat_w)  # (B, out_w)

    # rows: (B, out_h, Wf, C)
    rows = (
        feats[y0] * (1.0 - fy)[..., None, None]
        + feats[y1] * fy[..., None, None]
    )
    # columns from rows: (B, out_h, out_w, C)
    bidx = jnp.arange(boxes.shape[0])[:, None]
    cols0 = rows[bidx, :, x0].transpose(0, 2, 1, 3)  # (B, out_h, out_w, C)
    cols1 = rows[bidx, :, x1].transpose(0, 2, 1, 3)
    out = cols0 * (1.0 - fx)[:, None, :, None] + cols1 * fx[:, None, :, None]
    return out


def roi_align_mxu(feats, boxes, img_h, img_w, out_h=7, out_w=7,
                  feat_h=None, feat_w=None, compute_dtype=None):
    """RoI align as two matmuls per box — the MXU formulation.

    Bilinear interpolation over an axis-aligned grid is linear in the
    feature map:  out[p, q, :] = sum_ij Ry[p, i] * feats[i, j, :] *
    Rx[q, j], where Ry/Rx are per-box tent-weight matrices with two
    nonzeros per row (the bilinear weights). Building R densely turns
    the gather-bound sampler into two dense contractions that XLA tiles
    straight onto the MXU — the TPU answer to stnbhwd's hand-written
    CUDA gather kernels. Numerics are IDENTICAL to roi_align (same
    clamped positions; weights sum to 1), parity-tested.
    """
    Hf, Wf, C = feats.shape
    if feat_h is None:
        feat_h = Hf
    if feat_w is None:
        feat_w = Wf
    fdt = jnp.promote_types(boxes.dtype, jnp.float32)
    yf, xf = _sample_coords(
        boxes.astype(fdt), img_h, img_w, feat_h, feat_w, out_h, out_w
    )

    def tent(pos, size):
        # (B, out, size) weights: max(0, 1 - |pos - i|); rows sum to 1
        # because pos is clamped inside [0, size-1]
        i = jnp.arange(size, dtype=pos.dtype)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - i))

    Ry = tent(yf, Hf)  # (B, out_h, Hf)
    Rx = tent(xf, Wf)  # (B, out_w, Wf)
    # mask padded canvas rows/cols so they contribute nothing even when
    # a clamped position sits exactly on the cropped boundary
    row_ok = jnp.arange(Hf) < jnp.asarray(feat_h)
    col_ok = jnp.arange(Wf) < jnp.asarray(feat_w)
    Ry = Ry * row_ok
    Rx = Rx * col_ok

    if compute_dtype is not None:
        Ry = Ry.astype(compute_dtype)
        Rx = Rx.astype(compute_dtype)
        feats = feats.astype(compute_dtype)
    rows = jnp.einsum("bph,hwc->bpwc", Ry, feats,
                      preferred_element_type=jnp.float32)
    if compute_dtype is not None:
        # The (B, out_h, Wf, C) intermediate is the dominant HBM traffic
        # of this op (flagship: 8 x 1000 x 7 x 45 x 512). Keep it in the
        # compute dtype: the second MXU contraction takes bf16 operands
        # anyway, so XLA rounds `rows` to bf16 at its input regardless —
        # materializing it f32 only doubled the bytes. Measured 13.7 ->
        # 10.4 ms/step isolated at B=8 x 1000 with BIT-IDENTICAL output
        # (doc/BENCH.md). The f32 path (training) is untouched.
        # Bit-identity assumes JAX's DEFAULT matmul precision (bf16
        # operand rounding on TPU); under
        # jax_default_matmul_precision=float32/highest the old code fed
        # the contraction an f32 operand, so this cast then trades that
        # extra precision for the bandwidth win. compute_dtype=None
        # (the training/full-precision path) skips the cast entirely.
        rows = rows.astype(compute_dtype)
    out = jnp.einsum("bqw,bpwc->bpqc", Rx, rows,
                     preferred_element_type=jnp.float32)
    # (Also casting the OUTPUT to compute_dtype was tried and measures
    # NULL in the full program — 63.35 vs 63.38 ms — XLA already fuses
    # the consumer's bf16 cast into this einsum's epilogue, so the f32
    # output tensor never round-trips HBM at full width. Left f32.)
    return out


def roi_align_naive(feats, boxes, img_h, img_w, out_h=7, out_w=7,
                    feat_h=None, feat_w=None):
    """Reference implementation: per-point bilinear lookup, no tricks.

    Used only in tests as the golden model (plays the role of
    NaiveBatchBilinearSamplerBHWD, BatchBilinearSamplerBHWD.lua:163-207).
    """
    Hf, Wf, C = feats.shape
    if feat_h is None:
        feat_h = Hf
    if feat_w is None:
        feat_w = Wf
    fdt = jnp.promote_types(boxes.dtype, jnp.float32)
    yf, xf = _sample_coords(
        boxes.astype(fdt), img_h, img_w, feat_h, feat_w, out_h, out_w
    )
    yy = jnp.broadcast_to(yf[:, :, None], (boxes.shape[0], out_h, out_w))
    xx = jnp.broadcast_to(xf[:, None, :], (boxes.shape[0], out_h, out_w))

    def sample_point(y, x):
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, feat_h - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, feat_w - 1)
        y1 = jnp.clip(y0 + 1, 0, feat_h - 1)
        x1 = jnp.clip(x0 + 1, 0, feat_w - 1)
        fy = y - jnp.floor(y)
        fx = x - jnp.floor(x)
        v00 = feats[y0, x0]
        v01 = feats[y0, x1]
        v10 = feats[y1, x0]
        v11 = feats[y1, x1]
        return (
            v00 * (1 - fy) * (1 - fx)
            + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx)
            + v11 * fy * fx
        )

    return jax.vmap(jax.vmap(jax.vmap(sample_point)))(yy, xx)
