"""Pallas TPU kernel for RoI align (MXU formulation).

One fused kernel for the whole RoI-align pass: per grid step a tile of
boxes builds its tent-weight interpolation matrices in-register and runs
the two contractions against the conv feature map, which stays resident
in VMEM across the (sequential) TPU grid — no HBM round-trips for the
intermediate row-interpolation, unlike the XLA einsum pair in
ops/roi_align.py:roi_align_mxu which materializes (B, out_h, Wf, C).

Numerics match ops/roi_align.py exactly (same clamped positions / tent
weights); parity-tested in interpret mode on CPU and used on the TPU
serving path. Forward-only: training uses the autodiff-able jnp version
(its backward is an XLA scatter-add, already the right tool).

VMEM budget (worst case, 720px canvas, bf16 TB=16, spatial dims
padded 45->48 for the bf16 tiling): feats 48x48x512 bf16 = 2.4 MB;
the `rows` intermediate is F32 regardless of compute_dtype (the MXU
accumulator must be f32 — Mosaic rejects a bf16 acc), so it is
112 x (48*512) x 4B = 11.0 MB; out tile f32 1.6 MB — total ~15 MB,
TIGHT against the ~16 MB/core budget. Any geometry growth (bigger
canvas, TB, or out_h) must re-check this first. (f32 mode runs TB=8
to halve the rows buffer.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roi_align import _sample_coords


def _kernel(yf_ref, xf_ref, feats_ref, rowok_ref, colok_ref, out_ref,
            *, compute_dtype):
    """Grid: (B // TB,). Block shapes:
    yf (TB, out_h), xf (TB, out_w), feats (Hf, Wf, C) [whole map],
    rowok (1, Hf), colok (1, Wf), out (TB, out_h, out_w, C).

    compute_dtype: dtype of the two MXU contractions. bf16 runs the
    128x128x128 block at native rate (f32 multi-passes) and halves the
    `rows` intermediate's VMEM traffic; the tent weights carry ~8
    significant bits in bf16 so pooled features match f32 to ~1e-2
    relative — the parity tests bound it.
    """
    TB, out_h = yf_ref.shape
    _, out_w = xf_ref.shape
    Hf, Wf, C = feats_ref.shape

    yf = yf_ref[:]                      # (TB, out_h)
    xf = xf_ref[:]                      # (TB, out_w)

    # tent weights, built with broadcasted iota (int32 — TPU iota only
    # supports integer results — then cast)
    iy = jax.lax.broadcasted_iota(jnp.int32, (TB, out_h, Hf), 2
                                  ).astype(jnp.float32)
    Ry = jnp.maximum(0.0, 1.0 - jnp.abs(yf[:, :, None] - iy))
    Ry = Ry * rowok_ref[0][None, None, :]
    ix = jax.lax.broadcasted_iota(jnp.int32, (TB, out_w, Wf), 2
                                  ).astype(jnp.float32)
    Rx = jnp.maximum(0.0, 1.0 - jnp.abs(xf[:, :, None] - ix))
    Rx = Rx * colok_ref[0][None, None, :]

    # casts happen on 2D lane-aligned shapes only — a bf16 cast of the
    # (TB, 7, Hf) tent tensor (7-sublane bf16 layout) crashes Mosaic
    feats2d = feats_ref[:].reshape(Hf, Wf * C).astype(compute_dtype)
    Ry2d = Ry.reshape(TB * out_h, Hf).astype(compute_dtype)
    # first contraction on the MXU: (TB*out_h, Hf) @ (Hf, Wf*C).
    # The accumulator must be f32 (Mosaic rejects a bf16 acc).
    rows = jnp.dot(
        Ry2d, feats2d, preferred_element_type=jnp.float32,
    ).reshape(TB, out_h, Wf, C)
    # second contraction per box: (out_w, Wf) @ (Wf, out_h*C); f32 —
    # its M=out_w=7 runs in one MXU pass either way, nothing to win
    out = jax.lax.dot_general(
        Rx, rows,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, out_w, out_h, C)
    out_ref[:] = jnp.transpose(out, (0, 2, 1, 3))


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "tile_boxes", "interpret",
                     "compute_dtype"),
)
def roi_align_pallas(feats, boxes, img_h, img_w, out_h=7, out_w=7,
                     feat_h=None, feat_w=None, tile_boxes=None,
                     interpret=False, compute_dtype=jnp.bfloat16):
    """Drop-in equivalent of ops.roi_align.roi_align (forward only).

    tile_boxes default: 16 for bf16 (first contraction M = 16*7 = 112,
    ~one full MXU block instead of round-1's 56/128; TB must be a
    multiple of 8 — sublane dim of the yf/xf blocks), 8 for f32 (the
    f32 `rows` intermediate at TB=16 would crowd the ~16 MB VMEM
    budget).
    compute_dtype=bf16 runs the contractions at native MXU rate; pass
    f32 for exact parity with ops.roi_align.roi_align (the parity tests
    exercise both).
    """
    Hf, Wf, C = feats.shape
    B = boxes.shape[0]
    if feat_h is None:
        feat_h = Hf
    if feat_w is None:
        feat_w = Wf
    if tile_boxes is None:
        # TB is the sublane dim of the yf/xf blocks -> multiple of 8.
        # bf16: TB=16 puts the first contraction at M=112 (one nearly
        # full MXU block); f32 keeps TB=8 (VMEM: f32 rows buffer).
        tile_boxes = 16 if compute_dtype == jnp.bfloat16 else 8

    if compute_dtype == jnp.bfloat16:
        # bf16 arrays tile as (16, 128); a 45-sublane reshape inside the
        # kernel crashes Mosaic. Pad the spatial dims to multiples of 16
        # — rowok/colok give the padded rows/cols zero tent weight, so
        # outputs are unchanged.
        ph, pw = (-Hf) % 16, (-Wf) % 16
        if ph or pw:
            feats = jnp.pad(feats, ((0, ph), (0, pw), (0, 0)))
            Hf, Wf = Hf + ph, Wf + pw

    yf, xf = _sample_coords(
        boxes.astype(jnp.float32), img_h, img_w, feat_h, feat_w,
        out_h, out_w,
    )
    rowok = (jnp.arange(Hf) < jnp.asarray(feat_h)).astype(jnp.float32)
    colok = (jnp.arange(Wf) < jnp.asarray(feat_w)).astype(jnp.float32)

    TB = int(tile_boxes)
    pad = (-B) % TB
    if pad:
        yf = jnp.pad(yf, ((0, pad), (0, 0)))
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    Bp = B + pad

    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, out_h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, out_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hf, Wf, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, out_h, out_w, C), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, out_h, out_w, C),
                                       jnp.float32),
        interpret=interpret,
    )(yf, xf, feats.astype(compute_dtype), rowok[None], colok[None])
    return out[:B]
