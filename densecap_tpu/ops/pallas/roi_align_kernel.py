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

VMEM budget (worst case, 720px canvas): feats 45x45x512 f32 = 4.1 MB,
rows buffer TB*7 x Wf*C = 28 x 23040 f32 = 2.6 MB, out tile 0.4 MB —
comfortably under the ~16 MB/core budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roi_align import _sample_coords


def _kernel(yf_ref, xf_ref, feats_ref, rowok_ref, colok_ref, out_ref):
    """Grid: (B // TB,). Block shapes:
    yf (TB, out_h), xf (TB, out_w), feats (Hf, Wf, C) [whole map],
    rowok (1, Hf), colok (1, Wf), out (TB, out_h, out_w, C).
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

    feats2d = feats_ref[:].reshape(Hf, Wf * C)
    # first contraction on the MXU: (TB*out_h, Hf) @ (Hf, Wf*C)
    rows = jnp.dot(
        Ry.reshape(TB * out_h, Hf), feats2d,
        preferred_element_type=jnp.float32,
    ).reshape(TB, out_h, Wf, C)
    # second contraction per box: (out_w, Wf) @ (Wf, out_h*C)
    out = jax.lax.dot_general(
        Rx, rows,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TB, out_w, out_h, C)
    out_ref[:] = jnp.transpose(out, (0, 2, 1, 3))


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "tile_boxes", "interpret"),
)
def roi_align_pallas(feats, boxes, img_h, img_w, out_h=7, out_w=7,
                     feat_h=None, feat_w=None, tile_boxes=8,
                     interpret=False):
    """Drop-in equivalent of ops.roi_align.roi_align (forward only)."""
    Hf, Wf, C = feats.shape
    B = boxes.shape[0]
    if feat_h is None:
        feat_h = Hf
    if feat_w is None:
        feat_w = Wf

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
        _kernel,
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
    )(yf, xf, feats.astype(jnp.float32), rowok[None], colok[None])
    return out[:B]
