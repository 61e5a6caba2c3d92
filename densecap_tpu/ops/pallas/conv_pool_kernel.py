"""Fused 3x3-conv + bias + ReLU + extent-mask + 2x2 max-pool Pallas kernel.

Replaces the two HBM-heaviest stages of the VGG trunk — conv1_2+pool1
and conv2_2+pool2 (reference torch layers 3-5 / 8-10, chopped at
DenseCapModel.lua:61-67) — with ONE kernel that never materializes the
pre-pool activation in HBM. At B=8 720px the unfused XLA pair writes +
re-reads a 531 MB bf16 intermediate (conv1_2 5.26 ms + pool1 4.72 ms,
doc/BENCH.md trunk table); fused, the intermediate lives only in VMEM.

Both fused stages sit in trunk1, which the reference NEVER trains (its
manual backward starts at torch layer 11, DenseCapModel.lua:338-358)
and which this repo always wraps in stop_gradient — so the kernel needs
no VJP: differentiating it is a loud trace-time error by construction.

Formulation. The input arrives in a "w-paired" layout (N, H, W/2, 2C)
— a free row-major reshape of the NHWC activation: lane block [0:C] is
the even w column of the pair, [C:2C] the odd one. Mosaic cannot shape-
cast sublanes into lanes inside a kernel (that relayout was the exact
failure mode of the standalone lane-view pool, doc/BENCH.md), but the
SAME view taken in HBM by the caller is a byte-level no-op. Per grid
step (one image x R output rows):

  * DMA the R rows plus a 1-row halo each side into a zero-padded VMEM
    scratch (R+2, W/2 + 2, 2C) — one zero pair-column each side covers
    the conv's SAME padding.
  * Build A = [P(j-1) | P(j) | lo(P(j+1))] -> ((R+2)*W/2, 4C): the
    4C-wide window spans input columns 2j-2 .. 2j+2, enough for BOTH
    outputs of pair j (even needs 2j-1..2j+1, odd needs 2j..2j+2).
  * ONE MXU matmul Q = A @ B2 with B2 (4C, 6C): columns [0:3C] hold the
    even output's three dy groups, [3C:6C] the odd's; the two zero
    C-blocks (even never reads 2j+2, odd never reads 2j-2) cost 33%
    nominal FLOPs — repaid by K,N >= 256 keeping the 128-wide MXU full
    where XLA's 64-channel conv lowering runs half-empty.
  * Combine dy groups with shifted adds (f32), cast to compute dtype,
    add bias, ReLU — matching the unfused path's numerics (identical
    f32-accumulated products, one summation-order difference).
  * Apply the canvas extent mask (rows < eh, cols < ew; even and odd
    columns masked at 2j and 2j+1) IN the kernel, preserving the
    canvas==cropped exactness contract of apply_trunk.
  * The 2x2/2 max pool is then jnp.maximum(Y_even, Y_odd) followed by
    an h-pair max over a leading-dim split — no lane/sublane reshape.
  * Re-mask the POOLED output at the floor-halved extents (rows <
    floor(eh/2), cols < floor(ew/2)) — the same post-pool mask
    apply_trunk applies, so the kernel is a drop-in replacement for
    conv -> relu -> mask -> pool -> mask and the caller continues with
    the floor-halved extent.

Halo rows are recomputed rather than carried between grid steps:
(R+2)/R = 25% extra matmul FLOPs at R=8, bought back many times over
by the saved HBM round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output rows per grid step. 8 divides every shipping geometry (720,
# 544, 480 canvases and their /2 stage-2 sizes) and keeps the VMEM
# working set (~9 MB at C=64, W=720) well under the ~16 MB budget.
R = 8

# VMEM guard: C * W of the largest supported block. 64*768 == 128*384;
# both shipping stages (C=64 W<=720, C=128 W<=384) fit.
_MAX_CW = 64 * 768


def can_fuse(x_shape, w_shape) -> bool:
    """True when fused_conv_relu_pool supports this geometry."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    _, H, W, C = x_shape
    kh, kw, ci, co = w_shape
    return (
        kh == 3 and kw == 3 and ci == C and co == C
        and C in (64, 128)
        and H % R == 0 and H >= R
        and W % 2 == 0 and W >= 4
        and C * W <= _MAX_CW
    )


def _kernel(x_any, bm_ref, bias_ref, ext_ref, out_ref, xs_ref, sems,
            *, W2, C):
    """x_any: (N, H, W2, 2C) paired-layout input in HBM."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    r0 = i * R
    cd = xs_ref.dtype

    # Scratch layout: (R+2, PAD + W2 + PAD, 2C) with PAD = 8 (one full
    # sublane tile). DMA destinations must be tile-aligned on the
    # sublane dim — Mosaic rejects a memref_slice at sublane offset 1
    # ("tile index in dimension 1 not divisible by the tiling (8)") —
    # so the body lands at offset PAD and only the two SAME-padding
    # zero pair-columns sit at the unaligned read edges (PAD-1 and
    # PAD+W2), touched by plain vector loads, which relayout freely.
    PAD = 8

    # --- stage rows [r0-1, r0+R] into the pair-padded scratch ----------
    body = pltpu.make_async_copy(
        x_any.at[b, pl.ds(r0, R), :, :],
        xs_ref.at[pl.ds(1, R), pl.ds(PAD, W2), :],
        sems.at[0],
    )
    body.start()

    @pl.when(i > 0)
    def _():
        pltpu.make_async_copy(
            x_any.at[b, pl.ds(r0 - 1, 1), :, :],
            xs_ref.at[pl.ds(0, 1), pl.ds(PAD, W2), :],
            sems.at[1],
        ).start()

    @pl.when(i < nb - 1)
    def _():
        pltpu.make_async_copy(
            x_any.at[b, pl.ds(r0 + R, 1), :, :],
            xs_ref.at[pl.ds(R + 1, 1), pl.ds(PAD, W2), :],
            sems.at[2],
        ).start()

    # SAME-padding zeros: the w pair-columns every step (the DMAs never
    # touch them, but scratch reuse across steps makes fresh writes the
    # safe choice and they are ~KB), the h halo rows only at the edges.
    xs_ref[:, PAD - 1, :] = jnp.zeros((R + 2, 2 * C), cd)
    xs_ref[:, PAD + W2, :] = jnp.zeros((R + 2, 2 * C), cd)

    @pl.when(i == 0)
    def _():
        xs_ref[0, pl.ds(PAD - 1, W2 + 2), :] = jnp.zeros((W2 + 2, 2 * C),
                                                         cd)

    @pl.when(i == nb - 1)
    def _():
        xs_ref[R + 1, pl.ds(PAD - 1, W2 + 2), :] = jnp.zeros(
            (W2 + 2, 2 * C), cd)

    body.wait()

    @pl.when(i > 0)
    def _():
        pltpu.make_async_copy(
            x_any.at[b, pl.ds(r0 - 1, 1), :, :],
            xs_ref.at[pl.ds(0, 1), pl.ds(PAD, W2), :],
            sems.at[1],
        ).wait()

    @pl.when(i < nb - 1)
    def _():
        pltpu.make_async_copy(
            x_any.at[b, pl.ds(r0 + R, 1), :, :],
            xs_ref.at[pl.ds(R + 1, 1), pl.ds(PAD, W2), :],
            sems.at[2],
        ).wait()

    # --- conv as THREE (R+2)*W2 x 2C x 6C matmuls -----------------------
    # The even output of pair j taps x(2j-1), x(2j), x(2j+1); the odd
    # taps x(2j), x(2j+1), x(2j+2). Rather than concatenating shifted
    # scratch slices into one 4C-wide A (Mosaic rejects concat of
    # differently-offset slices), contract the FULL 2C pair vectors
    # P(j-1), P(j), P(j+1) against zero-padded weight blocks bm_ref =
    # [Bleft; Bcenter; Bright] (6C, 6C) — identical sums, and every
    # matmul keeps a >=128-wide contraction dim.
    xw = xs_ref[:]  # (R+2, PAD + W2 + PAD, 2C)
    m = (R + 2) * W2
    c2 = 2 * C
    q = jnp.dot(xw[:, PAD:PAD + W2, :].reshape(m, c2),
                bm_ref[c2:2 * c2], preferred_element_type=jnp.float32)
    q += jnp.dot(xw[:, PAD - 1:PAD - 1 + W2, :].reshape(m, c2),
                 bm_ref[0:c2], preferred_element_type=jnp.float32)
    q += jnp.dot(xw[:, PAD + 1:PAD + 1 + W2, :].reshape(m, c2),
                 bm_ref[2 * c2:3 * c2], preferred_element_type=jnp.float32)
    q = q.reshape(R + 2, W2, 6 * C)

    # dy-group combination: Y[t] = Q[t, g0] + Q[t+1, g1] + Q[t+2, g2],
    # for the even ([0:3C]) and odd ([3C:6C]) output columns
    ye = (q[0:R, :, 0 * C:1 * C]
          + q[1:R + 1, :, 1 * C:2 * C]
          + q[2:R + 2, :, 2 * C:3 * C])
    yo = (q[0:R, :, 3 * C:4 * C]
          + q[1:R + 1, :, 4 * C:5 * C]
          + q[2:R + 2, :, 5 * C:6 * C])
    bias = bias_ref[0]
    zero = jnp.zeros((), cd)
    ye = jnp.maximum(ye.astype(cd) + bias, zero)
    yo = jnp.maximum(yo.astype(cd) + bias, zero)

    # canvas extent mask (see apply_trunk): zero rows >= eh, cols >= ew
    eh = ext_ref[b, 0]
    ew = ext_ref[b, 1]
    rows = (jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0) + r0
            ).astype(jnp.float32)
    cols = (2 * jax.lax.broadcasted_iota(jnp.int32, (1, W2, 1), 1)
            ).astype(jnp.float32)
    rok = rows < eh
    ye = jnp.where(jnp.logical_and(rok, cols < ew), ye, zero)
    yo = jnp.where(jnp.logical_and(rok, cols + 1.0 < ew), yo, zero)

    # 2x2/2 max pool: the w-pair max is now just even-vs-odd; h pairs
    # split a leading dim (no lane/sublane relayout)
    wm = jnp.maximum(ye, yo)                   # (R, W2, C)
    h4 = wm.reshape(R // 2, 2, W2, C)
    pooled = jnp.maximum(h4[:, 0], h4[:, 1])   # (R/2, W2, C)

    # post-pool re-mask at the FLOOR-halved extents, exactly like
    # apply_trunk after every pool: for odd eh/ew the pooled cell at
    # floor(e/2) covers a partial window of valid data (e.g. valid row
    # eh-1) and must not leak into the next conv's edge reads.
    fh = jnp.floor(eh * 0.5)
    fw = jnp.floor(ew * 0.5)
    prows = (jax.lax.broadcasted_iota(jnp.int32, (R // 2, 1, 1), 0)
             + r0 // 2).astype(jnp.float32)
    pcols = jax.lax.broadcasted_iota(
        jnp.int32, (1, W2, 1), 1).astype(jnp.float32)
    out_ref[0] = jnp.where(
        jnp.logical_and(prows < fh, pcols < fw), pooled, zero)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_conv_relu_pool(x, w, b, ext, *, interpret=False):
    """(N, H, W, C) -> (N, H/2, W/2, C): conv3x3-SAME + bias + ReLU +
    extent mask + 2x2/2 max pool, one kernel.

    x: compute-dtype activations; w: (3, 3, C, C) HWIO f32 weights;
    b: (C,) f32 bias; ext: (N, 2) f32 per-image (eh, ew) valid extents
    (pass (H, W) rows for unmasked images).
    """
    N, H, W, C = x.shape
    if not can_fuse(x.shape, w.shape):
        # explicit raise (not assert: stripped under python -O) so
        # out-of-contract shapes fail loudly at trace time instead of
        # hitting wrong reshapes or opaque Mosaic errors
        raise ValueError(
            "fused_conv_relu_pool unsupported geometry: x%s w%s "
            "(need 3x3 CxC conv, C in {64,128}, H %% %d == 0, W even, "
            "C*W <= %d)" % (x.shape, w.shape, R, _MAX_CW))
    cd = x.dtype
    W2 = W // 2
    c3 = 3 * C
    # the paired view: a byte-level no-op in row-major HBM
    xp = x.reshape(N, H, W2, 2 * C)
    # Bold[(dx*C + ci), (dy*C + co)] = W[dy, dx, ci, co]. Conceptually
    # the conv contracts A = [x(2j-1) | x(2j) | x(2j+1) | x(2j+2)]
    # against B2 = [[bold; 0] | [0; bold]] (4C, 6C); the kernel instead
    # contracts the three FULL pair vectors P(j-1), P(j), P(j+1) (2C
    # each) against zero-padded row blocks of B2 stacked into bm
    # (6C, 6C) — x(2j-2) and x(2j+3) rows are zero:
    #   Bleft   = [0;        B2[0:C]]     (hi of P(j-1) = x(2j-1))
    #   Bcenter = B2[C:3C]                (P(j) = x(2j), x(2j+1))
    #   Bright  = [B2[3C:4C]; 0]          (lo of P(j+1) = x(2j+2))
    bold = jnp.transpose(w.astype(cd), (1, 2, 0, 3)).reshape(c3, c3)
    zc = jnp.zeros((C, c3), cd)
    beven = jnp.concatenate([bold, zc], axis=0)      # (4C, 3C)
    bodd = jnp.concatenate([zc, bold], axis=0)       # (4C, 3C)
    b2 = jnp.concatenate([beven, bodd], axis=1)      # (4C, 6C)
    z6 = jnp.zeros((C, 6 * C), cd)
    bm = jnp.concatenate([
        z6, b2[0:C],                                 # Bleft   (2C, 6C)
        b2[C:3 * C],                                 # Bcenter (2C, 6C)
        b2[3 * C:4 * C], z6,                         # Bright  (2C, 6C)
    ], axis=0)                                       # (6C, 6C)
    bias = b.astype(cd).reshape(1, C)
    ext = jnp.asarray(ext, jnp.float32).reshape(N, 2)

    kernel = functools.partial(_kernel, W2=W2, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(N, H // R),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xp stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bm (4C, 6C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, C)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ext (N, 2)
        ],
        out_specs=pl.BlockSpec(
            (1, R // 2, W2, C),
            lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, H // 2, W2, C), cd),
        scratch_shapes=[
            # PAD(8) | W2 body | zero col + tile-rounding slack: DMA
            # destinations stay sublane-tile-aligned (see _kernel)
            pltpu.VMEM((R + 2, W2 + 16, 2 * C), cd),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xp, bm, bias, ext)
    return out
