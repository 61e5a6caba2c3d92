"""Pallas TPU kernel for the greedy-NMS suppression sweep.

ops/nms.py expresses greedy NMS as a tiled sweep driven by
lax.fori_loop — correct, but each tile step is a separate XLA loop
iteration with its own buffer traffic. Here the WHOLE sweep is one
Pallas kernel: the TPU grid is sequential, so the alive mask lives in
the output VMEM ref across grid steps; each step resolves one tile's
within-tile greedy fixpoint and suppresses all later boxes in chunked
(T x C) IoU blocks without ever leaving VMEM.

TPU layout notes: Mosaic wants >= 2D vector memory, so boxes are stored
transposed as (4, Np) — coordinates in sublanes, boxes along lanes —
and the alive/valid masks as (1, Np) f32; all dynamic lane slices start
at multiples of the 128-wide tile.

Inputs are pre-sorted by score (the jnp wrapper sorts and post-selects,
sharing all semantics/tests with ops.nms.nms). Suppression uses pascal
+1 IoU and strict > thresh, identical to the reference
(box_utils.lua:154-256).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e38


def _make_kernel(T, C, Np, thresh):
    n_chunks = Np // C

    def kernel(boxesT_ref, valid_ref, alive_ref):
        t = pl.program_id(0)
        start = pl.multiple_of(t * T, T)

        # first step: alive := valid (output ref doubles as the carried
        # alive mask across the sequential TPU grid)
        @pl.when(t == 0)
        def _():
            alive_ref[:] = valid_ref[:]

        tb = boxesT_ref[:, pl.ds(start, T)]            # (4, T)
        # tile coordinates as columns (T, 1)
        tx1 = tb[0:1, :].T
        ty1 = tb[1:2, :].T
        tx2 = tb[2:3, :].T
        ty2 = tb[3:4, :].T
        t_area = (tx2 - tx1 + 1.0) * (ty2 - ty1 + 1.0)  # (T, 1)

        def iou_vs(blk):
            """(4, C') block -> (T, C') pascal IoU vs the tile."""
            bx1 = blk[0:1, :]
            by1 = blk[1:2, :]
            bx2 = blk[2:3, :]
            by2 = blk[3:4, :]
            iw = jnp.maximum(
                jnp.minimum(tx2, bx2) - jnp.maximum(tx1, bx1) + 1.0, 0.0)
            ih = jnp.maximum(
                jnp.minimum(ty2, by2) - jnp.maximum(ty1, by1) + 1.0, 0.0)
            inter = iw * ih
            ba = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
            return inter / (t_area + ba - inter)

        alive_in = alive_ref[0:1, pl.ds(start, T)]      # (1, T)

        # ---- within-tile greedy fixpoint --------------------------------
        iou_tt = iou_vs(tb)                             # (T, T)
        r = lax.broadcasted_iota(jnp.int32, (T, T), 0)
        c = lax.broadcasted_iota(jnp.int32, (T, T), 1)
        sup_tt = (iou_tt > thresh) & (r < c)

        def fix_cond(state):
            cur, prev, it = state
            return jnp.logical_and(jnp.any(cur != prev), it < T)

        def fix_step(state):
            cur, _, it = state
            curC = cur.T                                # (T, 1)
            suppressed = jnp.any(sup_tt & (curC > 0.5), axis=0,
                                 keepdims=True)         # (1, T)
            new = jnp.where(suppressed, 0.0, alive_in)
            return new, cur, it + 1

        first = jnp.where(
            jnp.any(sup_tt & (alive_in.T > 0.5), axis=0, keepdims=True),
            0.0, alive_in,
        )
        alive_tile, _, _ = lax.while_loop(
            fix_cond, fix_step, (first, alive_in, jnp.int32(0))
        )
        alive_ref[0:1, pl.ds(start, T)] = alive_tile
        alive_col = alive_tile.T                        # (T, 1)

        # ---- suppress later boxes, chunked over columns ------------------
        def chunk_body(j, _):
            cstart = pl.multiple_of(j * C, C)
            blk = boxesT_ref[:, pl.ds(cstart, C)]       # (4, C)
            iou_tc = iou_vs(blk)                        # (T, C)
            sup = jnp.any((iou_tc > thresh) & (alive_col > 0.5), axis=0,
                          keepdims=True)                # (1, C)
            col = lax.broadcasted_iota(jnp.int32, (1, C), 1) + cstart
            later = col >= start + T
            cur = alive_ref[0:1, pl.ds(cstart, C)]
            alive_ref[0:1, pl.ds(cstart, C)] = jnp.where(
                sup & later, 0.0, cur)
            return 0

        lax.fori_loop(0, n_chunks, chunk_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("iou_thresh", "max_out", "tile_size", "chunk",
                     "interpret"),
)
def nms_pallas(boxes, scores, iou_thresh, max_out, valid=None,
               tile_size=128, chunk=2048, interpret=False):
    """Drop-in equivalent of ops.nms.nms backed by the Pallas sweep."""
    N = boxes.shape[0]
    T = int(tile_size)
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)

    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order].astype(jnp.float32)
    svalid = (masked_scores[order] > NEG_INF / 2).astype(jnp.float32)

    C = min(int(chunk), -(-N // T) * T)
    base = math.lcm(T, C)
    Np = -(-N // base) * base
    pad = Np - N
    if pad:
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        svalid = jnp.pad(svalid, ((0, pad),))

    alive = pl.pallas_call(
        _make_kernel(T, C, Np, float(iou_thresh)),
        grid=(Np // T,),
        in_specs=[
            pl.BlockSpec((4, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Np), jnp.float32),
        interpret=interpret,
    )(sboxes.T, svalid[None])[0]

    alive_b = alive > 0.5
    K = int(max_out)
    rank = jnp.cumsum(alive_b) - 1
    take = alive_b & (rank < K)
    slot = jnp.where(take, rank, K)
    sorted_orig_idx = jnp.concatenate(
        [order, jnp.zeros((Np - N,), dtype=order.dtype)]
    )
    idx = jnp.zeros((K,), dtype=jnp.int32).at[slot].set(
        sorted_orig_idx.astype(jnp.int32), mode="drop"
    )
    total = jnp.minimum(jnp.sum(alive_b), K)
    out_valid = jnp.arange(K) < total
    return idx, out_valid
