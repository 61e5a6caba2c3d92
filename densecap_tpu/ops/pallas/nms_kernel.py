"""Pallas TPU kernel for the greedy-NMS suppression sweep.

ops/nms.py expresses greedy NMS as a tiled sweep driven by
lax.fori_loop — correct, but each tile step is a separate XLA loop
iteration with its own buffer traffic. Here the WHOLE sweep is one
Pallas kernel: the TPU grid is sequential, so the alive mask lives in
the output VMEM ref across grid steps, each step resolves one tile's
within-tile greedy fixpoint and suppresses all later boxes in chunked
(T x C) IoU blocks without ever leaving VMEM.

Inputs are pre-sorted by score (the jnp wrapper sorts and post-selects,
sharing all semantics/tests with ops.nms.nms). Suppression uses pascal
+1 IoU and strict > thresh, identical to the reference
(box_utils.lua:154-256).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NEG_INF = -1e38


def _iou_block(tile_boxes, blk_boxes):
    """(T, 4) x (C, 4) pascal IoU -> (T, C)."""
    tx1 = tile_boxes[:, 0:1]
    ty1 = tile_boxes[:, 1:2]
    tx2 = tile_boxes[:, 2:3]
    ty2 = tile_boxes[:, 3:4]
    bx1 = blk_boxes[:, 0][None, :]
    by1 = blk_boxes[:, 1][None, :]
    bx2 = blk_boxes[:, 2][None, :]
    by2 = blk_boxes[:, 3][None, :]
    iw = jnp.maximum(jnp.minimum(tx2, bx2) - jnp.maximum(tx1, bx1) + 1.0,
                     0.0)
    ih = jnp.maximum(jnp.minimum(ty2, by2) - jnp.maximum(ty1, by1) + 1.0,
                     0.0)
    inter = iw * ih
    ta = (tx2 - tx1 + 1.0) * (ty2 - ty1 + 1.0)
    ba = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
    return inter / (ta + ba - inter)


def _make_kernel(T, C, Np, thresh):
    n_chunks = Np // C

    def kernel(boxes_ref, valid_ref, alive_ref):
        t = pl.program_id(0)
        start = t * T

        # first step: alive := valid (output ref doubles as the carried
        # alive mask across the sequential TPU grid)
        @pl.when(t == 0)
        def _():
            alive_ref[:] = valid_ref[:]

        tile_boxes = boxes_ref[pl.ds(start, T), :]
        alive_in = alive_ref[pl.ds(start, T)]

        # ---- within-tile greedy fixpoint --------------------------------
        iou_tt = _iou_block(tile_boxes, tile_boxes)  # (T, T)
        r = lax.broadcasted_iota(jnp.int32, (T, T), 0)
        c = lax.broadcasted_iota(jnp.int32, (T, T), 1)
        sup_tt = (iou_tt > thresh) & (r < c)

        def fix_cond(state):
            cur, prev, it = state
            return jnp.logical_and(jnp.any(cur != prev), it < T)

        def fix_step(state):
            cur, _, it = state
            suppressed = jnp.any(sup_tt & (cur[:, None] > 0.5), axis=0)
            new = jnp.where(suppressed, 0.0, alive_in)
            return new, cur, it + 1

        first = jnp.where(
            jnp.any(sup_tt & (alive_in[:, None] > 0.5), axis=0),
            0.0, alive_in,
        )
        alive_tile, _, _ = lax.while_loop(
            fix_cond, fix_step, (first, alive_in, jnp.int32(0))
        )
        alive_ref[pl.ds(start, T)] = alive_tile

        # ---- suppress later boxes, chunked over columns ------------------
        def chunk_body(j, _):
            cstart = j * C
            blk = boxes_ref[pl.ds(cstart, C), :]
            iou_tc = _iou_block(tile_boxes, blk)  # (T, C)
            sup = jnp.any((iou_tc > thresh) & (alive_tile[:, None] > 0.5),
                          axis=0)
            col = lax.broadcasted_iota(jnp.int32, (C, 1), 0)[:, 0] + cstart
            later = col >= start + T
            cur = alive_ref[pl.ds(cstart, C)]
            alive_ref[pl.ds(cstart, C)] = jnp.where(
                sup & later, 0.0, cur
            )
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
    # pad to a common multiple of T and C
    import math

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
            pl.BlockSpec((Np, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Np,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Np,), lambda i: (0,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np,), jnp.float32),
        interpret=interpret,
    )(sboxes, svalid)

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
