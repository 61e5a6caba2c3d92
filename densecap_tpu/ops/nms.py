"""Fixed-shape exact greedy NMS for TPU.

The reference (densecap/box_utils.lua:154-256) runs a serial greedy loop
on the host with a CPU sort — a dynamic-shape, latency-bound design that
cannot live inside an XLA program. Here greedy NMS is reformulated as a
tiled suppression sweep with static shapes:

  1. sort boxes by descending score (one XLA sort),
  2. sweep tiles of T boxes: a tile's boxes are first checked against a
     fixed (max_out + T)-slot buffer of the survivors found so far
     (greedy suppression only ever comes from kept boxes, so pulling
     from survivors is exact and ~Np/(K+T) times less IoU work than
     pushing onto all later boxes); then within-tile greedy suppression
     resolves by fixpoint iteration on the T x T IoU matrix,
  3. emit the first `max_out` surviving boxes in score order, plus a
     validity mask (fewer survivors -> padded slots).

This computes EXACTLY the greedy NMS picks of the reference (same pascal
+1 IoU, same descending-score greedy order, same early stop at max_out),
but as a single compiled program: ~N/T matrix steps instead of up to N
serial host iterations. Suppression uses strict IoU > thresh survival
(reference keeps boxes with iou <= overlap, box_utils.lua:241).

An optional early exit (DENSECAP_NMS_EARLY_EXIT=1) stops the sweep
once `max_out` survivors are FINALIZED: a box's fate is settled the
moment its tile is processed (suppression only flows from a tile to
strictly later boxes), so as soon as the first t tiles hold >= max_out
survivors the remaining tiles cannot change the emitted set — the same
early stop the reference's serial loop performs at box granularity
(box_utils.lua:231-236). Bit-identical outputs, and 3.2x faster in an
ISOLATED clustered-box microbench — but the dynamic while_loop it
needs measures ~3 ms/step SLOWER in the full shipping inference
program (doc/BENCH.md), so the static fori_loop sweep is the default.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from .boxes import iou_pascal

NEG_INF = -1e38

# Sweep loop mode: "0" (default) = fixed-trip lax.fori_loop over every
# tile; "1" = lax.while_loop that early-exits once `max_out` survivors
# are finalized. Identical picks either way (the early exit is proven
# exact; tests run both), but the dynamic-predicate loop costs ~3
# ms/step MORE in the full shipping program on TPU (bench A/B: 122.7
# vs 114.1 img/s) even though it wins 3.2x in the isolated
# clustered-box sweep — the while lowering defeats the overlap XLA
# finds for the static loop. Flip on for workloads dominated by
# clustered NMS at small max_out.
EARLY_EXIT = os.environ.get("DENSECAP_NMS_EARLY_EXIT", "0") != "0"


def _pad_to_multiple(x, multiple, axis, value):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad, constant_values=value)


def nms(boxes, scores, iou_thresh, max_out, valid=None, tile_size=256,
        presorted=False):
    """Greedy NMS with fixed output size.

    Args:
      boxes: (N, 4) float, x1y1x2y2 (1-indexed inclusive pixels).
      scores: (N,) float.
      iou_thresh: scalar; boxes with IoU > iou_thresh to a kept
        higher-scored box is suppressed (pascal +1 IoU).
      max_out: static int K, number of output slots.
      valid: optional (N,) bool; invalid boxes can neither be kept nor
        suppress anything (replaces the reference's dynamic-compaction
        of clipped boxes, LocalizationLayer.lua:285-298).
      tile_size: static tile width for the suppression sweep. The 256
        default is the measured optimum for the pull-based sweep at
        both shipping shapes (B=8 vmapped, K=1000: 4.5 -> 3.7 ms at
        N=6000, 14.3 -> 11.1 ms at N=24300 vs tile 128; full-program
        65.7 -> 64.0 ms / 72.6 -> 69.5 ms — doc/BENCH.md round-4 NMS
        section).
      presorted: the caller guarantees `scores` are already in
        descending order with stable (original-index) tie order and all
        invalid entries at the tail — e.g. the output of lax.top_k /
        lax.sort_key_val in the pre-NMS top-k path. Skips the internal
        argsort, which a TPU bitonic sort charges in full even on
        sorted input (measured 1.4 ms at B=8 x 6000, doc/BENCH.md).

    Returns:
      idx: (K,) int32 indices into the input arrays, in decreasing score
        order; padded slots hold 0.
      out_valid: (K,) bool marking real outputs.
    """
    N = boxes.shape[0]
    T = int(tile_size)
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)

    if presorted:
        order = jnp.arange(N, dtype=jnp.int32)
        sboxes = boxes.astype(jnp.float32)
        svalid = valid
    else:
        masked_scores = jnp.where(valid, scores, NEG_INF)
        order = jnp.argsort(-masked_scores)  # descending, stable
        sboxes = boxes[order].astype(jnp.float32)
        svalid = masked_scores[order] > NEG_INF / 2

    sboxes = _pad_to_multiple(sboxes, T, 0, 0.0)
    svalid = _pad_to_multiple(svalid, T, 0, False)
    Np = sboxes.shape[0]
    num_tiles = Np // T

    K = int(max_out)

    # Survivor-buffer ("pull") sweep: greedy suppression only ever comes
    # from KEPT boxes, and only the first K survivors can be emitted, so
    # each tile checks its boxes against a fixed (K + T)-slot buffer of
    # the survivors found so far instead of pushing suppression onto all
    # Np later boxes. That cuts the pairwise-IoU work from num_tiles x
    # T x Np (the full N^2) to num_tiles x T x (K + T) — measured 9.0 ->
    # 3.7 ms/step at the flagship shape (B=8, 6000 -> 1000,
    # doc/BENCH.md) — and stays EXACT: while the buffer has fewer than
    # K survivors every suppressor is in it, and once it reaches K the
    # emitted set is already finalized (emission reads only the first K
    # survivors, all in processed tiles). Appends past the buffer edge
    # are dropped; they can only happen once count >= K.
    BUF = K + T
    buf0 = jnp.zeros((BUF, 4), jnp.float32)

    def tile_body(state):
        t, alive, found, buf, cnt = state
        start = t * T
        tile_boxes = lax.dynamic_slice(sboxes, (start, jnp.int32(0)),
                                       (T, 4))
        valid_in = lax.dynamic_slice(svalid, (start,), (T,))

        # --- suppression pulled from the survivor buffer ---------------
        iou_tb = iou_pascal(tile_boxes, buf)  # (T, BUF)
        buf_live = jnp.arange(BUF) < cnt
        suppressed = jnp.any((iou_tb > iou_thresh) & buf_live, axis=1)
        alive_in = valid_in & ~suppressed

        # --- within-tile greedy fixpoint -------------------------------
        iou_tt = iou_pascal(tile_boxes, tile_boxes)  # (T, T)
        r = jnp.arange(T)
        earlier = r[:, None] < r[None, :]  # row j strictly earlier than col i
        sup_tt = (iou_tt > iou_thresh) & earlier

        def fix_cond(state):
            cur, prev, it = state
            return jnp.logical_and(jnp.any(cur != prev), it < T)

        def fix_step(state):
            cur, _, it = state
            suppressed = jnp.any(sup_tt & cur[:, None], axis=0)
            new = alive_in & ~suppressed
            return new, cur, it + 1

        first = alive_in & ~jnp.any(sup_tt & alive_in[:, None], axis=0)
        alive_tile, _, _ = lax.while_loop(
            fix_cond, fix_step, (first, alive_in, jnp.int32(0))
        )

        # --- record survivors: alive flags + buffer append -------------
        alive = lax.dynamic_update_slice(alive, alive_tile, (start,))
        n_new = jnp.sum(alive_tile).astype(jnp.int32)
        pos = jnp.where(alive_tile,
                        cnt + jnp.cumsum(alive_tile) - 1,
                        BUF)  # BUF = out of bounds -> dropped
        buf = buf.at[pos].set(tile_boxes, mode="drop")
        cnt = jnp.minimum(cnt + n_new, jnp.int32(BUF))
        found = found + n_new.astype(found.dtype)
        return (t + 1).astype(t.dtype), alive, found, buf, cnt

    def sweep_cond(state):
        t, _, found, _, _ = state
        # Stop once K survivors are finalized: emission below only reads
        # the first K survivors in score order, all of which then live in
        # already-processed tiles (their alive flags are final).
        return jnp.logical_and(t < num_tiles, found < K)

    init = (jnp.int32(0), svalid, jnp.int32(0), buf0, jnp.int32(0))
    if EARLY_EXIT:
        _, alive, _, _, _ = lax.while_loop(sweep_cond, tile_body, init)
    else:
        _, alive, _, _, _ = lax.fori_loop(
            0, num_tiles, lambda _, st: tile_body(st), init)

    # --- emit first K survivors in score order --------------------------
    # Positions in unprocessed tiles may still be flagged alive, but
    # their cumulative rank is >= K (the processed prefix already holds
    # K survivors), so `take` drops them and `total` clamps to K.
    rank = jnp.cumsum(alive) - 1  # rank among survivors
    take = alive & (rank < K)
    slot = jnp.where(take, rank, K)  # K = out of bounds -> dropped
    sorted_orig_idx = jnp.concatenate(
        [order, jnp.zeros((Np - N,), dtype=order.dtype)]
    )
    idx = jnp.zeros((K,), dtype=jnp.int32).at[slot].set(
        sorted_orig_idx.astype(jnp.int32), mode="drop"
    )
    total = jnp.minimum(jnp.sum(alive), K)
    out_valid = jnp.arange(K) < total
    return idx, out_valid


def nms_scored_boxes(boxes_scores, iou_thresh, max_out=None):
    """Convenience wrapper mirroring the reference nms() signature.

    boxes_scores: (N, 5) with columns (x1, y1, x2, y2, score), as in
    reference box_utils.lua:154. Returns (idx, valid) with K = max_out
    (or N if max_out is None).
    """
    n = boxes_scores.shape[0]
    k = n if max_out is None else int(max_out)
    return nms(boxes_scores[:, :4], boxes_scores[:, 4], iou_thresh, k)
