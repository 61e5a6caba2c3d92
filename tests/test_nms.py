"""NMS golden tests.

Expected pick orders come from the reference's hand-computed fixtures
(test/nms_test.lua:9-95, converted from 1-indexed to 0-indexed), plus a
randomized cross-check against a straightforward numpy greedy NMS.
"""

import jax
import jax.numpy as jnp
import numpy as np

from densecap_tpu.ops.nms import nms, nms_scored_boxes

FIXTURE = np.array(
    [
        [-12, 3, -7, 9, 1],
        [-9, 7, -4, 13, 2],
        [-8, 8, -3, 14, 3],
        [3.5, 4.5, 8.5, 12.5, 4],
        [-6, -6, -1, -1, 5],
        [4, 5, 9, 13, 6],
        [4.5, 5.5, 9.5, 13.5, 7],
    ],
    dtype=np.float32,
)


def _run(boxes_scores, thresh, max_out=None):
    idx, valid = nms_scored_boxes(jnp.asarray(boxes_scores), thresh, max_out)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    return idx[valid].tolist()


def test_nms_fixture_thresh07():
    # reference expects picks {7,5,4,3,2,1} 1-indexed (nms_test.lua:28)
    assert _run(FIXTURE, 0.7) == [6, 4, 3, 2, 1, 0]


def test_nms_fixture_thresh05():
    # reference expects {7,5,3,1} (nms_test.lua:57)
    assert _run(FIXTURE, 0.5) == [6, 4, 2, 0]


def test_nms_fixture_other_scores():
    # reference expects {6,5,3,1,2} (nms_test.lua:91)
    b = FIXTURE.copy()
    b[:, 4] = [2.5, 2, 3, 4, 5, 10, 7]
    assert _run(b, 0.7) == [5, 4, 2, 0, 1]


def test_nms_max_out_truncates():
    assert _run(FIXTURE, 0.7, max_out=3) == [6, 4, 3]


def test_nms_respects_valid_mask():
    boxes = jnp.asarray(FIXTURE[:, :4])
    scores = jnp.asarray(FIXTURE[:, 4])
    valid = jnp.array([True, True, True, True, True, True, False])
    idx, ov = nms(boxes, scores, 0.7, 7, valid=valid)
    got = np.asarray(idx)[np.asarray(ov)].tolist()
    # with box 6 masked out, box 5 (score 6) leads its cluster; box 3 is
    # suppressed by box 5 at 0.7? iou(3,5) computed below in numpy ref
    ref = _numpy_greedy(FIXTURE[:6], 0.7)
    assert got == ref


def _numpy_greedy(boxes_scores, thresh, max_out=None):
    """Straight transliteration of greedy NMS semantics (pascal IoU)."""
    b = boxes_scores[:, :4].astype(np.float64)
    s = boxes_scores[:, 4]
    order = np.argsort(-s, kind="stable")
    area = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    picks = []
    sup = np.zeros(len(s), dtype=bool)
    for i in order:
        if sup[i]:
            continue
        picks.append(int(i))
        if max_out is not None and len(picks) >= max_out:
            break
        xx1 = np.maximum(b[i, 0], b[:, 0])
        yy1 = np.maximum(b[i, 1], b[:, 1])
        xx2 = np.minimum(b[i, 2], b[:, 2])
        yy2 = np.minimum(b[i, 3], b[:, 3])
        iw = np.maximum(xx2 - xx1 + 1, 0)
        ih = np.maximum(yy2 - yy1 + 1, 0)
        inter = iw * ih
        iou = inter / (area[i] + area - inter)
        sup |= iou > thresh
        sup[i] = True  # picked, not revisited (order guarantees anyway)
    return picks


def test_nms_random_vs_numpy_greedy():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 400
        xy = rng.uniform(1, 100, size=(n, 2))
        wh = rng.uniform(1, 60, size=(n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1)
        scores = rng.permutation(n).astype(np.float32)  # distinct scores
        bs = np.concatenate([boxes, scores[:, None]], axis=1).astype(
            np.float32
        )
        for thresh in (0.3, 0.5, 0.7):
            ref = _numpy_greedy(bs, thresh, max_out=50)
            got = _run(bs, thresh, max_out=50)
            assert got == ref, f"trial={trial} thresh={thresh}"


def test_nms_tile_boundaries():
    # force multiple tiles with a tiny tile size
    rng = np.random.RandomState(1)
    n = 130
    xy = rng.uniform(1, 40, size=(n, 2))
    wh = rng.uniform(1, 30, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.permutation(n).astype(np.float32)
    idx, valid = nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, n, tile_size=16
    )
    got = np.asarray(idx)[np.asarray(valid)].tolist()
    bs = np.concatenate([boxes, scores[:, None]], axis=1)
    assert got == _numpy_greedy(bs, 0.5)


def test_nms_jit_and_all_invalid():
    boxes = jnp.asarray(FIXTURE[:, :4])
    scores = jnp.asarray(FIXTURE[:, 4])
    f = jax.jit(lambda b, s, v: nms(b, s, 0.7, 5, valid=v))
    idx, ov = f(boxes, scores, jnp.zeros(7, dtype=bool))
    assert not np.asarray(ov).any()


def test_nms_survivor_buffer_overflow_exact():
    """The pull-based sweep keeps survivors in a (K + T)-slot buffer and
    DROPS appends once it holds K (output already finalized). Mix dense
    clusters (real suppression chains) with spread boxes (fast survivor
    accumulation) at small K and small tiles so the buffer overflows
    while suppression is still active — picks must stay exactly greedy."""
    rng = np.random.RandomState(23)
    n = 500
    dense_xy = rng.uniform(1, 80, size=(n // 2, 2))
    dense_wh = rng.uniform(10, 50, size=(n // 2, 2))
    spread_xy = rng.uniform(1, 8000, size=(n - n // 2, 2))
    spread_wh = rng.uniform(5, 25, size=(n - n // 2, 2))
    xy = np.concatenate([dense_xy, spread_xy])
    wh = np.concatenate([dense_wh, spread_wh])
    scores = rng.permutation(n).astype(np.float64)
    bs = np.concatenate([xy, xy + wh, scores[:, None]], axis=1)
    for thresh in (0.3, 0.6):
        for k in (8, 40):
            idx, valid = nms(jnp.asarray(bs[:, :4]),
                             jnp.asarray(bs[:, 4]),
                             thresh, k, tile_size=32)
            ref = _numpy_greedy(bs, thresh, k)
            got = np.asarray(idx)[np.asarray(valid)].tolist()
            assert got == ref, (thresh, k)


def test_nms_presorted_matches_default():
    """presorted=True (the pre-NMS top-k fast path: descending scores,
    invalid at the tail) must produce exactly the default path's picks,
    mapped through the sort permutation."""
    rng = np.random.RandomState(31)
    n = 300
    xy = rng.uniform(1, 90, size=(n, 2))
    wh = rng.uniform(5, 55, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.permutation(n).astype(np.float32)
    valid = rng.rand(n) > 0.2
    masked = np.where(valid, scores, -np.inf)
    order = np.argsort(-masked, kind="stable")
    sb, ss, sv = boxes[order], masked[order], np.isfinite(masked[order])
    for k in (20, 120):
        idx_d, val_d = nms(jnp.asarray(boxes), jnp.asarray(scores),
                           0.5, k, valid=jnp.asarray(valid))
        idx_p, val_p = nms(jnp.asarray(sb), jnp.asarray(ss), 0.5, k,
                           valid=jnp.asarray(sv), presorted=True)
        got_d = np.asarray(idx_d)[np.asarray(val_d)]
        got_p = order[np.asarray(idx_p)[np.asarray(val_p)]]
        np.testing.assert_array_equal(got_d, got_p)


def test_nms_early_exit_matches_full_sweep(monkeypatch):
    """K << N forces the sweep's early exit (prefix survivors >= K
    after few tiles); the first-K output must equal the numpy greedy
    reference exactly — later unprocessed alive bits must not leak.
    Runs BOTH sweep lowerings (static fori_loop default and the
    DENSECAP_NMS_EARLY_EXIT while_loop) so whichever is off by default
    stays covered."""
    import densecap_tpu.ops.nms as nms_mod

    rng = np.random.RandomState(11)
    n = 600
    # spread boxes: little suppression, so survivors accumulate fast
    xy = rng.uniform(1, 5000, size=(n, 2))
    wh = rng.uniform(5, 30, size=(n, 2))
    bs = np.concatenate(
        [xy, xy + wh, rng.permutation(n)[:, None].astype(np.float64)],
        axis=1)
    for early_exit in (False, True):
        monkeypatch.setattr(nms_mod, "EARLY_EXIT", early_exit)
        for k in (10, 50, 130):
            idx, valid = nms(jnp.asarray(bs[:, :4]),
                             jnp.asarray(bs[:, 4]),
                             0.5, k, tile_size=64)
            ref = _numpy_greedy(bs, 0.5, k)
            got = np.asarray(idx)[np.asarray(valid)]
            np.testing.assert_array_equal(got, ref)
