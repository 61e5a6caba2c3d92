"""Box sampler golden tests, fixtures from test/BoxSampler_test.lua
(converted to 0-indexed)."""

import jax
import jax.numpy as jnp
import numpy as np

from densecap_tpu.ops.sampler import (
    compute_match_masks,
    gather_rois,
    sample_rois,
)


def _simple_fixture():
    input_boxes = jnp.array(
        [
            [-4, 6, 4, 4],
            [-6.5, 1.5, 2, 6],
            [-4.5, -0.5, 6, 6],
            [-6.5, -6.5, 3, 3],
            [-0.5, -7.5, 3, 3],
            [7.5, -5.5, 3, 5],
            [5.5, -3, 6, 3],
            [4.5, 2, 3, 7],
            [6.5, 5, 6, 3],
            [4, 5, 3, 5],
        ],
        dtype=jnp.float32,
    )
    target_boxes = jnp.array(
        [[-6.5, 1.5, 3, 7], [4.5, 4.5, 3, 5], [5, -2.5, 6, 3]],
        dtype=jnp.float32,
    )
    return input_boxes, target_boxes


def test_masks_match_reference_fixture():
    # BoxSampler_test.lua:20-67 with low=0.2 high=0.4
    input_boxes, target_boxes = _simple_fixture()
    gt_valid = jnp.ones(3, dtype=bool)
    pos_mask, neg_mask, input_idx, _ = compute_match_masks(
        input_boxes, target_boxes, gt_valid, low_thresh=0.2, high_thresh=0.4
    )
    np.testing.assert_array_equal(
        np.asarray(pos_mask),
        np.array([0, 1, 0, 0, 0, 0, 1, 1, 0, 1], dtype=bool),
    )
    np.testing.assert_array_equal(
        np.asarray(neg_mask),
        np.array([1, 0, 0, 1, 1, 1, 0, 0, 0, 0], dtype=bool),
    )
    # best-gt for the positive inputs (0-indexed): input 6 -> gt 2,
    # input 7 -> gt 1 (reference expected_pos_target_idx {3, 2} 1-indexed
    # for sampled inputs {7, 8})
    assert int(input_idx[6]) == 2
    assert int(input_idx[7]) == 1


def test_best_match_forcing_and_fallback_fill():
    # BoxSampler_test.lua:76-120: a gt whose best input has IoU 0.125
    # (below high_thresh) must still be positive.
    input_boxes = jnp.array(
        [[4, 8, 2, 2], [6.5, 5, 3, 2], [3.5, 1, 3, 4], [8, 8, 2, 2]],
        dtype=jnp.float32,
    )
    target_boxes = jnp.array([[4.5, 4, 3, 4]], dtype=jnp.float32)
    gt_valid = jnp.ones(1, dtype=bool)
    pos_mask, neg_mask, input_idx, _ = compute_match_masks(
        input_boxes, target_boxes, gt_valid
    )
    np.testing.assert_array_equal(
        np.asarray(pos_mask), np.array([0, 1, 0, 0], dtype=bool)
    )
    np.testing.assert_array_equal(
        np.asarray(neg_mask), np.array([1, 0, 1, 1], dtype=bool)
    )

    out = sample_rois(
        jax.random.PRNGKey(0), input_boxes, target_boxes, gt_valid,
        batch_size=4,
    )
    # exactly 1 positive available -> num_pos == 1, num_neg == 3
    assert int(out.num_pos) == 1
    assert int(out.num_neg) == 3
    assert int(out.pos_input_idx[0]) == 1
    assert int(out.pos_target_idx[0]) == 0
    assert list(np.asarray(out.pos_valid)) == [True, False]
    assert list(np.asarray(out.neg_valid)) == [True, True, True, False]
    # the three valid negatives are a permutation of {0, 2, 3}
    negs = sorted(int(i) for i in np.asarray(out.neg_input_idx)[:3])
    assert negs == [0, 2, 3]


def test_bounds_exclusion():
    input_boxes, target_boxes = _simple_fixture()
    gt_valid = jnp.ones(3, dtype=bool)
    # bounds excluding boxes whose (w-1)/2 corners dip below y = -5:
    # fixture boxes 3, 4, 5 -> removed from the negative set; box 0
    # remains negative so the no-negatives fallback does NOT trigger
    bounds = dict(x_min=-100.0, y_min=-5.0, x_max=100.0, y_max=100.0)
    pos_mask, neg_mask, _, _ = compute_match_masks(
        input_boxes, target_boxes, gt_valid,
        low_thresh=0.2, high_thresh=0.4, bounds=bounds,
    )
    neg = np.asarray(neg_mask)
    assert not neg[[3, 4, 5]].any()
    assert neg[0]


def test_bounds_exclusion_fallback_readds_oob():
    # when bounds exclude EVERY negative, the no-negatives fallback
    # (BoxSampler.lua:111-128) re-admits all non-positives — including
    # out-of-bounds boxes, exactly like the reference
    input_boxes, target_boxes = _simple_fixture()
    gt_valid = jnp.ones(3, dtype=bool)
    bounds = dict(x_min=0.0, y_min=0.0, x_max=100.0, y_max=100.0)
    pos_mask, neg_mask, _, _ = compute_match_masks(
        input_boxes, target_boxes, gt_valid,
        low_thresh=0.2, high_thresh=0.4, bounds=bounds,
    )
    pm, nm = np.asarray(pos_mask), np.asarray(neg_mask)
    assert not (pm & nm).any()
    assert (pm | nm).all()  # fallback: everything non-positive is negative


def test_no_negatives_fallback():
    # single input that is the best match for the single gt -> forced
    # positive; no negatives exist -> fallback flips non-positives, and
    # since there are none, neg_mask stays empty -> sampler still fills
    # M slots by cycling (degenerate but shape-stable)
    input_boxes = jnp.array([[5.0, 5.0, 4.0, 4.0], [5.0, 5.0, 4.0, 4.0]])
    target_boxes = jnp.array([[5.0, 5.0, 4.0, 4.0]])
    gt_valid = jnp.ones(1, dtype=bool)
    pos_mask, neg_mask, _, _ = compute_match_masks(
        input_boxes, target_boxes, gt_valid
    )
    # both inputs have IoU 1 -> pos; argmax picks input 0 as forced
    assert bool(pos_mask[0]) and bool(pos_mask[1])
    assert not bool(neg_mask[0]) and not bool(neg_mask[1])


def test_gt_padding_is_ignored():
    input_boxes, target_boxes = _simple_fixture()
    padded_gt = jnp.concatenate(
        [target_boxes, jnp.zeros((5, 4), dtype=jnp.float32)], axis=0
    )
    gt_valid = jnp.array([True, True, True] + [False] * 5)
    pm1, nm1, ii1, _ = compute_match_masks(
        input_boxes, target_boxes, jnp.ones(3, dtype=bool),
        low_thresh=0.2, high_thresh=0.4,
    )
    pm2, nm2, ii2, _ = compute_match_masks(
        input_boxes, padded_gt, gt_valid, low_thresh=0.2, high_thresh=0.4
    )
    np.testing.assert_array_equal(np.asarray(pm1), np.asarray(pm2))
    np.testing.assert_array_equal(np.asarray(nm1), np.asarray(nm2))
    np.testing.assert_array_equal(np.asarray(ii1), np.asarray(ii2))


def test_sample_rois_is_jittable_and_vmappable():
    input_boxes, target_boxes = _simple_fixture()
    gt_valid = jnp.ones(3, dtype=bool)

    f = jax.jit(
        lambda k: sample_rois(
            k, input_boxes, target_boxes, gt_valid, batch_size=8
        )
    )
    out = f(jax.random.PRNGKey(1))
    assert out.pos_input_idx.shape == (4,)
    assert out.neg_input_idx.shape == (8,)
    assert int(out.num_pos) + int(out.num_neg) == 8

    # vmap over a batch of images (lifting the reference's N == 1 limit)
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    batched = jax.vmap(
        lambda k: sample_rois(
            k, input_boxes, target_boxes, gt_valid, batch_size=8
        )
    )(keys)
    assert batched.pos_input_idx.shape == (3, 4)


def test_positive_sampling_without_replacement():
    # many positives: sampled pos indices must be distinct
    input_boxes = jnp.tile(jnp.array([[5.0, 5.0, 4.0, 4.0]]), (20, 1))
    jitter = jnp.arange(20, dtype=jnp.float32)[:, None] * jnp.array(
        [[0.01, 0.0, 0.0, 0.0]]
    )
    input_boxes = input_boxes + jitter
    target_boxes = jnp.array([[5.0, 5.0, 4.0, 4.0]])
    out = sample_rois(
        jax.random.PRNGKey(3), input_boxes, target_boxes,
        jnp.ones(1, dtype=bool), batch_size=16,
    )
    pos = np.asarray(out.pos_input_idx)[np.asarray(out.pos_valid)]
    assert len(set(pos.tolist())) == len(pos)


def test_gather_rois():
    data = jnp.arange(40, dtype=jnp.float32).reshape(10, 4)
    pos, neg = gather_rois(data, jnp.array([1, 3]), jnp.array([0, 2, 4]))
    dn = np.asarray(data)
    np.testing.assert_array_equal(np.asarray(pos), dn[[1, 3]])
    np.testing.assert_array_equal(np.asarray(neg), dn[[0, 2, 4]])


def test_sampler_batch_size_exceeding_candidates():
    """Tiny images can have fewer anchors than the sampler batch size:
    slots must fill by cycling (with-replacement fallback), not crash."""
    import jax

    n = 12  # candidates
    boxes = jnp.stack([
        jnp.linspace(10, 50, n), jnp.linspace(10, 50, n),
        jnp.full((n,), 8.0), jnp.full((n,), 8.0)], axis=1)
    gt = jnp.array([[12.0, 12.0, 8.0, 8.0]])
    out = sample_rois(
        jax.random.PRNGKey(0), boxes, gt, jnp.array([True]),
        batch_size=32,  # P=16, M=32 > n=12
    )
    assert out.pos_input_idx.shape == (16,)
    assert out.neg_input_idx.shape == (32,)
    # every index must point at a real candidate
    assert int(jnp.max(out.pos_input_idx)) < n
    assert int(jnp.max(out.neg_input_idx)) < n
    # valid negative slots only reference negative-eligible candidates
    neg_sel = out.neg_input_idx[out.neg_valid]
    assert int(out.num_pos) >= 1
    assert neg_sel.shape[0] == int(out.num_neg)


def test_scarce_negative_fallback_is_iid_with_replacement():
    """When total_neg < num_neg the reference redraws ALL negatives iid
    WITH replacement (torch.multinomial(ones, num_neg, true),
    BoxSampler.lua:145-152). Three checks over many keys: (1) every
    eligible negative is reachable with ~uniform marginal frequency,
    (2) neg_replaced flags the regime, (3) per-trial counts have the
    multinomial's variance — a cycling fallback would pin every
    candidate's count to floor/ceil(num_neg/total_neg), so seeing a
    count outside that band proves independent draws."""
    # 1 forced positive + 3 negatives, num_neg = 16 - 1 = 15 > 3
    boxes = jnp.array([
        [12.0, 12.0, 8.0, 8.0],    # IoU 1 with gt -> positive
        [40.0, 40.0, 8.0, 8.0],    # negatives (IoU 0)
        [60.0, 40.0, 8.0, 8.0],
        [40.0, 60.0, 8.0, 8.0],
    ])
    gt = jnp.array([[12.0, 12.0, 8.0, 8.0]])
    fn = jax.jit(lambda k: sample_rois(
        k, boxes, gt, jnp.array([True]), batch_size=16))

    trials = 200
    counts = np.zeros(4, np.int64)
    saw_non_cycling_count = False
    for t in range(trials):
        out = fn(jax.random.PRNGKey(1000 + t))
        assert bool(out.neg_replaced)
        neg = np.asarray(out.neg_input_idx)[np.asarray(out.neg_valid)]
        assert neg.shape == (15,)
        assert set(neg.tolist()) <= {1, 2, 3}
        c = np.bincount(neg, minlength=4)
        counts += c
        # cycling would force every eligible count into {5} (15/3);
        # iid multinomial puts some count outside with p~0.9 per trial
        if np.any(c[1:] != 5):
            saw_non_cycling_count = True
    assert saw_non_cycling_count
    # uniform marginal: each eligible candidate ~ trials * 5 draws
    total = counts[1:].sum()
    freq = counts[1:] / total
    np.testing.assert_allclose(freq, 1.0 / 3.0, atol=0.03)
    assert counts[0] == 0  # the positive never appears as a negative
