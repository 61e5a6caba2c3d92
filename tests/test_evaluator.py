"""Evaluator tests, mirroring the reference's evaluation_test.lua:
exact-match and no-overlap sanity, perfect-detection mAP = 1, and the
greedy assignment / merged-references machinery."""

import numpy as np

from densecap_tpu.eval.evaluator import DenseCaptioningEvaluator
from densecap_tpu.eval.meteor import score_captions_fallback


def test_fallback_scorer_extremes():
    records = [
        {"candidate": "a cat on a mat", "references": ["a cat on a mat"]},
        {"candidate": "xyz qrs", "references": ["a cat on a mat"]},
        {"candidate": "anything", "references": []},
    ]
    s = score_captions_fallback(records)
    assert s[0] == 1.0
    assert s[1] == 0.0
    assert s[2] == 0.0


def test_fallback_scorer_partial_and_multiref():
    records = [
        {"candidate": "a cat", "references": ["a cat on a mat", "a cat"]},
    ]
    s = score_captions_fallback(records)
    assert s[0] == 1.0  # max over references


def test_perfect_predictions_map_one():
    ev = DenseCaptioningEvaluator()
    gt_boxes = np.array([[20.0, 20.0, 10.0, 10.0], [50.0, 50.0, 8.0, 8.0]])
    gt_text = ["a red cat", "a blue dog"]
    ev.add_result(
        logprobs=np.array([2.0, 1.0]),
        boxes=gt_boxes,
        text=gt_text,
        target_boxes=gt_boxes,
        target_text=gt_text,
    )
    res = ev.evaluate(verbose=False)
    assert res["map"] > 0.99
    assert res["detmap"] > 0.99


def test_all_wrong_predictions_map_zero():
    ev = DenseCaptioningEvaluator()
    gt_boxes = np.array([[20.0, 20.0, 10.0, 10.0]])
    pred_boxes = np.array([[200.0, 200.0, 10.0, 10.0]])
    ev.add_result(
        np.array([1.0]), pred_boxes, ["nothing here"],
        gt_boxes, ["a red cat"],
    )
    res = ev.evaluate(verbose=False)
    assert res["map"] == 0.0
    assert res["detmap"] == 0.0


def test_duplicate_detection_counts_once():
    ev = DenseCaptioningEvaluator()
    gt_boxes = np.array([[20.0, 20.0, 10.0, 10.0]])
    gt_text = ["a cat"]
    # two identical detections on one gt: second is 'ok'=0
    ev.add_result(
        np.array([2.0, 1.5]),
        np.array([[20.0, 20.0, 10.0, 10.0], [20.0, 20.0, 10.0, 10.0]]),
        ["a cat", "a cat"],
        gt_boxes, gt_text,
    )
    recs = ev.records
    oks = sorted(r["ok"] for r in recs)
    assert oks == [0, 1]
    res = ev.evaluate(verbose=False)
    # precision drops because of the duplicate, AP stays high but < 1
    assert 0.3 < res["map"] <= 1.0


def test_merged_gt_references():
    ev = DenseCaptioningEvaluator()
    # two nearly identical gt boxes (IoU > 0.7) with different captions
    gt_boxes = np.array([[20.0, 20.0, 10.0, 10.0],
                         [20.0, 20.0, 10.0, 11.0]])
    gt_text = ["a cat", "a kitten"]
    ev.add_result(
        np.array([1.0]), np.array([[20.0, 20.0, 10.0, 10.0]]),
        ["a cat"], gt_boxes, gt_text,
    )
    assert ev.npos == 1  # merged into one group
    assert sorted(ev.records[0]["references"]) == ["a cat", "a kitten"]


def test_wrong_caption_right_box():
    ev = DenseCaptioningEvaluator()
    gt_boxes = np.array([[20.0, 20.0, 10.0, 10.0]])
    ev.add_result(
        np.array([1.0]), gt_boxes, ["total nonsense words"],
        gt_boxes, ["a red cat"],
    )
    res = ev.evaluate(verbose=False)
    # detection-only AP is perfect; captioned mAP is 0 (score <= 0 fails
    # every min_score>0 threshold; min_score=0 requires score > 0)
    assert res["detmap"] > 0.99
    assert res["map"] == 0.0


def test_multiple_images_accumulate():
    ev = DenseCaptioningEvaluator()
    for _ in range(3):
        gt = np.array([[10.0, 10.0, 6.0, 6.0]])
        ev.add_result(np.array([1.0]), gt, ["a thing"], gt, ["a thing"])
    assert ev.num_added() == 3
    assert ev.npos == 3
    assert ev.evaluate(verbose=False)["map"] > 0.99


def _evaluate_loop_oracle(ev, scores):
    """Direct transliteration of the reference's per-record AP loop
    (eval_utils.lua:251-311) — the pre-vectorization implementation,
    kept as the equality oracle for DenseCaptioningEvaluator.evaluate."""
    from densecap_tpu.eval.evaluator import MIN_OVERLAPS, MIN_SCORES

    logprobs = np.concatenate(ev.all_logprobs)
    order = np.argsort(-logprobs, kind="stable")
    n = len(order)
    recs = ev.records
    out = {}
    for min_overlap in MIN_OVERLAPS:
        for min_score in MIN_SCORES:
            tp = np.zeros(n)
            fp = np.zeros(n)
            for rank, ii in enumerate(order):
                r = recs[ii]
                if not r["references"]:
                    fp[rank] = 1
                elif (r["ov"] >= min_overlap and r["ok"] == 1
                      and scores[ii] > min_score):
                    tp[rank] = 1
                else:
                    fp[rank] = 1
            fp = np.cumsum(fp)
            tp = np.cumsum(tp)
            rec = tp / max(ev.npos, 1)
            prec = tp / np.maximum(fp + tp, 1e-12)
            ap = 0.0
            for t in np.arange(0, 1.0001, 0.01):
                mask = rec >= t
                ap += float(prec[mask].max()) if mask.any() else 0.0
            out[(min_overlap, min_score)] = ap / 101.0
    return out


def test_vectorized_grid_matches_loop_oracle():
    """The vectorized (records x 35 cells) AP grid must equal the
    per-record loop transliteration bit-for-bit on randomized inputs:
    many images, overlapping/duplicate/unmatched detections, ties in
    objectness, empty-gt images."""
    from densecap_tpu.eval import meteor as meteor_mod
    from densecap_tpu.eval.evaluator import MIN_OVERLAPS, MIN_SCORES

    rng = np.random.RandomState(0)
    ev = DenseCaptioningEvaluator()
    vocab = ["cat", "dog", "red", "blue", "mat", "tree", "car"]
    for img in range(12):
        n_gt = rng.randint(0, 4)
        gt_boxes = np.column_stack([
            rng.uniform(20, 200, n_gt), rng.uniform(20, 200, n_gt),
            rng.uniform(8, 60, n_gt), rng.uniform(8, 60, n_gt)])
        gt_text = [" ".join(rng.choice(vocab, 3)) for _ in range(n_gt)]
        n_det = rng.randint(1, 8)
        if n_gt and rng.rand() < 0.7:
            picks = rng.randint(0, n_gt, n_det)
            boxes = gt_boxes[picks] + rng.normal(0, 6, (n_det, 4))
            text = [gt_text[p] if rng.rand() < 0.5
                    else " ".join(rng.choice(vocab, 3)) for p in picks]
        else:
            boxes = np.column_stack([
                rng.uniform(20, 200, n_det), rng.uniform(20, 200, n_det),
                rng.uniform(8, 60, n_det), rng.uniform(8, 60, n_det)])
            text = [" ".join(rng.choice(vocab, 3)) for _ in range(n_det)]
        logprobs = np.round(rng.uniform(0, 3, n_det), 1)  # force ties
        ev.add_result(logprobs, boxes, text, gt_boxes, gt_text)

    res = ev.evaluate(verbose=False)
    scores = meteor_mod.score_captions(ev.records)["scores"]
    oracle = _evaluate_loop_oracle(ev, scores)
    for min_overlap in MIN_OVERLAPS:
        for min_score in MIN_SCORES:
            got = (res["det_breakdown"][f"ov{min_overlap}"]
                   if min_score == -1 else
                   res["ap_breakdown"][f"ov{min_overlap}_score{min_score}"])
            # identical per-threshold precision values; only the
            # 101-term summation order differs (pairwise vs sequential)
            assert abs(got - oracle[(min_overlap, min_score)]) < 1e-12, (
                min_overlap, min_score)
