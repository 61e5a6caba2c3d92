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
