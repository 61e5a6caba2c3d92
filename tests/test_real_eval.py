"""Mocked-artifact test of the real_eval runbook (VERDICT-2 #10).

doc/REAL_DATA.md's validation plan is blocked on artifacts this
environment cannot download. `make real_eval` is the standing runbook;
this test proves that the day the artifacts land, executing it needs
ZERO new code: every step (artifact check -> t7 conversion -> smoke
inference -> VG preprocess -> test-split mAP evaluation) runs end-to-end
here against tiny structurally-faithful stand-ins — a miniature
DenseCap .t7 written in real torch serialization format and a synthetic
mini Visual Genome.
"""

import importlib.util
import json
import os

import numpy as np
import pytest

import test_full_convert as tfc
from test_t7_reader import _Writer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_real_eval():
    spec = importlib.util.spec_from_file_location(
        "real_eval", os.path.join(REPO, "scripts", "real_eval.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_mini_t7(path):
    """A miniature full DenseCap checkpoint with the SHIPPING anchor
    count (convert_t7 refuses a num_anchors mismatch)."""
    old_k = tfc.K
    tfc.K = 12
    try:
        obj = tfc._full_densecap_t7(np.random.RandomState(0))
    finally:
        tfc.K = old_k
    w = _Writer()
    w.write(obj)
    with open(path, "wb") as f:
        f.write(w.getvalue())


def _write_mini_vg(root):
    from PIL import Image

    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    data = []
    for i in range(4):
        img_id = 500 + i
        arr = rng.randint(0, 255, (96 + 8 * i, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{img_id}.jpg")
        data.append({"id": img_id, "regions": [
            {"phrase": "a red cat sitting", "x": 10, "y": 10,
             "width": 40, "height": 30},
            {"phrase": "the big dog", "x": 50, "y": 20,
             "width": 30, "height": 40},
        ]})
    (root / "regions.json").write_text(json.dumps(data))
    (root / "splits.json").write_text(json.dumps(
        {"train": [500, 501], "val": [502], "test": [503]}))
    return (str(root / "regions.json"), str(img_dir),
            str(root / "splits.json"))


def test_check_reports_missing(tmp_path, capsys):
    real_eval = _load_real_eval()
    rc = real_eval.main([
        "--t7", str(tmp_path / "nope.t7"),
        "--region_data", str(tmp_path / "nope.json"),
        "--image_dir", str(tmp_path / "noimgs"),
        "--jar", str(tmp_path / "nope.jar"),
        "--check_only",
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MISSING" in out
    # actionable: names the reference's download sources
    assert "download_pretrained_model.sh" in out
    assert "setup_eval.sh" in out


def test_runbook_end_to_end_with_mocked_artifacts(tmp_path):
    """convert -> smoke -> preprocess -> evaluate, one command."""
    real_eval = _load_real_eval()
    t7_path = tmp_path / "mini-pretrained.t7"
    _write_mini_t7(str(t7_path))
    region_data, image_dir, split_json = _write_mini_vg(tmp_path)
    smoke = os.path.join(image_dir, "500.jpg")
    workdir = tmp_path / "out"

    rc = real_eval.main([
        "--t7", str(t7_path),
        "--region_data", region_data,
        "--image_dir", image_dir,
        "--split_json", split_json,
        "--smoke_image", smoke,
        "--workdir", str(workdir),
        "--image_size", "64",
        "--min_token_instances", "1",
        "--num_proposals", "8",
        "--max_images", "1",
        "--allow_fallback_scorer",
    ])
    assert rc == 0

    # every step left its artifact
    assert (workdir / "pretrained.npz").exists()
    with open(workdir / "smoke" / "results.json") as f:
        smoke_res = json.load(f)["results"]
    assert smoke_res and smoke_res[0]["captions"]
    assert (workdir / "VG-regions.h5").exists()
    with open(workdir / "eval_results.json") as f:
        res = json.load(f)
    assert np.isfinite(float(res["ap_results"]["map"]))

    # idempotent: a rerun skips completed steps and still succeeds
    rc2 = real_eval.main([
        "--t7", str(t7_path),
        "--region_data", region_data,
        "--image_dir", image_dir,
        "--split_json", split_json,
        "--smoke_image", "",
        "--workdir", str(workdir),
        "--image_size", "64",
        "--min_token_instances", "1",
        "--num_proposals", "8",
        "--max_images", "1",
        "--allow_fallback_scorer",
    ])
    assert rc2 == 0
