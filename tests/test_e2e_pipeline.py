"""Full-pipeline integration test on synthetic data: preprocess ->
loader -> a few train steps -> eval_split computing a real mAP ->
checkpoint save/load round-trip. (The closest reference analogue is
DenseCapModel_test.lua + evaluation_test.lua glued together.)"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.data import preprocess as pp
from densecap_tpu.data.loader import DenseCapLoader
from densecap_tpu.eval.eval_split import eval_split
from densecap_tpu.parallel import train_step as ts
from densecap_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("e2e_vg")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    data = []
    for i in range(6):
        img_id = 1 + i
        arr = rng.randint(0, 255, (72, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{img_id}.jpg")
        data.append({
            "id": img_id,
            "regions": [
                {"phrase": "a red cat", "x": 8, "y": 8,
                 "width": 30, "height": 24},
                {"phrase": "a blue dog", "x": 48, "y": 30,
                 "width": 24, "height": 30},
            ],
        })
    with open(root / "regions.json", "w") as f:
        json.dump(data, f)
    with open(root / "splits.json", "w") as f:
        json.dump({"train": [1, 2, 3, 4], "val": [5], "test": [6]}, f)

    h5_out = str(root / "d.h5")
    json_out = str(root / "d.json")
    pp.main([
        "--region_data", str(root / "regions.json"),
        "--image_dir", str(img_dir),
        "--split_json", str(root / "splits.json"),
        "--h5_output", h5_out,
        "--json_output", json_out,
        "--image_size", "64",
        "--max_token_length", "5",
        "--min_token_instances", "1",
        "--num_workers", "2",
    ])
    return h5_out, json_out


def _cfg(loader):
    return DenseCapConfig(
        vocab_size=loader.vocab_size(),
        seq_length=loader.seq_length(),
        image_size=loader.canvas,
        anchors=((10, 10), (20, 20), (14, 28), (28, 14)),
        sampler_batch_size=16,
        max_gt_boxes=4,
        test_max_proposals=10,
        rnn_size=24,
        rnn_encoding_size=24,
        fc_dim=48,
        rpn_num_filters=24,
        compute_dtype=jnp.float32,
    )


def test_train_then_eval(dataset, tmp_path):
    h5_out, json_out = dataset
    loader = DenseCapLoader(h5_out, json_out, max_gt_boxes=4)
    cfg = _cfg(loader)

    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg,
                              learning_rate=1e-3)
    rng = jax.random.PRNGKey(1)
    for i in range(4):
        batch_np = loader.get_batch(batch_size=2, split=0)
        batch = {
            k: jnp.asarray(v)
            for k, v in batch_np.items()
            if k in ("image", "height", "width", "gt_boxes", "gt_labels",
                     "gt_valid")
        }
        rng, sub = jax.random.split(rng)
        state, losses = ts.train_step(state, batch, sub, cfg, tx)
        assert np.isfinite(float(losses["total_loss"]))

    results = eval_split(state.params, loader, cfg, split=1,
                         max_images=1, verbose=False)
    assert "map" in results["ap_results"]
    assert 0.0 <= results["ap_results"]["map"] <= 1.0
    assert np.isfinite(results["loss_results"]["total_loss"])

    # checkpoint round trip preserves params bit-exactly
    path = str(tmp_path / "ck.npz")
    ckpt.save_params(path, state.params, extra={"meta": "x"})
    params2, extra = ckpt.load_params(path)
    flat1 = jax.tree_util.tree_leaves(state.params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert str(extra["meta"]) == "x"


def test_orbax_train_state_roundtrip(dataset, tmp_path):
    h5_out, json_out = dataset
    loader = DenseCapLoader(h5_out, json_out, max_gt_boxes=4)
    cfg = _cfg(loader)
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg)
    batch_np = loader.get_batch(batch_size=1, split=0)
    batch = {
        k: jnp.asarray(v)
        for k, v in batch_np.items()
        if k in ("image", "height", "width", "gt_boxes", "gt_labels",
                 "gt_valid")
    }
    state, _ = ts.train_step(state, batch, jax.random.PRNGKey(2), cfg, tx)

    path = ckpt.save_train_state(str(tmp_path), state)
    template, _ = ts.init_state(jax.random.PRNGKey(9), cfg)
    restored = ckpt.load_train_state(path, template)
    assert int(restored.step) == 1
    # adam state survives (the reference dropped it, train.lua:114-115)
    a = jax.tree_util.tree_leaves(state.opt_state)
    b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_eval_split_batched_matches_sequential(dataset):
    h5_out, json_out = dataset
    loader = DenseCapLoader(h5_out, json_out, max_gt_boxes=4)
    cfg = _cfg(loader)
    params = __import__("densecap_tpu.models.densecap",
                        fromlist=["densecap"]).init_params(
        jax.random.PRNGKey(3), cfg)
    seq = eval_split(params, loader, cfg, split=0, max_images=4,
                     verbose=False, compute_losses=False)
    bat = eval_split(params, loader, cfg, split=0, max_images=4,
                     verbose=False, batch_size=3)
    assert abs(seq["ap_results"]["map"] - bat["ap_results"]["map"]) < 1e-6
    assert abs(seq["ap_results"]["detmap"]
               - bat["ap_results"]["detmap"]) < 1e-6


def test_eval_split_data_parallel_matches_sequential(dataset):
    """DP evaluation (batch sharded over the 'data' mesh axis) must be
    bit-equivalent to the single-device batched pass."""
    from densecap_tpu.parallel import mesh as meshlib

    h5_out, json_out = dataset
    loader = DenseCapLoader(h5_out, json_out, max_gt_boxes=4)
    cfg = _cfg(loader)
    params = __import__("densecap_tpu.models.densecap",
                        fromlist=["densecap"]).init_params(
        jax.random.PRNGKey(3), cfg)
    seq = eval_split(params, loader, cfg, split=0, max_images=4,
                     verbose=False, compute_losses=False)
    mesh = meshlib.make_mesh(n_devices=4, model_parallel=1)
    dp = eval_split(params, loader, cfg, split=0, max_images=4,
                    verbose=False, batch_size=4, mesh=mesh)
    assert abs(seq["ap_results"]["map"] - dp["ap_results"]["map"]) < 1e-6
    assert abs(seq["ap_results"]["detmap"]
               - dp["ap_results"]["detmap"]) < 1e-6


def test_eval_split_dp_tail_pads_to_data_axis_only(dataset):
    """A split that doesn't divide the batch runs its tail as a SMALLER
    program (padded only to the mesh data-axis multiple), with no
    repeated evaluator adds — same scores as the sequential pass."""
    from densecap_tpu.parallel import mesh as meshlib

    h5_out, json_out = dataset
    loader = DenseCapLoader(h5_out, json_out, max_gt_boxes=4)
    cfg = _cfg(loader)
    params = __import__("densecap_tpu.models.densecap",
                        fromlist=["densecap"]).init_params(
        jax.random.PRNGKey(3), cfg)
    seq = eval_split(params, loader, cfg, split=0, max_images=3,
                     verbose=False, compute_losses=False)
    mesh = meshlib.make_mesh(n_devices=2, model_parallel=1)
    dp = eval_split(params, loader, cfg, split=0, max_images=3,
                    verbose=False, batch_size=4, mesh=mesh)
    assert abs(seq["ap_results"]["map"] - dp["ap_results"]["map"]) < 1e-6
    assert abs(seq["ap_results"]["detmap"]
               - dp["ap_results"]["detmap"]) < 1e-6


def test_eval_split_bucketed_matches_square(dataset):
    """Batched eval on a cropped canvas bucket must reproduce the
    square-canvas results exactly (canvas masking makes the padding
    inert; backs evaluate_model --canvas_buckets)."""
    from densecap_tpu.utils.image import parse_buckets

    h5_out, json_out = dataset
    loader = DenseCapLoader(h5_out, json_out, max_gt_boxes=4)
    cfg = _cfg(loader)
    params = __import__("densecap_tpu.models.densecap",
                        fromlist=["densecap"]).init_params(
        jax.random.PRNGKey(3), cfg)
    sq = eval_split(params, loader, cfg, split=0, max_images=4,
                    verbose=False, batch_size=2)
    # 72x96 originals resize to 48x64 on the 64-canvas -> the 48x64
    # bucket actually crops
    buckets = parse_buckets("48x64", loader.canvas)
    bk = eval_split(params, loader, cfg, split=0, max_images=4,
                    verbose=False, batch_size=2, canvas_buckets=buckets)
    assert abs(sq["ap_results"]["map"] - bk["ap_results"]["map"]) < 1e-6
    assert abs(sq["ap_results"]["detmap"]
               - bk["ap_results"]["detmap"]) < 1e-6
