"""End-to-end model tests on a tiny config (the reference's
DenseCapModel_test.lua / LocalizationLayer_test.lua pattern: full
forward(+backward) on a small random image, checking shapes, finiteness
and loss structure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap

TINY = DenseCapConfig(
    vocab_size=20,
    seq_length=4,
    image_size=96,
    anchors=((8, 8), (16, 16), (12, 24), (24, 12)),
    sampler_batch_size=16,
    max_gt_boxes=8,
    test_max_proposals=12,
    rnn_size=32,
    rnn_encoding_size=32,
    fc_dim=64,
    rpn_num_filters=32,
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_setup():
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    img = jax.random.normal(
        jax.random.PRNGKey(1), (TINY.image_size, TINY.image_size, 3)
    ) * 10.0
    return params, img


def _gt():
    G = TINY.max_gt_boxes
    gt_boxes = jnp.zeros((G, 4)).at[:3].set(
        jnp.array([[20.0, 20.0, 16.0, 16.0],
                   [50.0, 40.0, 24.0, 12.0],
                   [70.0, 60.0, 10.0, 18.0]])
    )
    gt_labels = jnp.zeros((G, TINY.seq_length), jnp.int32).at[:3].set(
        jnp.array([[3, 5, 0, 0], [7, 0, 0, 0], [2, 9, 11, 4]])
    )
    gt_valid = jnp.arange(G) < 3
    return gt_boxes, gt_labels, gt_valid


def test_forward_train_losses(tiny_setup):
    params, img = tiny_setup
    gt_boxes, gt_labels, gt_valid = _gt()
    losses = densecap.forward_train(
        params, img, jnp.float32(96), jnp.float32(80),
        gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(2), TINY,
    )
    expected_keys = {
        "mid_objectness_loss", "mid_box_reg_loss", "box_decay_loss",
        "end_objectness_loss", "end_box_reg_loss", "captioning_loss",
        "total_loss",
        "stats/num_pos", "stats/sampler_no_negatives",
        "stats/sampler_neg_replaced",
    }
    assert set(losses) == expected_keys
    # stats must not leak into the objective
    parts = [
        "mid_objectness_loss", "mid_box_reg_loss", "box_decay_loss",
        "end_objectness_loss", "end_box_reg_loss", "captioning_loss",
    ]
    np.testing.assert_allclose(
        float(losses["total_loss"]),
        sum(float(losses[k]) for k in parts), rtol=1e-6,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["total_loss"]) > 0
    # zero-init box conv -> transforms are 0 -> no decay loss at init
    assert float(losses["box_decay_loss"]) == 0.0


def test_forward_train_grads_finite_and_structured(tiny_setup):
    params, img = tiny_setup
    gt_boxes, gt_labels, gt_valid = _gt()

    def loss_fn(p):
        return densecap.forward_train(
            p, img, jnp.float32(96), jnp.float32(80),
            gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(2), TINY,
        )["total_loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # gradient must reach every component
    for part in ("rpn", "recog", "objectness", "box_reg", "lm", "trunk2"):
        total = sum(
            float(jnp.abs(x).sum())
            for x in jax.tree_util.tree_leaves(g[part])
        )
        assert total > 0, f"no gradient into {part}"


def test_forward_test_output(tiny_setup):
    params, img = tiny_setup
    out = densecap.forward_test(
        params, img, jnp.float32(96), jnp.float32(80), TINY
    )
    K = TINY.test_max_proposals
    assert out.boxes.shape == (K, 4)
    assert out.scores.shape == (K,)
    assert out.captions.shape == (K, TINY.seq_length)
    assert out.valid.shape == (K,)
    assert int(out.num) == np.asarray(out.valid).sum()
    assert int(out.num) > 0
    # default (reference parity): final boxes are NOT clipped — near the
    # image they stay near it, but regression may poke past the edge
    b = np.asarray(out.boxes)[np.asarray(out.valid)]
    assert np.isfinite(b).all()

    # with clip_final_boxes on, every valid box lies within the extent
    out_c = densecap.forward_test(
        params, img, jnp.float32(96), jnp.float32(80),
        TINY.replace(clip_final_boxes=True),
    )
    bc = np.asarray(out_c.boxes)[np.asarray(out_c.valid)]
    x1 = bc[:, 0] - (bc[:, 2] - 1) / 2
    x2 = bc[:, 0] + (bc[:, 2] - 1) / 2
    assert (x1 >= 0.5).all() and (x2 <= 80.5).all()


def test_forward_test_jit_consistency(tiny_setup):
    params, img = tiny_setup
    f = jax.jit(
        lambda p, im, h, w: densecap.forward_test(p, im, h, w, TINY)
    )
    a = f(params, img, jnp.float32(96), jnp.float32(80))
    b = densecap.forward_test(
        params, img, jnp.float32(96), jnp.float32(80), TINY
    )
    np.testing.assert_allclose(
        np.asarray(a.boxes), np.asarray(b.boxes), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_extract_features(tiny_setup):
    params, img = tiny_setup
    boxes, codes, valid = densecap.extract_features(
        params, img, jnp.float32(96), jnp.float32(80), TINY, max_boxes=5
    )
    assert boxes.shape == (5, 4)
    assert codes.shape == (5, TINY.fc_dim)
    assert valid.shape == (5,)


def test_bf16_compute_grads(tiny_setup):
    # regression: conv transpose used to reject mixed f32/bf16 cotangents
    params, img = tiny_setup
    gt_boxes, gt_labels, gt_valid = _gt()
    cfg16 = TINY.replace(compute_dtype=jnp.bfloat16)

    def loss_fn(p):
        return densecap.forward_train(
            p, img, jnp.float32(96), jnp.float32(80),
            gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(2), cfg16,
        )["total_loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert all(x.dtype == jnp.float32 or x.dtype == jnp.float64
               for x in leaves)


def test_forward_train_debug_vars(tiny_setup):
    params, img = tiny_setup
    gt_boxes, gt_labels, gt_valid = _gt()
    losses, varsd = densecap.forward_train_debug(
        params, img, jnp.float32(96), jnp.float32(80),
        gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(2), TINY,
    )
    P = TINY.sampler_batch_size // 2
    assert varsd["pos_boxes"].shape == (P, 4)
    assert varsd["roi_boxes"].shape == (P + TINY.sampler_batch_size, 4)
    assert int(varsd["num_pos"]) >= 1
    assert np.isfinite(float(losses["total_loss"]))


def test_forward_train_zero_valid_gt():
    """An image with no valid gt regions (possible with padded batches)
    must produce finite losses and gradients, with all gt-dependent
    losses exactly zero."""
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    img = jax.random.normal(jax.random.PRNGKey(1), (96, 96, 3)) * 10
    G = TINY.max_gt_boxes
    gt_boxes = jnp.zeros((G, 4))
    gt_labels = jnp.zeros((G, TINY.seq_length), jnp.int32)
    gt_valid = jnp.zeros((G,), bool)

    def loss_fn(p):
        return densecap.forward_train(
            p, img, jnp.float32(96), jnp.float32(96),
            gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(2), TINY,
        )

    losses = loss_fn(params)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["captioning_loss"]) == 0.0
    assert float(losses["mid_box_reg_loss"]) == 0.0
    assert float(losses["end_box_reg_loss"]) == 0.0
    assert float(losses["stats/num_pos"]) == 0.0

    g = jax.grad(lambda p: loss_fn(p)["total_loss"])(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))
