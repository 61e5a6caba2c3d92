"""Loss semantics tests: normalizations, masking, outlier hack, and
equivalence with straightforward numpy implementations."""

import jax
import jax.numpy as jnp
import numpy as np

from densecap_tpu.ops import losses as L
from densecap_tpu.ops.transforms import apply_box_transform


def test_cross_entropy_matches_numpy():
    rng = np.random.RandomState(0)
    scores = rng.randn(6, 2).astype(np.float32)
    labels = np.array([0, 1, 0, 1, 0, 1])
    valid = np.array([True] * 4 + [False] * 2)
    got = float(
        L.cross_entropy(jnp.asarray(scores), jnp.asarray(labels),
                        jnp.asarray(valid))
    )
    p = np.exp(scores) / np.exp(scores).sum(1, keepdims=True)
    want = -np.log(p[np.arange(6), labels])[:4].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_l1_regions():
    pred = jnp.array([[0.5, 2.0, -3.0, 0.0]])
    tgt = jnp.zeros((1, 4))
    valid = jnp.array([True])
    # elements: 0.5^2/2=0.125, 2-0.5=1.5, 3-0.5=2.5, 0 -> mean over 4
    got = float(L.smooth_l1(pred, tgt, valid))
    np.testing.assert_allclose(got, (0.125 + 1.5 + 2.5 + 0) / 4, rtol=1e-6)


def test_smooth_l1_mask_excluded_from_denominator():
    pred = jnp.array([[1.0, 1.0, 1.0, 1.0], [100.0, 100.0, 100.0, 100.0]])
    tgt = jnp.zeros((2, 4))
    got = float(L.smooth_l1(pred, tgt, jnp.array([True, False])))
    np.testing.assert_allclose(got, 0.5, rtol=1e-6)


def test_logistic_matches_reference_formula():
    # loss(x, y=1) = log(1+exp(-x)); loss(x, y=0) = log(1+exp(-x)) + x
    scores = jnp.array([[2.0], [-1.0], [0.5]])
    labels = jnp.array([1, 0, 0])  # row0 positive, rows 1-2 negative
    valid = jnp.ones(3, dtype=bool)
    got = float(L.logistic(scores, labels, valid))
    want = (
        np.log1p(np.exp(-2.0))
        + np.log1p(np.exp(1.0)) + (-1.0)
        + np.log1p(np.exp(-0.5)) + 0.5
    ) / 3
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_logistic_extreme_scores_stable():
    scores = jnp.array([[1000.0], [-1000.0]])
    labels = jnp.array([1, 0])
    got = float(L.logistic(scores, labels, jnp.ones(2, dtype=bool)))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_box_regression_outlier_hack():
    anchors = jnp.array([[10.0, 10.0, 4.0, 4.0], [10.0, 10.0, 4.0, 4.0]])
    trans = jnp.zeros((2, 4))
    # second target is absurdly far -> |tx| = 90/4 > 10 -> masked out
    targets = jnp.array([[11.0, 10.0, 4.0, 4.0], [100.0, 10.0, 4.0, 4.0]])
    valid = jnp.ones(2, dtype=bool)
    loss = float(L.box_regression(anchors, trans, targets, valid, weight=1.0))
    # row 0: target trans = (0.25, 0, 0, 0); smooth l1 vs 0 =
    # 0.5*0.25^2 = 0.03125; row 1 contributes 0 but counts in denom
    np.testing.assert_allclose(loss, 0.03125 / 8, rtol=1e-6)


def test_box_regression_grad_into_anchors():
    anchors = jnp.array([[10.0, 10.0, 4.0, 4.0]])
    trans = jnp.array([[0.1, 0.1, 0.1, 0.1]])
    targets = jnp.array([[11.0, 11.0, 5.0, 5.0]])
    valid = jnp.ones(1, dtype=bool)
    ga, gt_ = jax.grad(
        lambda a, t: L.box_regression(a, t, targets, valid), argnums=(0, 1)
    )(anchors, trans)
    assert float(jnp.abs(ga).sum()) > 0
    assert float(jnp.abs(gt_).sum()) > 0


def test_temporal_ce_normalization_and_mask():
    rng = np.random.RandomState(1)
    V = 5
    scores = rng.randn(3, 4, V).astype(np.float32)
    target = np.array(
        [[0, 1, 2, 3],     # 3 real tokens
         [0, 4, 0, 0],     # 1 real token
         [0, 1, 1, 1]]     # masked-out row
    )
    seq_valid = np.array([True, True, False])
    got = float(
        L.temporal_cross_entropy(
            jnp.asarray(scores), jnp.asarray(target), jnp.asarray(seq_valid)
        )
    )
    logp = scores - np.log(np.exp(scores).sum(-1, keepdims=True))
    total = 0.0
    for i in range(2):
        for t in range(4):
            if target[i, t] > 0:
                total += -logp[i, t, target[i, t] - 1]
    np.testing.assert_allclose(got, total / 2, rtol=1e-5)


def test_apply_then_invert_loss_zero():
    anchors = jnp.array([[10.0, 10.0, 4.0, 6.0]])
    trans = jnp.array([[0.2, -0.1, 0.3, 0.0]])
    targets = apply_box_transform(anchors, trans)
    loss = float(
        L.box_regression(anchors, trans, targets, jnp.ones(1, dtype=bool))
    )
    np.testing.assert_allclose(loss, 0.0, atol=1e-10)


def test_box_regression_degenerate_inputs_finite_grads():
    """Zero-size anchors/targets (padded rows) must yield finite loss AND
    finite gradients — regression test for the NaN-at-step-2500 failure
    (inf transforms poisoning grads through jnp.where)."""
    anchors = jnp.array([[10.0, 10.0, 4.0, 4.0],
                         [0.0, 0.0, 0.0, 0.0]])      # degenerate pad row
    trans = jnp.array([[0.1, 0.1, 0.1, 0.1],
                       [50.0, -50.0, 100.0, -100.0]])  # spiked outputs
    targets = jnp.array([[11.0, 11.0, 5.0, 5.0],
                         [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.array([True, True])

    loss, (ga, gt_) = jax.value_and_grad(
        lambda a, t: L.box_regression(a, t, targets, valid),
        argnums=(0, 1),
    )(anchors, trans)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(ga)).all()
    assert np.isfinite(np.asarray(gt_)).all()


def test_apply_transform_overflow_guard():
    from densecap_tpu.ops.transforms import apply_box_transform

    boxes = jnp.array([[10.0, 10.0, 4.0, 4.0]])
    trans = jnp.array([[0.0, 0.0, 500.0, -500.0]])  # would overflow exp
    out = apply_box_transform(boxes, trans)
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda t: jnp.sum(apply_box_transform(boxes, t)))(trans)
    assert np.isfinite(np.asarray(g)).all()
