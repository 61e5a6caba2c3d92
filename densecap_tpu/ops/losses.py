"""Loss functions with masked fixed-shape semantics.

Ports the reference's five training criterions to masked jnp, keeping
each one's exact normalization so loss magnitudes (and therefore the
published loss weights, train_opts.lua:32-40) carry over:

  * cross entropy, mean over rows        (OurCrossEntropyCriterion.lua,
    used for RPN objectness, LocalizationLayer.lua:111-112)
  * smooth L1, mean over elements        (nn.SmoothL1Criterion, used for
    RPN box regression, LocalizationLayer.lua:113)
  * one-vs-all logistic, mean over elems (LogisticCriterion.lua:80-121,
    used for final objectness, DenseCapModel.lua:118)
  * smooth L1 on inverted transforms w/ the |t|>10 outlier mask
    (BoxRegressionCriterion.lua:50-66, final box regression)
  * masked temporal CE, sum over non-null tokens / num sequences
    (torch-rnn TemporalCrossEntropyCriterion w/ batch_average=true,
    time_average=false; used for captioning, DenseCapModel.lua:120)

Every function takes a row validity mask because padded sampler slots
must contribute exactly nothing — including to denominators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .transforms import invert_box_transform


def _safe_div(num, den):
    return num / jnp.maximum(den, 1.0)


def cross_entropy(scores, labels, valid):
    """Mean softmax cross entropy over valid rows.

    scores: (N, C); labels: (N,) int in [0, C); valid: (N,) bool.
    """
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return _safe_div(jnp.sum(nll * valid), jnp.sum(valid))


def smooth_l1(pred, target, valid):
    """Mean smooth-L1 over elements of valid rows (torch SmoothL1Criterion).

    pred, target: (N, D); valid: (N,) bool. Elementwise:
    0.5 z^2 if |z| < 1 else |z| - 0.5.
    """
    z = jnp.abs(pred - target)
    elem = jnp.where(z < 1.0, 0.5 * z * z, z - 0.5)
    elem = elem * valid[:, None]
    return _safe_div(jnp.sum(elem), jnp.sum(valid) * pred.shape[-1])


def logistic(scores, labels, valid):
    """One-vs-all logistic loss, LogisticCriterion.lua semantics.

    scores: (N, C); labels: (N,) int in [0, C] where 0 means negative for
    every class and c>0 means positive for class c (1-indexed, as in the
    reference). Loss per element x with binary label y:
      log(1 + exp(-x))       if y == 1
      log(1 + exp(-x)) + x   if y == 0
    normalized by the TOTAL element count N*C (reference divides by
    input:nElement(), LogisticCriterion.lua:118) — here by the count of
    elements in valid rows.
    """
    N, C = scores.shape
    # y[i, j] = 1 iff labels[i] == j+1
    y = (labels[:, None] == (jnp.arange(C)[None, :] + 1)).astype(scores.dtype)
    # log(1 + exp(-x)) stable:
    log1p_exp_negx = jnp.logaddexp(0.0, -scores)
    elem = log1p_exp_negx + (1.0 - y) * scores
    elem = elem * valid[:, None]
    return _safe_div(jnp.sum(elem), jnp.sum(valid) * C)


def box_regression(anchor_boxes, transforms, target_boxes, valid, weight=1.0,
                   max_trans=10.0):
    """Final box-regression loss (BoxRegressionCriterion.lua).

    Computes target transforms via invert_box_transform and applies
    smooth-L1 between predicted and target transforms; rows where any
    |target transform| exceeds max_trans are zeroed on BOTH sides — the
    reference's "DIRTY DIRTY HACK" (BoxRegressionCriterion.lua:54-63) —
    but still counted in the element-mean denominator, exactly as there.

    Gradient flows into transforms and anchor_boxes (the reference
    negates the invert-transform gradient into the anchors,
    BoxRegressionCriterion.lua:70-79 — autodiff reproduces this since
    anchors enter only through the target term with a minus sign).
    """
    target_trans = invert_box_transform(anchor_boxes, target_boxes)
    ok = jnp.max(jnp.abs(target_trans), axis=-1, keepdims=True) <= max_trans
    ok = jax.lax.stop_gradient(ok)
    pred = jnp.where(ok, transforms, 0.0)
    tgt = jnp.where(ok, target_trans, 0.0)
    return weight * smooth_l1(pred, tgt, valid)


def masked_transform_pair(transforms, target_trans, max_trans=10.0):
    """Zero out rows with outlier target transforms (both sides).

    Mirror of the train-time masking in LocalizationLayer.lua:479-489,
    exposed separately for the RPN mid loss.
    """
    ok = jnp.max(jnp.abs(target_trans), axis=-1, keepdims=True) <= max_trans
    ok = jax.lax.stop_gradient(ok)
    return jnp.where(ok, transforms, 0.0), jnp.where(ok, target_trans, 0.0)


def temporal_cross_entropy(scores, target, seq_valid):
    """Masked sequence cross entropy.

    scores: (N, T, V) unnormalized; target: (N, T) int in [0, V] where 0
    is a null (masked) token, >0 are 1-indexed classes; seq_valid: (N,)
    bool over rows (padded sampler slots).

    Returns sum of CE over non-null tokens of valid rows, divided by the
    number of valid rows (torch-rnn TemporalCrossEntropyCriterion with
    batch_average=true, time_average=false — the configuration DenseCap
    uses via DenseCapModel.lua:120).
    """
    logp = jax.nn.log_softmax(scores, axis=-1)
    tgt0 = jnp.maximum(target - 1, 0)  # 1-indexed -> 0-indexed, safe at 0
    nll = -jnp.take_along_axis(logp, tgt0[..., None], axis=-1)[..., 0]
    mask = (target > 0) & seq_valid[:, None]
    total = jnp.sum(nll * mask)
    return _safe_div(total, jnp.sum(seq_valid))
