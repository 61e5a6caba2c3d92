"""End-to-end golden test: independent transliteration vs forward_test.

The real correctness target (mAP 5.70 on Visual Genome with the released
checkpoint) is unreachable in this environment — zero network egress
(DNS resolution fails; see doc/REAL_DATA.md) and no checkpoint/dataset
on disk. This is the strongest available proxy, per VERDICT round-1
item 2: an INDEPENDENT numpy/torch implementation of the reference's
full inference semantics (run_model.lua:64-87 -> DenseCapModel.lua:
242-327 -> LocalizationLayer.lua:250-363), written in the reference's
own style — dynamic shapes, imperative greedy NMS loop
(box_utils.lua:154-256), per-point bilinear sampling, NCHW torch convs,
channel-major FC flatten, fused (D+H, 4H) LSTM — fed with the SAME
torch-layout weights (via the t7 conversion), compared against our
fixed-shape masked jitted pipeline.

Everything that could silently break parity is on this path: conv
layout conversion, anchor k-major ordering, the (w-1)/2 corner
convention, pascal +1 IoU, greedy NMS order, the BoxToAffine grid
normalization, fc6's flatten permutation, LSTM gate order, greedy
decode token indexing.
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
import test_full_convert as tfc

S = 64            # canvas == image size (cropped == canvas; the padded-
                  # canvas masking vs cropped-run delta is covered by
                  # test_canvas_vs_cropped instead)
K_PROPOSALS = 20
SEQ_LEN = 4


def _scaled_full_ckpt(seed=3):
    """The structural fixture from test_full_convert with sanely scaled
    VGG weights (1/sqrt(fan_in)) so 13 layers of ReLU convs keep
    activations O(1) instead of blowing up to 1e14."""
    tfc.K = 12
    rng = np.random.RandomState(seed)
    ckpt = tfc._full_densecap_t7(rng)
    nets = ckpt["model"]["nets"]
    for net_name in ("conv_net1", "conv_net2", "recog_base"):
        for m in t7._iter_modules(nets[net_name]):
            if "SpatialConvolution" in m.torch_class or \
                    m.torch_class.endswith("Linear"):
                w = m.fields["weight"]
                fan_in = int(np.prod(w.shape[1:]))
                m.fields["weight"] = rng.randn(*w.shape).astype(
                    np.float32) / np.sqrt(fan_in)
                m.fields["bias"] = (rng.randn(*m.fields["bias"].shape)
                                    .astype(np.float32) * 0.05)
    return ckpt


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
        test_max_proposals=K_PROPOSALS,
        test_pre_nms_topk=-1,          # exact reference semantics
        compute_dtype=jnp.float32,
    )
    rng = np.random.RandomState(5)
    image = rng.randn(S, S, 3).astype(np.float32) * 40.0  # ~mean-sub range
    return weights, params, cfg, image


# ---------------------------------------------------------------------------
# Independent numpy/torch reference implementation
# ---------------------------------------------------------------------------

def _np_trunk(weights, img_hwc):
    """VGG trunk exactly as the reference torch Sequential: NCHW convs
    (pad 1) + ReLU with 2x2/2 max pools at the TRUNK cfg positions."""
    x = torch.from_numpy(img_hwc.transpose(2, 0, 1)[None])
    for item in list(TRUNK1_CFG) + list(TRUNK2_CFG):
        if item == "M":
            x = F.max_pool2d(x, 2, 2)
            continue
        name, _ = item
        x = F.relu(F.conv2d(x, torch.from_numpy(weights[f"{name}.weight"]),
                            torch.from_numpy(weights[f"{name}.bias"]),
                            padding=1))
    return x.numpy()[0]                       # (C, H', W')


def _np_rpn(weights, feats_chw, anchors, field_centers):
    """RPN heads + k-major reshape + anchor generation + transform apply
    (LocalizationLayer.lua:609-690, ReshapeBoxFeatures.lua:24-35,
    MakeAnchors.lua:40-67, ApplyBoxTransform.lua:84-87)."""
    x = torch.from_numpy(feats_chw[None])
    hid = F.relu(F.conv2d(
        x, torch.from_numpy(weights["rpn_conv.weight"]),
        torch.from_numpy(weights["rpn_conv.bias"]), padding=1))
    box = F.conv2d(hid, torch.from_numpy(weights["rpn_box.weight"]),
                   torch.from_numpy(weights["rpn_box.bias"])).numpy()[0]
    score = F.conv2d(hid, torch.from_numpy(weights["rpn_score.weight"]),
                     torch.from_numpy(weights["rpn_score.bias"])).numpy()[0]
    k = anchors.shape[0]
    _, Hf, Wf = box.shape

    def reshape(arr, D):                      # (D*k, H, W) -> (kHW, D)
        return arr.reshape(k, D, Hf, Wf).transpose(0, 2, 3, 1).reshape(
            -1, D)

    trans = reshape(box, 4)
    scores = reshape(score, 2)

    x0, y0, sx, sy = field_centers
    xc = x0 + sx * np.arange(Wf)
    yc = y0 + sy * np.arange(Hf)
    anc = np.zeros((k, Hf, Wf, 4), np.float32)
    anc[..., 0] = xc[None, None, :]
    anc[..., 1] = yc[None, :, None]
    anc[..., 2] = anchors[:, 0][:, None, None]
    anc[..., 3] = anchors[:, 1][:, None, None]
    anc = anc.reshape(-1, 4)

    boxes = _np_apply_transform(anc, trans)
    return boxes, scores


def _np_apply_transform(anchors, trans):
    xa, ya, wa, ha = anchors.T
    tx, ty, tw, th = trans.T
    return np.stack([tx * wa + xa, ty * ha + ya,
                     wa * np.exp(np.clip(tw, -20, 20)),
                     ha * np.exp(np.clip(th, -20, 20))], axis=1)


def _np_corners(xcycwh):
    xc, yc, w, h = xcycwh.T
    return np.stack([xc - (w - 1) / 2, yc - (h - 1) / 2,
                     xc + (w - 1) / 2, yc + (h - 1) / 2], axis=1)


def _np_clip(xcycwh, W, H):
    bb = _np_corners(xcycwh)
    x0 = np.clip(bb[:, 0], 1, W - 1)
    y0 = np.clip(bb[:, 1], 1, H - 1)
    x1 = np.clip(bb[:, 2], 2, W)
    y1 = np.clip(bb[:, 3], 2, H)
    valid = (x1 > x0) & (y1 > y0)
    out = np.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0],
                   axis=1)
    return out, valid


def _np_greedy_nms(xcycwh, scores, thresh, max_out):
    """The reference's serial greedy NMS (box_utils.lua:154-256):
    descending-score order, suppress IoU > thresh (pascal +1), stop at
    max_out picks. Returns kept indices."""
    bb = _np_corners(xcycwh)
    order = np.argsort(-scores, kind="stable")
    areas = (bb[:, 2] - bb[:, 0] + 1) * (bb[:, 3] - bb[:, 1] + 1)
    keep, suppressed = [], np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_out:
            break
        xx1 = np.maximum(bb[i, 0], bb[:, 0])
        yy1 = np.maximum(bb[i, 1], bb[:, 1])
        xx2 = np.minimum(bb[i, 2], bb[:, 2])
        yy2 = np.minimum(bb[i, 3], bb[:, 3])
        inter = (np.maximum(0, xx2 - xx1 + 1)
                 * np.maximum(0, yy2 - yy1 + 1))
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > thresh
    return np.asarray(keep, np.int64)


def _np_roi_align(feats_chw, boxes, H, W, out=7):
    """Per-point bilinear sampling via the BoxToAffine normalization
    (BoxToAffine.lua:84-92) with inclusive linspace grid endpoints
    (AffineGridGeneratorBHWD) and border clamping (stnbhwd)."""
    C, Hf, Wf = feats_chw.shape
    pooled = np.zeros((len(boxes), C, out, out), np.float32)
    grid = np.linspace(-1, 1, out)
    for b, (xc, yc, w, h) in enumerate(boxes):
        yn = (h / H) * grid + (2 * yc - H - 1) / (H - 1)
        xn = (w / W) * grid + (2 * xc - W - 1) / (W - 1)
        yf = np.clip((yn + 1) * (Hf - 1) / 2, 0, Hf - 1)
        xf = np.clip((xn + 1) * (Wf - 1) / 2, 0, Wf - 1)
        for p in range(out):
            for q in range(out):
                y, x = yf[p], xf[q]
                y0, x0 = int(np.floor(y)), int(np.floor(x))
                y1, x1 = min(y0 + 1, Hf - 1), min(x0 + 1, Wf - 1)
                fy, fx = y - y0, x - x0
                pooled[b, :, p, q] = (
                    feats_chw[:, y0, x0] * (1 - fy) * (1 - fx)
                    + feats_chw[:, y0, x1] * (1 - fy) * fx
                    + feats_chw[:, y1, x0] * fy * (1 - fx)
                    + feats_chw[:, y1, x1] * fy * fx)
    return pooled


def _np_lm_greedy(weights, codes, vocab, T):
    """Greedy decode (LanguageModel.lua:293-348) with the fused
    torch-rnn LSTM layout."""
    enc_w, enc_b = (weights["lm_image_encoder.weight"],
                    weights["lm_image_encoder.bias"])
    lookup = weights["lm_lookup.weight"]
    lw, lb = weights["lm_lstm.weight"], weights["lm_lstm.bias"]
    pw, pb = weights["lm_proj.weight"], weights["lm_proj.bias"]
    D = enc_w.shape[0]
    Hn = lw.shape[1] // 4

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    def step(x, h, c):
        gates = x @ lw[:D] + h @ lw[D:] + lb
        i, f = sig(gates[:, :Hn]), sig(gates[:, Hn:2 * Hn])
        o = sig(gates[:, 2 * Hn:3 * Hn])
        g = np.tanh(gates[:, 3 * Hn:])
        c2 = f * c + i * g
        return o * np.tanh(c2), c2

    P = len(codes)
    h = np.zeros((P, Hn), np.float32)
    c = np.zeros((P, Hn), np.float32)
    img = np.maximum(codes @ enc_w.T + enc_b, 0)
    h, c = step(img, h, c)
    tok = np.full((P,), vocab + 1, np.int64)   # START
    seq = np.zeros((P, T), np.int64)
    for t in range(T):
        x = lookup[tok - 1]
        h, c = step(x, h, c)
        scores = h @ pw.T + pb
        tok = np.argmax(scores, axis=1) + 1
        seq[:, t] = tok
    return seq


def _np_forward_test(weights, cfg, image):
    """The whole reference inference pass, imperative and dynamic.

    image is the CROPPED (h, w, 3) image, exactly what the reference
    feeds its convs (DataLoader crops out of the h5 canvas /
    run_model.lua loads the raw image)."""
    h, w = image.shape[:2]
    feats = _np_trunk(weights, image)
    anchors = np.asarray(cfg.anchors, np.float32) * cfg.anchor_scale
    boxes, rpn_scores = _np_rpn(weights, feats, anchors, cfg.field_centers)

    boxes, valid = _np_clip(boxes, w, h)
    e = np.exp(rpn_scores - rpn_scores.max(axis=1, keepdims=True))
    probs = (e / e.sum(axis=1, keepdims=True))[:, 0]
    probs = np.where(valid, probs, -np.inf)

    keep = _np_greedy_nms(boxes, probs, cfg.test_rpn_nms_thresh,
                          K_PROPOSALS)
    roi_boxes = boxes[keep]
    pooled = _np_roi_align(feats, roi_boxes, h, w)   # (P, C, 7, 7)

    flat = pooled.reshape(len(keep), -1)             # channel-major
    h1 = np.maximum(flat @ weights["fc6.weight"].T
                    + weights["fc6.bias"], 0)
    codes = np.maximum(h1 @ weights["fc7.weight"].T
                       + weights["fc7.bias"], 0)

    obj = (codes @ weights["objectness.weight"].T
           + weights["objectness.bias"])[:, 0]
    trans = codes @ weights["box_reg.weight"].T + weights["box_reg.bias"]
    final_boxes = _np_apply_transform(roi_boxes, trans)

    keep2 = _np_greedy_nms(final_boxes, obj, cfg.test_final_nms_thresh,
                           K_PROPOSALS)
    final_boxes = final_boxes[keep2]
    obj = obj[keep2]
    captions = _np_lm_greedy(weights, codes[keep2], cfg.vocab_size,
                             SEQ_LEN)
    return final_boxes, obj, captions


@pytest.mark.parametrize("h,w", [
    (S, S),     # image fills the canvas (no padding in play)
    (48, 33),   # padded canvas; odd width exercises the pool floor chain
])
def test_forward_test_matches_reference_transliteration(setup, h, w):
    """The jitted CANVAS run must equal the reference's CROPPED run
    exactly — the per-conv extent masking in apply_trunk makes padded
    activations identical to the cropped run's zero padding."""
    weights, params, cfg, image = setup
    canvas = np.zeros_like(image)
    canvas[:h, :w] = image[:h, :w]

    ref_boxes, ref_scores, ref_caps = _np_forward_test(
        weights, cfg, image[:h, :w].copy())

    out = jax.jit(
        lambda p, im: densecap.forward_test(
            p, im, float(h), float(w), cfg)
    )(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(canvas))

    n = int(out.num)
    assert n == len(ref_boxes), (n, len(ref_boxes))
    assert bool(np.all(np.asarray(out.valid)[:n]))

    got_boxes = np.asarray(out.boxes)[:n]
    got_scores = np.asarray(out.scores)[:n]
    got_caps = np.asarray(out.captions)[:n]

    np.testing.assert_allclose(got_scores, ref_scores, rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(got_boxes, ref_boxes, rtol=2e-3, atol=0.05)
    assert (got_caps == ref_caps).mean() > 0.95, (got_caps, ref_caps)
