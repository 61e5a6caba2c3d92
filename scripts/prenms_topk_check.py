"""Quantify `test_pre_nms_topk` (6000 vs all-anchors) on a TRAINED
flagship-geometry model — the measurement the config comment promises.

The reference's test-time NMS scans ALL ~24k anchor scores serially
(LocalizationLayer.lua:172-207 clip + box_utils.nms over the full set);
we default to standard Faster-R-CNN practice of suppressing only the
top-6000 pre-NMS proposals. This script puts a number on the
difference: train the FLAGSHIP geometry (720px, 12 anchors -> 24300
proposals) on synthetic scenes, then evaluate HELD-OUT scenes with
test_pre_nms_topk in {-1, 6000, 2000} and report mAP + the IoU>=0.9
survivor overlap of each truncated run vs the exact (-1) run.

Usage:
  PYTHONPATH=.:/root/.axon_site python scripts/prenms_topk_check.py
  (add --steps N to change training length; params cached in /tmp so
  re-runs skip training)
"""

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.eval.evaluator import DenseCaptioningEvaluator
from densecap_tpu.models import densecap
from densecap_tpu.parallel import train_step as ts
from densecap_tpu.utils import checkpoint as ckpt
from densecap_tpu.utils.text import decode_sequence

COLORS = {
    "red": (200, 40, 40), "green": (40, 180, 40), "blue": (40, 60, 200),
    "yellow": (220, 210, 40),
}
VOCAB = ["box"] + list(COLORS)
TOK = {w: i + 1 for i, w in enumerate(VOCAB)}
IDX2TOK = {i + 1: w for i, w in enumerate(VOCAB)}
S = 720
G = 4
L = 3

CACHE = "/tmp/prenms_flagship_params.npz"


def make_scenes(n, seed):
    rng = np.random.RandomState(seed)
    images = np.zeros((n, S, S, 3), np.float32)
    gt_boxes = np.zeros((n, G, 4), np.float32)
    gt_labels = np.zeros((n, G, L), np.int32)
    gt_valid = np.zeros((n, G), bool)
    texts = []
    for i in range(n):
        img = rng.uniform(90, 130, (S, S, 3)).astype(np.float32)
        names = []
        for b in range(rng.randint(2, 4)):
            color = list(COLORS)[rng.randint(len(COLORS))]
            w, h = rng.randint(60, 300, 2)
            x = rng.randint(1, S - w - 1)
            y = rng.randint(1, S - h - 1)
            img[y:y + h, x:x + w] = COLORS[color]
            gt_boxes[i, b] = [x + w / 2.0, y + h / 2.0, w, h]
            gt_labels[i, b, :2] = [TOK[color], TOK["box"]]
            gt_valid[i, b] = True
            names.append(f"{color} box")
        images[i] = img[:, :, ::-1] - np.array([103.9, 116.8, 123.7])
        texts.append(names)
    return images, gt_boxes, gt_labels, gt_valid, texts


def flagship_cfg(**kw):
    return DenseCapConfig(
        vocab_size=len(VOCAB), seq_length=L, image_size=S,
        sampler_batch_size=128, max_gt_boxes=G, test_max_proposals=300,
        drop_prob=0.0, **kw)


def train(steps, n_train):
    cfg = flagship_cfg()
    tr = make_scenes(n_train, seed=0)
    tr_imgs = jax.device_put(jnp.asarray(tr[0]))
    lr = optax.cosine_decay_schedule(3e-4, steps, alpha=0.05)
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg,
                              learning_rate=lr)
    state = state._replace(finetune_cnn=jnp.ones((), bool))
    B = 4
    hs = jnp.full((B,), float(S))
    ws = jnp.full((B,), float(S))
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for it in range(steps):
        sel = np.random.RandomState(it).choice(n_train, B, replace=False)
        batch = {
            "image": tr_imgs[sel], "height": hs, "width": ws,
            "gt_boxes": jnp.asarray(tr[1][sel]),
            "gt_labels": jnp.asarray(tr[2][sel]),
            "gt_valid": jnp.asarray(tr[3][sel]),
        }
        rng, sub = jax.random.split(rng)
        state, losses = ts.train_step(state, batch, sub, cfg, tx)
        if it % 200 == 0 or it == steps - 1:
            print(f"it {it:5d} total {float(losses['total_loss']):8.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return state.params


def survivor_overlap(boxes_a, boxes_b, thresh=0.9):
    """Fraction of run-A survivors having an IoU>=thresh twin in run B."""
    from densecap_tpu.ops.boxes import iou_pascal, xcycwh_to_x1y1x2y2
    if len(boxes_a) == 0:
        return 1.0
    if len(boxes_b) == 0:
        return 0.0
    m = iou_pascal(xcycwh_to_x1y1x2y2(jnp.asarray(boxes_a)),
                   xcycwh_to_x1y1x2y2(jnp.asarray(boxes_b)))
    return float(jnp.mean(jnp.max(m, axis=1) >= thresh))


def evaluate(params, va, topk):
    cfg = flagship_cfg(test_pre_nms_topk=topk)
    fwd = jax.jit(lambda p, im: densecap.forward_test(
        p, im, jnp.float32(S), jnp.float32(S), cfg))
    ev = DenseCaptioningEvaluator()
    all_boxes = []
    n_val = len(va[0])
    va_imgs = jax.device_put(jnp.asarray(va[0]))
    for i in range(n_val):
        out = fwd(params, va_imgs[i])
        valid = np.asarray(out.valid)
        boxes = np.asarray(out.boxes)[valid]
        caps = decode_sequence(np.asarray(out.captions)[valid], IDX2TOK,
                               cfg.vocab_size)
        gv = va[3][i]
        ev.add_result(np.asarray(out.scores)[valid], boxes, caps,
                      va[1][i][gv], va[4][i])
        all_boxes.append(boxes)
    res = ev.evaluate(verbose=False)
    return res, all_boxes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n_train", type=int, default=64)
    ap.add_argument("--n_val", type=int, default=16)
    ap.add_argument("--retrain", action="store_true")
    args = ap.parse_args()

    if os.path.exists(CACHE) and not args.retrain:
        print(f"# loading cached params {CACHE}", flush=True)
        params, _ = ckpt.load_params(CACHE)
        # commit to device once — numpy pytrees re-transfer ~560 MB over
        # the tunnel on EVERY jitted call otherwise
        params = jax.device_put(params)
    else:
        params = train(args.steps, args.n_train)
        ckpt.save_params(CACHE, params)
        print(f"# params cached to {CACHE}")

    va = make_scenes(args.n_val, seed=777)
    results = {}
    boxes_by_k = {}
    sweep = (6000, 5000, 4000, 3000, 2000)
    for topk in (-1,) + sweep:
        t0 = time.time()
        res, boxes = evaluate(params, va, topk)
        results[topk] = res
        boxes_by_k[topk] = boxes
        print(f"topk={topk:6d}: mAP {res['map']:.4f} "
              f"detmap {res['detmap']:.4f} ({time.time() - t0:.0f}s)",
              flush=True)

    exact = boxes_by_k[-1]
    for topk in sweep:
        ov = np.mean([survivor_overlap(exact[i], boxes_by_k[topk][i])
                      for i in range(len(exact))])
        dmap = results[topk]["map"] - results[-1]["map"]
        print(f"topk={topk}: survivor overlap vs exact "
              f"{ov:.4f}, mAP delta {dmap:+.4f}")


if __name__ == "__main__":
    main()
