"""Overfit sanity: train from scratch on a tiny synthetic dataset until
the model detects and captions the shapes, then report train-set mAP.

Synthetic data: solid colored rectangles on textured backgrounds,
captioned "<color> box". A working end-to-end implementation should
overfit this in a few hundred steps. Run on TPU:

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/overfit_sanity.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.eval.evaluator import DenseCaptioningEvaluator
from densecap_tpu.models import densecap
from densecap_tpu.parallel import train_step as ts
from densecap_tpu.utils.text import decode_sequence

COLORS = {
    "red": (200, 40, 40), "green": (40, 180, 40), "blue": (40, 60, 200),
    "yellow": (220, 210, 40),
}
VOCAB = ["box"] + list(COLORS)  # 1-indexed tokens
TOK = {w: i + 1 for i, w in enumerate(VOCAB)}
IDX2TOK = {i + 1: w for i, w in enumerate(VOCAB)}

FULL = "--full" in sys.argv  # flagship 720px config
S = 720 if FULL else 192
N_IMAGES = 16
G = 4
L = 3


def make_dataset(seed=0):
    rng = np.random.RandomState(seed)
    images = np.zeros((N_IMAGES, S, S, 3), np.float32)
    gt_boxes = np.zeros((N_IMAGES, G, 4), np.float32)
    gt_labels = np.zeros((N_IMAGES, G, L), np.int32)
    gt_valid = np.zeros((N_IMAGES, G), bool)
    texts = []
    lo, hi = (60, 300) if FULL else (30, 80)  # box sizes match anchors
    for i in range(N_IMAGES):
        img = rng.uniform(90, 130, (S, S, 3)).astype(np.float32)
        names = []
        n = rng.randint(2, 4)
        for b in range(n):
            color = list(COLORS)[rng.randint(len(COLORS))]
            w, h = rng.randint(lo, hi, 2)
            x = rng.randint(1, S - w - 1)
            y = rng.randint(1, S - h - 1)
            img[y:y + h, x:x + w] = COLORS[color]
            gt_boxes[i, b] = [x + w / 2.0, y + h / 2.0, w, h]
            gt_labels[i, b, :2] = [TOK[color], TOK["box"]]
            gt_valid[i, b] = True
            names.append(f"{color} box")
        # BGR + mean-centering like the real pipeline
        images[i] = img[:, :, ::-1] - np.array([103.9, 116.8, 123.7])
        texts.append(names)
    return images, gt_boxes, gt_labels, gt_valid, texts


def main():
    if FULL:
        # flagship geometry: default 12 anchors, 4096-d recognition,
        # 512-d LSTM — the exact serving configuration
        cfg = DenseCapConfig(
            vocab_size=len(VOCAB),
            seq_length=L,
            image_size=S,
            sampler_batch_size=128,
            max_gt_boxes=G,
            test_max_proposals=50,
            drop_prob=0.0,
        )
    else:
        cfg = DenseCapConfig(
            vocab_size=len(VOCAB),
            seq_length=L,
            image_size=S,
            anchors=((32, 32), (64, 64), (48, 96), (96, 48), (96, 96)),
            sampler_batch_size=64,
            max_gt_boxes=G,
            test_max_proposals=50,
            test_pre_nms_topk=-1,
            rnn_size=64,
            rnn_encoding_size=64,
            fc_dim=256,
            rpn_num_filters=64,
            drop_prob=0.0,
        )
    images, gt_boxes, gt_labels, gt_valid, texts = make_dataset()
    images_d = jax.device_put(jnp.asarray(images))

    import optax

    steps_total = 1500 if FULL else 6000
    lr = optax.cosine_decay_schedule(3e-4, steps_total, alpha=0.02)
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg,
                              learning_rate=lr)
    # from-scratch: train the conv trunk too
    state = state._replace(finetune_cnn=jnp.ones((), bool))

    B = 4
    rng = jax.random.PRNGKey(1)
    hs = jnp.full((B,), float(S))
    ws = jnp.full((B,), float(S))
    t0 = time.time()
    steps = steps_total
    for it in range(steps):
        sel = np.random.RandomState(it).choice(N_IMAGES, B, replace=False)
        batch = {
            "image": images_d[sel],
            "height": hs,
            "width": ws,
            "gt_boxes": jnp.asarray(gt_boxes[sel]),
            "gt_labels": jnp.asarray(gt_labels[sel]),
            "gt_valid": jnp.asarray(gt_valid[sel]),
        }
        rng, sub = jax.random.split(rng)
        state, losses = ts.train_step(state, batch, sub, cfg, tx)
        if it % 50 == 0 or it == steps - 1:
            print(f"it {it:4d} total {float(losses['total_loss']):8.4f} "
                  f"cap {float(losses['captioning_loss']):7.4f} "
                  f"endobj {float(losses['end_objectness_loss']):6.4f} "
                  f"({time.time() - t0:.0f}s)")

    # RPN box recall diagnostic: does the localization layer FIND the
    # boxes (separately from how the final head ranks them)?
    from densecap_tpu.models.localization import localize_test
    from densecap_tpu.ops.boxes import eval_box_recall

    feats_fn = jax.jit(lambda p, im: densecap.features(p, im, cfg))
    loc_fn = jax.jit(lambda rp, f: localize_test(
        rp, f, jnp.float32(S), jnp.float32(S), cfg, cfg.anchor_array()))
    rec = []
    for i in range(4):
        loc = loc_fn(state.params["rpn"], feats_fn(state.params, images_d[i]))
        valid = np.asarray(loc.roi_valid)
        props = jnp.asarray(np.asarray(loc.roi_boxes)[valid])
        gvi = gt_valid[i]
        stats = eval_box_recall(props, jnp.asarray(gt_boxes[i][gvi]),
                                ns=(10, 50))
        rec.append(stats.get("0.50_recall_at_50",
                             stats.get("0.50_recall_at_10", 0.0)))
    print("RPN recall@50 iou0.5 on 4 imgs:", [round(r, 2) for r in rec])

    # evaluate on the training set (overfit check)
    fwd = jax.jit(lambda p, im: densecap.forward_test(
        p, im, jnp.float32(S), jnp.float32(S), cfg))
    ev = DenseCaptioningEvaluator()
    for i in range(N_IMAGES):
        out = fwd(state.params, images_d[i])
        valid = np.asarray(out.valid)
        boxes = np.asarray(out.boxes)[valid]
        scores = np.asarray(out.scores)[valid]
        caps = decode_sequence(np.asarray(out.captions)[valid], IDX2TOK,
                               cfg.vocab_size)
        gvi = gt_valid[i]
        ev.add_result(scores, boxes, caps, gt_boxes[i][gvi], texts[i])
        if i < 3:
            print(f"img {i}: gt={texts[i]} pred={caps[:4]} "
                  f"scores={np.round(scores[:4], 2).tolist()}")
    res = ev.evaluate(verbose=False)
    print(f"train-set mAP: {res['map']:.4f}  detmap: {res['detmap']:.4f} "
          f"({res['score_method']})")
    assert res["detmap"] > 0.15, "detection never learned"
    print("OVERFIT SANITY PASSED" if res["map"] > 0.2 else
          "WARNING: captions weak (map <= 0.2)")


if __name__ == "__main__":
    main()
