"""Generalization check: train on many synthetic scenes, evaluate mAP
on HELD-OUT scenes (novel box layouts) — demonstrates the system learns
transferable localization + captioning, not memorization.

  PYTHONPATH=. python scripts/generalize_check.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.eval.evaluator import DenseCaptioningEvaluator
from densecap_tpu.models import densecap
from densecap_tpu.parallel import train_step as ts
from densecap_tpu.utils.text import decode_sequence

COLORS = {
    "red": (200, 40, 40), "green": (40, 180, 40), "blue": (40, 60, 200),
    "yellow": (220, 210, 40),
}
VOCAB = ["box"] + list(COLORS)
TOK = {w: i + 1 for i, w in enumerate(VOCAB)}
IDX2TOK = {i + 1: w for i, w in enumerate(VOCAB)}
S = 192
G = 4
L = 3


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
            w, h = rng.randint(30, 80, 2)
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


def main(steps=4000, n_train=160, n_val=16):
    cfg = DenseCapConfig(
        vocab_size=len(VOCAB), seq_length=L, image_size=S,
        anchors=((32, 32), (64, 64), (48, 96), (96, 48), (96, 96)),
        sampler_batch_size=64, max_gt_boxes=G, test_max_proposals=50,
        rnn_size=64, rnn_encoding_size=64, fc_dim=256,
        rpn_num_filters=64, drop_prob=0.0,
        roi_align_impl="mxu",   # the shipping TPU train/test path
    )
    tr = make_scenes(n_train, seed=0)
    va = make_scenes(n_val, seed=777)  # disjoint layouts
    tr_imgs = jax.device_put(jnp.asarray(tr[0]))

    lr = optax.cosine_decay_schedule(3e-4, steps, alpha=0.05)
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg,
                              learning_rate=lr)
    state = state._replace(finetune_cnn=jnp.ones((), bool))

    B = 8
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
        if it % 250 == 0 or it == steps - 1:
            print(f"it {it:5d} total {float(losses['total_loss']):8.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    fwd = jax.jit(lambda p, im: densecap.forward_test(
        p, im, jnp.float32(S), jnp.float32(S), cfg))
    ev = DenseCaptioningEvaluator()
    va_imgs = jax.device_put(jnp.asarray(va[0]))
    for i in range(n_val):
        out = fwd(state.params, va_imgs[i])
        valid = np.asarray(out.valid)
        caps = decode_sequence(np.asarray(out.captions)[valid], IDX2TOK,
                               cfg.vocab_size)
        gv = va[3][i]
        ev.add_result(np.asarray(out.scores)[valid],
                      np.asarray(out.boxes)[valid], caps,
                      va[1][i][gv], va[4][i])
    res = ev.evaluate(verbose=False)
    print(f"HELD-OUT mAP: {res['map']:.4f}  detmap: {res['detmap']:.4f} "
          f"({res['score_method']}, {n_val} unseen scenes)")


if __name__ == "__main__":
    main()
