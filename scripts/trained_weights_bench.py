"""Trained-weights performance measurement (VERDICT r3 Missing #3).

Every prior BENCH figure used random weights — the worst case for the
greedy-decode early exit, because random logits essentially never emit
END and the decode while_loop runs all T=15 steps. Real models end
captions after ~5-8 tokens (VG mean ~6.3; reference
LanguageModel.lua:293-348 decodes to END), so the early exit's real
benefit only shows on weights that actually END.

This script trains the FLAGSHIP serving configuration (vocab 10000,
seq 15, 4096-d recognition, 512-d LSTM — the exact bench.py headline
program) on a synthetic scene dataset whose captions have a REALISTIC
length distribution (3-9 words, mean ~6, template chosen
deterministically from box appearance so the model can overfit it),
then measures on the attached TPU chip:

  1. bench.py's exact headline program (B=8, 720x544 canvas, greedy,
     1000 proposals) on TRAINED weights vs RANDOM weights.
  2. the decoded caption-length distribution (sanity: END is learned).
  3. beam-3 decode on trained weights vs random weights.

Run: PYTHONPATH=.:/root/.axon_site python scripts/trained_weights_bench.py
     (~4 min: ~2 min training + compiles; add --steps N to change)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap
from densecap_tpu.parallel import train_step as ts

S, W = 720, 544          # bench.py headline canvas (720x544 bucket)
CONTENT_W = 540.0        # true content width (4:3 of 720)
B_TRAIN = 4
B_BENCH = 8
N_IMAGES = 16
G = 4                    # gt boxes per image
L = 15                   # flagship seq_length

COLORS = {
    "red": (200, 40, 40), "green": (40, 180, 40),
    "blue": (40, 60, 200), "yellow": (220, 210, 40),
}
# word ids are arbitrary points in the REAL 10000-word vocab space —
# the LM projection runs at full headline width
WORDS = ["a", "the", "on", "box", "background", "small", "large",
         "sits", "near", "edge", "gray", "bright"] + list(COLORS)
TOK = {w: i + 1 for i, w in enumerate(WORDS)}

# caption templates, 3-9 words (mean ~6, matching VG's ~6.3): chosen
# DETERMINISTICALLY from (color, size) so captions are predictable from
# RoI appearance and the model can learn where END goes
TEMPLATES = [
    lambda c, s: [c, "box"],
    lambda c, s: ["a", s, c, "box"],
    lambda c, s: ["a", c, "box", "on", "the", "background"],
    lambda c, s: ["a", s, c, "box", "on", "the", "gray", "background"],
    lambda c, s: ["a", "bright", s, c, "box", "sits", "near", "the",
                  "edge"],
]


def caption_for(color, size):
    # stable across processes (python str hash is salted)
    h = sum(map(ord, color + size))
    t = TEMPLATES[h % len(TEMPLATES)]
    return t(color, size)


def make_dataset(seed=0):
    rng = np.random.RandomState(seed)
    images = np.zeros((N_IMAGES, S, W, 3), np.float32)
    gt_boxes = np.zeros((N_IMAGES, G, 4), np.float32)
    gt_labels = np.zeros((N_IMAGES, G, L), np.int32)
    gt_valid = np.zeros((N_IMAGES, G), bool)
    for i in range(N_IMAGES):
        img = rng.uniform(90, 130, (S, W, 3)).astype(np.float32)
        n = rng.randint(2, G + 1)
        for b in range(n):
            color = list(COLORS)[rng.randint(len(COLORS))]
            w, h = rng.randint(60, 300, 2)
            x = rng.randint(1, int(CONTENT_W) - w - 1)
            y = rng.randint(1, S - h - 1)
            img[y:y + h, x:x + w] = COLORS[color]
            size = "small" if w * h < 160 * 160 else "large"
            words = caption_for(color, size)
            gt_boxes[i, b] = [x + w / 2.0, y + h / 2.0, w, h]
            gt_labels[i, b, :len(words)] = [TOK[w_] for w_ in words]
            gt_valid[i, b] = True
        images[i] = img[:, :, ::-1] - np.array([103.9, 116.8, 123.7])
    return images, gt_boxes, gt_labels, gt_valid


def timeit_step(step, args, iters=24, depth=2, warmup=2):
    for _ in range(warmup):
        float(step(*args))
    futs = []
    t0 = time.perf_counter()
    for _ in range(iters):
        futs.append(step(*args))
        if len(futs) > depth:
            float(futs.pop(0))
    for f in futs:
        float(f)
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    steps = 1500
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    print(f"device: {jax.devices()[0]}")

    # headline inference cfg — IDENTICAL to bench.py
    cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000,
                         roi_align_impl="mxu")
    # train-path fields only (forward_test program unchanged)
    tcfg = cfg.replace(sampler_batch_size=128, max_gt_boxes=G,
                       drop_prob=0.0)

    images, gt_boxes, gt_labels, gt_valid = make_dataset()
    images_d = jax.device_put(jnp.asarray(images))

    import optax
    lr = optax.cosine_decay_schedule(3e-4, steps, alpha=0.02)
    state, tx = ts.init_state(jax.random.PRNGKey(0), tcfg,
                              learning_rate=lr)
    state = state._replace(finetune_cnn=jnp.ones((), bool))

    hs = jnp.full((B_TRAIN,), float(S))
    ws = jnp.full((B_TRAIN,), CONTENT_W)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for it in range(steps):
        sel = np.random.RandomState(it).choice(N_IMAGES, B_TRAIN,
                                               replace=False)
        batch = {
            "image": images_d[sel],
            "height": hs, "width": ws,
            "gt_boxes": jnp.asarray(gt_boxes[sel]),
            "gt_labels": jnp.asarray(gt_labels[sel]),
            "gt_valid": jnp.asarray(gt_valid[sel]),
        }
        rng, sub = jax.random.split(rng)
        state, losses = ts.train_step(state, batch, sub, tcfg, tx)
        if it % 100 == 0 or it == steps - 1:
            print(f"it {it:4d} total {float(losses['total_loss']):8.4f} "
                  f"cap {float(losses['captioning_loss']):7.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    trained = state.params
    if "--save" in sys.argv:
        import json as _json

        from densecap_tpu.utils import checkpoint as ckpt
        out_path = sys.argv[sys.argv.index("--save") + 1]
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        ckpt.save_params(out_path, jax.device_get(trained), extra={
            "meta": _json.dumps({
                "vocab_size": cfg.vocab_size,
                "seq_length": cfg.seq_length,
                "config": cfg.to_json(),
            })})
        print(f"saved trained flagship checkpoint to {out_path}")
    random_p = jax.device_put(densecap.init_params(jax.random.PRNGKey(0),
                                                   cfg))

    # ---- 1. headline program: trained vs random ----------------------
    @jax.jit
    def infer_checksum(params, ims, h, w):
        out = densecap.forward_test_batch(params, ims, h, w, cfg)
        return (jnp.sum(out.boxes) + jnp.sum(out.scores)
                + jnp.sum(out.captions) + jnp.sum(out.num))

    bsel = np.random.RandomState(7).choice(N_IMAGES, B_BENCH)
    bims = images_d[bsel]
    bhs = jnp.full((B_BENCH,), float(S), jnp.float32)
    bws = jnp.full((B_BENCH,), CONTENT_W, jnp.float32)

    res = {}
    for name, p in [("random", random_p), ("trained", trained)]:
        ms = timeit_step(infer_checksum, (p, bims, bhs, bws))
        res[name] = ms
        print(f"headline {name}: {ms:.2f} ms/step "
              f"({B_BENCH / ms * 1e3:.1f} img/s)", flush=True)
    print(f"greedy early-exit benefit on trained weights: "
          f"{res['random'] - res['trained']:+.2f} ms/step "
          f"({res['random'] / res['trained']:.3f}x)")

    # ---- 2. caption length distribution ------------------------------
    @jax.jit
    def decode(params, im, h, w):
        return densecap.forward_test(params, im, h, w, cfg)

    out = decode(trained, bims[0], bhs[0], bws[0])
    caps = np.asarray(out.captions)[np.asarray(out.valid)]
    END = cfg.vocab_size + 1
    lengths = []
    for row in caps:
        ends = np.nonzero(row == END)[0]
        lengths.append(int(ends[0]) if len(ends) else L)
    lengths = np.asarray(lengths)
    print(f"caption lengths (trained, {len(lengths)} boxes): "
          f"mean {lengths.mean():.2f} p50 {np.percentile(lengths, 50):.0f} "
          f"max {lengths.max()}  (T={L})")

    # ---- 3. beam-3 ----------------------------------------------------
    @jax.jit
    def beam_checksum(params, im, h, w):
        out = densecap.forward_test(params, im, h, w, cfg, use_beam=3)
        return jnp.sum(out.captions) + jnp.sum(out.scores)

    for name, p in [("random", random_p), ("trained", trained)]:
        ms = timeit_step(beam_checksum, (p, bims[0], bhs[0], bws[0]),
                         iters=12)
        print(f"beam3 single-image {name}: {ms:.2f} ms/image", flush=True)


if __name__ == "__main__":
    main()
