"""Beam-search early-exit A/B on a trained checkpoint (VERDICT r4 #4).

Beam-3 is the most decode-dominated serving mode; until round 5 its
step loop was a fixed lax.scan over T-1 steps while trained captions
average ~6 of 15 tokens. Measures, on trained weights:

  1. LM-only: beamsearch(early_exit=True) vs (False) at the flagship
     decode shape (P RoIs x beam 3), token-equality asserted;
  2. full program: forward_test (720px, 1000 proposals, beam 3) with
     each variant, pipelined steady wall time.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/beam_early_exit_bench.py --checkpoint /tmp/soak/densecap.npz
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap, lstm
from densecap_tpu.utils import checkpoint as ckpt

BEAM = 3
ITERS = 20


def steady(fn, args_fn, iters=ITERS):
    cs = [fn(args_fn(i)) for i in range(2)]
    t0 = time.perf_counter()
    for i in range(iters):
        cs.append(fn(args_fn(i + 2)))
        float(cs.pop(0))
    for x in cs:
        float(x)
    return (time.perf_counter() - t0) / iters


def make_scene(rng, H, W):
    """In-distribution image for the trained flagship checkpoint
    (colored boxes on gray, as scripts/trained_weights_bench.py trains
    on). On OUT-of-distribution input (pure noise) a few RoIs never
    emit END, the while_loop runs all T steps, and the early exit can
    only show its ~6% overhead — pass --noise_image to measure that
    worst case."""
    img = rng.uniform(90, 130, (H, W, 3)).astype(np.float32)
    colors = [(200, 40, 40), (40, 180, 40), (40, 60, 200),
              (220, 210, 40)]
    for _ in range(4):
        w, h = rng.randint(60, 300, 2)
        x = rng.randint(1, W - w - 1)
        y = rng.randint(1, H - h - 1)
        img[y:y + h, x:x + w] = colors[rng.randint(len(colors))]
    return jnp.asarray(img[:, :, ::-1] - np.array([103.9, 116.8, 123.7],
                                                  np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image_size", type=int, default=720)
    ap.add_argument("--proposals", type=int, default=1000)
    ap.add_argument("--part", default="all", choices=["all", "lm", "full"],
                    help="run only the LM-only or only the full-program "
                         "A/B (the full 720px beam graph is a long "
                         "compile; split parts across runs to stay "
                         "inside a wall-clock budget)")
    ap.add_argument("--noise_image", action="store_true",
                    help="use an out-of-distribution noise image "
                         "(worst case for the early exit)")
    args = ap.parse_args()

    params, extra = ckpt.load_params(args.checkpoint)
    meta = json.loads(str(extra["meta"])) if "meta" in extra else {}
    cfg = DenseCapConfig.from_json(meta["config"]) if "config" in meta \
        else DenseCapConfig(vocab_size=int(meta.get("vocab_size", 10000)),
                            seq_length=int(meta.get("seq_length", 15)))
    cfg = cfg.replace(image_size=args.image_size,
                      test_max_proposals=args.proposals,
                      roi_align_impl="mxu")
    lmc = lstm.LMConfig(cfg.vocab_size, cfg.seq_length,
                        cfg.rnn_encoding_size, cfg.rnn_size, cfg.fc_dim)
    params = jax.device_put(params)

    # ---- trained RoI codes from a real forward pass -------------------
    rng = np.random.RandomState(0)
    if args.noise_image:
        img = jnp.asarray(rng.randn(args.image_size, args.image_size, 3)
                          .astype(np.float32) * 40 + 20)
    else:
        img = make_scene(rng, args.image_size, args.image_size)
    _, feats, _ = jax.jit(lambda p, im: densecap.extract_features(
        p, im, args.image_size, args.image_size, cfg,
        max_boxes=args.proposals))(params, img)

    seq_e = np.asarray(lstm.beamsearch(params["lm"], feats, lmc,
                                       beam_size=BEAM, early_exit=True))
    END = cfg.vocab_size + 1
    lens = []
    for row in seq_e:
        ends = np.nonzero(row == END)[0]
        lens.append(int(ends[0]) if len(ends) else cfg.seq_length)
    lens = np.asarray(lens)
    print(f"caption lengths over {len(lens)} RoIs: mean {lens.mean():.1f} "
          f"max {lens.max()} / T={cfg.seq_length} "
          f"(the while_loop exits after max+1 steps)", flush=True)

    if args.part in ("all", "lm"):
        variants = {}
        for early in (False, True):
            f = jax.jit(lambda p, v, early=early: jnp.sum(
                lstm.beamsearch(p, v, lmc, beam_size=BEAM,
                                early_exit=early)))
            t0 = time.perf_counter()
            float(f(params["lm"], feats))
            print(f"LM-only early_exit={early}: compile+run "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            dt = steady(lambda a: f(params["lm"], feats + a[1] * 0),
                        lambda i: (0, i))
            variants[early] = dt
            print(f"LM-only early_exit={early}: {1e3 * dt:.2f} ms steady")
        seq_f = np.asarray(lstm.beamsearch(params["lm"], feats, lmc,
                                           beam_size=BEAM,
                                           early_exit=False))
        np.testing.assert_array_equal(seq_f, seq_e)
        print(f"token-EQUAL; LM-only speedup "
              f"{variants[False] / variants[True]:.2f}x")

    # ---- full program -------------------------------------------------
    if args.part not in ("all", "full"):
        return
    for early in (False, True):
        import densecap_tpu.models.lstm as lstm_mod
        orig = lstm_mod.beamsearch
        if not early:
            def fixed(p, v, c, beam_size=20, compute_dtype=jnp.float32,
                      return_logprobs=False, early_exit=True):
                return orig(p, v, c, beam_size, compute_dtype,
                            return_logprobs, early_exit=False)
            lstm_mod.beamsearch = fixed
        try:
            # params/img must be jit ARGUMENTS: closed-over arrays are
            # embedded in the HLO shipped to the remote compiler and
            # the ~600 MB of params overflow its request limit (413)
            @jax.jit
            def g(p, im, salt):
                out = densecap.forward_test(
                    p, im + salt, args.image_size, args.image_size, cfg,
                    use_beam=BEAM)
                return (jnp.sum(out.boxes.astype(jnp.float32))
                        + jnp.sum(out.captions) + out.num)

            t0 = time.perf_counter()
            float(g(params, img, jnp.float32(0.0)))
            print(f"full early_exit={early}: compile+run "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            dt = steady(lambda s: g(params, img, s),
                        lambda i: jnp.float32(i * 1e-4))
            print(f"FULL beam-3 early_exit={early}: {1e3 * dt:.2f} "
                  f"ms/image steady", flush=True)
        finally:
            lstm_mod.beamsearch = orig


if __name__ == "__main__":
    main()
