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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image_size", type=int, default=720)
    ap.add_argument("--proposals", type=int, default=1000)
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

    # ---- LM-only: trained RoI codes from a real forward pass ----------
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(args.image_size, args.image_size, 3)
                      .astype(np.float32) * 40 + 20)
    _, feats, _ = jax.jit(lambda p, im: densecap.extract_features(
        p, im, args.image_size, args.image_size, cfg,
        max_boxes=args.proposals))(params, img)

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
                                       beam_size=BEAM, early_exit=False))
    seq_e = np.asarray(lstm.beamsearch(params["lm"], feats, lmc,
                                       beam_size=BEAM, early_exit=True))
    np.testing.assert_array_equal(seq_f, seq_e)
    END = cfg.vocab_size + 1
    lens = (seq_e != END).sum(axis=1)
    print(f"token-EQUAL; mean caption length {lens.mean():.1f} / "
          f"{cfg.seq_length}; LM-only speedup "
          f"{variants[False] / variants[True]:.2f}x")

    # ---- full program -------------------------------------------------
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
            f = jax.jit(lambda p, im: densecap.forward_test(
                p, im, args.image_size, args.image_size, cfg,
                use_beam=BEAM))

            def run(salt):
                out = f(params, img + salt)
                return (jnp.sum(out.boxes.astype(jnp.float32))
                        + jnp.sum(out.captions) + out.num)

            g = jax.jit(lambda salt: run(salt))
            t0 = time.perf_counter()
            float(g(jnp.float32(0.0)))
            print(f"full early_exit={early}: compile+run "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            dt = steady(lambda s: g(s), lambda i: jnp.float32(i * 1e-4))
            print(f"FULL beam-3 early_exit={early}: {1e3 * dt:.2f} "
                  f"ms/image steady", flush=True)
        finally:
            lstm_mod.beamsearch = orig


if __name__ == "__main__":
    main()
