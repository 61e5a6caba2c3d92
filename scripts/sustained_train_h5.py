"""Sustained training fed by the SHIPPING h5 pipeline (VERDICT r4 #1).

Every prior training-throughput number cycled synthetic in-RAM,
device-resident scenes (scripts/sustained_train.py); the reference's
train loop is h5-fed every step (train.lua:71-75, DataLoader.lua:
144-217). This harness drives the real path —
DenseCapLoader -> BucketedLoader -> PrefetchingLoader -> device —
on a preprocess-CLI-produced h5 (scripts/make_synth_vg.py) and compares
three feeds at the identical flagship config:

  in_ram   - device-resident batch pool (the prior methodology);
  shipping - the real h5 path, f32 mean-subtracted on host;
  loader   - no training: drain the prefetching loader, measuring the
             host pipeline's standalone capacity.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python scripts/sustained_train_h5.py --h5 /tmp/synthvg/VG-regions.h5 \
       --json /tmp/synthvg/VG-regions-dicts.json --mode shipping
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.data.loader import (BucketedLoader, DenseCapLoader,
                                      PrefetchingLoader)
from densecap_tpu.parallel import train_step as ts

BATCH_KEYS = ("image", "height", "width", "gt_boxes", "gt_labels",
              "gt_valid", "weight")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5", default="/tmp/synthvg/VG-regions.h5")
    ap.add_argument("--json", default="/tmp/synthvg/VG-regions-dicts.json")
    ap.add_argument("--mode", default="shipping",
                    choices=["shipping", "in_ram", "loader"])
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--warmup", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--buckets", default="544x720,720x544")
    ap.add_argument("--max_gt_boxes", type=int, default=128)
    ap.add_argument("--vocab_size", type=int, default=10000,
                    help="flagship LM width (labels use only the synth "
                         "vocab's low ids; geometry is what's measured)")
    ap.add_argument("--pool_batches", type=int, default=36,
                    help="in_ram mode: device-resident pool size")
    ap.add_argument("--raw", action="store_true",
                    help="raw-uint8 feed: loader returns h5 uint8, the "
                         "train step normalizes on device")
    args = ap.parse_args()

    loader = DenseCapLoader(args.h5, args.json,
                            max_gt_boxes=args.max_gt_boxes,
                            raw_images=args.raw)
    buckets = [tuple(int(v) for v in b.split("x"))
               for b in args.buckets.split(",") if b]
    bl = BucketedLoader(loader, buckets, args.batch, split=0)
    cfg = DenseCapConfig(
        vocab_size=max(args.vocab_size, loader.vocab_size()),
        seq_length=loader.seq_length(),
        image_size=loader.canvas,
        sampler_batch_size=256,
        max_gt_boxes=args.max_gt_boxes,
        static_freeze_cnn=True,
        roi_align_impl="mxu",
    )
    print(f"cfg: canvas {loader.canvas}, seq {cfg.seq_length}, "
          f"vocab {cfg.vocab_size}, G {cfg.max_gt_boxes}, B {args.batch}, "
          f"buckets {bl.buckets}")

    if args.mode == "loader":
        pf = PrefetchingLoader(source=bl.next_batch, depth=4)
        try:
            for _ in range(args.warmup):
                pf.next()
            t0 = time.perf_counter()
            n = 0
            for _ in range(args.steps):
                _, batch = pf.next()
                n += int((batch["weight"] > 0).sum())
            dt = time.perf_counter() - t0
        finally:
            pf.close()
        print(f"LOADER-ONLY ({'raw-uint8' if args.raw else 'f32'}): "
              f"{n / dt:.1f} img/s over {args.steps} batches "
              f"({dt:.1f}s) — host pipeline standalone capacity")
        return

    lr = optax.cosine_decay_schedule(3e-4, args.steps + args.warmup,
                                     alpha=0.05)
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg,
                              learning_rate=lr)
    rng = jax.random.PRNGKey(1)

    def to_device(bucket_batch):
        # async device_put: the transfer proceeds while the previous
        # step computes (the feed below keeps one batch in flight)
        bucket, batch = bucket_batch
        return bucket, {k: jax.device_put(batch[k]) for k in BATCH_KEYS}

    if args.mode == "in_ram":
        # device-resident pool built by the SAME bucketed loader, then
        # cycled — the prior methodology (sustained_train.py) on this
        # dataset's exact geometry distribution
        pool = [jax.device_put(to_device(bl.next_batch())[1])
                for _ in range(args.pool_batches)]
        def feed(i):
            return None, pool[i % len(pool)]
        get_feed = feed
        pf = None
    else:
        pf = PrefetchingLoader(source=bl.next_batch, depth=4)
        pending = [to_device(pf.next())]

        def feed(i):
            # one-batch device-side lookahead: batch i+1's host->device
            # transfer overlaps batch i's step
            out = pending.pop(0)
            pending.append(to_device(pf.next()))
            return out
        get_feed = feed

    try:
        # warmup compiles every bucket program outside the timed window
        for i in range(args.warmup):
            rng, sub = jax.random.split(rng)
            _, batch = get_feed(i)
            state, losses = ts.train_step(state, batch, sub, cfg, tx)
        jax.block_until_ready(losses["total_loss"])
        first = float(losses["total_loss"])

        t0 = time.perf_counter()
        n_imgs = 0
        for i in range(args.steps):
            rng, sub = jax.random.split(rng)
            _, batch = get_feed(args.warmup + i)
            n_imgs += args.batch
            state, losses = ts.train_step(state, batch, sub, cfg, tx)
            if (i + 1) % 250 == 0:
                print(f"  step {i + 1:5d} loss "
                      f"{float(losses['total_loss']):8.4f} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
        jax.block_until_ready(losses["total_loss"])
        dt = time.perf_counter() - t0
    finally:
        if pf is not None:
            pf.close()

    print(f"SUSTAINED ({args.mode}, B={args.batch}, "
          f"G={args.max_gt_boxes}, buckets {args.buckets}): "
          f"{n_imgs / dt:.1f} img/s over {args.steps} steps incl host; "
          f"loss {first:.2f} -> {float(losses['total_loss']):.2f}")


if __name__ == "__main__":
    main()
