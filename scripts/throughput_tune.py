"""Throughput tuning on the real chip: batch size x pipeline depth for
inference, and train-step batch scaling with the static trunk freeze.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/throughput_tune.py
"""

import os
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap
from densecap_tpu.parallel import train_step as ts


def main():
    cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000,
                         use_pallas_roi_align=True)
    S = cfg.image_size
    params = jax.device_put(
        densecap.init_params(jax.random.PRNGKey(0), cfg))

    for B in (8, 12, 16):
        @jax.jit
        def infer_checksum(params, images, hs, ws):
            out = densecap.forward_test_batch(params, images, hs, ws, cfg)
            return (jnp.sum(out.boxes) + jnp.sum(out.scores)
                    + jnp.sum(out.captions) + jnp.sum(out.num))

        batches = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (2, B, S, S, 3),
                              jnp.float32) * 30.0)
        hs = jnp.full((B,), float(S), jnp.float32)
        ws = jnp.full((B,), S * 0.75, jnp.float32)
        try:
            float(infer_checksum(params, batches[0], hs, ws))
        except Exception as e:
            print(f"B={B}: COMPILE/RUN FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}")
            traceback.print_exc(limit=2)
            continue
        for depth in (2, 4):
            iters = 12
            futures = []
            t0 = time.perf_counter()
            for i in range(iters):
                futures.append(
                    infer_checksum(params, batches[i % 2], hs, ws))
                if len(futures) > depth:
                    float(futures.pop(0))
            for f in futures:
                float(f)
            dt = time.perf_counter() - t0
            print(f"inference B={B} depth={depth}: "
                  f"{iters * B / dt:7.1f} img/s", flush=True)

    # ---- train-step batch scaling with the static freeze
    for B in (8, 16):
        tcfg = cfg.replace(use_pallas_roi_align=False,
                           static_freeze_cnn=True)
        G, L = tcfg.max_gt_boxes, tcfg.seq_length
        batch = jax.device_put({
            "image": jax.random.normal(jax.random.PRNGKey(2),
                                       (B, S, S, 3)) * 30.0,
            "height": jnp.full((B,), float(S)),
            "width": jnp.full((B,), S * 0.75),
            "gt_boxes": jnp.tile(
                jnp.array([[[100.0, 100.0, 50.0, 60.0]]]), (B, G, 1)),
            "gt_labels": jnp.ones((B, G, L), jnp.int32),
            "gt_valid": jnp.tile(jnp.arange(G) < 20, (B, 1)),
        })
        rng = jax.random.PRNGKey(3)
        state, tx = ts.init_state(jax.random.PRNGKey(0), tcfg)
        try:
            state, losses = ts.train_step(state, batch, rng, tcfg, tx)
            float(losses["total_loss"])
        except Exception as e:
            print(f"train B={B}: FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            state, losses = ts.train_step(state, batch, rng, tcfg, tx)
        float(losses["total_loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"train(static-frozen) B={B}: {dt*1e3:7.1f} ms/step  "
              f"{B/dt:6.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
