"""Serving-mode A/B: full-program throughput for each serving knob.

Produces the doc/BENCH.md serving-modes table (VERDICT r3 Weak #4):
the measured cost/quality levers built over rounds 2-4, in one place.

Rows measured here (flagship B=8 720x544 unless noted):
  * default — pre_nms_topk 6000 (survivor-IDENTICAL to exact),
    greedy early-exit decode, MXU RoI align, bf16 trunk.
  * --pre_nms_topk 2000 — mAP 0.7806 vs 0.7805 on the measured
    trained workload (doc/BENCH.md pre-NMS table).
  * webcam mode — 480px canvas, 50 proposals (the reference demo's
    exact serving setting, single_machine_demo.lua/daemon.lua): both
    micro-batched throughput and single-image latency.

Quality columns come from the measured sweeps already recorded in
doc/BENCH.md (pre-NMS table, NMS early-exit A/B, int8 section).

Run: PYTHONPATH=.:/root/.axon_site python scripts/serving_modes_bench.py
"""

import os
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


def pipeline_ms(step, args, iters=24, depth=2, warmup=2):
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
    return (time.perf_counter() - t0) / iters * 1e3


def bench_cfg(tag, cfg, B, S, W, content_w):
    params = jax.device_put(densecap.init_params(jax.random.PRNGKey(0),
                                                 cfg))
    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, S, W, 3),
                          jnp.float32) * 30.0)
    hs = jnp.full((B,), float(S), jnp.float32)
    ws = jnp.full((B,), content_w, jnp.float32)

    @jax.jit
    def step(p, ims, h, w):
        out = densecap.forward_test_batch(p, ims, h, w, cfg)
        return (jnp.sum(out.boxes) + jnp.sum(out.scores)
                + jnp.sum(out.captions) + jnp.sum(out.num))

    ms = pipeline_ms(step, (params, images, hs, ws))
    print(f"{tag}: {ms:.2f} ms/step  {B / ms * 1e3:.1f} img/s",
          flush=True)
    return ms


def main():
    print(f"device: {jax.devices()[0]}", flush=True)

    # flagship eval setting
    for topk in (6000, 2000):
        cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000,
                             roi_align_impl="mxu",
                             test_pre_nms_topk=topk)
        bench_cfg(f"flagship topk={topk}", cfg, B=8, S=720, W=544,
                  content_w=540.0)

    # webcam mode: the reference demo's exact serving setting
    # (480px, 50 proposals — reference measures 10 FPS here)
    wcfg = DenseCapConfig(vocab_size=10000, test_max_proposals=50,
                          image_size=480, roi_align_impl="mxu")
    bench_cfg("webcam 480px/50props B=8", wcfg, B=8, S=480, W=480,
              content_w=480.0)

    # webcam single-image latency (synced per call — serving latency)
    params = jax.device_put(densecap.init_params(jax.random.PRNGKey(0),
                                                 wcfg))
    im = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(2), (480, 480, 3), jnp.float32) * 30.0)

    @jax.jit
    def one(p, im):
        out = densecap.forward_test(p, im, jnp.float32(480.0),
                                    jnp.float32(480.0), wcfg)
        return jnp.sum(out.boxes) + jnp.sum(out.scores)

    float(one(params, im)); float(one(params, im))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        float(one(params, im))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts = np.asarray(ts)
    print(f"webcam single-image synced: p50 {np.percentile(ts, 50):.1f} "
          f"ms  p90 {np.percentile(ts, 90):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
