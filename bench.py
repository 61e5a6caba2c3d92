"""Benchmark: DenseCap inference throughput at 1000 proposals/image.

Runs the flagship inference pass (VGG-16 trunk -> RPN -> pre-top-k +
masked NMS to 1000 RoIs -> MXU-einsum RoI align -> 4096-d recognition
-> greedy LSTM decode) end-to-end on the attached TPU chip, bf16
compute, 8 images per compiled step with steps pipelined in flight.
Each sync is a scalar checksum fetch (block_until_ready does not
reliably wait on this transport).

Workload: 4:3 images resized so the long edge is 720 (the reference's
eval setting, run_model.lua:64-87 — it processes each 720x540 image at
its true extent with dynamic shapes). We run them on the 720x544
inference canvas bucket (run_model --canvas_buckets), which produces
EXACTLY the square-canvas outputs (tests/test_canvas_parity.py) at the
reference's FLOP profile; the square 720x720 canvas measures ~13%
slower (doc/BENCH.md).

Baseline: the reference's best published single-GPU figure is 10 FPS —
at only 50 proposals and 480px input (README.md:168,
webcam/single_machine_demo.lua:25-26); our number is at the full
1000-proposal, 720px evaluation setting.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from densecap_tpu.config import DenseCapConfig
    from densecap_tpu.models import densecap

    cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000,
                         roi_align_impl="mxu")
    S = cfg.image_size
    W = 544   # 720x544 canvas bucket: fits the 720x540 4:3 content,
    B = 8     # /16-aligned (run_model --canvas_buckets 720x544)

    params = jax.device_put(
        densecap.init_params(jax.random.PRNGKey(0), cfg)
    )

    @jax.jit
    def infer_checksum(params, images, hs, ws):
        out = densecap.forward_test_batch(params, images, hs, ws, cfg)
        return (jnp.sum(out.boxes) + jnp.sum(out.scores)
                + jnp.sum(out.captions) + jnp.sum(out.num))

    batches = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (2, B, S, W, 3),
                          jnp.float32) * 30.0
    )
    hs = jnp.full((B,), float(S), jnp.float32)
    ws = jnp.full((B,), S * 0.75, jnp.float32)  # true content: 720x540

    # warmup / compile; the remote compile service has been seen to 500
    # on very large cold programs — fall back to single-image mode
    try:
        float(infer_checksum(params, batches[0], hs, ws))
        float(infer_checksum(params, batches[1], hs, ws))  # steady-state
    except Exception as e:
        print(f"# batched compile failed ({type(e).__name__}); "
              "falling back to single-image", flush=True)
        B = 1

        @jax.jit
        def infer_checksum(params, image, h, w):  # noqa: F811
            out = densecap.forward_test(params, image, h, w, cfg)
            return (jnp.sum(out.boxes) + jnp.sum(out.scores)
                    + jnp.sum(out.captions) + jnp.sum(out.num))

        batches = batches[:, 0]  # (2, S, S, 3)
        hs, ws = hs[0], ws[0]
        float(infer_checksum(params, batches[0], hs, ws))

    iters = 24  # longer window: the 1-core host + tunnel add jitter
    depth = 2
    futures = []
    t0 = time.perf_counter()
    for i in range(iters):
        futures.append(infer_checksum(params, batches[i % 2], hs, ws))
        if len(futures) > depth:
            float(futures.pop(0))
    for f in futures:
        float(f)
    dt = time.perf_counter() - t0

    images_per_sec = iters * B / dt
    baseline_fps = 10.0  # reference single-machine demo (50 proposals!)
    # NOTE: random weights are the decode's WORST case (captions never
    # END, the early-exit while_loop runs all 15 steps). The same
    # program on a converged model measures ~13% faster — 141.3 img/s,
    # scripts/trained_weights_bench.py, doc/BENCH.md trained-weights
    # table.
    print(json.dumps({
        "metric": "inference_images_per_sec_1000_proposals",
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
