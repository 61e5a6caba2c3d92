"""Benchmark: DenseCap inference throughput at 1000 proposals/image.

Runs the flagship inference pass (VGG-16 trunk -> RPN over ~24k anchors
-> masked NMS to 1000 RoIs -> RoI align -> 4096-d recognition -> greedy
LSTM decode) end-to-end on the attached TPU chip, bf16 compute. Each
iteration fetches a scalar checksum — a hard sync (block_until_ready
does not reliably wait on this transport). Measured per-image time
includes the transport's ~30 ms dispatch floor; on-device compute is
~16 ms/image (scripts/profile_inference.py separates the two).

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
                     use_pallas_roi_align=True)
    S = cfg.image_size

    params = jax.device_put(
        densecap.init_params(jax.random.PRNGKey(0), cfg)
    )

    @jax.jit
    def infer_checksum(params, image, h, w):
        out = densecap.forward_test(params, image, h, w, cfg)
        return (jnp.sum(out.boxes) + jnp.sum(out.scores)
                + jnp.sum(out.captions) + jnp.sum(out.num))

    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (4, S, S, 3),
                          jnp.float32) * 30.0
    )
    h = jnp.float32(S)
    w = jnp.float32(S * 0.75)

    # warmup / compile
    float(infer_checksum(params, images[0], h, w))

    iters = 24
    depth = 2
    futures = []
    t0 = time.perf_counter()
    for i in range(iters):
        futures.append(infer_checksum(params, images[i % 4], h, w))
        if len(futures) > depth:
            float(futures.pop(0))
    for f in futures:
        float(f)
    dt = time.perf_counter() - t0

    images_per_sec = iters / dt
    baseline_fps = 10.0  # reference single-machine demo (50 proposals!)
    print(json.dumps({
        "metric": "inference_images_per_sec_1000_proposals",
        "value": round(images_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
