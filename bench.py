"""Benchmark: DenseCap inference throughput at 1000 proposals/image.

Runs the flagship single-image inference pass (VGG-16 trunk -> RPN over
~24k anchors -> masked NMS to 1000 RoIs -> RoI align -> 4096-d recog ->
greedy LSTM decode) end-to-end on the attached TPU chip, bf16 compute.

Baseline: the reference's best published single-GPU figure is 10 FPS —
and that is at only 50 proposals and 480px input (README.md:168,
webcam/single_machine_demo.lua:25-26); our number is at the full
1000-proposal, 720px evaluation setting.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from densecap_tpu.config import DenseCapConfig
    from densecap_tpu.models import densecap

    cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000)
    S = cfg.image_size

    key = jax.random.PRNGKey(0)
    params = densecap.init_params(key, cfg)
    params = jax.device_put(params)

    @jax.jit
    def infer(params, image, h, w):
        return densecap.forward_test(params, image, h, w, cfg)

    image = jax.random.normal(jax.random.PRNGKey(1), (S, S, 3),
                              jnp.float32) * 30.0
    h = jnp.float32(S)
    w = jnp.float32(S * 0.75)

    # warmup / compile
    out = infer(params, image, h, w)
    jax.block_until_ready(out)

    # NOTE: block every iteration — under the axon transport, blocking
    # only on the last future under-reports wall time wildly.
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(params, image, h, w)
        jax.block_until_ready(out)
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
