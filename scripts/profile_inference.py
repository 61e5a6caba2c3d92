"""Stage-level timing of the inference pass on the real TPU.

Each stage is jitted to return only a scalar checksum (sum of outputs),
so the tunnel moves nothing but the scalar — timings are device compute
plus fixed dispatch latency. Inputs are device-resident before timing.
Run: PYTHONPATH=. python scripts/profile_inference.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap, lstm
from densecap_tpu.models.localization import localize_test
from densecap_tpu.models.vgg16 import apply_recog
from densecap_tpu.ops.boxes import xcycwh_to_x1y1x2y2
from densecap_tpu.ops.nms import nms


def checksum(tree):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def timeit(name, fn, *args, iters=10):
    f = jax.jit(lambda *a: checksum(fn(*a)))
    v = float(f(*args))  # compile + run
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(f(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt * 1000:8.2f} ms")
    return dt


def main():
    cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000)
    S = cfg.image_size
    params = jax.device_put(densecap.init_params(jax.random.PRNGKey(0), cfg))
    image = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (S, S, 3)) * 30
    )
    h = jnp.float32(S)
    w = jnp.float32(S * 0.75)
    anchors = cfg.anchor_array()

    # dispatch floor: how long does a do-nothing jit take?
    timeit("dispatch floor (tiny op)", lambda x: x * 2.0 + 1.0,
           jnp.ones((8, 128)))

    feats = jax.device_put(densecap.features(params, image, cfg))
    timeit("trunk (vgg convs)", lambda p, im: densecap.features(p, im, cfg),
           params, image)

    from densecap_tpu.models.rpn import apply_rpn

    rpn_out = apply_rpn(params["rpn"], feats, anchors, cfg.field_centers,
                        compute_dtype=cfg.compute_dtype)
    timeit("rpn heads", lambda p, f: apply_rpn(
        p, f, anchors, cfg.field_centers, compute_dtype=cfg.compute_dtype),
        params["rpn"], feats)

    probs = jax.device_put(jax.nn.softmax(rpn_out.scores, axis=-1)[:, 0])
    boxes_xyxy = jax.device_put(xcycwh_to_x1y1x2y2(rpn_out.boxes))
    timeit("nms 24k->1000", lambda b, s: nms(b, s, 0.7, 1000),
           boxes_xyxy, probs)
    timeit("nms 24k->1000 tile256",
           lambda b, s: nms(b, s, 0.7, 1000, tile_size=256),
           boxes_xyxy, probs)
    timeit("argsort 24k", lambda s: jnp.argsort(-s), probs)

    loc = localize_test(params["rpn"], feats, h, w, cfg, anchors)
    boxes1000 = jax.device_put(loc.roi_boxes)
    roi_feats = jax.device_put(loc.roi_feats)

    from densecap_tpu.ops.roi_align import roi_align, roi_align_mxu

    timeit("roi_align gather x1000",
           lambda f, b: roi_align(f, b, h, w, 7, 7), feats, boxes1000)
    timeit("roi_align mxu bf16 x1000",
           lambda f, b: roi_align_mxu(f, b, h, w, 7, 7,
                                      compute_dtype=jnp.bfloat16),
           feats, boxes1000)
    try:
        from densecap_tpu.ops.pallas.roi_align_kernel import \
            roi_align_pallas

        timeit("roi_align pallas x1000",
               lambda f, b: roi_align_pallas(f, b, h, w, 7, 7),
               feats, boxes1000)
    except Exception as e:
        print(f"roi_align pallas FAILED: {type(e).__name__}"[:120])

    codes = jax.device_put(apply_recog(
        params["recog"], roi_feats, train=False,
        compute_dtype=cfg.compute_dtype))
    timeit("recog fc 1000x25088x4096",
           lambda p, rf: apply_recog(p, rf, train=False,
                                     compute_dtype=cfg.compute_dtype),
           params["recog"], roi_feats)

    lmc = densecap.lm_config(cfg)
    timeit("lstm greedy decode x1000",
           lambda p, c: lstm.sample_with_logprobs(
               p, c, lmc, compute_dtype=cfg.compute_dtype),
           params["lm"], codes)

    timeit("FULL forward_test",
           lambda p, im: densecap.forward_test(p, im, h, w, cfg),
           params, image)

    # train step cost for reference
    G, L = cfg.max_gt_boxes, cfg.seq_length
    gt_boxes = jnp.tile(jnp.array([[100.0, 100.0, 50.0, 60.0]]), (G, 1))
    gt_labels = jnp.ones((G, L), jnp.int32)
    gt_valid = jnp.arange(G) < 20
    timeit("forward_train (1 image)",
           lambda p, im: densecap.forward_train(
               p, im, h, w, gt_boxes, gt_labels, gt_valid,
               jax.random.PRNGKey(0), cfg)["total_loss"],
           params, image, iters=5)

    def train_grad(p, im):
        return jax.grad(
            lambda pp: densecap.forward_train(
                pp, im, h, w, gt_boxes, gt_labels, gt_valid,
                jax.random.PRNGKey(0), cfg)["total_loss"]
        )(p)

    timeit("grad(forward_train) 1 image", train_grad, params, image,
           iters=5)


if __name__ == "__main__":
    main()
