"""Device-time breakdown of the B=8 flagship inference program.

Each stage is amplified: K reps inside ONE jitted lax.scan program with
a data dependency threaded through a scalar, so per-dispatch transport
latency is amortized to noise and the measured time is device compute.
(Round-2 finding: pipelined wall time == scan-amplified time for the
full program, so these per-stage numbers add up against the real
80.8 ms/step, unlike the round-1 single-image synced profile.)

Run: PYTHONPATH=.:/root/.axon_site python scripts/stage_profile_b8.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap, lstm
from densecap_tpu.models.rpn import apply_rpn
from densecap_tpu.models.vgg16 import apply_recog
from densecap_tpu.ops.boxes import xcycwh_to_x1y1x2y2
from densecap_tpu.ops.nms import nms

B = 8
K = 10  # reps inside one program


def checksum(tree):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def timeit(name, fn, *args, iters=3):
    """fn(*args, salt) -> anything; amplified K times inside one jit."""

    @jax.jit
    def amplified(*a):
        def body(carry, _):
            out = checksum(fn(*a, carry * 1e-9))
            return out, None
        total, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return total

    float(amplified(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        float(amplified(*args))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name:34s} {dt * 1000:8.2f} ms/step ({dt / B * 1000:.2f} ms/img)",
          flush=True)
    return dt


def main():
    cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000,
                         roi_align_impl="mxu")
    S = cfg.image_size
    params = jax.device_put(
        densecap.init_params(jax.random.PRNGKey(0), cfg))
    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, S, S, 3)) * 30.0)
    hs = jnp.full((B,), float(S), jnp.float32)
    ws = jnp.full((B,), S * 0.75, jnp.float32)
    anchors = cfg.anchor_array()

    vb = jax.vmap(lambda im: densecap.features(params, im, cfg))
    feats = jax.device_put(vb(images))
    timeit("trunk (vgg convs) B=8",
           lambda im, s: jax.vmap(
               lambda i: densecap.features(params, i, cfg))(im + s),
           images)

    rpn_fn = jax.vmap(lambda f: apply_rpn(
        params["rpn"], f, anchors, cfg.field_centers,
        compute_dtype=cfg.compute_dtype))
    rpn_out = rpn_fn(feats)
    timeit("rpn heads B=8", lambda f, s: rpn_fn(f + s), feats)

    probs = jax.device_put(
        jax.nn.softmax(rpn_out.scores, axis=-1)[..., 0])
    boxes_xyxy = jax.device_put(
        jax.vmap(xcycwh_to_x1y1x2y2)(rpn_out.boxes))
    N = probs.shape[-1]

    pre = cfg.test_pre_nms_topk
    N_all = probs.shape[-1]

    def preselect(s):
        # the shipping pre-select (localization.py): full sort_key_val +
        # slice — measured faster than lax.top_k (doc/BENCH.md round 4)
        neg, sidx = lax.sort_key_val(
            -s, jnp.arange(N_all, dtype=jnp.int32))
        return -neg[:pre], sidx[:pre]

    timeit(f"top-{pre} pre-select B=8 (sort_key_val)",
           lambda s_, salt: jax.vmap(preselect)(s_ + salt), probs)
    px, idx = jax.vmap(preselect)(probs)
    bx = jax.device_put(jnp.take_along_axis(
        boxes_xyxy, idx[..., None], axis=1))
    px = jax.device_put(px)
    timeit(f"nms {pre}->1000 B=8 (pull, presorted)",
           lambda b, p, s: jax.vmap(
               lambda bb, pp: nms(bb, pp, 0.7, 1000, presorted=True)
           )(b + s, p),
           bx, px)

    from densecap_tpu.models.localization import localize_test
    loc = jax.jit(jax.vmap(
        lambda f, h, w: localize_test(params["rpn"], f, h, w, cfg,
                                      anchors)))(feats, hs, ws)
    boxes1000 = jax.device_put(loc.roi_boxes)

    from densecap_tpu.ops.roi_align import roi_align_mxu
    timeit("roi_align mxu bf16 B=8x1000 (ship)",
           lambda f, b, s: jax.vmap(
               lambda ff, bb, h, w: roi_align_mxu(
                   ff, bb, h, w, 7, 7, compute_dtype=jnp.bfloat16)
           )(f + s, b, hs, ws),
           feats, boxes1000)
    from densecap_tpu.ops.pallas.roi_align_kernel import roi_align_pallas
    timeit("roi_align pallas bf16 B=8x1000",
           lambda f, b, s: jax.vmap(
               lambda ff, bb, h, w: roi_align_pallas(ff, bb, h, w, 7, 7)
           )(f + s, b, hs, ws),
           feats, boxes1000)

    # params are explicit ARGUMENTS here — closing over the 400 MB fc6
    # weight bakes it into the HLO as a literal and the remote compile
    # service rejects the request body (HTTP 413)
    roi_feats = jax.device_put(loc.roi_feats)

    def recog_fn(rp, rf):
        return jax.vmap(lambda r: apply_recog(
            rp, r, train=False, compute_dtype=cfg.compute_dtype))(rf)

    timeit("recog fc B=8x1000x25088x4096",
           lambda rp, rf, s: recog_fn(rp, rf + s),
           params["recog"], roi_feats)

    codes = jax.device_put(recog_fn(params["recog"], roi_feats))
    lmc = densecap.lm_config(cfg)
    flat_codes = codes.reshape(-1, codes.shape[-1])
    # tokens only — the logprob log_softmax is DCE'd exactly as in the
    # shipping program (run_model consumes boxes/scores/captions)
    timeit("lstm greedy decode B=8x1000",
           lambda lp, c, s: lstm.sample_with_logprobs(
               lp, c + s, lmc, compute_dtype=cfg.compute_dtype)[0],
           params["lm"], flat_codes)
    timeit("lstm decode + logprobs (non-ship)",
           lambda lp, c, s: lstm.sample_with_logprobs(
               lp, c + s, lmc, compute_dtype=cfg.compute_dtype),
           params["lm"], flat_codes)

    # Random weights essentially never emit END, so the rows above are
    # the worst case (all T=15 steps execute). Real captions average
    # 5-8 tokens; bias the END logit to reproduce that regime and show the
    # while_loop early exit (models/lstm.py:_greedy_decode).
    END = lmc.vocab_size + 1
    for bias in (0.5, 1.0, 2.0):
        lmb = {**params["lm"],
               "proj": {**params["lm"]["proj"],
                        "b": params["lm"]["proj"]["b"]
                        .at[END - 1].add(bias)}}
        toks = lstm.sample(lmb, flat_codes, lmc,
                           compute_dtype=cfg.compute_dtype)
        first_end = jnp.argmax(toks == END, axis=1)
        mean_len = float(jnp.mean(first_end + 1))
        timeit(f"greedy decode, mean len {mean_len:.1f}",
               lambda lp, c, s: lstm.sample_with_logprobs(
                   lp, c + s, lmc, compute_dtype=cfg.compute_dtype)[0],
               lmb, flat_codes)

    def ship_outputs(p, im, s):
        out = densecap.forward_test_batch(p, im + s, hs, ws, cfg)
        return (out.boxes, out.scores, out.captions, out.num)

    timeit("FULL forward_test_batch B=8", ship_outputs, params, images,
           iters=2)


if __name__ == "__main__":
    main()
