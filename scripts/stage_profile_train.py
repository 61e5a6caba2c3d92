"""Device-time breakdown of the B=8 frozen-trunk TRAIN step.

The inference program got a full stage profile in round 2
(scripts/stage_profile_b8.py); the train step — the LOWEST-MFU shipping
program (32.6% frozen vs 43% finetune-on, doc/BENCH.md MFU table) —
never did. This itemizes it with the same method: each stage amplified
K reps inside ONE jitted lax.scan with a data dependency threaded
through a scalar, so per-dispatch transport latency amortizes to noise.

Config matches the MFU-table frozen row: B=8, 720px square canvas
(content 720x540), vocab 10000, seq 15, sampler 256, G=128 gt slots,
MXU RoI align, static_freeze_cnn=True.

Run: PYTHONPATH=.:/root/.axon_site python scripts/stage_profile_train.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap, lstm
from densecap_tpu.models.localization import localize_train
from densecap_tpu.models.rpn import apply_rpn
from densecap_tpu.models.vgg16 import apply_recog
from densecap_tpu.ops.roi_align import roi_align_mxu
from densecap_tpu.parallel import train_step as ts

B = 8
K = 10


def checksum(tree):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def timeit(name, fn, *args, iters=3, reps=K):
    @jax.jit
    def amplified(*a):
        def body(carry, _):
            out = checksum(fn(*a, carry * 1e-9))
            return out, None
        total, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return total

    float(amplified(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        float(amplified(*args))
    dt = (time.perf_counter() - t0) / (iters * reps)
    print(f"{name:44s} {dt * 1000:8.2f} ms/step", flush=True)
    return dt


def main():
    cfg = DenseCapConfig(vocab_size=10000, roi_align_impl="mxu",
                         static_freeze_cnn=True)
    S, G, L = cfg.image_size, cfg.max_gt_boxes, cfg.seq_length
    params = jax.device_put(
        densecap.init_params(jax.random.PRNGKey(0), cfg))
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
    anchors = cfg.anchor_array()

    # ---- full loss fwd and fwd+bwd --------------------------------------
    def loss_fwd(p, b, salt):
        b = dict(b, image=b["image"] + salt)
        return ts.batched_loss(p, b, rng, cfg)["total_loss"]

    timeit("loss forward only", loss_fwd, params, batch)

    def loss_grad(p, b, salt):
        b = dict(b, image=b["image"] + salt)
        return jax.grad(
            lambda pp: ts.batched_loss(pp, b, rng, cfg)["total_loss"])(p)

    timeit("loss fwd+bwd (grads)", loss_grad, params, batch, iters=2)

    # ---- optimizer: wd-adjust + multi_transform adam + apply ------------
    _, tx = ts.init_state(jax.random.PRNGKey(0), cfg)
    state0, _ = ts.init_state(jax.random.PRNGKey(0), cfg)
    grads = jax.jit(
        lambda p, b: jax.grad(
            lambda pp: ts.batched_loss(pp, b, rng, cfg)["total_loss"])(p)
    )(params, batch)
    grads = jax.device_put(grads)
    opt_state = jax.device_put(state0.opt_state)

    def opt_stage(p, g, os_, salt):
        g = dict(g, objectness={"w": g["objectness"]["w"],
                                "b": g["objectness"]["b"] + salt})
        zones = ts.param_zones(p)

        def adjust(zl, gz, pz):
            if zl == "frozen":
                return jax.tree_util.tree_map(jnp.zeros_like, gz)
            return jax.tree_util.tree_map(
                lambda gi, pi: gi + cfg.weight_decay * pi, gz, pz)

        g = {k: adjust(zones[k], g[k], p[k]) for k in g}
        updates, new_os = tx.update(g, os_, p)
        import optax
        return optax.apply_updates(p, updates), new_os

    timeit("optimizer (wd + adam + apply, no donate)",
           opt_stage, params, grads, opt_state)

    # ---- trunk forward (frozen: stop_gradient, fwd only) ----------------
    hs, ws = batch["height"], batch["width"]

    def trunk_fwd(p, im, h, w, salt):
        return jax.vmap(lambda i, hh, ww: densecap.features(
            p, i + salt, cfg, hh, ww))(im, h, w)

    timeit("trunk fwd B=8 (frozen)", trunk_fwd, params, batch["image"],
           hs, ws)

    feats = jax.device_put(jax.jit(trunk_fwd)(
        params, batch["image"], hs, ws, 0.0))

    # ---- rpn heads fwd and fwd+bwd --------------------------------------
    def rpn_fwd(rp, f, salt):
        return jax.vmap(lambda ff: apply_rpn(
            rp, ff + salt, anchors, cfg.field_centers,
            box_reg_decay=cfg.box_reg_decay,
            compute_dtype=cfg.compute_dtype))(f)

    timeit("rpn heads fwd B=8", rpn_fwd, params["rpn"], feats)

    def rpn_grad(rp, f, salt):
        return jax.grad(lambda rpp: checksum(rpn_fwd(rpp, f, salt)))(rp)

    timeit("rpn heads fwd+bwd B=8", rpn_grad, params["rpn"], feats)

    # ---- localization train fwd (rpn + sampler + roi + mid losses) ------
    rngs = jax.device_put(jax.random.split(rng, B))

    def loc_fwd(p, f, salt):
        return jax.vmap(
            lambda ff, h, w, gb, gl, gv, r: localize_train(
                p["rpn"], ff + salt, h, w, gb, gl, gv, r, cfg, anchors)
        )(f, hs, ws, batch["gt_boxes"], batch["gt_labels"],
          batch["gt_valid"], rngs)

    timeit("localize_train fwd B=8", loc_fwd, params, feats)

    def loc_grad(p, f, salt):
        def obj(pp):
            o = loc_fwd(pp, f, salt)
            return (checksum(o.roi_feats) + checksum(o.losses)
                    + checksum(o.pos_boxes) + checksum(o.pos_trans))
        return jax.grad(obj)(p)

    timeit("localize_train fwd+bwd B=8", loc_grad, params, feats)

    loc = jax.jit(loc_fwd)(params, feats, 0.0)
    roi_boxes = jax.device_put(loc.roi_boxes)     # (B, P+M, 4)

    # ---- roi align (train shape: 384 rois/img) fwd and fwd+bwd ----------
    def roi_fwd(f, bx, salt):
        return jax.vmap(lambda ff, bb, h, w: roi_align_mxu(
            ff + salt, bb, h, w, cfg.output_height, cfg.output_width,
        ))(f, bx, hs, ws)

    n_roi = roi_boxes.shape[1]
    timeit(f"roi_align mxu f32 B=8x{n_roi} fwd", roi_fwd, feats, roi_boxes)

    def roi_grad(f, bx, salt):
        return jax.grad(lambda ff: checksum(roi_fwd(ff, bx, salt)))(f)

    timeit(f"roi_align mxu f32 B=8x{n_roi} fwd+bwd", roi_grad, feats,
           roi_boxes)

    # ---- recognition FC (train shapes, dropout on) ----------------------
    roi_feats = jax.device_put(loc.roi_feats)     # (B, P+M, 7, 7, 512)
    kd = jax.random.PRNGKey(7)

    def recog_fwd(rp, rf, salt):
        return jax.vmap(lambda r: apply_recog(
            rp, r + salt, train=True, dropout_key=kd,
            drop_prob=cfg.drop_prob,
            compute_dtype=cfg.compute_dtype))(rf)

    timeit(f"recog fc B=8x{n_roi} fwd (dropout)", recog_fwd,
           params["recog"], roi_feats)

    def recog_grad(rp, rf, salt):
        def obj(args):
            rpp, rff = args
            return checksum(recog_fwd(rpp, rff, salt))
        return jax.grad(obj)((rp, rf))

    timeit(f"recog fc B=8x{n_roi} fwd+bwd", recog_grad,
           params["recog"], roi_feats)

    # ---- language model train (P positives/img) -------------------------
    P = cfg.sampler_batch_size // 2
    lmc = densecap.lm_config(cfg)
    codes = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(8), (B * P, cfg.fc_dim)) * 0.1)
    seqs = jax.device_put(
        jnp.tile(jnp.arange(1, L + 1, dtype=jnp.int32)[None], (B * P, 1)))

    def lm_fwd(lp, c, salt):
        return lstm.forward_train(lp, c + salt, seqs, lmc,
                                  compute_dtype=cfg.compute_dtype)

    timeit(f"lm train fwd {B * P}x{L + 2} steps", lm_fwd, params["lm"],
           codes)

    def lm_grad(lp, c, salt):
        def obj(args):
            lpp, cc = args
            return checksum(lm_fwd(lpp, cc, salt))
        return jax.grad(obj)((lp, c))

    timeit(f"lm train fwd+bwd {B * P}x{L + 2} steps", lm_grad,
           params["lm"], codes)


if __name__ == "__main__":
    main()
