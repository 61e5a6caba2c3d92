"""MFU estimate for the flagship inference and training programs.

FLOPs come from XLA's own cost analysis of the compiled program
(`compiled.cost_analysis()["flops"]`) — the exact count of the program
that actually runs, not a hand model. Device time is measured with the
scalar-checksum sync (the tunnel's block_until_ready is unreliable);
the fixed per-dispatch transport floor is measured separately on a tiny
program and reported both ways.

MFU = flops / (time * peak_bf16_flops). Peak table below by
device_kind; this environment attaches one TPU v5 lite (v5e,
197 TFLOP/s bf16).

Run: PYTHONPATH=.:/root/.axon_site python scripts/mfu_estimate.py
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

# peak dense bf16 FLOP/s per chip
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
    "cpu": 1e12,  # placeholder so the script runs anywhere
}


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32)))


def measure(compiled_fn, args, iters=10):
    v = compiled_fn(*args)
    sync(v)
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(compiled_fn(*args))
    return (time.perf_counter() - t0) / iters


def report(name, flops, dt, floor, peak, per_item=None):
    adj = max(dt - floor, 1e-9)
    line = {
        "program": name,
        "xla_flops": flops,
        "ms_per_step": round(dt * 1e3, 2),
        "ms_per_step_minus_dispatch": round(adj * 1e3, 2),
        "tflops_per_s": round(flops / dt / 1e12, 1),
        "mfu_pct": round(100 * flops / dt / peak, 1),
        "mfu_pct_minus_dispatch": round(100 * flops / adj / peak, 1),
    }
    if per_item:
        line["items_per_sec"] = round(per_item / dt, 1)
    print(json.dumps(line))
    return line


def main():
    from densecap_tpu.config import DenseCapConfig
    from densecap_tpu.models import densecap
    from densecap_tpu.parallel import train_step as ts

    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind, 197e12)
    print(f"# device {kind}, peak bf16 {peak/1e12:.0f} TFLOP/s")

    # ---- dispatch floor
    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    xs = jax.device_put(jnp.ones((8, 128)))
    floor = measure(tiny, (xs,), iters=20)
    print(f"# dispatch floor {floor*1e3:.1f} ms")

    # ---- flagship inference, B=8
    cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000,
                         use_pallas_roi_align=True)
    S, B = cfg.image_size, 8
    params = jax.device_put(densecap.init_params(jax.random.PRNGKey(0),
                                                 cfg))
    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, S, S, 3)) * 30.0)
    hs = jnp.full((B,), float(S), jnp.float32)
    ws = jnp.full((B,), S * 0.75, jnp.float32)

    for NB in (8, 16):
        imgs = images if NB == B else jnp.concatenate([images, images])
        h2 = jnp.full((NB,), float(S), jnp.float32)
        w2 = jnp.full((NB,), S * 0.75, jnp.float32)
        infer = jax.jit(lambda p, im, h, w: densecap.forward_test_batch(
            p, im, h, w, cfg).scores)
        try:
            compiled = infer.lower(params, imgs, h2, w2).compile()
        except Exception as e:
            print(f"# inference B={NB} compile failed: "
                  f"{type(e).__name__}")
            continue
        inf_flops = compiled.cost_analysis()["flops"]
        dt = measure(infer, (params, imgs, h2, w2))
        report(f"inference B={NB} 720px 1000-prop", inf_flops, dt, floor,
               peak, per_item=NB)

    # ---- flagship train step, B=8: with CNN-finetune backward (the
    # full program) and with the static trunk freeze (the default
    # pre-finetune program)
    G, L = cfg.max_gt_boxes, cfg.seq_length
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

    for label, tcfg in (
        ("finetune-on", cfg.replace(use_pallas_roi_align=False)),
        ("static-frozen-trunk", cfg.replace(use_pallas_roi_align=False,
                                            static_freeze_cnn=True)),
    ):
        state, tx = ts.init_state(jax.random.PRNGKey(0), tcfg)

        def step(state, batch, rng, tcfg=tcfg, tx=tx):
            return ts.train_step(state, batch, rng, tcfg, tx)

        new_state, losses = step(state, batch, rng)  # compile
        sync(losses["total_loss"])
        # lower the FULL step (new state included) — returning only the
        # loss lets XLA dead-code-eliminate the entire backward and the
        # flop count collapses to forward-only
        tr_lowered = jax.jit(
            lambda s, b, r: ts.train_step(s, b, r, tcfg, tx)
        ).lower(new_state, batch, rng)
        tr_flops = tr_lowered.compile().cost_analysis()["flops"]

        iters = 8
        t0 = time.perf_counter()
        st = new_state
        for _ in range(iters):
            st, losses = step(st, batch, rng)
        sync(losses["total_loss"])
        dt = (time.perf_counter() - t0) / iters
        report(f"train_step B={B} 720px {label}", tr_flops, dt, floor,
               peak, per_item=B)


if __name__ == "__main__":
    main()
