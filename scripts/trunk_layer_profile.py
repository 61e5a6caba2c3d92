"""Per-conv-block device-time profile of the VGG trunk at B=8 720px.

Answers WHERE the trunk's ~45% MFU goes: each conv (and each pool
boundary) is measured scan-amplified (K reps, one dispatch) with its
true input shape, and compared against its ideal MXU time at peak
bf16. Evidence backing doc/BENCH.md's "XLA conv efficiency at VGG
geometries" ceiling claim.

Run: PYTHONPATH=.:/root/.axon_site python scripts/trunk_layer_profile.py
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

from densecap_tpu.models.vgg16 import (TRUNK1_CFG, TRUNK2_CFG,
                                       conv1_1_s2d, conv2d_same,
                                       init_trunk, max_pool_2x2)

B = 8
S = 720
K = 50  # reps/dispatch: the ~30 ms tunnel round trip spreads to 0.6 ms
PEAK = 197e12


def timeit(fn, *args, iters=3):
    """Scan-amplified. The harness ops must stay cheap relative to a
    single conv: inputs are pre-cast bf16 (so the salt add is one bf16
    pass), and the checksum is jnp.sum(out, dtype=f32) — a fused
    f32-accumulating read of the bf16 output, NOT an astype that
    materializes an f32 copy. (The first version of this script paid
    ~3 ms/stage of harness traffic and mismeasured every layer.)"""
    @jax.jit
    def amp(*a):
        def body(c, _):
            out = fn(*a, (c * 1e-3).astype(jnp.bfloat16))
            return jnp.sum(out, dtype=jnp.float32), None
        t, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return jnp.sum(t)

    float(amp(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(amp(*args))
    return (time.perf_counter() - t0) / (iters * K)


def main():
    key = jax.random.PRNGKey(0)
    p1, c1 = init_trunk(key, TRUNK1_CFG, 3)
    p2, _ = init_trunk(key, TRUNK2_CFG, c1)
    params = {**p1, **p2}

    base = timeit(lambda xx, s: xx + s.astype(xx.dtype),
                  jnp.ones((8, 128), jnp.bfloat16))
    print(f"harness baseline (tiny add): {base*1000:.2f} ms/step "
          "(subtract from every row)", flush=True)

    x = jax.device_put((jax.random.normal(
        jax.random.PRNGKey(1), (B, S, S, 3)) * 30.0
    ).astype(jnp.bfloat16))
    h = w = S
    cin = 3
    total = 0.0
    for item in TRUNK1_CFG + TRUNK2_CFG:
        if item == "M":
            dt = timeit(
                lambda xx, s: max_pool_2x2(xx + s.astype(xx.dtype)), x)
            print(f"pool {h}x{w}              {dt*1000:7.2f} ms/step",
                  flush=True)
            x = max_pool_2x2(x)
            h //= 2
            w //= 2
            total += dt
            continue
        name, cout = item
        p = jax.device_put(params[name])
        if name == "conv1_1":
            # the exact s2d alternative (cfg.conv1_s2d, off by default)
            p32 = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32), p)
            dt_s2d = timeit(
                lambda xx, pp, s: conv1_1_s2d(
                    xx + s.astype(xx.dtype), pp, jnp.bfloat16),
                x, p32)
            print(f"conv1_1[s2d] {h}x{w}x{cin*4}->{cout}"
                  f" {dt_s2d*1000:7.2f} ms/step", flush=True)
        dt = timeit(
            lambda xx, pp, s: conv2d_same(xx + s.astype(xx.dtype), pp,
                                          jnp.bfloat16),
            x, p)
        flops = 2.0 * B * h * w * 9 * cin * cout
        ideal_ms = flops / PEAK * 1e3
        print(f"{name} {h}x{w}x{cin}->{cout}"
              f"   {dt*1000:7.2f} ms/step  ideal {ideal_ms:5.2f}"
              f"  MFU {100*ideal_ms/(dt*1000):5.1f}%", flush=True)
        x = jax.nn.relu(conv2d_same(x, p, jnp.bfloat16)
                        ).astype(jnp.bfloat16)
        cin = cout
        total += dt
    print(f"sum of isolated stages: {total*1000:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
