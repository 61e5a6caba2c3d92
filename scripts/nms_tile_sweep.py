"""Pick the NMS suppression-sweep tile size empirically on the TPU.

Amplified-loop measurement: each jitted program runs `nms` REPS times
inside a lax.fori_loop with a data dependency between iterations, so
the per-call device time is (total - dispatch_floor) / REPS — immune to
the tunnel's ~30 ms dispatch floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/nms_tile_sweep.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from densecap_tpu.ops.nms import nms

REPS = 20


def bench(N, K, tile):
    key = jax.random.PRNGKey(0)
    kb, ks = jax.random.split(key)
    # clustered boxes so suppression actually happens
    centers = jax.random.uniform(kb, (N, 2), minval=50.0, maxval=670.0)
    sizes = jax.random.uniform(ks, (N, 2), minval=30.0, maxval=260.0)
    boxes = jnp.concatenate([centers - sizes / 2, centers + sizes / 2],
                            axis=1)
    scores = jax.random.uniform(jax.random.PRNGKey(2), (N,))

    @jax.jit
    def many(boxes, scores):
        def body(i, carry):
            s, acc = carry
            idx, valid = nms(boxes, s, 0.7, K, tile_size=tile)
            # data dependency: perturb scores by the result checksum
            delta = jnp.sum(idx) * 1e-12 + jnp.sum(valid) * 1e-12
            return s + delta, acc + delta
        _, acc = jax.lax.fori_loop(0, REPS, body,
                                   (scores, jnp.float32(0.0)))
        return acc

    float(many(boxes, scores))  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        float(many(boxes, scores))
    dt = (time.perf_counter() - t0) / 3
    return dt / REPS


def main():
    # dispatch floor for reference
    tiny = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((8, 128))
    float(jnp.sum(tiny(x)))
    t0 = time.perf_counter()
    for _ in range(10):
        float(jnp.sum(tiny(x)))
    floor = (time.perf_counter() - t0) / 10
    print(f"# dispatch floor {floor*1e3:.1f} ms (amortized over "
          f"{REPS} reps -> {floor/REPS*1e3:.2f} ms/call residue)")

    for N in (6000, 24300):
        for tile in (64, 128, 256, 512, 1024):
            dt = bench(N, 1000, tile)
            print(f"N={N:6d} K=1000 tile={tile:5d}: {dt*1e3:7.2f} ms/call",
                  flush=True)


if __name__ == "__main__":
    main()
