"""Max-pool remedy sweep: the trunk's remaining itemized headroom.

The per-layer trunk profile (doc/BENCH.md) puts the four 2x2/2 max
pools at ~5.3 ms/step (B=8, 720px) against a ~1.6 ms HBM floor
(read+write of every pool in/out tensor at ~800 GB/s). reduce_window
beat reshape+max in round 2, but neither addresses the likely real
cost: pool1/pool2 run with C=64/128 in the lane dim, and a windowed
reduce over sublanes. Variants, each numerically EXACT (same max over
the same elements):

  rw       lax.reduce_window VALID (shipping)
  slice    jnp.maximum of stride-2 slices along H then W
  reshape  (B,H/2,2,W/2,2,C) + max over the two window axes
  view     row-major reinterpretation (W,C)->(W/2,2C): H-pair max is a
           major-axis reduce, W-pair max is a LANE-half maximum — every
           op lane-aligned, last dim 2C fills the 128 lanes for pool1
  pool1..4 are measured at the trunk's true geometries and summed.

Run: PYTHONPATH=.:/root/.axon_site python scripts/pool_variants.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, K = 8, 50

GEOMS = [  # (H=W, C) at each pool's input, 720px canvas
    (720, 64),
    (360, 128),
    (180, 256),
    (90, 512),
]


def pool_rw(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_slice(x):
    y = jnp.maximum(x[:, 0::2], x[:, 1::2])
    return jnp.maximum(y[:, :, 0::2], y[:, :, 1::2])


def pool_reshape(x):
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.max(axis=(2, 4))


def pool_view(x):
    b, h, w, c = x.shape
    # (w, c) -> (w/2, 2c) is a row-major reinterpretation (free view):
    # element (w_, c_) lands at (w_//2, (w_%2)*c + c_)
    y = x.reshape(b, h // 2, 2, w // 2, 2 * c)
    y = y.max(axis=2)                       # H pairs: major-axis reduce
    return jnp.maximum(y[..., :c], y[..., c:])  # W pairs: lane halves


VARIANTS = {
    "rw": pool_rw,
    "slice": pool_slice,
    "reshape": pool_reshape,
    "view": pool_view,
}


def timeit(fn, x, iters=3):
    @jax.jit
    def amp(xx):
        def body(c, _):
            out = fn(xx + (c * 1e-3).astype(xx.dtype))
            return jnp.sum(out, dtype=jnp.float32), None
        t, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return jnp.sum(t)

    float(amp(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(amp(x))
    return (time.perf_counter() - t0) / (iters * K)


def main():
    rng = np.random.RandomState(0)

    base = timeit(lambda xx: xx * 2.0, jnp.ones((8, 128), jnp.bfloat16))
    print(f"baseline {base*1e3:.3f} ms")

    # exactness check on CPU-visible values first
    x_small = jnp.asarray(rng.randn(2, 8, 12, 4).astype(np.float32))
    ref = np.asarray(pool_rw(x_small))
    for name, fn in VARIANTS.items():
        np.testing.assert_array_equal(np.asarray(fn(x_small)), ref,
                                      err_msg=name)
    print("all variants exact vs reduce_window")

    totals = {name: 0.0 for name in VARIANTS}
    for (s, c) in GEOMS:
        x = jax.device_put(jnp.asarray(
            rng.randn(B, s, s, c).astype(np.float32)
        ).astype(jnp.bfloat16))
        row = []
        bytes_touched = B * s * s * c * 2 * 1.25  # in + out, bf16
        floor_ms = bytes_touched / 800e9 * 1e3
        for name, fn in VARIANTS.items():
            dt = (timeit(fn, x) - base) * 1e3
            totals[name] += dt
            row.append(f"{name} {dt:.2f}")
        print(f"pool {s}x{s}x{c}: " + "  ".join(row) +
              f"   (HBM floor ~{floor_ms:.2f} ms)")
        del x

    print("totals (4 pools, ms/step B=8): " +
          "  ".join(f"{k} {v:.2f}" for k, v in totals.items()))


if __name__ == "__main__":
    main()
