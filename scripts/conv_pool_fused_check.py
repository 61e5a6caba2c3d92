"""Fused conv+pool Pallas kernel: TPU parity + A/B measurement.

Three measurements on the attached chip, flagship geometry (B=8,
720x544 canvas bucket, bf16 compute):

  1. parity — at f32 the fused kernel must match the unfused stage to
     rounding (rtol 1e-5); at bf16 the two paths differ by ONE
     summation order, so each is compared against the f32 oracle and
     the fused error must be no worse than the unfused error (bit
     equality is impossible by design; doc/BENCH.md records this).
  2. isolated stage timing — scan-amplified (K reps, one dispatch, the
     trunk_layer_profile.py harness) so the ~20 ms dispatch floor of
     this tunnel transport doesn't swamp a ~5 ms stage.
  3. full-program A/B — forward_test_batch ms/step with
     cfg.fuse_conv_pool off vs on (the decisive number).

Context: the per-layer trunk profile (doc/BENCH.md) charges conv1_2 +
pool1 + conv2_2 + pool2 ~14 ms/step at B=8, of which the pools are
~5.3 ms against a ~1.1 ms bandwidth floor; the fused kernel removes the
531 MB (conv1_2) + 265 MB (conv2_2) pre-pool HBM round-trips.

Run: PYTHONPATH=.:/root/.axon_site python scripts/conv_pool_fused_check.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from densecap_tpu.models.vgg16 import (
    _extent_mask, conv2d_same, max_pool_2x2)
from densecap_tpu.ops.pallas.conv_pool_kernel import fused_conv_relu_pool

B = 8
K = 20  # scan amplification
STAGES = [  # (H, W, C, eh, ew) — odd extents exercise both masks
    ("conv1_2+pool1", 720, 544, 64, 715.0, 539.0),
    ("conv2_2+pool2", 360, 272, 128, 357.0, 269.0),
]


def unfused_stage(x, w, b, eh, ew, compute_dtype):
    H, W = x.shape[1], x.shape[2]
    y = jax.nn.relu(conv2d_same(x, {"w": w, "b": b}, compute_dtype))
    y = y * _extent_mask(H, W, eh, ew, y.dtype)
    y = max_pool_2x2(y)
    return y * _extent_mask(H // 2, W // 2, float(int(eh) // 2),
                            float(int(ew) // 2), y.dtype)


def timeit(fn, *args, iters=3):
    """Scan-amplified: K reps in one dispatch, salted so the scan body
    can't be hoisted (same harness as trunk_layer_profile.py)."""
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
    return (time.perf_counter() - t0) / (iters * K) * 1e3  # ms


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.RandomState(0)

    for name, H, W, C, eh, ew in STAGES:
        x32 = jax.device_put(jnp.asarray(
            rng.randn(B, H, W, C).astype(np.float32)))
        w = jax.device_put(jnp.asarray(
            (rng.randn(3, 3, C, C) * 0.05).astype(np.float32)))
        b = jax.device_put(jnp.asarray(rng.randn(C).astype(np.float32)))
        ext = jax.device_put(
            jnp.tile(jnp.asarray([[eh, ew]], jnp.float32), (B, 1)))
        x16 = x32.astype(jnp.bfloat16)

        # f32 parity: one summation-order difference only
        oracle = np.asarray(jax.jit(
            unfused_stage, static_argnums=(3, 4, 5))(
                x32, w, b, eh, ew, jnp.float32))
        got32 = np.asarray(fused_conv_relu_pool(x32, w, b, ext))
        np.testing.assert_allclose(got32, oracle, rtol=1e-4, atol=1e-4)
        print(f"{name}: f32 parity OK (rtol 1e-4 vs unfused)", flush=True)

        # bf16: compare BOTH paths against the f32 oracle; the fused
        # error must be no worse than the unfused error
        un16 = np.asarray(jax.jit(
            unfused_stage, static_argnums=(3, 4, 5))(
                x16, w, b, eh, ew, jnp.bfloat16), np.float32)
        fu16 = np.asarray(fused_conv_relu_pool(x16, w, b, ext),
                          np.float32)
        e_un = np.abs(un16 - oracle)
        e_fu = np.abs(fu16 - oracle)
        print(f"{name}: bf16 |err| vs f32 oracle — "
              f"unfused mean {e_un.mean():.2e} p99.9 "
              f"{np.percentile(e_un, 99.9):.2e} max {e_un.max():.2e}; "
              f"fused mean {e_fu.mean():.2e} p99.9 "
              f"{np.percentile(e_fu, 99.9):.2e} max {e_fu.max():.2e}",
              flush=True)

        t_un = timeit(
            lambda xx, ww, bb, s: unfused_stage(
                xx + s.astype(xx.dtype), ww, bb, eh, ew, jnp.bfloat16),
            x16, w, b)
        t_fu = timeit(
            lambda xx, ww, bb, s: fused_conv_relu_pool(
                xx + s.astype(xx.dtype), ww, bb, ext),
            x16, w, b)
        print(f"{name}: unfused {t_un:.3f} ms  fused {t_fu:.3f} ms  "
              f"({t_un / t_fu:.2f}x)", flush=True)

    # ---- full program A/B -------------------------------------------
    from densecap_tpu.config import DenseCapConfig
    from densecap_tpu.models import densecap

    S, Wc = 720, 544
    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, S, Wc, 3),
                          jnp.float32) * 30.0)
    hs = jnp.full((B,), float(S), jnp.float32)
    ws = jnp.full((B,), S * 0.75, jnp.float32)

    results = {}
    for fuse in (False, True):
        cfg = DenseCapConfig(vocab_size=10000, test_max_proposals=1000,
                             roi_align_impl="mxu", fuse_conv_pool=fuse)
        params = jax.device_put(
            densecap.init_params(jax.random.PRNGKey(0), cfg))

        @jax.jit
        def step(params, images, hs, ws):
            out = densecap.forward_test_batch(params, images, hs, ws, cfg)
            return (jnp.sum(out.boxes) + jnp.sum(out.scores)
                    + jnp.sum(out.captions) + jnp.sum(out.num))

        c0 = float(step(params, images, hs, ws))
        float(step(params, images, hs, ws))
        iters, depth, futs = 24, 2, []
        t0 = time.perf_counter()
        for _ in range(iters):
            futs.append(step(params, images, hs, ws))
            if len(futs) > depth:
                float(futs.pop(0))
        for f in futs:
            float(f)
        dt = time.perf_counter() - t0
        ms = dt / iters * 1e3
        results[fuse] = ms
        print(f"full program fuse={fuse}: {ms:.2f} ms/step "
              f"({iters * B / dt:.1f} img/s)  checksum={c0:.1f}",
              flush=True)

    print(f"full-program delta: {results[False] - results[True]:+.2f} "
          f"ms/step ({results[False] / results[True]:.3f}x)")


if __name__ == "__main__":
    main()
