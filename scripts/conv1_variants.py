"""conv1_1 remedy sweep: where does the C=3 MXU waste actually go?

The trunk profile shows conv1_1 at ~2.8 ms/step (2.6% MFU) because the
3-channel input wastes the 128-wide contraction. Candidate remedies,
each measured scan-amplified at B=8 720px:

  plain     the shipping SAME conv
  s2d       2x2 space-to-depth + block kernel + depth-to-space (exact)
  s2d_conv  the s2d conv alone (block-space output, no d2s shuffle) —
            isolates how much of `s2d` is the 530 MB output transpose
  pad8      input zero-padded 3->8 channels, kernel zero-padded to match
  dil       s2d input + lhs_dilation=2 conv that emits full resolution
            directly (depth-to-space fused into the conv)

Run: PYTHONPATH=.:/root/.axon_site python scripts/conv1_variants.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from densecap_tpu.models.vgg16 import conv1_1_s2d, conv2d_same, \
    _s2d_block_kernel

B, S, K = 8, 720, 50


def timeit(fn, *args, iters=3):
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
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(
        (rng.randn(B, S, S, 3) * 30).astype(np.float32)
    ).astype(jnp.bfloat16))
    w = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.05)
    p = {"w": w, "b": b}

    base = timeit(lambda xx, s: xx + s.astype(xx.dtype),
                  jnp.ones((8, 128), jnp.bfloat16))
    print(f"baseline {base*1e3:.2f} ms")

    dt = timeit(lambda xx, pp, s: conv2d_same(
        xx + s.astype(xx.dtype), pp, jnp.bfloat16), x, p)
    print(f"plain    {dt*1e3:.2f} ms")

    dt = timeit(lambda xx, pp, s: conv1_1_s2d(
        xx + s.astype(xx.dtype), pp, jnp.bfloat16), x, p)
    print(f"s2d      {dt*1e3:.2f} ms")

    # s2d conv only: pre-shuffled input, block-space output
    x2 = x.reshape(B, S // 2, 2, S // 2, 2, 3)
    x2 = jnp.transpose(x2, (0, 1, 3, 2, 4, 5)).reshape(
        B, S // 2, S // 2, 12)
    x2 = jax.device_put(x2)
    w2 = _s2d_block_kernel(w.astype(jnp.bfloat16))

    def s2d_conv(xx, ww, s):
        return lax.conv_general_dilated(
            xx + s.astype(xx.dtype), ww, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dt = timeit(s2d_conv, x2, w2, iters=3)
    print(f"s2d_conv {dt*1e3:.2f} ms")

    # pad8
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
    wp = {"w": jnp.pad(w, ((0, 0), (0, 0), (0, 5), (0, 0))), "b": b}
    dt = timeit(lambda xx, pp, s: conv2d_same(
        xx + s.astype(xx.dtype), pp, jnp.bfloat16), xp, wp)
    print(f"pad8     {dt*1e3:.2f} ms")

    # lhs-dilated fused depth-to-space: 4x4 kernel over dilated 360 grid.
    # out(y, x) = sum_{u,v in 3x3} w[u,v] in(y+u-1, x+v-1); in block space
    # input lives at even coordinates of the dilated grid. A 4x4 kernel
    # with taps at the right parities reproduces it exactly.
    # Geometry: with lhs_dilation=2, x2 block (i, j) sits at dilated
    # position (2i, 2j) and pad=2 on each side; output y = 2i+di at tap
    # t reads dilated q = y-2+t, which is a real sample iff q is even,
    # i.e. block q/2 carrying original offset-(dr, dc) channels that
    # represent in(q+dr). q+dr = y+u-1 with u = t+dr-1, so tap (t, dr)
    # carries w[u] when u is in [0, 3).
    wd = np.zeros((4, 4, 12, 64), np.float32)
    wnp = np.asarray(w)
    for t_r in range(4):
        for t_c in range(4):
            for dr in range(2):
                for dc in range(2):
                    u, v = t_r + dr - 1, t_c + dc - 1
                    if 0 <= u < 3 and 0 <= v < 3:
                        blk = (dr * 2 + dc) * 3
                        wd[t_r, t_c, blk:blk + 3] = wnp[u, v]
    wd_j = jnp.asarray(wd).astype(jnp.bfloat16)

    def dil(xx, ww, s):
        return lax.conv_general_dilated(
            xx + s.astype(xx.dtype), ww, (1, 1),
            padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dt = timeit(dil, x2, wd_j)
    print(f"dil      {dt*1e3:.2f} ms")
    # numerical check vs plain on a 64x64 slice (both sides see the
    # slice boundary as a zero-padded image edge)
    ref = conv2d_same(x[:1, :64, :64], p, jnp.bfloat16)
    got = dil(x2[:1, :32, :32], wd_j, jnp.zeros((), jnp.bfloat16))
    err = float(jnp.max(jnp.abs(
        got[0] + jnp.asarray(b)[None, None].astype(got.dtype) - ref[0])))
    print(f"dil max err vs plain: {err:.4f} "
          f"(ref scale {float(jnp.max(jnp.abs(ref))):.1f})")


if __name__ == "__main__":
    main()
