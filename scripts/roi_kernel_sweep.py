"""RoI-align Pallas kernel sweep at flagship geometry (B=8 x 1000
boxes, 45x45x512 feature maps), scan-amplified to device time.

Round-2 finding this sweep drove: the round-1 kernel ran the first
contraction at (M=56, K=45) in f32 — ~10% of one 128x128 MXU block,
multi-pass f32 rate — costing 2.3 ms/img. bf16 contractions + TB=18
(M=126, one full block) recover most of it; numbers in doc/BENCH.md.

Run: PYTHONPATH=.:/root/.axon_site python scripts/roi_kernel_sweep.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from densecap_tpu.ops.pallas.roi_align_kernel import roi_align_pallas
from densecap_tpu.ops.roi_align import roi_align, roi_align_mxu

B, NB = 8, 1000
Hf = Wf = 45
C = 512
S = 720.0


def main():
    rng = np.random.RandomState(0)
    feats = jax.device_put(jnp.asarray(
        rng.randn(B, Hf, Wf, C).astype(np.float32)))
    boxes = jax.device_put(jnp.asarray(np.stack([
        rng.uniform(30, 680, (B, NB)),
        rng.uniform(30, 500, (B, NB)),
        rng.uniform(16, 300, (B, NB)),
        rng.uniform(16, 300, (B, NB)),
    ], axis=-1).astype(np.float32)))
    hs = jnp.full((B,), S, jnp.float32)
    ws = jnp.full((B,), S * 0.75, jnp.float32)

    ref = None

    def bench(name, one_image):
        nonlocal ref
        K = 10

        @jax.jit
        def amp(feats, boxes):
            def body(c, _):
                out = jax.vmap(one_image)(feats + c * 1e-9, boxes, hs, ws)
                return jnp.sum(out.astype(jnp.float32)), None
            tot, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
            return tot

        try:
            float(amp(feats, boxes))
        except Exception as e:
            print(f"{name:36s} FAILED {type(e).__name__}: {e}"[:160],
                  flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(3):
            float(amp(feats, boxes))
        dt = (time.perf_counter() - t0) / (3 * K)
        out = jax.vmap(one_image)(feats, boxes, hs, ws)
        if ref is None:
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref))
                        / (np.abs(ref).max() + 1e-9))
        print(f"{name:36s} {dt*1000:7.2f} ms/step  rel_err {err:.1e}",
              flush=True)

    # gather formulation: its big scatter/gather program 500s the
    # remote compile service at this size — round-1 measured it ~6x
    # slower than the MXU formulation, not re-run here.
    bench("mxu einsum bf16",
          lambda f, b, h, w: roi_align_mxu(f, b, h, w, 7, 7,
                                           compute_dtype=jnp.bfloat16))
    bench("pallas f32 TB=8 (round-1 default)",
          lambda f, b, h, w: roi_align_pallas(
              f, b, h, w, 7, 7, tile_boxes=8,
              compute_dtype=jnp.float32))
    # TB must be a multiple of 8: it is the sublane dim of the yf/xf
    # blocks (Pallas tiling); 16 -> M=112, 32 -> M=224
    for tb in (8, 16, 32):
        bench(f"pallas bf16 TB={tb}",
              lambda f, b, h, w, tb=tb: roi_align_pallas(
                  f, b, h, w, 7, 7, tile_boxes=tb,
                  compute_dtype=jnp.bfloat16))


if __name__ == "__main__":
    main()
