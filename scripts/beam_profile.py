"""Beam-search compile time + steady latency at flagship geometry.

Round-2 measured the vmap(per-image scan) beam program at ~8 min first
compile and 0.44 s/image steady (doc/BENCH.md); round 3 folds beams
into the batch dimension (models/lstm.py:beamsearch, one scan over
(P*B) rows).  This harness re-measures both numbers the same way:
full forward_test (720px, 1000 RoIs, real VG vocab 10497, beam 3),
first-compile wall clock, then pipelined steady wall time with an
in-program scalar checksum (>= 2 dispatches in flight, per the
round-2 methodology in doc/BENCH.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/beam_profile.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap

BEAM = 3
ITERS = 20


def main():
    cfg = DenseCapConfig(vocab_size=10497)
    rng = jax.random.PRNGKey(0)
    params = densecap.init_params(rng, cfg)
    img = jax.device_put(
        jnp.asarray(np.random.RandomState(0)
                    .randn(720, 720, 3).astype(np.float32) * 30))
    params = jax.device_put(params)

    @jax.jit
    def fwd(p, im, salt):
        out = densecap.forward_test(p, im + salt, 720, 720, cfg,
                                    use_beam=BEAM)
        cs = (jnp.sum(out.boxes.astype(jnp.float32))
              + jnp.sum(out.scores.astype(jnp.float32))
              + jnp.sum(out.captions)
              + out.num)
        return cs

    t0 = time.perf_counter()
    c = fwd(params, img, jnp.float32(0.0))
    float(c)
    compile_s = time.perf_counter() - t0
    print(f"first compile + run: {compile_s:.1f} s", flush=True)

    # pipelined steady time: keep >= 2 dispatches in flight
    cs = [fwd(params, img, jnp.float32(i * 1e-4)) for i in range(2)]
    t0 = time.perf_counter()
    for i in range(ITERS):
        cs.append(fwd(params, img, jnp.float32((i + 2) * 1e-4)))
        float(cs.pop(0))
    for x in cs:
        float(x)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"steady: {dt*1000:.1f} ms/image (beam={BEAM}, 1000 RoIs, "
          f"V=10497, 720px)", flush=True)


if __name__ == "__main__":
    main()
