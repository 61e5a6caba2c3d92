"""Cost of the exact-canvas masking (zeroing padding activations after
every conv so a canvas run EXACTLY equals a cropped run).

Measures the B=8 720px trunk with and without extent masking, amplified
inside one program so the tunnel dispatch floor cancels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mask_cost_check.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap

REPS = 4


def bench(masked):
    cfg = DenseCapConfig(vocab_size=10000)
    S, B = cfg.image_size, 8
    params = jax.device_put(
        densecap.init_params(jax.random.PRNGKey(0), cfg))
    images = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (B, S, S, 3)) * 30.0)
    h = jnp.float32(S)
    w = jnp.float32(S * 0.75)

    @jax.jit
    def many(params, images):
        def one(im):
            if masked:
                return densecap.features(params, im, cfg, h, w)
            return densecap.features(params, im, cfg)

        def body(i, carry):
            x, acc = carry
            f = jax.vmap(one)(x)
            d = jnp.sum(f) * 1e-12
            return x + d, acc + d
        _, acc = jax.lax.fori_loop(
            0, REPS, body, (images, jnp.float32(0.0)))
        return acc

    float(many(params, images))
    t0 = time.perf_counter()
    for _ in range(3):
        float(many(params, images))
    dt = (time.perf_counter() - t0) / 3 / REPS
    return dt


def main():
    t_masked = bench(True)
    t_plain = bench(False)
    print(f"trunk B=8 720px masked:   {t_masked*1e3:7.1f} ms/batch "
          f"({t_masked/8*1e3:.2f} ms/img)")
    print(f"trunk B=8 720px unmasked: {t_plain*1e3:7.1f} ms/batch "
          f"({t_plain/8*1e3:.2f} ms/img)")
    print(f"exact-canvas masking overhead: "
          f"{(t_masked/t_plain - 1)*100:.1f}%")


if __name__ == "__main__":
    main()
