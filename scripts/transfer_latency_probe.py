"""Host->device feed-latency anatomy for the train-step batch.

The h5-fed sustained-training measurement (scripts/sustained_train_h5.py)
showed shipping-path throughput far below both the loader's standalone
capacity and the device's in-RAM rate, with one-batch lookahead already
in place. This probe isolates WHERE the per-step feed time goes on the
current transport:

  a) per-leaf jax.device_put of the 7-array batch (the shipping
     pattern), call-return vs block_until_ready;
  b) one-call jax.device_put of the whole batch pytree;
  c) the same via jax.make_array_from_process_local_data (the
     cli/train single+multi-host path);
  d) a single packed buffer of identical total bytes (RPC floor).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/transfer_latency_probe.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

B, S, W, G, T = 8, 720, 544, 128, 15


def make_batch(raw=True):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (B, S, W, 3)).astype(
        np.uint8 if raw else np.float32)
    return {
        "image": img,
        "height": np.full((B,), S, np.int32),
        "width": np.full((B,), W, np.int32),
        "gt_boxes": rng.rand(B, G, 4).astype(np.float32) * 500,
        "gt_labels": rng.randint(1, 100, (B, G, T)).astype(np.int32),
        "gt_valid": np.ones((B, G), bool),
        "weight": np.ones((B,), np.float32),
    }


def timeit(label, fn, iters=30):
    fn()  # warm
    t_call = t_ready = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        t_call += time.perf_counter() - t0
        jax.block_until_ready(out)
        t_ready += time.perf_counter() - t0
    print(f"{label:48s} call {1e3 * t_call / iters:7.2f} ms   "
          f"ready {1e3 * t_ready / iters:7.2f} ms", flush=True)


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.zeros(8) + 1)
    print(f"first execution: {time.perf_counter() - t0:.1f}s", flush=True)

    for raw in (True, False):
        batch = make_batch(raw)
        nbytes = sum(v.nbytes for v in batch.values())
        print(f"--- raw={raw}: {nbytes / 1e6:.1f} MB/batch")

        timeit("a) per-leaf device_put",
               lambda: {k: jax.device_put(v) for k, v in batch.items()})
        timeit("b) one-call pytree device_put",
               lambda: jax.device_put(batch))
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        sh = NamedSharding(mesh, P("data"))
        timeit("c) make_array_from_process_local_data per leaf",
               lambda: {k: jax.make_array_from_process_local_data(
                   sh, np.asarray(v)) for k, v in batch.items()})
        packed = np.concatenate(
            [np.asarray(v, np.uint8).reshape(-1).view(np.uint8)
             for v in batch.values()]
            if raw else
            [np.asarray(v, np.float32).astype(np.float32).reshape(-1)
             .view(np.uint8) for v in batch.values()])
        timeit(f"d) single packed buffer ({packed.nbytes / 1e6:.1f} MB)",
               lambda: jax.device_put(packed))
        timeit("e) tiny scalar device_put (RPC floor)",
               lambda: jax.device_put(np.float32(1.0)))
        timeit("f) scalar fetch (result RTT)",
               lambda: float(jnp.sum(jnp.zeros(8))), iters=30)


if __name__ == "__main__":
    main()
