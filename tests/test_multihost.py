"""Two-process distributed training test (VERDICT round-1 missing #4).

Spawns two REAL processes, each with 2 virtual CPU devices, connects
them with jax.distributed.initialize, and runs one sharded train step
over the resulting 4-device global mesh (data=2 x model=2) with
per-process data feeding via jax.make_array_from_process_local_data.
Asserts the global batch actually contains both processes' examples and
that both processes compute the identical loss.
"""

import os
import socket
import pytest
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from densecap_tpu.parallel import distributed as dist
    ok = dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
    assert ok
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    assert len(jax.local_devices()) == 2
    assert dist.is_main_process() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    from densecap_tpu.config import DenseCapConfig
    from densecap_tpu.parallel import mesh as meshlib
    from densecap_tpu.parallel import train_step as ts

    cfg = DenseCapConfig(
        vocab_size=7, seq_length=3, image_size=32,
        anchors=((8, 8), (16, 16)), sampler_batch_size=4,
        max_gt_boxes=2, test_max_proposals=4, rnn_size=8,
        rnn_encoding_size=8, fc_dim=16, rpn_num_filters=8,
        compute_dtype=jnp.float32)

    mesh = meshlib.make_mesh(model_parallel=2)  # global: data=2, model=2
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg, mesh=mesh)

    # each process contributes ONE image with its own fill value
    B = 1
    batch = {
        "image": np.full((B, 32, 32, 3), float(pid + 1), np.float32),
        "height": np.full((B,), 32.0, np.float32),
        "width": np.full((B,), 32.0, np.float32),
        "gt_boxes": np.tile(np.array(
            [[[10.0, 10.0, 8.0, 8.0], [20.0, 20.0, 6.0, 6.0]]],
            np.float32), (B, 1, 1)),
        "gt_labels": np.ones((B, 2, 3), np.int32),
        "gt_valid": np.ones((B, 2), bool),
    }
    gbatch = dist.global_batch_from_local(batch, mesh)
    assert gbatch["image"].shape[0] == 2, gbatch["image"].shape

    # global reduction proves both processes' data is in the batch:
    # sum = 32*32*3 * (1 + 2)
    img_sum = float(jnp.sum(gbatch["image"]))

    new_state, losses = ts.train_step(
        state, gbatch, jax.random.PRNGKey(1), cfg, tx)
    total = float(losses["total_loss"])
    print(f"RESULT pid={pid} img_sum={img_sum:.1f} loss={total:.6f}",
          flush=True)
""")


BUCKET_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from densecap_tpu.parallel import distributed as dist
    ok = dist.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
    assert ok and jax.process_count() == 2

    import numpy as np
    import jax.numpy as jnp
    from densecap_tpu.config import DenseCapConfig
    from densecap_tpu.data.loader import BucketedLoader
    from densecap_tpu.parallel import mesh as meshlib
    from densecap_tpu.parallel import train_step as ts

    class Stub:
        # metadata-protocol loader: 6 examples, alternating aspect so
        # both the (16,32) bucket and the full square occur
        canvas = 32
        def split_size(self, split):
            return 6
        def example_meta(self, split, ri):
            return (16 if ri % 2 == 0 else 32), 32
        def get_example_at(self, split, ri):
            h, w = self.example_meta(split, ri)
            img = np.zeros((32, 32, 3), np.float32)
            img[:h, :w] = float(ri + 1)
            return {
                "image": img,
                "height": np.float32(h), "width": np.float32(w),
                "gt_boxes": np.array(
                    [[8.0, 8.0, 6.0, 6.0], [24.0, 8.0, 6.0, 6.0]],
                    np.float32),
                "gt_labels": np.ones((2, 3), np.int32),
                "gt_valid": np.ones((2,), bool),
                "ix": ri, "split_pos": (ri, 6),
            }

    cfg = DenseCapConfig(
        vocab_size=7, seq_length=3, image_size=32,
        anchors=((8, 8), (16, 16)), sampler_batch_size=4,
        max_gt_boxes=2, test_max_proposals=4, rnn_size=8,
        rnn_encoding_size=8, fc_dim=16, rpn_num_filters=8,
        compute_dtype=jnp.float32)

    mesh = meshlib.make_mesh(model_parallel=2)  # data=2 x model=2
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg, mesh=mesh)

    # GLOBAL batch 2 over 2 processes: each materializes its own slice
    # of the shared metadata-derived schedule (zero communication)
    bl = BucketedLoader(Stub(), [(16, 32)], batch_size=2,
                        shard=(pid, 2))
    keys = ("image", "height", "width", "gt_boxes", "gt_labels",
            "gt_valid", "weight")
    log = []
    for step in range(4):  # one epoch (3 batches) + wrap into epoch 2
        bucket, bnp = bl.next_batch()
        assert bnp["image"].shape[0] == 1  # local slice of global 2
        batch = {k: v for k, v in bnp.items() if k in keys}
        gbatch = dist.global_batch_from_local(batch, mesh)
        assert gbatch["image"].shape[0] == 2, gbatch["image"].shape
        state, losses = ts.train_step(
            state, gbatch, jax.random.PRNGKey(step), cfg, tx)
        log.append((bucket, float(losses["total_loss"])))
    buckets = ";".join(f"{b[0]}x{b[1]}" for b, _ in log)
    lsum = sum(l for _, l in log)
    print(f"RESULT pid={pid} buckets={buckets} lsum={lsum:.6f}",
          flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(tmp_path))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-4000:]
        parts = dict(kv.split("=") for kv in line[0].split()[1:])
        results[int(parts["pid"])] = (float(parts["img_sum"]),
                                      float(parts["loss"]))

    assert set(results) == {0, 1}
    # both processes' images are in the global batch
    expect_sum = 32 * 32 * 3 * (1 + 2)
    assert results[0][0] == expect_sum
    assert results[1][0] == expect_sum
    # SPMD: identical loss on both controllers
    assert results[0][1] == results[1][1]
    assert results[0][1] == results[0][1]  # finite (not NaN)


@pytest.mark.slow
def test_two_process_bucketed_train(tmp_path):
    """Canvas buckets under multi-host (VERDICT-2 #9): both processes
    derive the identical bucket schedule from shared metadata, so the
    per-bucket compiled programs and collectives line up — 4 steps
    spanning two bucket shapes and an epoch wrap, identical losses."""
    script = tmp_path / "bucket_worker.py"
    script.write_text(BUCKET_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(tmp_path))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, out[-4000:]
        parts = dict(kv.split("=") for kv in line[0].split()[1:])
        results[int(parts["pid"])] = (parts["buckets"],
                                      float(parts["lsum"]))

    assert set(results) == {0, 1}
    # identical bucket schedule on both controllers, spanning both the
    # (16,32) bucket and the full-square fallback (epoch-tail flush)
    assert results[0][0] == results[1][0]
    assert "16x32" in results[0][0] and "32x32" in results[0][0]
    # SPMD: identical loss sums, finite
    assert results[0][1] == results[1][1]
    assert results[0][1] == results[0][1]
