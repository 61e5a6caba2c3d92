"""Flagship-geometry sharded train step on the virtual CPU mesh.

VERDICT round-1 weak #9: every multichip test ran at toy shapes
(64px/fc64/V=19), which is exactly how the TP divisibility crash stayed
invisible. This runs ONE full dp=4 x tp=2 training step at the REAL
model geometry — 720px canvas, fc 4096, 12 anchors (~24k RPN boxes),
sampler 256, V=10497 — so shape/divisibility/memory bugs at production
size surface in CI.

Runs in a SUBPROCESS: the step needs several GB of native scratch and
aborts (XLA CPU abort(), not a python exception) when executed late in
a long pytest process that has accumulated dozens of compiled programs
— it passes in isolation. Subprocess isolation makes it order-immune.
Slow (minutes of XLA compile + CPU conv time): kept lean (one step,
one batch) and marked `slow`.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

WORKER = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.parallel import mesh as meshlib
from densecap_tpu.parallel import train_step as ts

cfg = DenseCapConfig(
    vocab_size=10497,
    seq_length=15,
    image_size=720,
    compute_dtype=jnp.float32,   # CPU has no bf16 units
    remat_trunk=True,            # keep 720px activations in check
)
assert cfg.num_anchors == 12 and cfg.fc_dim == 4096

mesh = meshlib.make_mesh(8, model_parallel=2)
state, tx = ts.init_state(jax.random.PRNGKey(0), cfg, mesh=mesh)
# V+1 = 10498 on model=2 happens to divide; the padding path at this
# geometry is covered by test_tp_padding at model=4.

B = 4  # one image per data shard
S, G, L = cfg.image_size, cfg.max_gt_boxes, cfg.seq_length
rng = np.random.RandomState(0)
batch = {
    "image": jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32)),
    "height": jnp.full((B,), 720.0, jnp.float32),
    "width": jnp.full((B,), 540.0, jnp.float32),  # padded canvas
    "gt_boxes": jnp.asarray(
        np.stack([np.stack([
            np.array([100.0 + 30 * i, 120.0 + 20 * i,
                      60.0 + i, 40.0 + i], np.float32)
            for i in range(G)])] * B)),
    "gt_labels": jnp.asarray(
        rng.randint(1, cfg.vocab_size, (B, G, L)), jnp.int32),
    "gt_valid": jnp.ones((B, G), bool),
}
batch = meshlib.shard_batch(batch, mesh)

new_state, losses = ts.train_step(
    state, batch, jax.random.PRNGKey(1), cfg, tx)
jax.block_until_ready(new_state.params)
total = float(losses["total_loss"])
assert np.isfinite(total), losses
assert float(losses["captioning_loss"]) > 0
print("FLAGSHIP_OK", total)
"""


def test_flagship_geometry_dp4_tp2_train_step(tmp_path):
    script = tmp_path / "flagship_worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, (
        f"flagship worker failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}")
    assert "FLAGSHIP_OK" in proc.stdout
