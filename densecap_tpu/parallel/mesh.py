"""Device mesh + sharding layout.

The reference has no multi-device story at all (SURVEY.md §2.6: one GPU,
cutorch.setDevice, N == 1 minibatches). Here scale-out is first-class
and entirely XLA-collective based — no hand-written transport:

  * axis "data": batch dim of images/gt; gradients all-reduce (psum)
    over ICI automatically under jit once shardings are annotated.
  * axis "model": tensor-parallel shard of the weight-heavy tensors —
    VGG fc6/fc7 (25088x4096, 4096x4096) and the vocab projection
    (rnn_size x V+1) — the only places TP pays for itself in this model
    (everything else is < 5M params).

Layouts are expressed as NamedSharding PartitionSpecs over the param
pytree; XLA inserts the all-gathers/reduce-scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_parallel=1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def param_pspecs(params):
    """PartitionSpec tree: TP-shard the big matmuls, replicate the rest.

    fc6/fc7 shard their OUTPUT dim ('model'); the LM vocab projection
    shards the vocab dim. Biases shard to match. Everything else is
    replicated (conv kernels are small relative to the FC stack's ~119M
    params — the same observation that led the reference to keep them
    resident per-GPU).
    """

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "recog" in keys:  # fc6 / fc7
            if keys[-1] == "w":
                return P(None, "model")
            if keys[-1] == "b":
                return P("model")
        if "lm" in keys and "proj" in keys:
            if keys[-1] == "w":
                return P(None, "model")
            if keys[-1] == "b":
                return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def pad_params_for_tp(params, model_size: int):
    """Zero-pad TP-sharded dims to multiples of the model axis.

    NamedSharding requires sharded dims to divide evenly; the LM vocab
    projection's V+1 dim is data-dependent (e.g. the real VG vocab gives
    10498, which 4 does not divide), so it is padded here and the
    padded logit columns are masked to -inf inside the model
    (models/lstm.py:_project — the embed table's V+2 rows carry the true
    size). fc6/fc7 shard their 4096-wide output dims, which every
    realistic model axis divides; a non-divisible dim anywhere else is a
    configuration error and raises with the offending leaf named.
    """
    if model_size == 1:
        return params
    specs = param_pspecs(params)

    def prep(path, x, spec):
        for axis, name in enumerate(spec):
            if name != "model":
                continue
            rem = (-x.shape[axis]) % model_size
            if rem == 0:
                continue
            keys = [getattr(p, "key", None) for p in path]
            if "lm" in keys and "proj" in keys:
                pad = [(0, 0)] * x.ndim
                pad[axis] = (0, rem)
                x = jnp.pad(x, pad)
            else:
                raise ValueError(
                    f"param {'/'.join(str(k) for k in keys)}: dim {axis} "
                    f"of size {x.shape[axis]} is TP-sharded but not "
                    f"divisible by model axis {model_size}"
                )
        return x

    return jax.tree_util.tree_map_with_path(prep, params, specs)


def repad_vocab(tree, v1_target: int):
    """Slice or zero-pad the LM vocab projection's vocab dim to
    v1_target everywhere it appears in a pytree.

    Works on params AND on optimizer state (adam m/v mirror the param
    dict structure, so their lm/proj/w|b leaves carry the same dict
    path); everything else passes through untouched. Padded columns are
    zeros — exactly right for adam moments too, because the -inf logit
    mask (models/lstm.py:_project) gives padded columns zero softmax
    probability and therefore zero gradient.

    This is how checkpoints stay MESH-PORTABLE: save paths strip to the
    true V+1 (v1_target = cfg.vocab_size + 1), load paths re-pad to the
    multiple of whatever --model_parallel the resuming run uses.
    """

    def fix(path, x):
        keys = [getattr(p, "key", None) for p in path]
        if ("lm" in keys and "proj" in keys and keys[-1] in ("w", "b")
                and getattr(x, "ndim", 0) >= 1):
            cur = x.shape[-1]
            if cur > v1_target:
                return x[..., :v1_target]
            if cur < v1_target:
                pad = [(0, 0)] * (x.ndim - 1) + [(0, v1_target - cur)]
                return jnp.pad(x, pad)
        return x

    return jax.tree_util.tree_map_with_path(fix, tree)


def padded_vocab_size(true_v1: int, model_size: int) -> int:
    """The vocab-projection width after TP padding."""
    return true_v1 + (-true_v1) % model_size


def shard_params(params, mesh: Mesh):
    """Pad (vocab projection) + place params by their PartitionSpecs."""
    params = pad_params_for_tp(params, mesh.shape["model"])
    specs = param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_pspec():
    """Batch arrays shard their leading dim over 'data'."""
    return P("data")


def shard_batch(batch, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_pspec())), batch
    )
