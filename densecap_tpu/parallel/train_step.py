"""Jitted training step: batched loss, grad, optax update.

Replaces the reference's hand-rolled in-place adam + manual two-group
parameter flattening (optim_updates.lua:56-84, train.lua:114-130,
DenseCapModel:getParameters DenseCapModel.lua:369-376):

  * optax.adam with the reference hyperparameters;
  * the reference's three-zone backprop policy (never train conv1;
    train conv2 only after -finetune_cnn_after iters; always train the
    rest, DenseCapModel.lua:338-358) is an optax.multi_transform
    partition over the param pytree, switched by a scalar flag so
    enabling finetuning does NOT recompile;
  * L2 weight decay added to grads exactly like train.lua:92-95
    (grad += wd * param), applied to the trainable zones;
  * one image per loss term, vmapped over the device batch; under a
    sharded-batch jit XLA all-reduces gradients over the 'data' axis.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import DenseCapConfig
from ..models import densecap


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array            # () int32
    finetune_cnn: jax.Array    # () bool — conv2 updates enabled?


def param_zones(params):
    """Label each top-level param group: 'frozen' | 'cnn' | 'main'."""
    zones = {}
    for k in params:
        if k == "trunk1":
            zones[k] = "frozen"
        elif k == "trunk2":
            zones[k] = "cnn"
        else:
            zones[k] = "main"
    return zones


def make_optimizer(cfg: DenseCapConfig, learning_rate=1e-5, beta1=0.9,
                   beta2=0.999, eps=1e-8):
    """Reference defaults: train_opts.lua:56-59.

    With cfg.static_freeze_cnn the conv2 ('cnn') zone gets a no-op
    transform that SHARES adam's init (identical opt_state pytree), so
    the finetune switch can rebuild the optimizer without touching the
    state — while frozen, XLA deletes the zone's entire m/v
    read-modify-write (isolated optimizer stage 5.2 -> 2.8 ms/step at
    flagship B=8; the full-step delta is ~0 because the update traffic
    already overlaps the backward — doc/BENCH.md train-step profile).
    Numerics are identical either way: conv2 grads are zero
    pre-finetune, so adam's moments stayed zero too; and the fresh
    m = v = 0, count = 0 at the switch is exactly the reference, which
    creates its cnn adam state lazily at the first finetune step
    (train.lua:114-130).

    The learning rate (float or optax schedule) is applied ONCE, outside
    the zone partition, so all zones share a single schedule count that
    advances every step. (Applying optax.adam(lr) per zone would leave a
    frozen zone's schedule count at 0, making conv2 resume at the
    schedule's peak LR at the finetune flip instead of the current
    decayed LR — the reference passes the one live LR to every param,
    optim_updates.lua:56-84.) Per-zone adam bias-correction counts stay
    per-zone: the cnn zone's count is 0 at the flip, which IS the
    reference's lazily-created state.
    """
    adam = optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps)
    if cfg.static_freeze_cnn:
        cnn_tx = optax.GradientTransformation(
            adam.init,
            lambda updates, state, params=None: (
                jax.tree_util.tree_map(jnp.zeros_like, updates), state),
        )
    else:
        cnn_tx = adam
    tx = optax.chain(
        optax.multi_transform(
            {"frozen": optax.set_to_zero(), "cnn": cnn_tx, "main": adam},
            param_zones,
        ),
        optax.scale_by_learning_rate(learning_rate),
    )
    return tx


def normalize_uint8_images(images, heights, widths):
    """Device-side image normalization for the raw-uint8 feed
    (data/loader.py raw_images=True): (B, S, S, 3) uint8 BGR canvas ->
    f32, VGG mean subtracted, pad region (rows >= h, cols >= w) zeroed
    AFTER the subtraction — bit-equal to the host f32 path
    (DenseCapLoader._load_image). XLA fuses the convert/subtract/mask
    into the first conv's input; the win is host work and transfer
    bytes (uint8 is 4x smaller), measured in doc/BENCH.md round 5."""
    from ..config import VGG_MEAN_BGR

    x = images.astype(jnp.float32) - jnp.asarray(
        VGG_MEAN_BGR, jnp.float32)
    B, H, W = x.shape[0], x.shape[1], x.shape[2]
    row_ok = jnp.arange(H)[None, :] < heights[:, None]      # (B, H)
    col_ok = jnp.arange(W)[None, :] < widths[:, None]       # (B, W)
    mask = (row_ok[:, :, None] & col_ok[:, None, :])[..., None]
    return jnp.where(mask, x, 0.0)   # where (not *) keeps pad at +0.0


def batched_loss(params, batch, rng, cfg: DenseCapConfig):
    """Mean per-image losses over the batch dim.

    An optional batch['weight'] (B,) reweights the mean — used by the
    bucketed loader's epoch-tail batches, where repeat-padded slots
    carry weight 0 so every real example counts exactly once. A uint8
    batch['image'] is normalized on device (raw-uint8 feed)."""
    if batch["image"].dtype == jnp.uint8:
        batch = dict(batch, image=normalize_uint8_images(
            batch["image"], batch["height"], batch["width"]))
    B = batch["image"].shape[0]
    rngs = jax.random.split(rng, B)
    losses = jax.vmap(
        lambda img, h, w, gb, gl, gv, r: densecap.forward_train(
            params, img, h, w, gb, gl, gv, r, cfg
        )
    )(
        batch["image"], batch["height"], batch["width"],
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"], rngs,
    )
    if "weight" in batch:
        w = batch["weight"].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w), 1.0)
        return jax.tree_util.tree_map(
            lambda v: jnp.sum(v * w) / denom, losses)
    return jax.tree_util.tree_map(jnp.mean, losses)


def init_state(key, cfg: DenseCapConfig, learning_rate=1e-5, mesh=None,
               params=None, **opt_kw):
    """Build (TrainState, optimizer).

    mesh: optional ('data','model') Mesh — params are TP-padded and
    sharded BEFORE the optimizer state is created, so adam's m/v mirror
    the padded shapes and inherit the shardings (zeros_like preserves
    sharding). params: optional pre-built pytree (e.g. a converted
    checkpoint) instead of fresh initialization.
    """
    if params is None:
        params = densecap.init_params(key, cfg)
    if mesh is not None:
        from . import mesh as meshlib

        params = meshlib.shard_params(params, mesh)
    tx = make_optimizer(cfg, learning_rate, **opt_kw)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        finetune_cnn=jnp.zeros((), bool),
    ), tx


def resume_train_state(path, template: TrainState, cfg: DenseCapConfig,
                       mesh=None) -> TrainState:
    """Restore a saved TrainState onto THIS run's mesh.

    Checkpoints are written with the TP vocab padding stripped
    (parallel/mesh.py:repad_vocab), so any --model_parallel can resume
    any checkpoint: restore into an unpadded template, re-pad params
    and adam m/v with zeros for this mesh's model axis (exact — the
    padded logit columns are masked to -inf so their gradient, and
    hence correct moments, are zero), then place by the template's
    shardings.
    """
    import jax as _jax

    from . import mesh as meshlib
    from ..utils import checkpoint as ckpt

    true_v1 = cfg.vocab_size + 1
    state = ckpt.load_train_state(
        path, meshlib.repad_vocab(template, true_v1))
    if mesh is None:
        return state
    state = meshlib.repad_vocab(
        state, meshlib.padded_vocab_size(true_v1, mesh.shape["model"]))

    def _put_like(x, tmpl):
        # Only adopt MESH shardings (adam m/v mirror the params). Leaves
        # the template created eagerly (e.g. the optax count scalar)
        # carry an incidental single-device sharding — committing to it
        # would conflict with the mesh-committed params inside jit;
        # return them uncommitted and let jit replicate.
        if (isinstance(tmpl, _jax.Array)
                and isinstance(tmpl.sharding, _jax.sharding.NamedSharding)):
            return _jax.device_put(x, tmpl.sharding)
        return np.asarray(x) if hasattr(x, "shape") else x

    return state._replace(
        params=meshlib.shard_params(state.params, mesh),
        opt_state=jax.tree_util.tree_map(
            _put_like, state.opt_state, template.opt_state),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "tx"),
                   donate_argnames=("state",))
def train_step(state: TrainState, batch, rng, cfg: DenseCapConfig, tx):
    def loss_fn(params):
        losses = batched_loss(params, batch, rng, cfg)
        return losses["total_loss"], losses

    grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)

    zones = param_zones(state.params)

    # weight decay on grads (train.lua:92-95), trainable zones only;
    # conv2 grads are zeroed until finetuning turns on (scalar switch,
    # same compiled program either way)
    def adjust(zone_label, g, p):
        if zone_label == "frozen":
            return jax.tree_util.tree_map(jnp.zeros_like, g)
        g = jax.tree_util.tree_map(
            lambda gi, pi: gi + cfg.weight_decay * pi, g, p
        )
        if zone_label == "cnn":
            scale = state.finetune_cnn.astype(jnp.float32)
            g = jax.tree_util.tree_map(lambda gi: gi * scale, g)
        return g

    grads = {k: adjust(zones[k], grads[k], state.params[k]) for k in grads}

    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        step=state.step + 1,
        finetune_cnn=state.finetune_cnn,
    )
    return new_state, losses
