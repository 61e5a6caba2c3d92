"""Tensor-parallel vocab padding (VERDICT round-1 weak #2).

The real VG vocabulary (~10497 words -> V+1 = 10498 projection columns)
does not divide model axes of 4 or 8; NamedSharding requires exact
divisibility, so round 1 crashed at real sizes (verified repro:
device_put of a (512, 10001) weight with P(None, 'model') on model=2).
pad_params_for_tp zero-pads the projection and models/lstm.py:_project
masks the padded logits; these tests pin the crash fix, the masking
semantics, and TP-vs-unsharded numerical equality at the real vocab.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap, lstm
from densecap_tpu.parallel import mesh as meshlib
from densecap_tpu.parallel import train_step as ts

REAL_VOCAB = 10497  # info/VG-regions-dicts vocab size of the reference


def tiny_cfg(vocab, **kw):
    base = dict(
        vocab_size=vocab, seq_length=4, image_size=64,
        anchors=((8, 8), (16, 16), (12, 24), (24, 12)),
        sampler_batch_size=8, max_gt_boxes=4, test_max_proposals=8,
        rnn_size=32, rnn_encoding_size=32, fc_dim=64, rpn_num_filters=32,
        compute_dtype=jnp.float32,
    )
    base.update(kw)
    return DenseCapConfig(**base)


def _batch(B, cfg):
    G, L, S = cfg.max_gt_boxes, cfg.seq_length, cfg.image_size
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.randn(B, S, S, 3).astype(np.float32)),
        "height": jnp.full((B,), float(S), jnp.float32),
        "width": jnp.full((B,), float(S), jnp.float32),
        "gt_boxes": jnp.tile(
            jnp.array([[[20.0, 20.0, 12.0, 12.0],
                        [40.0, 40.0, 16.0, 10.0]] * (G // 2)]), (B, 1, 1)),
        "gt_labels": jnp.asarray(
            rng.randint(1, cfg.vocab_size, (B, G, L)), jnp.int32),
        "gt_valid": jnp.ones((B, G), bool),
    }


def test_verdict_repro_indivisible_vocab_device_put():
    """The exact round-1 crash: V+1 = 10001 on model=2. shard_params
    must now pad instead of raising."""
    cfg = tiny_cfg(10000)
    params = densecap.init_params(jax.random.PRNGKey(0), cfg)
    assert params["lm"]["proj"]["w"].shape[1] == 10001
    mesh = meshlib.make_mesh(8, model_parallel=2)
    sharded = meshlib.shard_params(params, mesh)
    assert sharded["lm"]["proj"]["w"].shape[1] == 10002  # padded
    assert sharded["lm"]["proj"]["b"].shape[0] == 10002
    # padding is zeros
    np.testing.assert_array_equal(
        np.asarray(sharded["lm"]["proj"]["w"])[:, -1], 0.0)


@pytest.mark.parametrize("model_par", [2, 4])
def test_real_vocab_train_step(model_par):
    """Full sharded train step at the REAL vocab (V+1 = 10498; not
    divisible by 4). This is the case the round-1 dryrun dodged with
    V=19."""
    cfg = tiny_cfg(REAL_VOCAB)
    mesh = meshlib.make_mesh(8, model_parallel=model_par)
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg, mesh=mesh)
    B = 8 // model_par
    batch = meshlib.shard_batch(_batch(B, cfg), mesh)
    new_state, losses = ts.train_step(
        state, batch, jax.random.PRNGKey(1), cfg, tx)
    total = float(losses["total_loss"])
    assert np.isfinite(total)
    # padded projection columns must stay exactly zero after an update
    w = np.asarray(new_state.params["lm"]["proj"]["w"])
    pad = w.shape[1] - (REAL_VOCAB + 1)
    assert pad > 0 or model_par == 2
    if pad:
        np.testing.assert_array_equal(w[:, REAL_VOCAB + 1:], 0.0)


@pytest.mark.slow
def test_tp_matches_unsharded():
    """TP=4 with padding produces the same loss and the same greedy
    captions as the unsharded model."""
    cfg = tiny_cfg(REAL_VOCAB)
    params = densecap.init_params(jax.random.PRNGKey(2), cfg)
    batch = _batch(2, cfg)

    loss_plain = ts.batched_loss(params, batch, jax.random.PRNGKey(3), cfg)

    mesh = meshlib.make_mesh(8, model_parallel=4)
    sharded = meshlib.shard_params(params, mesh)
    loss_tp = jax.jit(
        lambda p, b: ts.batched_loss(p, b, jax.random.PRNGKey(3), cfg)
    )(sharded, meshlib.shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(loss_tp["total_loss"]), float(loss_plain["total_loss"]),
        rtol=1e-5)

    # greedy decoding sees identical tokens (mask keeps argmax off the
    # padded classes)
    lmc = densecap.lm_config(cfg)
    vecs = jnp.asarray(
        np.random.RandomState(4).randn(5, cfg.fc_dim).astype(np.float32))
    toks_plain = np.asarray(lstm.sample(params["lm"], vecs, lmc))
    padded_lm = jax.tree_util.tree_map(
        jnp.asarray, jax.device_get(sharded)["lm"])
    toks_tp = np.asarray(lstm.sample(padded_lm, vecs, lmc))
    np.testing.assert_array_equal(toks_plain, toks_tp)
    assert toks_plain.max() <= REAL_VOCAB + 1


def test_padded_logits_masked():
    cfg = tiny_cfg(9)  # V+1 = 10; pad to 12 on model=4... build manually
    params = densecap.init_params(jax.random.PRNGKey(0), cfg)
    padded = meshlib.pad_params_for_tp(params["lm"], 4)
    # pad_params_for_tp works on the full tree; emulate via full params
    full_padded = meshlib.pad_params_for_tp(params, 4)
    lm_p = full_padded["lm"]
    assert lm_p["proj"]["w"].shape[1] % 4 == 0
    h = jnp.asarray(np.random.RandomState(1).randn(3, cfg.rnn_size)
                    .astype(np.float32))
    logits = lstm._project(lm_p, h, jnp.float32)
    assert logits.shape[1] == lm_p["proj"]["w"].shape[1]
    assert np.all(np.asarray(logits)[:, cfg.vocab_size + 1:] < -1e29)
    del padded


def test_indivisible_fc_dim_raises_with_leaf_name():
    cfg = tiny_cfg(19, fc_dim=30)  # 30 % 4 != 0, recog is TP-sharded
    params = densecap.init_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="recog"):
        meshlib.pad_params_for_tp(params, 4)


def _vocab_leaf_widths(tree, candidates):
    """Last-dim widths of every lm/proj w|b leaf in a pytree (params or
    optimizer state — adam m/v mirror the param dict paths)."""
    widths = []

    def visit(path, x):
        keys = [getattr(p, "key", None) for p in path]
        if ("lm" in keys and "proj" in keys and keys[-1] in ("w", "b")
                and getattr(x, "ndim", 0) >= 1
                and x.shape[-1] in candidates):
            widths.append(x.shape[-1])
        return x

    jax.tree_util.tree_map_with_path(visit, tree)
    return widths


@pytest.mark.slow
def test_cross_mesh_resume(tmp_path):
    """Save at model=2, resume at model=4 and model=1 (VERDICT-2 #5):
    checkpoints strip the TP vocab padding on save and re-pad on load,
    so --model_parallel is a per-run choice, not baked into the
    checkpoint."""
    from densecap_tpu.utils import checkpoint as ckpt

    cfg = tiny_cfg(12)  # V+1 = 13: pads to 14 (model=2), 16 (model=4)
    mesh2 = meshlib.make_mesh(8, model_parallel=2)
    state, tx = ts.init_state(jax.random.PRNGKey(0), cfg, mesh=mesh2)
    batch2 = meshlib.shard_batch(_batch(4, cfg), mesh2)
    state, _ = ts.train_step(state, batch2, jax.random.PRNGKey(1), cfg, tx)
    assert state.params["lm"]["proj"]["w"].shape[1] == 14

    # save exactly as cli/train.py does: strip padding from the WHOLE
    # state (params + adam m/v), then write
    host = jax.tree_util.tree_map(np.asarray, state)
    save_state = meshlib.repad_vocab(host, 13)
    assert set(_vocab_leaf_widths(save_state, {13, 14, 16})) == {13}
    path = ckpt.save_train_state(str(tmp_path), save_state)

    for model_par in (4, 1):
        mesh = meshlib.make_mesh(8, model_parallel=model_par)
        tmpl, tx2 = ts.init_state(jax.random.PRNGKey(9), cfg, mesh=mesh)
        resumed = ts.resume_train_state(path, tmpl, cfg, mesh)
        padded = meshlib.padded_vocab_size(13, model_par)
        # every vocab-dim leaf (params AND adam moments) re-padded
        assert set(_vocab_leaf_widths(resumed.params, {13, 14, 16})) \
            == {padded}
        assert set(_vocab_leaf_widths(resumed.opt_state, {13, 14, 16})) \
            == {padded}
        # roundtrip is exact: stripping again recovers the saved params
        got = meshlib.repad_vocab(
            jax.tree_util.tree_map(np.asarray, resumed.params), 13)
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, got, save_state.params)
        assert int(resumed.step) == int(save_state.step)
        # padded columns are zeros (weights and moments)
        w = np.asarray(resumed.params["lm"]["proj"]["w"])
        if padded > 13:
            np.testing.assert_array_equal(w[:, 13:], 0.0)
        # training continues on the new mesh
        B = 8 // max(model_par, 1) if model_par > 1 else 8
        batch = meshlib.shard_batch(_batch(B, cfg), mesh)
        nxt, losses = ts.train_step(
            resumed, batch, jax.random.PRNGKey(2), cfg, tx2)
        assert np.isfinite(float(losses["total_loss"]))
        if padded > 13:
            np.testing.assert_array_equal(
                np.asarray(nxt.params["lm"]["proj"]["w"])[:, 13:], 0.0)
