"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap
from densecap_tpu.parallel import mesh as meshlib

TINY = DenseCapConfig(
    vocab_size=19,
    seq_length=4,
    image_size=64,
    anchors=((8, 8), (16, 16)),
    sampler_batch_size=8,
    max_gt_boxes=4,
    test_max_proposals=8,
    rnn_size=32,
    rnn_encoding_size=32,
    fc_dim=64,
    rpn_num_filters=32,
    compute_dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def mesh2():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    return meshlib.make_mesh(model_parallel=2)


def test_param_pspecs_shard_the_big_matmuls(mesh2):
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    sharded = meshlib.shard_params(params, mesh2)

    def n_shards(x):
        return len({s.index for s in x.addressable_shards})

    # fc6/fc7 and the vocab projection are model-sharded
    assert n_shards(sharded["recog"]["fc6"]["w"]) >= 2
    assert n_shards(sharded["recog"]["fc7"]["w"]) >= 2
    assert n_shards(sharded["lm"]["proj"]["w"]) >= 2
    # conv kernels are replicated
    assert n_shards(sharded["trunk1"]["conv1_1"]["w"]) == 1
    assert n_shards(sharded["rpn"]["conv"]["w"]) == 1

    # sharded-dim sizes divide evenly
    w = sharded["recog"]["fc6"]["w"]
    shard_shape = w.addressable_shards[0].data.shape
    assert shard_shape[1] * 2 == w.shape[1]


def test_sharded_forward_matches_replicated(mesh2):
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    img = jax.random.normal(jax.random.PRNGKey(1), (64, 64, 3)) * 10

    ref = densecap.forward_test(params, img, jnp.float32(64.0),
                                jnp.float32(48.0), TINY)
    sharded = meshlib.shard_params(params, mesh2)
    f = jax.jit(lambda p, im: densecap.forward_test(
        p, im, jnp.float32(64.0), jnp.float32(48.0), TINY))
    got = f(sharded, img)
    np.testing.assert_allclose(np.asarray(got.scores),
                               np.asarray(ref.scores), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))


def test_batch_sharding(mesh2):
    batch = {"image": jnp.ones((4, 8, 8, 3))}
    sharded = meshlib.shard_batch(batch, mesh2)
    assert len({s.index for s in
                sharded["image"].addressable_shards}) == 4
