"""Rectangular inference canvases produce EXACTLY the square-canvas
outputs (the bucket machinery only removes padding the masking already
zeroed). Backs run_model --canvas_buckets and the bucketed bench.

Reference point: run_model.lua:64-87 processes each image at its true
resized extent (dynamic shapes); our buckets recover that FLOP profile
with static shapes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap
from densecap_tpu.utils.image import parse_buckets, pick_bucket


def small_cfg():
    return DenseCapConfig(image_size=128, vocab_size=50,
                          test_max_proposals=20, rnn_size=32,
                          rnn_encoding_size=32, fc_dim=64)


def test_rect_canvas_equals_square():
    cfg = small_cfg()
    params = densecap.init_params(jax.random.PRNGKey(0), cfg)
    content = jax.random.normal(jax.random.PRNGKey(1), (128, 96, 3)) * 30.0
    img_sq = jnp.zeros((128, 128, 3)).at[:, :96].set(content)
    h, w = jnp.float32(128), jnp.float32(96)

    out_sq = densecap.forward_test(params, img_sq, h, w, cfg)
    out_rect = densecap.forward_test(params, img_sq[:, :96], h, w, cfg)

    n = int(out_sq.num)
    assert n == int(out_rect.num) and n > 0
    np.testing.assert_allclose(out_sq.boxes[:n], out_rect.boxes[:n],
                               atol=1e-3)
    np.testing.assert_allclose(out_sq.scores[:n], out_rect.scores[:n],
                               atol=1e-3)
    assert (np.asarray(out_sq.captions)[:n]
            == np.asarray(out_rect.captions)[:n]).all()


def test_parse_and_pick_buckets():
    buckets = parse_buckets("128x96,96x128", 128)
    assert (128, 128) in buckets  # square fallback always present
    assert pick_bucket(120, 90, buckets) == (128, 96)
    assert pick_bucket(90, 120, buckets) == (96, 128)
    assert pick_bucket(128, 128, buckets) == (128, 128)
    # non-multiple-of-16 and oversize specs are rejected
    import pytest

    with pytest.raises(ValueError):
        parse_buckets("100x96", 128)
    with pytest.raises(ValueError):
        parse_buckets("256x96", 128)
