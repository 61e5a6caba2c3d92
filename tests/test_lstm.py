"""Language model tests: target encoding and decode goldens from
test/LanguageModel_test.lua, shape checks, decode determinism, beam
search sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from densecap_tpu.models import lstm
from densecap_tpu.utils.text import decode_sequence


def _cfg(V=100, T=5, W=64, H=128, D=512):
    return lstm.LMConfig(
        vocab_size=V, seq_length=T, input_encoding_size=W,
        rnn_size=H, image_vector_dim=D,
    )


def test_get_target_golden():
    # LanguageModel_test.lua:46-71 (V=100 -> END=101)
    gt = jnp.array(
        [
            [5, 7, 0, 0, 0],
            [11, 12, 13, 0, 0],
            [15, 16, 17, 18, 29],
            [50, 0, 0, 0, 0],
        ]
    )
    target = lstm.get_target(gt, 100)
    expected = np.array(
        [
            [0, 5, 7, 101, 0, 0, 0],
            [0, 11, 12, 13, 101, 0, 0],
            [0, 15, 16, 17, 18, 29, 101],
            [0, 50, 101, 0, 0, 0, 0],
        ]
    )
    np.testing.assert_array_equal(np.asarray(target), expected)


def test_decode_sequence_golden():
    # LanguageModel_test.lua:135-160 (V=5 -> END=6)
    idx_to_token = {1: "a", 2: "cat", 3: "dog", 4: "eating", 5: "hungry"}
    seq = np.array(
        [
            [1, 5, 2, 4, 1, 3, 6],
            [1, 3, 6, 0, 0, 0, 0],
            [2, 3, 1, 3, 2, 6, 0],
        ]
    )
    captions = decode_sequence(seq, idx_to_token, 5)
    assert captions == [
        "a hungry cat eating a dog",
        "a dog",
        "cat dog a dog cat",
    ]


def test_forward_train_shapes():
    cfg = _cfg()
    params = lstm.init_lm(jax.random.PRNGKey(0), cfg)
    N, T, V = 20, cfg.seq_length, cfg.vocab_size
    vecs = jax.random.normal(jax.random.PRNGKey(1), (N, cfg.image_vector_dim))
    gt = jax.random.randint(jax.random.PRNGKey(2), (N, T), 0, V + 1)
    out = lstm.forward_train(params, vecs, gt, cfg)
    assert out.shape == (N, T + 2, V + 1)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_shapes_and_range():
    cfg = _cfg()
    params = lstm.init_lm(jax.random.PRNGKey(0), cfg)
    vecs = jax.random.normal(jax.random.PRNGKey(1), (7, cfg.image_vector_dim))
    seq = lstm.sample(params, vecs, cfg)
    assert seq.shape == (7, cfg.seq_length)
    s = np.asarray(seq)
    assert (s >= 1).all() and (s <= cfg.vocab_size + 1).all()

    seq2, lps = lstm.sample_with_logprobs(params, vecs, cfg)
    np.testing.assert_array_equal(np.asarray(seq2), s)
    assert (np.asarray(lps) <= 0).all()


def test_sample_deterministic_and_batch_consistent():
    cfg = _cfg(V=30, T=4, W=32, H=32, D=64)
    params = lstm.init_lm(jax.random.PRNGKey(3), cfg)
    vecs = jax.random.normal(jax.random.PRNGKey(4), (5, 64))
    a = np.asarray(lstm.sample(params, vecs, cfg))
    b = np.asarray(lstm.sample(params, vecs, cfg))
    np.testing.assert_array_equal(a, b)
    # decoding a single row alone gives the same caption (no cross-batch
    # leakage — the reference's stateful LSTM makes this easy to break)
    one = np.asarray(lstm.sample(params, vecs[2:3], cfg))
    np.testing.assert_array_equal(one[0], a[2])


def test_beamsearch_runs_and_beats_greedy():
    cfg = _cfg(V=20, T=6, W=32, H=32, D=48)
    params = lstm.init_lm(jax.random.PRNGKey(5), cfg)
    vecs = jax.random.normal(jax.random.PRNGKey(6), (3, 48))
    beam = lstm.beamsearch(params, vecs, cfg, beam_size=4)
    assert beam.shape == (3, cfg.seq_length)
    s = np.asarray(beam)
    assert (s >= 1).all() and (s <= cfg.vocab_size + 1).all()
    # beam_size=1 must equal greedy decoding
    beam1 = np.asarray(lstm.beamsearch(params, vecs, cfg, beam_size=1))
    greedy = np.asarray(lstm.sample(params, vecs, cfg))
    np.testing.assert_array_equal(beam1, greedy)


def test_train_grads_finite():
    cfg = _cfg(V=25, T=4, W=32, H=32, D=40)
    params = lstm.init_lm(jax.random.PRNGKey(7), cfg)
    vecs = jax.random.normal(jax.random.PRNGKey(8), (6, 40))
    gt = jax.random.randint(jax.random.PRNGKey(9), (6, 4), 0, 26)

    def loss(p):
        scores = lstm.forward_train(p, vecs, gt, cfg)
        return jnp.sum(scores ** 2) / scores.size

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
