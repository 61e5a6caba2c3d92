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


def test_sample_early_exit_canonical_past_end():
    """Greedy decode while_loop early exit: tokens after a row's first
    END are END, logprobs after END are 0, and tokens up to END match a
    plain fixed-length scan of the same step function."""
    cfg = _cfg(V=12, T=8, W=16, H=16, D=24)
    params = lstm.init_lm(jax.random.PRNGKey(9), cfg)
    # bias END upward so rows finish at different early steps
    END = lstm.start_token(cfg.vocab_size)
    params["proj"]["b"] = params["proj"]["b"].at[END - 1].add(2.0)
    vecs = jax.random.normal(jax.random.PRNGKey(10), (9, 24)) * 2.0

    seq, lps = lstm.sample_with_logprobs(params, vecs, cfg)
    seq, lps = np.asarray(seq), np.asarray(lps)
    assert (seq >= 1).all() and (seq <= cfg.vocab_size + 1).all()

    # reference: fixed-length scan, argmax continuation past END
    img = jax.nn.relu(vecs @ params["img_enc"]["w"]
                      + params["img_enc"]["b"])
    h = jnp.zeros((9, cfg.rnn_size))
    c = jnp.zeros((9, cfg.rnn_size))
    h, c = lstm._lstm_step(params["lstm"], h, c, img, jnp.float32)
    tok = jnp.full((9,), END, jnp.int32)
    ref = np.zeros((9, cfg.seq_length), np.int64)
    for t in range(cfg.seq_length):
        x = lstm._embed(params, tok)
        h, c = lstm._lstm_step(params["lstm"], h, c, x, jnp.float32)
        s = lstm._project(params, h, jnp.float32)
        tok = (jnp.argmax(s, -1) + 1).astype(jnp.int32)
        ref[:, t] = np.asarray(tok)

    hit_end = False
    for i in range(9):
        ends = np.nonzero(ref[i] == END)[0]
        cut = ends[0] + 1 if len(ends) else cfg.seq_length
        np.testing.assert_array_equal(seq[i, :cut], ref[i, :cut])
        np.testing.assert_array_equal(seq[i, cut:], END)
        np.testing.assert_array_equal(lps[i, cut:], 0.0)
        assert (lps[i, :cut] < 0.0).all()
        hit_end = hit_end or len(ends) > 0
    assert hit_end, "fixture never emitted END; test is vacuous"


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
