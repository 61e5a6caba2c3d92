"""Beam search cross-check: an independent numpy transliteration of the
reference algorithm (LanguageModel.lua:170-290) run against the same
parameters must produce the same beams as models.lstm.beamsearch.

Covers the reference's quirks: per-step top-k over (beam x beam)
candidates, state reindexing by source beam, and the END handling that
ZEROES (not -inf's) the next-word logprobs of finished beams
(LanguageModel.lua:242-245)."""

import numpy as np

import jax
import jax.numpy as jnp

from densecap_tpu.models import lstm


def _np_lstm_step(p, h, c, x):
    gates = x @ p["Wx"] + h @ p["Wh"] + p["b"]
    H = h.shape[-1]
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    i = sig(gates[:, 0 * H:1 * H])
    f = sig(gates[:, 1 * H:2 * H])
    o = sig(gates[:, 2 * H:3 * H])
    g = np.tanh(gates[:, 3 * H:4 * H])
    c2 = f * c + i * g
    return o * np.tanh(c2), c2


def _np_logsoftmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def _np_reference_beamsearch(params, image_vector, cfg, beam_size):
    """Single-image beam search, straight from the reference recipe."""
    p = {k: np.asarray(v) for k, v in params["lstm"].items()}
    embed = np.asarray(params["embed"])
    proj_w = np.asarray(params["proj"]["w"])
    proj_b = np.asarray(params["proj"]["b"])
    enc_w = np.asarray(params["img_enc"]["w"])
    enc_b = np.asarray(params["img_enc"]["b"])
    V, T, H = cfg.vocab_size, cfg.seq_length, cfg.rnn_size
    END = V + 1
    B = beam_size

    # image step then START step (batch of 1)
    x = np.maximum(np.asarray(image_vector)[None] @ enc_w + enc_b, 0)
    h = np.zeros((1, H))
    c = np.zeros((1, H))
    h, c = _np_lstm_step(p, h, c, x)
    start_vec = embed[END - 1][None]
    h, c = _np_lstm_step(p, h, c, start_vec)
    scores = h @ proj_w + proj_b
    logp = _np_logsoftmax(scores)[0]

    order = np.argsort(-logp, kind="stable")[:B]
    beam_lp = logp[order]
    beams = np.ones((B, T), np.int64)
    beams[:, 0] = order + 1
    h = np.repeat(h, B, axis=0)
    c = np.repeat(c, B, axis=0)

    for t in range(1, T):
        words = beams[:, t - 1]
        x = embed[words - 1]
        h2, c2 = _np_lstm_step(p, h, c, x)
        logp = _np_logsoftmax(h2 @ proj_w + proj_b)  # (B, V+1)
        unfinished = ~(beams == END).any(axis=1)
        logp = logp * unfinished[:, None]  # reference zeroes, not -inf

        # per-beam top-B words, then global top-B over B*B candidates
        top_idx = np.argsort(-logp, axis=1, kind="stable")[:, :B]
        top_lp = np.take_along_axis(logp, top_idx, axis=1)
        cand = (beam_lp[:, None] + top_lp).reshape(-1)
        pick = np.argsort(-cand, kind="stable")[:B]
        beam_lp = cand[pick]
        src = pick // B
        words_next = top_idx.reshape(-1)[pick] + 1
        beams = beams[src]
        beams[:, t] = words_next
        h, c = h2[src], c2[src]

    return beams[int(np.argmax(beam_lp))]


def _canon(seq, END):
    """END-fill past the first END — models.lstm's output convention.
    The reference's post-END positions hold meaningless tie-broken junk
    (its own consumers stop at END, LanguageModel.lua:360-374)."""
    seq = np.array(seq)
    hits = np.nonzero(seq == END)[0]
    if hits.size:
        seq[hits[0]:] = END
    return seq


def test_beamsearch_matches_reference_recipe():
    cfg = lstm.LMConfig(vocab_size=17, seq_length=6,
                        input_encoding_size=20, rnn_size=24,
                        image_vector_dim=12)
    params = lstm.init_lm(jax.random.PRNGKey(0), cfg)
    vecs = jax.random.normal(jax.random.PRNGKey(1), (4, 12)) * 2.0
    END = cfg.vocab_size + 1

    for beam in (1, 3, 5):
        for early in (False, True):
            ours = np.asarray(lstm.beamsearch(params, vecs, cfg,
                                              beam_size=beam,
                                              early_exit=early))
            for i in range(4):
                ref = _canon(
                    _np_reference_beamsearch(params, vecs[i], cfg, beam),
                    END)
                np.testing.assert_array_equal(
                    ours[i], ref,
                    err_msg=f"beam={beam} image={i} early={early}",
                )


def test_beamsearch_early_exit_matches_fixed_scan():
    """The while_loop early exit must be token- and logprob-exact vs
    the fixed-length scan, including rows that never emit END and rows
    finishing at different steps."""
    cfg = lstm.LMConfig(vocab_size=11, seq_length=8,
                        input_encoding_size=16, rnn_size=16,
                        image_vector_dim=10)
    for seed in range(4):
        params = lstm.init_lm(jax.random.PRNGKey(seed), cfg)
        vecs = jax.random.normal(jax.random.PRNGKey(100 + seed),
                                 (6, 10)) * 3.0
        for beam in (1, 3):
            s_f, lp_f = lstm.beamsearch(params, vecs, cfg, beam_size=beam,
                                        return_logprobs=True,
                                        early_exit=False)
            s_e, lp_e = lstm.beamsearch(params, vecs, cfg, beam_size=beam,
                                        return_logprobs=True,
                                        early_exit=True)
            np.testing.assert_array_equal(np.asarray(s_f), np.asarray(s_e))
            np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_e),
                                       rtol=0, atol=1e-6)
