"""Image-conditioned LSTM language model on lax.scan.

Re-design of reference LanguageModel.lua + torch-rnn's stateful nn.LSTM:
the reference mutates LSTM cell state across manual python-side steps
(remember_states, LanguageModel.lua:299-344); here training is one scan
over T+2 steps and decoding is a scan carrying (h, c, token) — a single
compiled program either way, batched over all RoIs (the reference's beam
search loops over images one at a time, LanguageModel.lua:190-282; ours
vmaps the whole batch).

Token scheme (LanguageModel.lua:32-34): words are 1..V,
START = END = V+1, NULL = V+2. The embedding table has V+2 rows
(1-indexed tokens -> row token-1); the output projection scores V+1
classes (class j (0-indexed) <-> token j+1).

Gate order is torch-rnn's (i, f, o, g) so t7 checkpoints convert by
simple concatenation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import quant


class LMConfig(NamedTuple):
    vocab_size: int
    seq_length: int
    input_encoding_size: int = 512
    rnn_size: int = 512
    image_vector_dim: int = 4096


def start_token(V):
    return V + 1


def null_token(V):
    return V + 2


def init_lm(key, cfg: LMConfig):
    V, W, H, D = (cfg.vocab_size, cfg.input_encoding_size, cfg.rnn_size,
                  cfg.image_vector_dim)
    ks = jax.random.split(key, 5)
    u = lambda k, shape, scale: jax.random.uniform(
        k, shape, minval=-scale, maxval=scale
    ).astype(jnp.float32)
    hscale = 1.0 / H ** 0.5
    return {
        "img_enc": {"w": u(ks[0], (D, W), 1.0 / D ** 0.5),
                    "b": jnp.zeros((W,), jnp.float32)},
        "embed": u(ks[1], (V + 2, W), 0.01),
        "lstm": {"Wx": u(ks[2], (W, 4 * H), hscale),
                 "Wh": u(ks[3], (H, 4 * H), hscale),
                 "b": jnp.zeros((4 * H,), jnp.float32)},
        "proj": {"w": u(ks[4], (H, V + 1), hscale),
                 "b": jnp.zeros((V + 1,), jnp.float32)},
    }


def _lstm_step(p, h, c, x, compute_dtype):
    gates = (
        jnp.dot(x.astype(compute_dtype), p["Wx"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(h.astype(compute_dtype), p["Wh"].astype(compute_dtype),
                  preferred_element_type=jnp.float32)
        + p["b"]
    )
    Hn = h.shape[-1]
    i = jax.nn.sigmoid(gates[..., 0 * Hn:1 * Hn])
    f = jax.nn.sigmoid(gates[..., 1 * Hn:2 * Hn])
    o = jax.nn.sigmoid(gates[..., 2 * Hn:3 * Hn])
    g = jnp.tanh(gates[..., 3 * Hn:4 * Hn])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return h2, c2


def _embed(params, tokens):
    """1-indexed tokens -> word vectors (row token-1, clamped for safety)."""
    idx = jnp.clip(tokens - 1, 0, params["embed"].shape[0] - 1)
    return params["embed"][idx]


def _encode_image(params, vectors, compute_dtype):
    p = params["img_enc"]
    x = jnp.dot(vectors.astype(compute_dtype), p["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32) + p["b"]
    return jax.nn.relu(x)


def _project(params, h, compute_dtype):
    p = params["proj"]
    if quant.is_quantized(p):
        # int8 serving path (ops/quant.py): the projection feeds
        # argmax/top_k/log_softmax, all robust to ~1% logit noise.
        logits = quant.qdot(h, p)
        width = p["w_q"].shape[-1]
    else:
        logits = jnp.dot(h.astype(compute_dtype),
                         p["w"].astype(compute_dtype),
                         preferred_element_type=jnp.float32) + p["b"]
        width = p["w"].shape[-1]
    # Under tensor parallelism the vocab dim is zero-padded to a multiple
    # of the model axis (parallel/mesh.py:pad_params_for_tp); mask padded
    # classes so argmax/top_k/softmax never see them. The true V+1 is
    # recoverable from the (never padded) V+2-row embed table.
    true_w = params["embed"].shape[0] - 1
    if width > true_w:
        mask = jnp.arange(width) < true_w
        logits = jnp.where(mask, logits, -1e30)
    return logits


def forward_train(params, image_vectors, gt_seq, cfg: LMConfig,
                  compute_dtype=jnp.float32):
    """Training forward: scores over T+2 steps.

    image_vectors: (P, D) RoI codes; gt_seq: (P, T) int tokens in [0, V]
    (0 = padding). Returns (P, T+2, V+1) scores.

    Input sequence construction (LanguageModel.lua:111-126): step 0 feeds
    the encoded image, step 1 feeds START, steps 2..T+1 feed gt tokens
    with 0 replaced by NULL.
    """
    P, T = gt_seq.shape
    V = cfg.vocab_size
    with_start = jnp.concatenate(
        [jnp.full((P, 1), start_token(V), dtype=gt_seq.dtype), gt_seq],
        axis=1,
    )
    with_start = jnp.where(with_start == 0, null_token(V), with_start)
    wordvecs = _embed(params, with_start)             # (P, T+1, W)
    img_vec = _encode_image(params, image_vectors, compute_dtype)
    xs = jnp.concatenate([img_vec[:, None, :], wordvecs], axis=1)

    H = cfg.rnn_size
    h0 = jnp.zeros((P, H), jnp.float32)
    c0 = jnp.zeros((P, H), jnp.float32)

    def step(carry, x_t):
        h, c = carry
        h2, c2 = _lstm_step(params["lstm"], h, c, x_t, compute_dtype)
        return (h2, c2), h2

    # Fully unrolled: T+2 <= 17 steps of (P, 512) matmuls are tiny and
    # the scan's per-step backward overhead dominates in isolation —
    # measured at the flagship train shape (1024 x 17) the unrolled
    # fwd+bwd runs 7.3 ms vs 10.0 ms rolled, while in the FULL train
    # step the difference hides behind XLA's cross-stage overlap and
    # the end-to-end delta is ~0 (doc/BENCH.md train-step profile).
    # Kept because it is free, identical math per step, and the
    # isolated win applies wherever the LM is the critical path.
    # (Hoisting x @ Wx out of the loop was also tried and LOSES badly
    # in the backward: 21.2 ms.)
    (_, _), hs = lax.scan(step, (h0, c0), jnp.swapaxes(xs, 0, 1),
                          unroll=xs.shape[1])
    hs = jnp.swapaxes(hs, 0, 1)                       # (P, T+2, H)
    return _project(params, hs, compute_dtype)


def get_target(gt_seq, vocab_size):
    """Build TemporalCrossEntropy targets (LanguageModel.lua:148-164).

    gt_seq: (P, T) ints in [0, V]. Returns (P, T+2): col 0 is 0 (image
    step, masked), cols 1..T copy gt, and the FIRST zero in cols 1..T+1
    becomes END. All following entries stay 0 (masked).
    """
    P, T = gt_seq.shape
    y = jnp.concatenate(
        [gt_seq, jnp.zeros((P, 1), dtype=gt_seq.dtype)], axis=1
    )  # (P, T+1)
    first_zero = jnp.argmax(y == 0, axis=1)  # first True; always exists
    y = y.at[jnp.arange(P), first_zero].set(
        jnp.asarray(start_token(vocab_size), dtype=y.dtype)
    )
    return jnp.concatenate([jnp.zeros((P, 1), dtype=y.dtype), y], axis=1)


def _greedy_decode(params, image_vectors, cfg: LMConfig, compute_dtype,
                   with_logprobs):
    """Greedy argmax decoding (LanguageModel.lua:293-348) with early exit.

    Captions average 5-8 of the T=15 steps, so a fixed-length scan
    wastes roughly half the decode FLOPs (measured 22% of the whole
    inference program, doc/BENCH.md stage table); a while_loop stops as
    soon as every row has emitted END.

    Canonical output convention: a row's tokens AFTER its first END are
    END (so unexecuted loop tail and still-running batchmates agree),
    and its logprobs after END are 0 — the reference beam path's own
    quirk (LanguageModel.lua:242-245). Tokens up to and including END
    match the fixed-length scan exactly.
    """
    P = image_vectors.shape[0]
    V, T, H = cfg.vocab_size, cfg.seq_length, cfg.rnn_size
    END = start_token(V)

    img_vec = _encode_image(params, image_vectors, compute_dtype)
    h0 = jnp.zeros((P, H), jnp.float32)
    c0 = jnp.zeros((P, H), jnp.float32)
    h, c = _lstm_step(params["lstm"], h0, c0, img_vec, compute_dtype)
    tok0 = jnp.full((P,), END, dtype=jnp.int32)       # START == END

    state = dict(
        t=jnp.zeros((), jnp.int32),
        h=h, c=c, tok=tok0,
        seq=jnp.full((T, P), END, dtype=jnp.int32),
        lps=jnp.zeros((T, P), jnp.float32),
        done=jnp.zeros((P,), bool),
    )

    def cond(st):
        return (st["t"] < T) & ~jnp.all(st["done"])

    def body(st):
        t, done = st["t"], st["done"]
        x = _embed(params, st["tok"])
        h2, c2 = _lstm_step(params["lstm"], st["h"], st["c"], x,
                            compute_dtype)
        scores = _project(params, h2, compute_dtype)  # (P, V+1)
        nxt0 = jnp.argmax(scores, axis=-1)
        nxt = jnp.where(done, END, (nxt0 + 1).astype(jnp.int32))
        seq = lax.dynamic_update_index_in_dim(st["seq"], nxt, t, 0)
        lps = st["lps"]
        if with_logprobs:
            logp = jax.nn.log_softmax(scores, axis=-1)
            lp = jnp.take_along_axis(logp, nxt0[:, None], axis=-1)[:, 0]
            lps = lax.dynamic_update_index_in_dim(
                lps, jnp.where(done, 0.0, lp), t, 0)
        return dict(t=t + 1, h=h2, c=c2, tok=nxt, seq=seq, lps=lps,
                    done=done | (nxt == END))

    st = lax.while_loop(cond, body, state)
    seq = jnp.swapaxes(st["seq"], 0, 1)               # (P, T)
    if with_logprobs:
        return seq, jnp.swapaxes(st["lps"], 0, 1)
    return seq


def sample(params, image_vectors, cfg: LMConfig,
           compute_dtype=jnp.float32):
    """Greedy argmax decoding. image_vectors: (P, D). Returns (P, T)
    int32 tokens in [1, V+1]; END repeats after a row's first END."""
    return _greedy_decode(params, image_vectors, cfg, compute_dtype,
                          with_logprobs=False)


def sample_with_logprobs(params, image_vectors, cfg: LMConfig,
                         compute_dtype=jnp.float32):
    """Greedy decode also returning per-step chosen log-probabilities
    (0 after a row's END, matching the beam path's convention)."""
    return _greedy_decode(params, image_vectors, cfg, compute_dtype,
                          with_logprobs=True)


def beamsearch(params, image_vectors, cfg: LMConfig, beam_size=20,
               compute_dtype=jnp.float32, return_logprobs=False,
               early_exit=True):
    """Batched beam search (LanguageModel.lua:170-290).

    The reference runs one image at a time, using the minibatch dim for
    beams; we vmap images so the whole batch decodes in one program.
    Matches the reference's scoring quirk: once a beam emits END, later
    steps contribute 0 logprob (not -inf), LanguageModel.lua:242-245.

    early_exit=True (default) runs the step loop as a while_loop that
    stops once EVERY beam of EVERY row has emitted END — trained
    captions average ~6 of T=15 steps, so the fixed-length loop wastes
    most of beam decode by construction (greedy's measured early exit:
    +6.94 ms/step). early_exit=False keeps the fixed lax.scan (the
    original formulation, used as the parity oracle in tests).

    Canonical output convention (same as greedy): a row's tokens AFTER
    its first END are END, and its logprobs after END are 0 (the
    reference quirk already zeroes them) — this makes the two loop
    forms token-EXACT against each other: steps skipped by the early
    exit only ever rewrite post-END positions, which both forms
    canonicalize away. Returns (P, T) int32 tokens; with
    return_logprobs also the winning beam's per-token logprobs (P, T)
    f32; their sum is the beam score.
    """
    V, T, H = cfg.vocab_size, cfg.seq_length, cfg.rnn_size
    B = beam_size
    END = start_token(V)
    P = image_vectors.shape[0]

    img_vecs = _encode_image(params, image_vectors, compute_dtype)  # (P, W)

    # Beams folded into the batch dim: LSTM steps and vocab projections
    # run on (P*B, .) matrices inside ONE scan — round 2's
    # vmap(per-image scan) structure compiled for ~8 minutes at flagship
    # geometry and ran 0.44 s/image; this is the same math (identical
    # flattened-candidate tie-breaking) in a single batched program.
    h0 = jnp.zeros((P, H), jnp.float32)
    c0 = jnp.zeros((P, H), jnp.float32)
    h, c = _lstm_step(params["lstm"], h0, c0, img_vecs, compute_dtype)
    x = _embed(params, jnp.full((P,), END, dtype=jnp.int32))
    h, c = _lstm_step(params["lstm"], h, c, x, compute_dtype)
    logp0 = jax.nn.log_softmax(
        _project(params, h, compute_dtype), axis=-1)     # (P, V+1)
    beam_lp, idx0 = lax.top_k(logp0, B)                  # (P, B)
    beams = jnp.ones((P, B, T), dtype=jnp.int32)
    beams = beams.at[:, :, 0].set((idx0 + 1).astype(jnp.int32))
    lp_hist = jnp.zeros((P, B, T), jnp.float32).at[:, :, 0].set(beam_lp)
    hB = jnp.broadcast_to(h[:, None], (P, B, H)).reshape(P * B, H)
    cB = jnp.broadcast_to(c[:, None], (P, B, H)).reshape(P * B, H)

    def step_body(t, carry):
        beams, beam_lp, lp_hist, h, c = carry
        words = lax.dynamic_index_in_dim(
            beams, t - 1, axis=2, keepdims=False)        # (P, B)
        x = _embed(params, words.reshape(P * B))
        h2, c2 = _lstm_step(params["lstm"], h, c, x, compute_dtype)
        scores = _project(params, h2, compute_dtype)     # (P*B, V+1) f32
        # Per-beam top-k on the RAW logits, 2D: log_softmax is a
        # per-row monotone shift so the indices/order are identical,
        # and the (P, B, V+1) top_k lowers ~6x slower on TPU than the
        # flat (P*B, V+1) form (30.4 vs 5.4 ms at flagship geometry);
        # the shift is applied to just the k survivors via logsumexp.
        top_raw, top_words = lax.top_k(scores, B)        # (P*B, B)
        lse = jax.scipy.special.logsumexp(scores, axis=-1)
        top_lp = (top_raw - lse[:, None]).reshape(P, B, B)
        top_words = top_words.reshape(P, B, B)
        # reference quirk: finished beams contribute 0, not -inf, for
        # EVERY word (LanguageModel.lua:242-245) — and a stable top-k
        # of an all-equal row picks words 0..B-1 in order
        unfinished = ~jnp.any(beams == END, axis=2)      # (P, B)
        alive = unfinished[:, :, None]
        top_lp = jnp.where(alive, top_lp, 0.0)
        top_words = jnp.where(alive, top_words,
                              jnp.arange(B, dtype=top_words.dtype))
        cand = beam_lp[:, :, None] + top_lp              # (P, B, B)
        new_lp, flat_idx = lax.top_k(cand.reshape(P, B * B), B)
        src_beam = flat_idx // B                         # (P, B)
        word0 = jnp.take_along_axis(
            top_words.reshape(P, B * B), flat_idx, axis=1)
        new_beams = jnp.take_along_axis(
            beams, src_beam[:, :, None], axis=1
        ).at[:, :, t].set((word0 + 1).astype(jnp.int32))
        step_lp = new_lp - jnp.take_along_axis(beam_lp, src_beam, axis=1)
        new_hist = jnp.take_along_axis(
            lp_hist, src_beam[:, :, None], axis=1
        ).at[:, :, t].set(step_lp)
        gather = (src_beam + B * jnp.arange(P)[:, None]).reshape(-1)
        return (new_beams, new_lp, new_hist, h2[gather], c2[gather])

    if early_exit:
        def cond(st):
            t, carry = st
            return (t < T) & ~jnp.all(jnp.any(carry[0] == END, axis=2))

        def body(st):
            t, carry = st
            return t + 1, step_body(t, carry)

        _, (beams, beam_lp, lp_hist, _, _) = lax.while_loop(
            cond, body,
            (jnp.ones((), jnp.int32), (beams, beam_lp, lp_hist, hB, cB)),
        )
    else:
        (beams, beam_lp, lp_hist, _, _), _ = lax.scan(
            lambda c, t: (step_body(t, c), None),
            (beams, beam_lp, lp_hist, hB, cB), jnp.arange(1, T)
        )
    best = jnp.argmax(beam_lp, axis=1)                   # (P,)
    seq = jnp.take_along_axis(beams, best[:, None, None], axis=1)[:, 0]
    lps = jnp.take_along_axis(lp_hist, best[:, None, None], axis=1)[:, 0]
    # canonicalize: END-fill past each row's first END (docstring above)
    pos = jnp.arange(T)
    first_end = jnp.argmax(seq == END, axis=1)
    after = jnp.any(seq == END, axis=1)[:, None] & (
        pos[None, :] > first_end[:, None])
    seq = jnp.where(after, END, seq)
    lps = jnp.where(after, 0.0, lps)
    if return_logprobs:
        return seq, lps
    return seq
