"""Full pretrained-checkpoint conversion tests.

Layout validation strategy (VERDICT round-1 item 1): build a miniature
but structurally faithful DenseCap t7 checkpoint — localization layer
RPN Sequential (conv/ReLU/ConcatTable branches), objectness/box_reg
Linears, LanguageModel with torch-rnn fused-LSTM weights — write it in
torch serialization format, extract + convert, then check every mapped
tensor two ways:

  1. exact array equality against the expected transpose/slice of the
     raw torch tensors (gate order, NCHW->HWIO, Linear transpose);
  2. numerics: run the torch-side computation (conv2d via torch, LSTM
     emulated with the fused (D+H, 4H) i,f,o,g layout exactly as
     torch-rnn's LSTM.lua) and our JAX functions with the converted
     params on the same inputs — outputs must agree.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densecap_tpu.models import lstm
from densecap_tpu.models.rpn import apply_rpn
from densecap_tpu.utils import t7_reader as t7
from densecap_tpu.utils.checkpoint import convert_torch_densecap

from test_t7_reader import _Writer, _mini_densecap_t7

# mini dimensions
RPN_IN, RPN_NF, K = 16, 8, 3
FC_DIM = 32
ENC_W, RNN_H, VOCAB = 10, 7, 19
SEQ_LEN = 4


def _seq(mods):
    return t7.TorchObject("nn.Sequential", {"modules": mods})


def _concat(mods):
    return t7.TorchObject("nn.ConcatTable", {"modules": mods})


def _conv(rng, cout, cin, k):
    return t7.TorchObject("cudnn.SpatialConvolution", {
        "weight": rng.randn(cout, cin, k, k).astype(np.float32) * 0.1,
        "bias": rng.randn(cout).astype(np.float32) * 0.1,
        "kW": k, "kH": k, "nInputPlane": cin,
    })


def _linear(rng, cout, cin):
    return t7.TorchObject("nn.Linear", {
        "weight": rng.randn(cout, cin).astype(np.float32) * 0.1,
        "bias": rng.randn(cout).astype(np.float32) * 0.1,
    })


def _full_densecap_t7(rng):
    """The VGG part from test_t7_reader plus RPN/branches/LM, mirroring
    the module tree built at DenseCapModel.lua:50-113 +
    LocalizationLayer.lua:609-690 + LanguageModel.lua:27-61."""
    ckpt = _mini_densecap_t7()
    nets = ckpt["model"]["nets"]

    # RPN: Sequential[conv3x3, ReLU, ConcatTable[box_branch, rpn_branch]]
    box_branch = _seq([
        _conv(rng, 4 * K, RPN_NF, 1),
        t7.TorchObject("nn.RegularizeLayer", {}),
        _concat([_seq([t7.TorchObject("nn.MakeAnchors", {}),
                       t7.TorchObject("nn.ReshapeBoxFeatures", {})]),
                 t7.TorchObject("nn.ReshapeBoxFeatures", {})]),
        _concat([t7.TorchObject("nn.ApplyBoxTransform", {}),
                 t7.TorchObject("nn.Identity", {})]),
    ])
    rpn_branch = _seq([_conv(rng, 2 * K, RPN_NF, 1),
                       t7.TorchObject("nn.ReshapeBoxFeatures", {})])
    rpn = _seq([_conv(rng, RPN_NF, RPN_IN, 3),
                t7.TorchObject("cudnn.ReLU", {}),
                _concat([box_branch, rpn_branch]),
                t7.TorchObject("nn.FlattenTable", {})])
    nets["localization_layer"] = t7.TorchObject(
        "nn.LocalizationLayer", {"nets": {"rpn": rpn}})

    nets["objectness_branch"] = _linear(rng, 1, FC_DIM)
    nets["box_reg_branch"] = _linear(rng, 4, FC_DIM)

    image_encoder = _seq([_linear(rng, ENC_W, FC_DIM),
                          t7.TorchObject("nn.ReLU", {}),
                          t7.TorchObject("nn.View", {})])
    lookup = t7.TorchObject("nn.LookupTable", {
        "weight": rng.randn(VOCAB + 2, ENC_W).astype(np.float32) * 0.1,
    })
    lstm_mod = t7.TorchObject("nn.LSTM", {
        "weight": rng.randn(ENC_W + RNN_H, 4 * RNN_H).astype(
            np.float32) * 0.1,
        "bias": rng.randn(4 * RNN_H).astype(np.float32) * 0.1,
    })
    rnn = _seq([lstm_mod, t7.TorchObject("nn.View", {}),
                _linear(rng, VOCAB + 1, RNN_H),
                t7.TorchObject("nn.View", {})])
    nets["language_model"] = t7.TorchObject("nn.LanguageModel", {
        "image_encoder": image_encoder,
        "lookup_table": lookup,
        "rnn": rnn,
        "idx_to_token": {i: f"word{i}" for i in range(1, VOCAB + 1)},
    })
    return ckpt


@pytest.fixture(scope="module")
def converted():
    rng = np.random.RandomState(7)
    ckpt_obj = _full_densecap_t7(rng)
    w = _Writer()
    w.write(ckpt_obj)
    loaded = t7.T7Reader(io.BytesIO(w.getvalue())).read_object()
    weights = t7.extract_full_densecap_weights(loaded)
    params, info = convert_torch_densecap(weights, out_hw=(7, 7))
    return weights, params, info


def test_extraction_finds_every_tensor(converted):
    weights, _, _ = converted
    expected = {
        "rpn_conv", "rpn_box", "rpn_score", "objectness", "box_reg",
        "lm_image_encoder", "lm_lstm", "lm_proj",
    }
    for name in expected:
        assert f"{name}.weight" in weights, name
        assert f"{name}.bias" in weights, name
    assert "lm_lookup.weight" in weights
    assert weights["rpn_conv.weight"].shape == (RPN_NF, RPN_IN, 3, 3)
    assert weights["rpn_box.weight"].shape == (4 * K, RPN_NF, 1, 1)
    assert weights["rpn_score.weight"].shape == (2 * K, RPN_NF, 1, 1)
    assert weights["lm_lstm.weight"].shape == (ENC_W + RNN_H, 4 * RNN_H)
    assert weights["lm_proj.weight"].shape == (VOCAB + 1, RNN_H)


def test_idx_to_token_extraction():
    rng = np.random.RandomState(7)
    w = _Writer()
    w.write(_full_densecap_t7(rng))
    loaded = t7.T7Reader(io.BytesIO(w.getvalue())).read_object()
    vocab = t7.extract_idx_to_token(loaded)
    assert len(vocab) == VOCAB
    assert vocab[1] == "word1" and vocab[VOCAB] == f"word{VOCAB}"


def test_derived_info(converted):
    _, _, info = converted
    assert info == {
        "vocab_size": VOCAB, "num_anchors": K,
        "rpn_num_filters": RPN_NF, "rnn_size": RNN_H,
        "rnn_encoding_size": ENC_W, "fc_dim": FC_DIM,
    }


def test_exact_layout_mapping(converted):
    weights, params, _ = converted
    # convs: NCHW -> HWIO
    np.testing.assert_array_equal(
        params["rpn"]["conv"]["w"],
        weights["rpn_conv.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        params["rpn"]["box"]["w"],
        weights["rpn_box.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        params["rpn"]["score"]["b"], weights["rpn_score.bias"])
    # linears: (out, in) -> (in, out)
    np.testing.assert_array_equal(
        params["objectness"]["w"], weights["objectness.weight"].T)
    np.testing.assert_array_equal(
        params["box_reg"]["w"], weights["box_reg.weight"].T)
    np.testing.assert_array_equal(
        params["lm"]["img_enc"]["w"], weights["lm_image_encoder.weight"].T)
    np.testing.assert_array_equal(
        params["lm"]["proj"]["w"], weights["lm_proj.weight"].T)
    # lookup rows as-is
    np.testing.assert_array_equal(
        params["lm"]["embed"], weights["lm_lookup.weight"])
    # fused LSTM weight: rows 0..D-1 = Wx, D.. = Wh
    np.testing.assert_array_equal(
        params["lm"]["lstm"]["Wx"], weights["lm_lstm.weight"][:ENC_W])
    np.testing.assert_array_equal(
        params["lm"]["lstm"]["Wh"], weights["lm_lstm.weight"][ENC_W:])
    np.testing.assert_array_equal(
        params["lm"]["lstm"]["b"], weights["lm_lstm.bias"])


def test_rpn_conversion_matches_torch_conv(converted):
    """Converted RPN heads through apply_rpn == torch NCHW convs +
    the reference's ReshapeBoxFeatures permutation (k-major grouping,
    ReshapeBoxFeatures.lua:30)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    weights, params, _ = converted
    rng = np.random.RandomState(11)
    Hf, Wf = 5, 6
    feats = rng.randn(RPN_IN, Hf, Wf).astype(np.float32)

    x = torch.from_numpy(feats[None])
    hid = F.relu(F.conv2d(x, torch.from_numpy(weights["rpn_conv.weight"]),
                          torch.from_numpy(weights["rpn_conv.bias"]),
                          padding=1))
    box = F.conv2d(hid, torch.from_numpy(weights["rpn_box.weight"]),
                   torch.from_numpy(weights["rpn_box.bias"]))
    score = F.conv2d(hid, torch.from_numpy(weights["rpn_score.weight"]),
                     torch.from_numpy(weights["rpn_score.bias"]))

    def ref_reshape(t, k):          # (1, D*k, H, W) -> (k*H*W, D)
        arr = t.numpy()[0]
        D = arr.shape[0] // k
        return arr.reshape(k, D, Hf, Wf).transpose(0, 2, 3, 1).reshape(
            k * Hf * Wf, D)

    anchors = jnp.asarray(rng.rand(K, 2).astype(np.float32) * 50 + 10)
    out = apply_rpn(
        jax.tree_util.tree_map(jnp.asarray, params["rpn"]),
        jnp.asarray(feats.transpose(1, 2, 0)), anchors,
        (8.5, 8.5, 16.0, 16.0), compute_dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(out.trans),
                               ref_reshape(box, K), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.scores),
                               ref_reshape(score, K), rtol=1e-4, atol=1e-4)


def test_lm_conversion_matches_torch_rnn_forward(converted):
    """forward_train with converted LM params == a numpy transliteration
    of the reference LanguageModel forward (LanguageModel.lua:106-126)
    over torch-layout weights: fused (D+H, 4H) LSTM in (i, f, o, g)
    order, image step + START prepend + NULL substitution."""
    weights, params, _ = converted
    rng = np.random.RandomState(13)
    P = 5
    img_vecs = rng.randn(P, FC_DIM).astype(np.float32)
    gt = rng.randint(0, VOCAB + 1, size=(P, SEQ_LEN)).astype(np.int32)
    gt[:, -1] = 0  # ensure padding occurs
    gt[0, 1:] = 0

    # --- numpy reference over torch-layout weights
    enc_w = weights["lm_image_encoder.weight"]   # (W, D)
    enc_b = weights["lm_image_encoder.bias"]
    lookup = weights["lm_lookup.weight"]         # (V+2, W)
    lw, lb = weights["lm_lstm.weight"], weights["lm_lstm.bias"]
    pw, pb = weights["lm_proj.weight"], weights["lm_proj.bias"]

    START, NULL = VOCAB + 1, VOCAB + 2
    img_enc = np.maximum(img_vecs @ enc_w.T + enc_b, 0)   # (P, W)
    toks = np.concatenate(
        [np.full((P, 1), START, np.int32), gt], axis=1)
    toks = np.where(toks == 0, NULL, toks)
    xs = np.concatenate(
        [img_enc[:, None], lookup[toks - 1]], axis=1)     # (P, T+2, W)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np.zeros((P, RNN_H), np.float32)
    c = np.zeros((P, RNN_H), np.float32)
    ref_scores = []
    for tstep in range(SEQ_LEN + 2):
        x_t = xs[:, tstep]
        gates = x_t @ lw[:ENC_W] + h @ lw[ENC_W:] + lb
        i = sig(gates[:, :RNN_H])
        f = sig(gates[:, RNN_H:2 * RNN_H])
        o = sig(gates[:, 2 * RNN_H:3 * RNN_H])
        g = np.tanh(gates[:, 3 * RNN_H:])
        c = f * c + i * g
        h = o * np.tanh(c)
        ref_scores.append(h @ pw.T + pb)
    ref = np.stack(ref_scores, axis=1)                    # (P, T+2, V+1)

    cfg = lstm.LMConfig(vocab_size=VOCAB, seq_length=SEQ_LEN,
                        input_encoding_size=ENC_W, rnn_size=RNN_H,
                        image_vector_dim=FC_DIM)
    got = lstm.forward_train(
        jax.tree_util.tree_map(jnp.asarray, params["lm"]),
        jnp.asarray(img_vecs), jnp.asarray(gt), cfg,
        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_converted_tree_matches_init_structure(converted):
    """Converted params have exactly the pytree paths init_params makes
    (so train/infer code paths accept them unchanged)."""
    from densecap_tpu.config import DenseCapConfig
    from densecap_tpu.models import densecap

    _, params, info = converted
    cfg = DenseCapConfig(vocab_size=info["vocab_size"], seq_length=SEQ_LEN)
    fresh = densecap.init_params(jax.random.PRNGKey(0), cfg)

    def paths(tree):
        return {jax.tree_util.keystr(kp)
                for kp, _ in jax.tree_util.tree_leaves_with_path(tree)}

    # trunk convs in the mini fixture have VGG names; compare full sets
    assert paths(params) == paths(fresh)
