"""int8 W8A8 quantized inference path (densecap_tpu/ops/quant.py).

The quantized model must (a) be numerically close to the f32/bf16 path
at the tensor level, (b) leave every mAP-critical branch untouched,
and (c) run end-to-end through forward_test with near-identical
captions. No reference counterpart exists (the reference is fp32
cudnn throughout); the baseline here is our own full-precision path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap, lstm
from densecap_tpu.models.vgg16 import apply_recog, init_recog
from densecap_tpu.ops import quant


def test_weight_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 48).astype(np.float32))
    qp = quant.quantize_linear({"w": w, "b": jnp.zeros((48,))})
    deq = qp["w_q"].astype(jnp.float32) * qp["w_scale"][None, :]
    # symmetric round-to-nearest: error <= scale/2 per element
    err = jnp.abs(deq - w)
    assert bool(jnp.all(err <= qp["w_scale"][None, :] * 0.5 + 1e-7))
    # exact zeros stay exact
    w2 = w.at[:, 0].set(0.0)
    qp2 = quant.quantize_linear({"w": w2})
    assert bool(jnp.all(qp2["w_q"][:, 0] == 0))


@pytest.mark.parametrize("K,N", [(256, 128), (25088, 512), (512, 1024)])
def test_qdot_close_to_f32(K, N):
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02)
    b = jnp.asarray(rng.randn(N).astype(np.float32) * 0.01)
    x = jnp.asarray(np.abs(rng.randn(16, K)).astype(np.float32))
    qp = quant.quantize_linear({"w": w, "b": b})
    ref = x @ w + b
    out = quant.qdot(x, qp)
    rel = jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
    assert float(rel) < 0.03, float(rel)


def test_qdot_zero_rows_and_leading_dims():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    qp = quant.quantize_linear({"w": w, "b": jnp.zeros((16,))})
    # all-zero rows (padded RoI slots) must produce exact zeros, no NaN
    x = jnp.zeros((4, 32))
    out = quant.qdot(x, qp)
    assert bool(jnp.all(out == 0.0))
    # folded leading dims match the 2D result
    x3 = jnp.asarray(rng.randn(3, 5, 32).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(quant.qdot(x3, qp)),
        np.asarray(quant.qdot(x3.reshape(15, 32), qp)).reshape(3, 5, 16),
        rtol=0, atol=0,
    )


def test_quantize_for_inference_structure():
    cfg = DenseCapConfig(image_size=64, vocab_size=20,
                         test_max_proposals=16)
    params = densecap.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_for_inference(params)
    # targets quantized
    for layer in (qparams["recog"]["fc6"], qparams["recog"]["fc7"]):
        assert quant.is_quantized(layer)
        assert layer["w_q"].dtype == jnp.int8
    # lm.proj only with the explicit (measured-slower-on-v5e) switch
    assert not quant.is_quantized(qparams["lm"]["proj"])
    qall = quant.quantize_for_inference(params, quantize_lm_proj=True)
    assert quant.is_quantized(qall["lm"]["proj"])
    # everything else untouched (identical objects)
    assert qparams["trunk1"] is params["trunk1"]
    assert qparams["rpn"] is params["rpn"]
    assert qparams["objectness"] is params["objectness"]
    assert qparams["box_reg"] is params["box_reg"]
    assert qparams["lm"] is params["lm"]
    assert qall["lm"]["lstm"] is params["lm"]["lstm"]
    assert qall["lm"]["embed"] is params["lm"]["embed"]
    # original pytree not mutated
    assert not quant.is_quantized(params["recog"]["fc6"])
    # idempotent
    q2 = quant.quantize_for_inference(qparams)
    assert q2["recog"]["fc6"]["w_q"] is qparams["recog"]["fc6"]["w_q"]


def test_apply_recog_quantized_close():
    rng = np.random.RandomState(3)
    recog = init_recog(jax.random.PRNGKey(1), in_dim=7 * 7 * 32,
                       fc_dim=64)
    feats = jnp.asarray(np.abs(rng.randn(8, 7, 7, 32)).astype(np.float32))
    ref = apply_recog(recog, feats, train=False,
                      compute_dtype=jnp.float32)
    qrecog = {k: quant.quantize_linear(v) for k, v in recog.items()}
    out = apply_recog(qrecog, feats, train=False,
                      compute_dtype=jnp.float32)
    rel = jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-9)
    assert float(rel) < 0.05, float(rel)
    # the training path must refuse quantized params (round() would
    # starve the weight gradients silently)
    with pytest.raises(AssertionError):
        apply_recog(qrecog, feats, train=True,
                    dropout_key=jax.random.PRNGKey(0))


def test_greedy_decode_quantized_token_agreement():
    cfg = lstm.LMConfig(vocab_size=50, seq_length=12,
                        input_encoding_size=32, rnn_size=32,
                        image_vector_dim=48)
    params = lstm.init_lm(jax.random.PRNGKey(4), cfg)
    # scale the projection up so logits are well-separated (random init
    # logits are near-tied, where 1% noise legitimately flips argmax)
    params["proj"]["w"] = params["proj"]["w"] * 4.0
    vecs = jnp.asarray(
        np.random.RandomState(5).randn(64, 48).astype(np.float32))
    ref = lstm.sample(params, vecs, cfg)
    qparams = dict(params, proj=quant.quantize_linear(params["proj"]))
    out = lstm.sample(qparams, vecs, cfg)
    agreement = float(jnp.mean((ref == out).astype(jnp.float32)))
    assert agreement >= 0.9, agreement


def test_project_quantized_respects_tp_vocab_mask():
    """Zero-padded vocab columns (TP padding) must never win argmax."""
    cfg = lstm.LMConfig(vocab_size=10, seq_length=5,
                        input_encoding_size=8, rnn_size=8,
                        image_vector_dim=8)
    params = lstm.init_lm(jax.random.PRNGKey(6), cfg)
    V = cfg.vocab_size
    pad = 5
    w = params["proj"]["w"]
    params["proj"] = {
        "w": jnp.pad(w, ((0, 0), (0, pad))),
        "b": jnp.pad(params["proj"]["b"], (0, pad)),
    }
    qparams = dict(params, proj=quant.quantize_linear(params["proj"]))
    h = jnp.asarray(
        np.random.RandomState(7).randn(16, 8).astype(np.float32))
    logits = lstm._project(qparams, h, jnp.float32)
    assert logits.shape[-1] == V + 1 + pad
    assert bool(jnp.all(jnp.argmax(logits, axis=-1) < V + 1))


def test_forward_test_quantized_end_to_end():
    """Quantized forward_test runs and its box path is EXACT.

    Boxes come from RPN + the (unquantized) box_reg branch applied to
    roi codes; codes shift ~1% under int8, so boxes/scores are compared
    with tolerance and validity/count must be NMS-stable at this seed.
    """
    cfg = DenseCapConfig(image_size=64, vocab_size=20,
                         test_max_proposals=12, test_pre_nms_topk=64,
                         fc_dim=64, rnn_size=16, rnn_encoding_size=16)
    params = densecap.init_params(jax.random.PRNGKey(8), cfg)
    # tame the random-init recog scale so activations stay sane
    for name in ("fc6", "fc7"):
        params["recog"][name]["w"] = params["recog"][name]["w"] * 0.05
    img = jnp.asarray(
        np.random.RandomState(9).rand(64, 64, 3).astype(np.float32))
    ref = densecap.forward_test(params, img, 64, 64, cfg)
    qparams = quant.quantize_for_inference(params)
    out = densecap.forward_test(qparams, img, 64, 64, cfg)
    assert out.boxes.shape == ref.boxes.shape
    assert bool(jnp.all(jnp.isfinite(out.scores)))
    # same NMS survivors at this seed -> same slots comparable
    assert int(out.num) == int(ref.num)
    m = np.asarray(ref.valid)
    rb, ob = np.asarray(ref.boxes)[m], np.asarray(out.boxes)[m]
    rel = np.linalg.norm(ob - rb) / (np.linalg.norm(rb) + 1e-9)
    assert rel < 0.05, rel
