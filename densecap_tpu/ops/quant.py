"""int8 W8A8 dynamic quantization for the inference FC stacks.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs
197 TOPS); measured on this chip the flagship fc6 shape
(8192 x 25088 x 4096) drops 11.06 -> 6.00 ms (1.84x). The
quantization target is the VGG recognition head (fc6/fc7, ~120 M
params — the FLOPs-heavy FC stack of the inference program); the LM
vocab projection is supported but off by default (measured slower,
see quantize_for_inference). Everything that feeds mAP-critical
box/score outputs directly (RPN convs, objectness/box_reg branches)
stays in the bf16/f32 path.

Scheme (standard dynamic W8A8, no calibration data needed):
  * weights: symmetric per-OUTPUT-channel int8,
      scale_n = max_k |w[k, n]| / 127
  * activations: symmetric per-ROW (per-RoI) int8 computed on the fly,
      scale_m = max_k |x[m, k]| / 127
  * matmul accumulates int32; dequant is one fused elementwise
      out[m, n] = acc[m, n] * scale_m * scale_n + bias[n]

The quantized model is a PARAMS TRANSFORM, not a config switch:
`quantize_for_inference(params)` rewrites the chosen linear layers
from {"w", "b"} to {"w_q", "w_scale", "b"} and the model code
(vgg16.apply_recog, lstm._project) dispatches on the pytree
structure. jit specializes on the structure, so the quantized and
full-precision programs are separate compilations with zero overhead
on each other, and nothing inside jit consults a flag.

Inference-only: `jnp.round` has zero gradient almost everywhere, so
training through a quantized layer would silently starve it of
gradients — apply_recog asserts train=False on quantized params.

The reference has no quantized path at all (fp32 cudnn throughout);
this is a TPU-native serving capability on top of reference parity —
the bf16 path remains the default and the parity baseline.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# int8 symmetric range. 127 (not 128) keeps the grid symmetric so
# -amax and +amax quantize to -127/+127 exactly.
_QMAX = 127.0
# Floor for scales: an all-zero row/column (padded RoI slots, TP vocab
# padding) would otherwise divide by zero. Any tiny value works — the
# quantized values are all zero regardless.
_EPS = 1e-30


def quantize_linear(p):
    """{"w": (K, N) f32, "b": (N,)} -> {"w_q", "w_scale", "b"}.

    Symmetric per-output-channel: w_q[:, n] = round(w[:, n] / s_n),
    s_n = max_k |w[k, n]| / 127. Exact zeros stay exact zeros.
    """
    w = jnp.asarray(p["w"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _EPS) / _QMAX
    w_q = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    out = {"w_q": w_q, "w_scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = jnp.asarray(p["b"], jnp.float32)
    return out


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "w_q" in p


def qdot(x, p):
    """x: (..., K) float -> (..., N) f32 via int8 MXU matmul.

    Dynamically quantizes x per leading-row (all leading dims folded),
    runs int8 x int8 -> int32 on the MXU, and dequantizes with the
    fused outer product of row/channel scales. Output matches
    f32 `x @ w + b` to ~1% relative for well-scaled inputs
    (tests/test_quant.py bounds it).
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x2), axis=1), _EPS) / _QMAX  # (M,)
    x_q = jnp.clip(jnp.round(x2 / sx[:, None]), -_QMAX, _QMAX).astype(
        jnp.int8)
    acc = lax.dot_general(
        x_q, p["w_q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (M, N) int32
    out = acc.astype(jnp.float32) * sx[:, None] * p["w_scale"][None, :]
    if "b" in p:
        out = out + p["b"]
    return out.reshape(*lead, p["w_q"].shape[1])


def quantize_for_inference(params, quantize_lm_proj=False):
    """Quantize the heavy inference FCs of a DenseCap params pytree.

    Targets: recog.fc6, recog.fc7 — the 25088->4096->4096 recognition
    stack, measured 15.6 -> 12.9 ms/step at B=8x1000 RoIs on v5e
    (doc/BENCH.md int8 section). Leaves the trunk, RPN,
    objectness/box_reg branches, LSTM cell, embedding, image encoder,
    and (by default) the vocab projection untouched. Returns a NEW
    pytree; the input is not modified. Idempotent on already-quantized
    layers.

    quantize_lm_proj: also quantize lm.proj (512 x V+1, run every
    decode step). MEASURED SLOWER on v5e at flagship decode geometry
    (31.2 vs 27.9 ms worst-case decode): the per-step int32->f32
    dequant of the (8000, V+1) logits does not fuse into the matmul
    epilogue the way the bf16 path's bias add does, and the matmul
    itself is too small (82 GFLOP) for the int8 rate to recoup it.
    lstm._project supports it (dispatch + TP-padding mask are tested),
    so the switch exists for geometries where it wins, but the CLI
    "int8" mode leaves it off.
    """
    out = dict(params)
    if "recog" in out:
        recog = dict(out["recog"])
        for name in ("fc6", "fc7"):
            if name in recog and not is_quantized(recog[name]):
                recog[name] = quantize_linear(recog[name])
        out["recog"] = recog
    if quantize_lm_proj and "lm" in out:
        lm = dict(out["lm"])
        if "proj" in lm and not is_quantized(lm["proj"]):
            lm["proj"] = quantize_linear(lm["proj"])
        out["lm"] = lm
    return out
