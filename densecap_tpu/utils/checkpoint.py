"""Checkpoint save/load + legacy weight conversion.

Replaces the reference's torch.save of the whole mutated model object
(train.lua:171-197 — which had to clearState/float/de-cudnnify the
graph, and silently DROPPED adam state, train.lua:114-115): here a
checkpoint is params + full optimizer state + step, so resume is exact.

Uses orbax when available, with an npz fallback that round-trips the
pytree by path-flattened keys.

Legacy conversion (net_utils.lua:7-24 loadcaffe / the released 1.2 GB
.t7): `convert_torch_vgg16` maps a {name -> tensor} dict of torch
layout weights into our pytree, handling NCHW->HWIO kernel transposes
and the channel-major fc6 flatten order. Reading .t7/.caffemodel files
requires `torchfile`/`caffe` which are not in this image — the function
takes plain numpy dicts so any host that can read those formats can
produce the input.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path, params, extra=None):
    """Save a (possibly nested dict) param pytree to one .npz file."""
    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))
    if extra:
        for k, v in extra.items():
            flat[f"__extra__/{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path):
    """Load params saved by save_params. Returns (params, extra)."""
    data = np.load(path, allow_pickle=False)
    flat, extra = {}, {}
    for k in data.files:
        if k.startswith("__extra__/"):
            extra[k[len("__extra__/"):]] = data[k]
        else:
            flat[k] = data[k]
    return _unflatten(flat), extra


def save_train_state(dirpath, state, step=None):
    """Full train state via orbax (params + opt state + counters)."""
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else int(step)
    path = os.path.abspath(os.path.join(dirpath, f"step_{step}"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state._asdict()))
    return path


def load_train_state(path, template_state):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        item=jax.tree_util.tree_map(np.asarray, template_state._asdict()),
    )
    return type(template_state)(**restored)


# ---------------------------------------------------------------------------
# Legacy torch/caffe VGG-16 conversion
# ---------------------------------------------------------------------------

# our conv names in torch's 1-based Sequential order (loadcaffe VGG-16)
_VGG_CONV_ORDER = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
]

# torchvision vgg16 state_dict layer indices -> our names, so
# {k: v.numpy() for k, v in tv_state_dict.items()} renames straight
# into convert_torch_vgg16's expected keys
_TORCHVISION_VGG16 = {
    "features.0": "conv1_1", "features.2": "conv1_2",
    "features.5": "conv2_1", "features.7": "conv2_2",
    "features.10": "conv3_1", "features.12": "conv3_2",
    "features.14": "conv3_3",
    "features.17": "conv4_1", "features.19": "conv4_2",
    "features.21": "conv4_3",
    "features.24": "conv5_1", "features.26": "conv5_2",
    "features.28": "conv5_3",
    "classifier.0": "fc6", "classifier.3": "fc7",
}


def rename_torchvision_vgg16(state_dict):
    """torchvision vgg16 {features.N.weight: array} -> our naming.

    NOTE: torchvision's VGG is RGB-input with 0..1-normalized images;
    the reference caffemodel is BGR with 0..255 - mean inputs (the
    convention this framework keeps). When initializing from torchvision
    weights, flip conv1_1's input-channel order and rescale:
    w[:, :, ::-1, ...] * (1/255-ish normalization folding is NOT done
    here — document/verify per weight source).
    """
    out = {}
    for key, arr in state_dict.items():
        base, _, kind = key.rpartition(".")
        if base in _TORCHVISION_VGG16 and kind in ("weight", "bias"):
            out[f"{_TORCHVISION_VGG16[base]}.{kind}"] = arr
    return out


def convert_torch_vgg16(weights, out_hw=(7, 7)):
    """{name: np.ndarray} torch-layout VGG-16 -> our trunk/recog pytrees.

    Expected keys: '<conv_name>.weight' (Cout, Cin, kh, kw) and '.bias';
    'fc6.weight' (4096, 25088), 'fc6.bias', 'fc7.weight' (4096, 4096),
    'fc7.bias'. Returns (trunk1, trunk2, recog) param dicts.

    fc6's input flatten order is torch channel-major (C, H, W); our RoI
    features flatten NHWC (H, W, C) — the weight's input dim is permuted
    accordingly.
    """
    def conv(name):
        w = weights[f"{name}.weight"]          # (Cout, Cin, kh, kw)
        b = weights[f"{name}.bias"]
        return {
            "w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),  # HWIO
            "b": b.astype(np.float32),
        }

    trunk1 = {n: conv(n) for n in _VGG_CONV_ORDER[:4]}
    trunk2 = {n: conv(n) for n in _VGG_CONV_ORDER[4:]}

    H, W = out_hw
    C = weights["fc6.weight"].shape[1] // (H * W)
    w6 = weights["fc6.weight"].astype(np.float32)       # (4096, C*H*W)
    # torch input index = c*H*W + y*W + x; ours = y*W*C + x*C + c
    w6 = w6.reshape(-1, C, H, W).transpose(0, 2, 3, 1).reshape(w6.shape[0], -1)
    recog = {
        "fc6": {"w": w6.T.copy(), "b": weights["fc6.bias"].astype(np.float32)},
        "fc7": {"w": weights["fc7.weight"].astype(np.float32).T.copy(),
                "b": weights["fc7.bias"].astype(np.float32)},
    }
    return trunk1, trunk2, recog


def _conv_hwio(weights, name):
    w = weights[f"{name}.weight"]                       # (Cout, Cin, kh, kw)
    return {"w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32).copy(),
            "b": weights[f"{name}.bias"].astype(np.float32)}


def _linear_t(weights, name):
    w = weights[f"{name}.weight"]                       # (out, in) torch
    return {"w": w.astype(np.float32).T.copy(),
            "b": weights[f"{name}.bias"].astype(np.float32)}


def convert_torch_densecap(weights, out_hw=(7, 7)):
    """Full torch-layout DenseCap weights -> complete params pytree.

    Input is the flat dict from t7_reader.extract_full_densecap_weights
    (VGG names + rpn_conv/rpn_box/rpn_score, objectness, box_reg,
    lm_image_encoder, lm_lookup, lm_lstm, lm_proj). Returns
    (params, info) where params matches models.densecap.init_params and
    info carries dimensions derived from the tensors themselves
    (vocab_size, num_anchors, rnn sizes) for config validation.

    Layout mapping per tensor:
      * convs: torch (Cout, Cin, kh, kw) -> HWIO (identical channel
        semantics: both frameworks group the box/score head channels as
        (anchor, dim) — ReshapeBoxFeatures.lua:30 `view(N, k, D, H, W)`
        vs ops/transforms.reshape_box_features's `.reshape(H, W, k, D)`).
      * Linears: torch (out, in) -> ours (in, out) transpose.
      * LookupTable: (V+2, W) copied as-is (row token-1 indexing both).
      * torch-rnn nn.LSTM: one fused (D+H, 4H) weight, gate order
        (i, f, o, g); rows 0..D-1 are Wx, rows D.. are Wh — our cell
        keeps the same gate order (models/lstm.py:_lstm_step) so the
        split is a plain row slice.
    """
    trunk1, trunk2, recog = convert_torch_vgg16(weights, out_hw=out_hw)

    rpn = {"conv": _conv_hwio(weights, "rpn_conv"),
           "box": _conv_hwio(weights, "rpn_box"),
           "score": _conv_hwio(weights, "rpn_score")}

    enc_w = weights["lm_image_encoder.weight"]          # (W, D)
    W_enc = enc_w.shape[0]
    lstm_w = weights["lm_lstm.weight"].astype(np.float32)   # (D+H, 4H)
    H_rnn = lstm_w.shape[1] // 4
    lm = {
        "img_enc": _linear_t(weights, "lm_image_encoder"),
        "embed": weights["lm_lookup.weight"].astype(np.float32).copy(),
        "lstm": {"Wx": lstm_w[:W_enc].copy(),
                 "Wh": lstm_w[W_enc:].copy(),
                 "b": weights["lm_lstm.bias"].astype(np.float32)},
        "proj": _linear_t(weights, "lm_proj"),
    }

    params = {
        "trunk1": trunk1,
        "trunk2": trunk2,
        "rpn": rpn,
        "recog": recog,
        "objectness": _linear_t(weights, "objectness"),
        "box_reg": _linear_t(weights, "box_reg"),
        "lm": lm,
    }
    info = {
        "vocab_size": int(weights["lm_lookup.weight"].shape[0] - 2),
        "num_anchors": int(weights["rpn_box.weight"].shape[0] // 4),
        "rpn_num_filters": int(weights["rpn_conv.weight"].shape[0]),
        "rnn_size": int(H_rnn),
        "rnn_encoding_size": int(W_enc),
        "fc_dim": int(weights["fc7.weight"].shape[0]),
    }
    return params, info
