"""Legacy weight conversion parity: run a torch (NCHW) conv/fc stack and
our (NHWC) trunk/recog with converted weights on the same input — the
outputs must match. This pins down the kernel transposes and the
channel-major fc6 flatten permutation in convert_torch_vgg16 without
needing the actual 1.2 GB t7 file."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from densecap_tpu.models.vgg16 import apply_recog, apply_trunk
from densecap_tpu.utils.checkpoint import (
    convert_torch_vgg16,
    load_params,
    save_params,
)

# a miniature VGG: conv1_1/conv1_2/pool conv2_1/conv2_2/pool + fc6/fc7
MINI_CFG1 = [("conv1_1", 8), ("conv1_2", 8), "M",
             ("conv2_1", 16), ("conv2_2", 16), "M"]
MINI_CFG2 = [("conv3_1", 16), ("conv3_2", 16), ("conv3_3", 16), "M",
             ("conv4_1", 16), ("conv4_2", 16), ("conv4_3", 16), "M",
             ("conv5_1", 16), ("conv5_2", 16), ("conv5_3", 16)]


def _torch_weights(seed=0):
    rng = np.random.RandomState(seed)
    weights = {}
    cin = 3
    for item in MINI_CFG1 + MINI_CFG2:
        if item == "M":
            continue
        name, cout = item
        weights[f"{name}.weight"] = rng.randn(cout, cin, 3, 3).astype(
            np.float32) * 0.1
        weights[f"{name}.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        cin = cout
    H = W = 7
    weights["fc6.weight"] = rng.randn(32, cin * H * W).astype(
        np.float32) * 0.02
    weights["fc6.bias"] = rng.randn(32).astype(np.float32) * 0.1
    weights["fc7.weight"] = rng.randn(32, 32).astype(np.float32) * 0.1
    weights["fc7.bias"] = rng.randn(32).astype(np.float32) * 0.1
    return weights


def _torch_forward(weights, x_nchw):
    import torch.nn.functional as F

    x = torch.from_numpy(x_nchw)
    for item in MINI_CFG1 + MINI_CFG2:
        if item == "M":
            x = F.max_pool2d(x, 2, 2)
            continue
        name, _ = item
        x = F.conv2d(x, torch.from_numpy(weights[f"{name}.weight"]),
                     torch.from_numpy(weights[f"{name}.bias"]), padding=1)
        x = F.relu(x)
    return x.numpy()


def test_trunk_conversion_matches_torch():
    weights = _torch_weights()
    trunk1, trunk2, recog = convert_torch_vgg16(weights, out_hw=(7, 7))

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)

    ref = _torch_forward(weights, x)  # (1, C, 8, 8)

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    y = apply_trunk(trunk1, MINI_CFG1, x_nhwc, jnp.float32)
    y = apply_trunk(trunk2, MINI_CFG2, y, jnp.float32)
    got = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_fc_conversion_matches_torch_flatten_order():
    weights = _torch_weights()
    _, _, recog = convert_torch_vgg16(weights, out_hw=(7, 7))

    rng = np.random.RandomState(2)
    C = 16
    roi_chw = rng.randn(2, C, 7, 7).astype(np.float32)

    # torch: flatten channel-major then fc6 -> relu -> fc7 -> relu
    flat = roi_chw.reshape(2, -1)
    t = np.maximum(flat @ weights["fc6.weight"].T + weights["fc6.bias"], 0)
    ref = np.maximum(t @ weights["fc7.weight"].T + weights["fc7.bias"], 0)

    roi_nhwc = jnp.asarray(roi_chw.transpose(0, 2, 3, 1))
    got = apply_recog(recog, roi_nhwc, train=False,
                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_converted_params_roundtrip_npz(tmp_path):
    weights = _torch_weights()
    trunk1, trunk2, recog = convert_torch_vgg16(weights, out_hw=(7, 7))
    path = str(tmp_path / "conv.npz")
    save_params(path, {"trunk1": trunk1, "trunk2": trunk2, "recog": recog})
    loaded, _ = load_params(path)
    np.testing.assert_array_equal(
        loaded["trunk1"]["conv1_1"]["w"], np.asarray(trunk1["conv1_1"]["w"])
    )


def test_lstm_gate_order_matches_torch_rnn_convention():
    """Our scan cell uses torch-rnn's (i, f, o, g) gate layout: a numpy
    step with that layout must match models.lstm._lstm_step exactly."""
    from densecap_tpu.models.lstm import _lstm_step

    rng = np.random.RandomState(3)
    D, H = 6, 5
    p = {"Wx": rng.randn(D, 4 * H).astype(np.float32),
         "Wh": rng.randn(H, 4 * H).astype(np.float32),
         "b": rng.randn(4 * H).astype(np.float32)}
    x = rng.randn(2, D).astype(np.float32)
    h0 = rng.randn(2, H).astype(np.float32)
    c0 = rng.randn(2, H).astype(np.float32)

    gates = x @ p["Wx"] + h0 @ p["Wh"] + p["b"]

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    i = sig(gates[:, 0 * H:1 * H])
    f = sig(gates[:, 1 * H:2 * H])
    o = sig(gates[:, 2 * H:3 * H])
    g = np.tanh(gates[:, 3 * H:4 * H])
    c_ref = f * c0 + i * g
    h_ref = o * np.tanh(c_ref)

    h2, c2 = _lstm_step(
        {k: jnp.asarray(v) for k, v in p.items()},
        jnp.asarray(h0), jnp.asarray(c0), jnp.asarray(x), jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(h2), h_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), c_ref, rtol=1e-5, atol=1e-6)
