"""t7 reader tests against a fixture writer implementing the same
documented format (structure-level validation; see the reader's caveat
about exotic real-world files)."""

import io
import struct

import numpy as np

from densecap_tpu.utils import t7_reader as t7


class _Writer:
    """Inverse of T7Reader for test fixtures (DEFAULT binary format)."""

    def __init__(self):
        self.buf = io.BytesIO()
        self.next_idx = 1

    def i32(self, v):
        self.buf.write(struct.pack("<i", v))

    def i64(self, v):
        self.buf.write(struct.pack("<q", v))

    def f64(self, v):
        self.buf.write(struct.pack("<d", v))

    def string(self, s):
        raw = s.encode()
        self.i32(len(raw))
        self.buf.write(raw)

    def write(self, obj):
        if obj is None:
            self.i32(t7.TYPE_NIL)
        elif isinstance(obj, bool):
            self.i32(t7.TYPE_BOOLEAN)
            self.i32(1 if obj else 0)
        elif isinstance(obj, (int, float)):
            self.i32(t7.TYPE_NUMBER)
            self.f64(float(obj))
        elif isinstance(obj, str):
            self.i32(t7.TYPE_STRING)
            self.string(obj)
        elif isinstance(obj, dict):
            self.i32(t7.TYPE_TABLE)
            self.i32(self.next_idx)
            self.next_idx += 1
            self.i32(len(obj))
            for k, v in obj.items():
                self.write(k)
                self.write(v)
        elif isinstance(obj, list):
            self.write({i + 1: v for i, v in enumerate(obj)})
        elif isinstance(obj, np.ndarray):
            self.i32(t7.TYPE_TORCH)
            self.i32(self.next_idx)
            self.next_idx += 1
            self.string("V 1")
            self.string("torch.FloatTensor")
            arr = np.ascontiguousarray(obj, np.float32)
            self.i32(arr.ndim)
            for s in arr.shape:
                self.i64(s)
            strides = [st // arr.itemsize for st in arr.strides]
            for s in strides:
                self.i64(s)
            self.i64(1)  # storage offset (1-based)
            # storage object
            self.i32(t7.TYPE_TORCH)
            self.i32(self.next_idx)
            self.next_idx += 1
            self.string("V 1")
            self.string("torch.FloatStorage")
            self.i64(arr.size)
            self.buf.write(arr.tobytes())
        elif isinstance(obj, t7.TorchObject):
            self.i32(t7.TYPE_TORCH)
            self.i32(self.next_idx)
            self.next_idx += 1
            self.string("V 1")
            self.string(obj.torch_class)
            self.write(obj.fields)
        else:
            raise TypeError(type(obj))

    def getvalue(self):
        return self.buf.getvalue()


def _roundtrip(obj):
    w = _Writer()
    w.write(obj)
    return t7.T7Reader(io.BytesIO(w.getvalue())).read_object()


def test_scalars_strings_tables():
    got = _roundtrip({"a": 1, "b": 2.5, "c": "hello", "d": True,
                      "e": None, "f": [10, 20, 30]})
    assert got["a"] == 1 and got["b"] == 2.5
    assert got["c"] == "hello" and got["d"] is True
    assert got["e"] is None
    assert got["f"] == [10, 20, 30]


def test_tensor_roundtrip():
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    got = _roundtrip({"w": arr})
    np.testing.assert_array_equal(got["w"], arr)


def test_torch_object_and_modules():
    conv = t7.TorchObject("nn.SpatialConvolution", {
        "weight": np.ones((8, 3, 3, 3), np.float32),
        "bias": np.zeros(8, np.float32),
    })
    seq = t7.TorchObject("nn.Sequential", {"modules": [conv]})
    got = _roundtrip(seq)
    assert got.torch_class == "nn.Sequential"
    mods = got["modules"]
    assert mods[0].torch_class == "nn.SpatialConvolution"
    assert mods[0]["weight"].shape == (8, 3, 3, 3)


def _mini_densecap_t7():
    def conv(cout, cin):
        return t7.TorchObject("cudnn.SpatialConvolution", {
            "weight": np.random.RandomState(cout).randn(
                cout, cin, 3, 3).astype(np.float32),
            "bias": np.zeros(cout, np.float32),
        })

    def relu():
        return t7.TorchObject("cudnn.ReLU", {})

    def seq(mods):
        return t7.TorchObject("nn.Sequential", {"modules": mods})

    def linear(cout, cin):
        return t7.TorchObject("nn.Linear", {
            "weight": np.random.RandomState(cout + 100).randn(
                cout, cin).astype(np.float32),
            "bias": np.zeros(cout, np.float32),
        })

    conv1 = seq([conv(4, 3), relu(), conv(4, 4), relu(),
                 conv(8, 4), relu(), conv(8, 8), relu()])
    c2 = []
    cin = 8
    for cout in (16, 16, 16, 16, 16, 16, 16, 16, 16):
        c2 += [conv(cout, cin), relu()]
        cin = cout
    conv2 = seq(c2)
    recog = seq([
        t7.TorchObject("nn.View", {}),
        linear(32, 16 * 7 * 7), relu(),
        t7.TorchObject("nn.Dropout", {}),
        linear(32, 32), relu(),
        t7.TorchObject("nn.Dropout", {}),
    ])
    model = t7.TorchObject("DenseCapModel", {
        "nets": {"conv_net1": conv1, "conv_net2": conv2,
                 "recog_base": recog},
    })
    return {"model": model, "iter": 1234}


def test_extract_densecap_weights(tmp_path):
    ckpt_obj = _mini_densecap_t7()
    w = _Writer()
    w.write(ckpt_obj)
    path = str(tmp_path / "ck.t7")
    with open(path, "wb") as f:
        f.write(w.getvalue())

    loaded = t7.load(path)
    assert loaded["iter"] == 1234
    weights = t7.extract_densecap_weights(loaded)
    assert set(weights) == {
        f"{n}.{k}" for n in (
            "conv1_1", "conv1_2", "conv2_1", "conv2_2",
            "conv3_1", "conv3_2", "conv3_3",
            "conv4_1", "conv4_2", "conv4_3",
            "conv5_1", "conv5_2", "conv5_3", "fc6", "fc7",
        ) for k in ("weight", "bias")
    }
    assert weights["conv1_1.weight"].shape == (4, 3, 3, 3)
    assert weights["fc6.weight"].shape == (32, 16 * 7 * 7)
