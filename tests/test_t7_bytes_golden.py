"""Byte-level golden fixtures for the t7 reader.

The _Writer in test_t7_reader.py is the structural inverse of the
reader, so reader<->writer round-trips can't catch a shared
misunderstanding of the torch format. These fixtures are hand-encoded
byte streams written field-by-field per torch7's File.lua writeObject
(github.com/torch/torch7/blob/master/File.lua — from the published
format description, since no torch7 install exists in this image),
covering cases the _Writer never produces:

  * re-referenced objects (second reference = type code + index ONLY),
  * non-contiguous tensors (transposed strides + storage offset),
  * two tensors sharing one storage,
  * DoubleStorage / LongTensor payloads,
  * the legacy no-"V 1" version-string form.
"""

import io
import struct

import numpy as np

from densecap_tpu.utils import t7_reader as t7


def _i32(v):
    return struct.pack("<i", v)


def _i64(v):
    return struct.pack("<q", v)


def _f64(v):
    return struct.pack("<d", v)


def _s(text):
    raw = text.encode()
    return _i32(len(raw)) + raw


def _read(blob):
    return t7.T7Reader(io.BytesIO(blob)).read_object()


def test_number_string_boolean_nil():
    blob = (
        _i32(3) + _i32(1)          # TABLE, memo index 1
        + _i32(4)                  # 4 key/value pairs
        + _i32(2) + _s("num") + _i32(1) + _f64(2.5)
        + _i32(2) + _s("str") + _i32(2) + _s("hello")
        + _i32(2) + _s("flag") + _i32(5) + _i32(1)
        + _i32(2) + _s("none") + _i32(0)
    )
    got = _read(blob)
    assert got == {"num": 2.5, "str": "hello", "flag": True, "none": None}


def test_contiguous_float_tensor():
    # torch.FloatTensor of shape (2, 3), values 0..5
    data = np.arange(6, dtype=np.float32)
    blob = (
        _i32(4) + _i32(1)          # TORCH object, index 1
        + _s("V 1") + _s("torch.FloatTensor")
        + _i32(2)                  # ndim
        + _i64(2) + _i64(3)        # sizes
        + _i64(3) + _i64(1)        # strides (row-major)
        + _i64(1)                  # storageOffset (1-based)
        + _i32(4) + _i32(2)        # the storage object, index 2
        + _s("V 1") + _s("torch.FloatStorage")
        + _i64(6) + data.tobytes()
    )
    got = _read(blob)
    np.testing.assert_array_equal(got, data.reshape(2, 3))


def test_transposed_tensor_with_offset():
    # a (3, 2) view with strides (1, 3) and offset 2 over storage 0..7:
    # t[i, j] = storage[1 + i + 3j]  (0-based)
    storage = np.arange(8, dtype=np.float32)
    blob = (
        _i32(4) + _i32(1)
        + _s("V 1") + _s("torch.FloatTensor")
        + _i32(2)
        + _i64(3) + _i64(2)        # sizes
        + _i64(1) + _i64(3)        # strides: column-major (transposed)
        + _i64(2)                  # offset 2 (1-based) -> skip 1 element
        + _i32(4) + _i32(2)
        + _s("V 1") + _s("torch.FloatStorage")
        + _i64(8) + storage.tobytes()
    )
    got = _read(blob)
    expected = np.array([[1, 4], [2, 5], [3, 6]], np.float32)
    np.testing.assert_array_equal(got, expected)


def test_shared_storage_and_rereference():
    """Two tensors over ONE storage; the second tensor re-references the
    storage by writing only (type, index). Also the table itself is
    referenced twice at the top level via a wrapping table."""
    storage = np.arange(4, dtype=np.float32)

    def tensor_header(idx, offset):
        return (_i32(4) + _i32(idx) + _s("V 1") + _s("torch.FloatTensor")
                + _i32(1) + _i64(2) + _i64(1) + _i64(offset))

    blob = (
        _i32(3) + _i32(1)          # outer table, index 1
        + _i32(3)
        # key "a": tensor over storage (index 3), elements 1..2
        + _i32(2) + _s("a")
        + tensor_header(2, 1)
        + _i32(4) + _i32(3) + _s("V 1") + _s("torch.FloatStorage")
        + _i64(4) + storage.tobytes()
        # key "b": tensor re-using storage index 3 (re-reference!)
        + _i32(2) + _s("b")
        + tensor_header(4, 3)
        + _i32(4) + _i32(3)        # type TORCH + known index, no payload
        # key "self": the outer table again (re-reference of a table)
        + _i32(2) + _s("self")
        + _i32(3) + _i32(1)        # type TABLE + known index, no payload
    )
    got = _read(blob)
    np.testing.assert_array_equal(got["a"], [0.0, 1.0])
    np.testing.assert_array_equal(got["b"], [2.0, 3.0])
    assert got["self"] is got


def test_double_storage_and_long_tensor():
    d = np.array([1.5, -2.25], np.float64)
    blob_d = (
        _i32(4) + _i32(1) + _s("V 1") + _s("torch.DoubleTensor")
        + _i32(1) + _i64(2) + _i64(1) + _i64(1)
        + _i32(4) + _i32(2) + _s("V 1") + _s("torch.DoubleStorage")
        + _i64(2) + d.tobytes()
    )
    np.testing.assert_array_equal(_read(blob_d), d)

    lo = np.array([7, -9, 11], np.int64)
    blob_l = (
        _i32(4) + _i32(1) + _s("V 1") + _s("torch.LongTensor")
        + _i32(1) + _i64(3) + _i64(1) + _i64(1)
        + _i32(4) + _i32(2) + _s("V 1") + _s("torch.LongStorage")
        + _i64(3) + lo.tobytes()
    )
    np.testing.assert_array_equal(_read(blob_l), lo)


def test_legacy_class_without_version_string():
    """Pre-V1 torch files write the class name where the version string
    would be (t7_reader handles both)."""
    data = np.ones(2, np.float32)
    blob = (
        _i32(4) + _i32(1)
        + _s("torch.FloatTensor")  # legacy: no "V 1" first
        + _i32(1) + _i64(2) + _i64(1) + _i64(1)
        + _i32(4) + _i32(2) + _s("torch.FloatStorage")
        + _i64(2) + data.tobytes()
    )
    np.testing.assert_array_equal(_read(blob), data)


def test_nn_module_object():
    """A torch class instance: payload is its field table."""
    w = np.full(3, 2.0, np.float32)
    blob = (
        _i32(4) + _i32(1) + _s("V 1") + _s("nn.Linear")
        + _i32(3) + _i32(2)        # field table, index 2
        + _i32(1)
        + _i32(2) + _s("weight")
        + _i32(4) + _i32(3) + _s("V 1") + _s("torch.FloatTensor")
        + _i32(1) + _i64(3) + _i64(1) + _i64(1)
        + _i32(4) + _i32(4) + _s("V 1") + _s("torch.FloatStorage")
        + _i64(3) + w.tobytes()
    )
    got = _read(blob)
    assert isinstance(got, t7.TorchObject)
    assert got.torch_class == "nn.Linear"
    np.testing.assert_array_equal(got["weight"], w)


def test_lua_array_table_becomes_list():
    blob = (
        _i32(3) + _i32(1) + _i32(3)
        + _i32(1) + _f64(1.0) + _i32(1) + _f64(10.0)
        + _i32(1) + _f64(2.0) + _i32(1) + _f64(20.0)
        + _i32(1) + _f64(3.0) + _i32(1) + _f64(30.0)
    )
    assert _read(blob) == [10.0, 20.0, 30.0]
