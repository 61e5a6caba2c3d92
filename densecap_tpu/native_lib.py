"""ctypes bindings for the native runtime (native/dcio.cpp, dcgeom.cpp).

Libraries are built on demand with `make -C native` the first time they
are requested; callers fall back to pure-python paths when no compiler
is available (is_available() gates that)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

# repo layout: native/ is a sibling of the package dir. Installed
# (non-editable) trees don't carry it — point DENSECAP_TPU_NATIVE_DIR
# at a built native/ checkout there, or the pure-python fallbacks run.
_NATIVE_DIR = os.environ.get("DENSECAP_TPU_NATIVE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_lock = threading.Lock()
_libs = {}

# expected ABI of each library (dc<name>_abi_version in the .cpp); a
# stale .so built before a signature change must never be called with
# the new argument list — it would misread pointers as ints
_ABI = {"dcio": 4, "dcgeom": 1}


def _abi_ok(lib, name):
    try:
        fn = getattr(lib, f"{name}_abi_version")
    except AttributeError:
        return False  # pre-versioning build
    return int(fn()) == _ABI[name]


def _load(name):
    with _lock:
        if name in _libs:
            return _libs[name]
        so = os.path.join(_NATIVE_DIR, f"lib{name}.so")

        def build(force=False):
            cmd = ["make", "-C", _NATIVE_DIR]
            if force:
                cmd.append("-B")
            cmd.append(f"lib{name}.so")
            subprocess.run(cmd, check=True, capture_output=True)

        lib = None
        try:
            if not os.path.exists(so):
                build()
            lib = ctypes.CDLL(so)
            if not _abi_ok(lib, name):
                # stale binary from an older source revision: rebuild
                # from scratch. dlopen caches by pathname, so the first
                # (stale) handle would shadow a same-path reload — load
                # the fresh build through a unique temp copy instead.
                build(force=True)
                import shutil
                import tempfile

                tmp = tempfile.NamedTemporaryFile(
                    prefix=f"lib{name}_", suffix=".so", delete=False)
                tmp.close()
                shutil.copy2(so, tmp.name)
                lib = ctypes.CDLL(tmp.name)
                if not _abi_ok(lib, name):
                    lib = None
        except Exception:
            lib = None
        _libs[name] = lib
        return lib


def is_available(name="dcgeom"):
    return _load(name) is not None


# ---------------------------------------------------------------------------
# dcgeom
# ---------------------------------------------------------------------------

def _geom():
    lib = _load("dcgeom")
    if lib is None:
        raise RuntimeError("libdcgeom.so unavailable")
    return lib


_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def iou_matrix(boxes1, boxes2):
    lib = _geom()
    b1 = np.ascontiguousarray(boxes1, np.float32)
    b2 = np.ascontiguousarray(boxes2, np.float32)
    out = np.empty((len(b1), len(b2)), np.float32)
    lib.dcgeom_iou_matrix(
        b1.ctypes.data_as(ctypes.c_void_p), len(b1),
        b2.ctypes.data_as(ctypes.c_void_p), len(b2),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def nms(boxes, scores, thresh, max_out=None):
    lib = _geom()
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    n = len(b)
    k = n if max_out is None else int(max_out)
    pick = np.empty(n, np.int32)
    kept = lib.dcgeom_nms(
        b.ctypes.data_as(ctypes.c_void_p),
        s.ctypes.data_as(ctypes.c_void_p),
        n, ctypes.c_float(thresh), k,
        pick.ctypes.data_as(ctypes.c_void_p),
    )
    return pick[:kept].copy()


def assign(det_boxes_sorted, gt_boxes):
    """Greedy evaluator assignment; det boxes must be score-sorted."""
    lib = _geom()
    d = np.ascontiguousarray(det_boxes_sorted, np.float32)
    g = np.ascontiguousarray(gt_boxes, np.float32)
    nd, nt = len(d), len(g)
    ov = np.empty(nd, np.float32)
    asg = np.empty(nd, np.int32)
    ok = np.empty(nd, np.int32)
    lib.dcgeom_assign(
        d.ctypes.data_as(ctypes.c_void_p), nd,
        g.ctypes.data_as(ctypes.c_void_p), nt,
        ov.ctypes.data_as(ctypes.c_void_p),
        asg.ctypes.data_as(ctypes.c_void_p),
        ok.ctypes.data_as(ctypes.c_void_p),
    )
    return ov, asg, ok


def merge_boxes(boxes, thr):
    """Greedy IoU clustering; returns list of index arrays (greedy order)."""
    lib = _geom()
    b = np.ascontiguousarray(boxes, np.float32)
    n = len(b)
    gid = np.empty(n, np.int32)
    ng = lib.dcgeom_merge_boxes(
        b.ctypes.data_as(ctypes.c_void_p), n, ctypes.c_float(thr),
        gid.ctypes.data_as(ctypes.c_void_p),
    )
    return [np.nonzero(gid == g)[0] for g in range(ng)]


# ---------------------------------------------------------------------------
# dcio
# ---------------------------------------------------------------------------

def load_batch(paths, canvas_size, mean_bgr, num_threads=8,
               fast_dct=False):
    """Decode+preprocess a batch of JPEGs natively (threaded C++).

    Returns (canvases (n, S, S, 3) f32 BGR mean-sub zero-padded,
    heights, widths, orig_heights, orig_widths, ok_count). Failed
    decodes leave zero canvases and zero dims.

    fast_dct=True decodes at the smallest DCT-domain M/8 scale whose
    longest edge still covers the canvas, then bilinear-resizes the
    rest — ~2x faster ingest on large photos, NOT bit-identical to
    the exact decode+resize path (extents/box mapping unchanged)."""
    lib = _load("dcio")
    if lib is None:
        raise RuntimeError("libdcio.so unavailable")
    n = len(paths)
    S = canvas_size
    canv = np.zeros((n, S, S, 3), np.float32)
    hts = np.zeros(n, np.float32)
    wds = np.zeros(n, np.float32)
    ohts = np.zeros(n, np.float32)
    owds = np.zeros(n, np.float32)
    mean = np.asarray(mean_bgr, np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.dcio_load_batch(
        arr, n, S,
        mean.ctypes.data_as(ctypes.c_void_p),
        canv.ctypes.data_as(ctypes.c_void_p),
        hts.ctypes.data_as(ctypes.c_void_p),
        wds.ctypes.data_as(ctypes.c_void_p),
        ohts.ctypes.data_as(ctypes.c_void_p),
        owds.ctypes.data_as(ctypes.c_void_p),
        int(num_threads),
        int(bool(fast_dct)),
    )
    return canv, hts, wds, ohts, owds, ok


def resize_rgb(rgb, dh, dw):
    """(H, W, 3) uint8 -> (dh, dw, 3) uint8, bit-identical to
    PIL.Image.resize((dw, dh), Image.BILINEAR) (native/dcio.cpp
    resample; parity test in tests/test_native.py)."""
    lib = _load("dcio")
    if lib is None:
        raise RuntimeError("libdcio.so unavailable")
    src = np.ascontiguousarray(rgb, np.uint8)
    sh, sw = src.shape[:2]
    dst = np.empty((int(dh), int(dw), 3), np.uint8)
    lib.dcio_resize(
        src.ctypes.data_as(ctypes.c_void_p), int(sh), int(sw),
        dst.ctypes.data_as(ctypes.c_void_p), int(dh), int(dw),
    )
    return dst


def decode_jpeg(path):
    """Decode one JPEG to (H, W, 3) uint8 RGB, or None on failure."""
    lib = _load("dcio")
    if lib is None:
        raise RuntimeError("libdcio.so unavailable")
    max_bytes = 8192 * 8192 * 3
    buf = np.empty(max_bytes, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ret = lib.dcio_decode_jpeg(
        path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_long(max_bytes), ctypes.byref(h), ctypes.byref(w),
    )
    if not ret:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def decode_jpeg_bytes(data):
    """Decode JPEG bytes to (H, W, 3) uint8 RGB, or None on failure."""
    lib = _load("dcio")
    if lib is None:
        raise RuntimeError("libdcio.so unavailable")
    raw = np.frombuffer(data, np.uint8)
    max_bytes = 8192 * 8192 * 3
    buf = np.empty(max_bytes, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ret = lib.dcio_decode_jpeg_mem(
        raw.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(len(raw)),
        buf.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(max_bytes),
        ctypes.byref(h), ctypes.byref(w),
    )
    if not ret:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
