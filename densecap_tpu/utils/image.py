"""Image loading + model preprocessing (reference run_model.lua:64-87).

Pipeline: load RGB -> scale so the longest edge is image_size -> BGR,
0..255 -> subtract VGG mean -> place top-left on a zero S x S canvas
(fixed shape for one compiled program; the padding region is masked out
downstream via the true (h, w))."""

from __future__ import annotations

import numpy as np

from ..config import VGG_MEAN_BGR


def load_image(path):
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def preprocess_for_model(rgb, image_size=720):
    """(H0, W0, 3) uint8 RGB -> (canvas, h, w, scale).

    canvas: (S, S, 3) float32 HWC BGR mean-subtracted; h, w: true extent
    on the canvas; scale: original -> canvas coordinate factor.
    """
    from PIL import Image

    H0, W0 = rgb.shape[:2]
    scale = float(image_size) / max(H0, W0)
    H, W = round(H0 * scale), round(W0 * scale)
    im = Image.fromarray(rgb).resize((W, H), Image.BILINEAR)
    arr = np.asarray(im, dtype=np.float32)[:, :, ::-1]  # BGR, 0..255
    arr = arr - np.asarray(VGG_MEAN_BGR, dtype=np.float32)
    canvas = np.zeros((image_size, image_size, 3), dtype=np.float32)
    canvas[:H, :W] = arr
    return canvas, float(H), float(W), scale


def preprocess_for_model_uint8(rgb, image_size=720):
    """Raw-uint8 twin of preprocess_for_model: canvas stays uint8 BGR.

    The BGR flip + VGG mean subtraction + pad-zeroing move on-device
    (parallel.train_step.normalize_uint8_images — uint8->f32 is exact,
    so the result is bit-equal to the host f32 path). Shipping uint8
    is 4x fewer transfer bytes; on the serving path that is the
    difference between ~650 ms and ~30 ms per micro-batch over a
    bandwidth-limited host->device link (doc/BENCH.md transport table).
    """
    from PIL import Image

    H0, W0 = rgb.shape[:2]
    scale = float(image_size) / max(H0, W0)
    H, W = round(H0 * scale), round(W0 * scale)
    im = Image.fromarray(rgb).resize((W, H), Image.BILINEAR)
    canvas = np.zeros((image_size, image_size, 3), dtype=np.uint8)
    canvas[:H, :W] = np.asarray(im, dtype=np.uint8)[:, :, ::-1]  # BGR
    return canvas, float(H), float(W), scale


def parse_buckets(spec, image_size):
    """'720x544,544x720' -> sorted [(h, w), ...] + the square fallback.

    Buckets trade compile count for trunk FLOPs: a 720x540 image on a
    720x544 canvas does ~25% less conv work than on the 720x720 square,
    with EXACTLY equal outputs (canvas masking; tested in
    tests/test_canvas_parity.py). Dims must be multiples of 16 so the
    /16 feature grid stays exact.
    """
    buckets = set()
    for part in str(spec).split(","):
        part = part.strip()
        if not part:
            continue
        h, w = (int(v) for v in part.lower().split("x"))
        if h % 16 or w % 16:
            raise ValueError(f"bucket {part}: dims must be multiples of 16")
        if h > image_size or w > image_size:
            raise ValueError(f"bucket {part} exceeds image_size {image_size}")
        buckets.add((h, w))
    buckets.add((image_size, image_size))
    return sorted(buckets, key=lambda b: b[0] * b[1])


def pick_bucket(h, w, buckets):
    """Smallest-area bucket that fits a true (h, w) extent; buckets must
    come from parse_buckets (always contains the square fallback)."""
    for bh, bw in buckets:
        if h <= bh and w <= bw:
            return bh, bw
    return buckets[-1]
