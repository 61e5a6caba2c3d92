"""Visual sanity check for the RoI-align coordinate conventions.

The reference needed an iTorch notebook to catch the stnbhwd (y, x)
convention pitfall (test/BoxToAffine_visual_test.ipynb, documented at
BoxToAffine.lua:36-41). This is the same check as a script: sample a
box out of a structured test image at full feature resolution and
write side-by-side PNGs — the RoI crop must show the box contents,
upright, not transposed and not mirrored.

  PYTHONPATH=. python scripts/visual_roi_check.py /tmp/roi_check.png
"""

import sys

import numpy as np

import jax.numpy as jnp

from densecap_tpu.ops.roi_align import roi_align


def main(out_path="/tmp/roi_check.png"):
    from PIL import Image, ImageDraw

    # structured image: gradient + an unmistakably oriented glyph ("F")
    H = W = 128
    img = np.zeros((H, W, 3), np.uint8)
    img[:, :, 0] = np.linspace(0, 255, W)[None, :]
    img[:, :, 1] = np.linspace(0, 255, H)[:, None]
    pil = Image.fromarray(img)
    d = ImageDraw.Draw(pil)
    # draw an F near (40..80, 30..90): vertical bar + two horizontal bars
    d.rectangle([40, 30, 48, 90], fill=(255, 255, 255))
    d.rectangle([40, 30, 76, 38], fill=(255, 255, 255))
    d.rectangle([40, 55, 68, 62], fill=(255, 255, 255))
    img = np.asarray(pil)

    # box around the F in 1-indexed (xc, yc, w, h)
    box = jnp.array([[59.0, 61.0, 48.0, 72.0]])
    # "features" = the image itself (feature map == image resolution,
    # so the sampled crop is directly comparable)
    feats = jnp.asarray(img, jnp.float32)
    crop = roi_align(feats, box, float(H), float(W), 72, 48)
    crop = np.clip(np.asarray(crop[0]), 0, 255).astype(np.uint8)

    canvas = Image.new("RGB", (W + 8 + 48, max(H, 72)), (32, 32, 32))
    src = pil.copy()
    ds = ImageDraw.Draw(src)
    ds.rectangle([59 - 24, 61 - 36, 59 + 24, 61 + 36], outline=(255, 0, 0),
                 width=2)
    canvas.paste(src, (0, 0))
    canvas.paste(Image.fromarray(crop), (W + 8, 0))
    canvas.save(out_path)
    print(f"wrote {out_path} — the right panel must show an upright 'F'")

    # programmatic orientation assertions (no human needed):
    # vertical bar of the F = bright column near the crop's left side
    gray = crop.mean(axis=2)
    left_col = gray[:, 2:8].mean()
    right_col = gray[:, -8:-2].mean()
    top_row = gray[2:8, :].mean()
    bottom_row = gray[-8:-2, :].mean()
    assert left_col > right_col, "F bar should be on the LEFT (x flip?)"
    assert top_row > bottom_row, "F top bar should be UP (y flip?)"
    print("orientation checks passed (no transpose/mirror)")


if __name__ == "__main__":
    main(*sys.argv[1:])
