"""Server-side visualization: draw boxes + captions onto images.

PIL re-implementation of reference densecap/vis_utils.lua (which drew 4
filled rects per box edge and used image.drawText, :82-110), keeping
its WAD color palette (:6-21)."""

from __future__ import annotations

import numpy as np

# WAD palette (vis_utils.lua:6-21), RGB 0..255
WAD_COLORS = [
    (173, 35, 35), (42, 75, 215), (87, 87, 87), (29, 105, 20),
    (129, 74, 25), (129, 38, 192), (160, 160, 160), (129, 197, 122),
    (157, 175, 255), (41, 208, 208), (255, 146, 51), (255, 238, 51),
    (233, 222, 187), (255, 205, 243),
]


def densecap_draw(rgb, boxes_xywh, captions, box_width=2, text_size=12):
    """Draw boxes (N, 4) xywh (1-indexed) + captions onto an RGB array."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.asarray(rgb, dtype=np.uint8))
    draw = ImageDraw.Draw(im)
    font = None
    try:
        from PIL import ImageFont

        font = ImageFont.load_default(size=text_size)
    except Exception:
        pass

    boxes = np.asarray(boxes_xywh, dtype=np.float64)
    for i, (box, caption) in enumerate(zip(boxes, captions)):
        color = WAD_COLORS[i % len(WAD_COLORS)]
        x, y, w, h = box
        x0, y0 = x - 1, y - 1  # 1-indexed -> pixel coords
        draw.rectangle([x0, y0, x0 + w - 1, y0 + h - 1], outline=color,
                       width=box_width)
        if caption:
            ty = max(y0 - text_size - 2, 0)
            if font is not None:
                tw = draw.textlength(caption, font=font)
                draw.rectangle([x0, ty, x0 + tw + 4, ty + text_size + 2],
                               fill=color)
                draw.text((x0 + 2, ty), caption, fill=(255, 255, 255),
                          font=font)
    return np.asarray(im)
