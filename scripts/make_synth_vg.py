"""Generate a realistic synthetic Visual-Genome-style dataset and run it
through the SHIPPING preprocess CLI (data/preprocess.py) to an h5+json
pair (VERDICT r4 #1: every training number so far fed synthetic in-RAM
scenes; this gives the h5 the shipping loader actually reads).

Properties matched to VG: ~40 regions/image (VG mean ~43), 3-8 token
phrases, mixed aspect ratios (VG is 4:3-dominated), images sized so the
720-canvas resize actually resizes. Scenes are LEARNABLE (colored
rectangles with color/size-descriptive phrases) so the full train-CLI
soak shows loss decreasing and mAP improving, not just throughput.

Usage:
  python scripts/make_synth_vg.py --out_dir /tmp/synthvg \
      --n_portrait 300 --n_landscape 80 --n_square 20
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

COLORS = {
    "red": (200, 40, 40), "green": (40, 180, 40), "blue": (40, 60, 200),
    "yellow": (220, 210, 40), "purple": (150, 40, 190),
    "orange": (230, 140, 30), "white": (235, 235, 235),
    "black": (25, 25, 25),
}
FILLER = ["on", "the", "left", "right", "top", "bottom", "near", "a",
          "region", "with", "texture", "another", "standing", "alone"]


def make_scene(rng, W, H, n_regions):
    img = rng.randint(85, 135, (H, W, 3)).astype(np.uint8)
    regions = []
    for _ in range(n_regions):
        name = list(COLORS)[rng.randint(len(COLORS))]
        w = int(rng.randint(30, max(31, W // 2)))
        h = int(rng.randint(30, max(31, H // 2)))
        x = int(rng.randint(1, max(2, W - w)))
        y = int(rng.randint(1, max(2, H - h)))
        img[y:y + h, x:x + w] = COLORS[name]
        size = "large" if w * h > W * H // 8 else "small"
        extra = " ".join(
            FILLER[rng.randint(len(FILLER))]
            for _ in range(rng.randint(0, 4)))
        phrase = f"a {size} {name} box" + (f" {extra}" if extra else "")
        regions.append({"phrase": phrase, "x": x, "y": y,
                        "width": w, "height": h})
    return img, regions


def main():
    from PIL import Image

    from densecap_tpu.data import preprocess as pp

    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/synthvg")
    ap.add_argument("--n_portrait", type=int, default=300)
    ap.add_argument("--n_landscape", type=int, default=80)
    ap.add_argument("--n_square", type=int, default=20)
    ap.add_argument("--regions_per_image", type=int, default=40)
    ap.add_argument("--image_size", type=int, default=720)
    ap.add_argument("--max_token_length", type=int, default=15)
    ap.add_argument("--val_frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    img_dir = os.path.join(args.out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)

    # VG-like source sizes (4:3-family); all resize on the 720 canvas
    shapes = ([(600, 800)] * args.n_portrait          # -> 540x720 content
              + [(800, 600)] * args.n_landscape       # -> 720x540 content
              + [(768, 768)] * args.n_square)         # -> 720x720 content
    rng.shuffle(shapes)

    data = []
    for i, (W, H) in enumerate(shapes):
        img_id = i + 1
        n_reg = int(rng.randint(args.regions_per_image - 8,
                                args.regions_per_image + 9))
        img, regions = make_scene(rng, W, H, n_reg)
        Image.fromarray(img).save(
            os.path.join(img_dir, f"{img_id}.jpg"), quality=90)
        data.append({"id": img_id, "regions": regions})
        if (i + 1) % 100 == 0:
            print(f"  scenes {i + 1}/{len(shapes)}", flush=True)

    ids = [d["id"] for d in data]
    rng.shuffle(ids)
    n_val = max(1, int(len(ids) * args.val_frac))
    splits = {"val": ids[:n_val], "test": ids[n_val:2 * n_val],
              "train": ids[2 * n_val:]}
    with open(os.path.join(args.out_dir, "regions.json"), "w") as f:
        json.dump(data, f)
    with open(os.path.join(args.out_dir, "splits.json"), "w") as f:
        json.dump(splits, f)

    h5_out = os.path.join(args.out_dir, "VG-regions.h5")
    json_out = os.path.join(args.out_dir, "VG-regions-dicts.json")
    pp.main([
        "--region_data", os.path.join(args.out_dir, "regions.json"),
        "--image_dir", img_dir,
        "--split_json", os.path.join(args.out_dir, "splits.json"),
        "--h5_output", h5_out,
        "--json_output", json_out,
        "--image_size", str(args.image_size),
        "--max_token_length", str(args.max_token_length),
        "--min_token_instances", "1",
        "--num_workers", "8",
    ])
    print(f"wrote {h5_out} ({os.path.getsize(h5_out) / 1e6:.0f} MB), "
          f"{json_out}; splits train={len(splits['train'])} "
          f"val={len(splits['val'])} test={len(splits['test'])}")


if __name__ == "__main__":
    main()
