"""Feature extraction CLI (reference extract_features.lua): for each
input image write the top-100 boxes and their 4096-d RoI codes to HDF5
(datasets 'boxes' (N, 100, 4) and 'feats' (N, 100, 4096), plus validity
mask — the reference has no mask because its shapes were dynamic)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_txt", default="",
                   help="file with one image path per line")
    p.add_argument("--input_dir", default="")
    p.add_argument("--output_h5", required=True)
    p.add_argument("--image_size", type=int, default=720)
    p.add_argument("--boxes_per_image", type=int, default=100)
    p.add_argument("--final_nms_thresh", type=float, default=0.4)
    p.add_argument("--max_images", type=int, default=-1)
    p.add_argument("--canvas_buckets", default="",
                   help="comma list of HxW inference canvases (same "
                        "semantics as run_model)")
    p.add_argument("--roi_align", default="auto",
                   choices=["auto", "gather", "mxu", "pallas"],
                   help="RoI-align formulation: auto picks the MXU "
                        "einsum on TPU at the standard 512ch/7x7 "
                        "geometry (fastest measured), gather elsewhere")
    from ._common import add_quantize_flag, setup_compilation_cache
    add_quantize_flag(p)
    args = p.parse_args(argv)
    setup_compilation_cache()

    from ..config import DenseCapConfig
    from ..models import densecap
    from ..utils import checkpoint as ckpt
    from ..utils.image import (load_image, parse_buckets, pick_bucket,
                               preprocess_for_model)

    if args.input_txt:
        with open(args.input_txt) as f:
            paths = [line.strip() for line in f if line.strip()]
    elif args.input_dir:
        exts = (".jpg", ".jpeg", ".png")
        paths = sorted(
            os.path.join(args.input_dir, f)
            for f in os.listdir(args.input_dir)
            if f.lower().endswith(exts)
        )
    else:
        raise SystemExit("need --input_txt or --input_dir")
    if args.max_images > 0:
        paths = paths[: args.max_images]

    params, extra = ckpt.load_params(args.checkpoint)
    meta = json.loads(str(extra["meta"])) if "meta" in extra else {}
    if "config" in meta:
        cfg = DenseCapConfig.from_json(meta["config"])
    else:
        cfg = DenseCapConfig(
            vocab_size=int(meta.get("vocab_size", 10000)),
            seq_length=int(meta.get("seq_length", 15)),
        )
    from ._common import maybe_quantize, resolve_roi_impl

    params = maybe_quantize(params, args.quantize)
    cfg = cfg.replace(
        image_size=args.image_size,
        roi_align_impl=resolve_roi_impl(args.roi_align, cfg),
    )

    fn = jax.jit(
        lambda p, im, h, w: densecap.extract_features(
            p, im, h, w, cfg,
            final_nms_thresh=args.final_nms_thresh,
            max_boxes=args.boxes_per_image,
        )
    )

    import h5py

    N, B = len(paths), args.boxes_per_image
    with h5py.File(args.output_h5, "w") as h5:
        d_boxes = h5.create_dataset("boxes", (N, B, 4), dtype=np.float32)
        d_feats = h5.create_dataset("feats", (N, B, cfg.fc_dim),
                                    dtype=np.float32)
        d_valid = h5.create_dataset("valid", (N, B), dtype=bool)
        buckets = (parse_buckets(args.canvas_buckets, args.image_size)
                   if args.canvas_buckets else None)
        for i, path in enumerate(paths):
            rgb = load_image(path)
            canvas, h, w, scale = preprocess_for_model(rgb, args.image_size)
            if buckets is not None:
                bh, bw = pick_bucket(h, w, buckets)
                canvas = canvas[:bh, :bw]
            boxes, feats, valid = fn(
                params, jnp.asarray(canvas), jnp.float32(h), jnp.float32(w)
            )
            boxes = np.array(boxes)  # writable copy
            # canvas coords -> original image coords (xcycwh)
            boxes[:, :2] = (boxes[:, :2] - 1) / scale + 1
            boxes[:, 2:] = boxes[:, 2:] / scale
            d_boxes[i] = boxes
            d_feats[i] = np.asarray(feats)
            d_valid[i] = np.asarray(valid)
            print(f"{i + 1}/{N}: {path}")
        h5.create_dataset(
            "paths",
            data=np.asarray(paths, dtype=h5py.string_dtype()),
        )
    print(f"wrote {args.output_h5}")


if __name__ == "__main__":
    main()
