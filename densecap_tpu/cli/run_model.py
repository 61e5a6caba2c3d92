"""Inference CLI (reference run_model.lua).

Runs DenseCap on an image / directory / dataset split and writes the
d3-viewer JSON (vis/data/results.json, schema run_model.lua:89-95,
182-188) and/or baked images with boxes+captions drawn in.

  python -m densecap_tpu.cli.run_model --checkpoint ck.npz \
      --input_image img.jpg --output_dir vis/data
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help=".npz produced by utils.checkpoint.save_params")
    p.add_argument("--input_image", default="")
    p.add_argument("--input_dir", default="")
    p.add_argument("--input_split", default="",
                   help="val|test (requires --data_h5/--data_json)")
    p.add_argument("--data_h5", default="")
    p.add_argument("--data_json", default="")
    p.add_argument("--image_size", type=int, default=720)
    p.add_argument("--rpn_nms_thresh", type=float, default=0.7)
    p.add_argument("--final_nms_thresh", type=float, default=0.3)
    p.add_argument("--num_proposals", type=int, default=1000)
    p.add_argument("--pre_nms_topk", type=int, default=6000,
                   help="NMS scans only the top-K scored anchors "
                        "(-1 = all ~24k, exact reference semantics). "
                        "6000 is survivor-identical on the measured "
                        "workload; 2000 is a measured fast-serving "
                        "mode (mAP +0.0001, doc/BENCH.md)")
    p.add_argument("--boxes_to_show", type=int, default=10)
    p.add_argument("--output_dir", default="vis/data")
    p.add_argument("--output_vis", type=int, default=1)
    p.add_argument("--output_images", type=int, default=0,
                   help="also write baked images with drawn boxes")
    p.add_argument("--copy_images", type=int, default=0,
                   help="copy inputs into output_dir so the "
                        "vis/view_results.html browser can show them")
    p.add_argument("--max_images", type=int, default=100)
    p.add_argument("--beam_size", type=int, default=0)
    from ._common import add_quantize_flag
    add_quantize_flag(p)
    p.add_argument("--roi_align", default="",
                   choices=["", "auto", "gather", "mxu", "pallas"],
                   help="RoI-align formulation: auto picks the MXU "
                        "einsum on TPU at the standard 512ch/7x7 "
                        "geometry (fastest measured), gather elsewhere")
    p.add_argument("--pallas_roi_align", type=int, default=-1,
                   help="DEPRECATED alias of --roi_align: -1 auto, "
                        "1 pallas, 0 gather")
    p.add_argument("--canvas_buckets", default="",
                   help="comma list of HxW inference canvases (e.g. "
                        "720x544,544x720); each image runs on the "
                        "smallest bucket that fits its resized extent, "
                        "cutting padded-square conv waste ~25% for 4:3 "
                        "inputs with exactly equal outputs; each bucket "
                        "shape compiles once")
    p.add_argument("--native_io", type=int, default=1,
                   help="use the threaded C++ JPEG->canvas pipeline "
                        "(native/dcio.cpp) for --input_dir batches; "
                        "falls back to PIL when the library is absent "
                        "or inputs are not JPEG")
    p.add_argument("--fast_io", type=int, default=0,
                   help="with --native_io: decode large JPEGs at a "
                        "DCT-domain M/8 scale that still covers the "
                        "canvas, then resize the rest (~1.5x faster "
                        "ingest on 1080p-class photos, measured pixel "
                        "delta mean ~0.4/255 vs the exact path; "
                        "extents and box mapping identical)")
    return p


def get_input_images(args):
    if args.input_image:
        return [args.input_image]
    if args.input_dir:
        exts = (".jpg", ".jpeg", ".png", ".ppm")
        return sorted(
            os.path.join(args.input_dir, f)
            for f in os.listdir(args.input_dir)
            if f.lower().endswith(exts)
        )[: args.max_images]
    raise SystemExit(
        "need --input_image, --input_dir or --input_split"
    )


def run_split(args, params, cfg, idx_to_token):
    """Run over a dataset split straight from the preprocessed h5
    (run_model.lua's -input_split mode, :129-142)."""
    import jax
    import jax.numpy as jnp

    from ..data.loader import DenseCapLoader
    from ..models import densecap
    from ..ops.boxes import xcycwh_to_xywh
    from ..utils.text import decode_sequence

    loader = DenseCapLoader(args.data_h5, args.data_json)
    # canvas size comes from the h5; vocab stays the CHECKPOINT's (the
    # params own the embedding size — the dataset dict must match it)
    cfg = cfg.replace(image_size=loader.canvas)
    split = {"train": 0, "val": 1, "test": 2}[args.input_split]
    n = min(args.max_images, loader.split_size(split)) \
        if args.max_images > 0 else loader.split_size(split)
    fwd = jax.jit(
        lambda p, im, h, w: densecap.forward_test(p, im, h, w, cfg)
    )
    results = []
    loader.reset_iterator(split)
    for i in range(n):
        ex = loader.get_example(split=split)
        out = fwd(params, jnp.asarray(ex["image"]),
                  jnp.float32(ex["height"]), jnp.float32(ex["width"]))
        valid = np.asarray(out.valid)
        boxes = np.asarray(out.boxes)[valid]
        xywh = np.array(xcycwh_to_xywh(jnp.asarray(boxes)))
        # h5 canvas coords -> original image coords
        frac = (float(ex["width"])
                / float(loader.original_widths[ex["ix"]]))
        xywh[:, :2] = (xywh[:, :2] - 1) / frac + 1
        xywh[:, 2:] = xywh[:, 2:] / frac
        results.append({
            "img_name": ex["filename"],
            "boxes": xywh.tolist(),
            "scores": np.asarray(out.scores)[valid].tolist(),
            "captions": decode_sequence(
                np.asarray(out.captions)[valid],
                loader.idx_to_token(), cfg.vocab_size,
            ),
        })
        print(f"{ex['filename']} ({i + 1}/{n})")
    return results


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from ._common import setup_compilation_cache
    setup_compilation_cache()

    from ..config import DenseCapConfig
    from ..models import densecap
    from ..ops.boxes import xcycwh_to_xywh
    from ..utils import checkpoint as ckpt
    from ..utils.image import load_image, preprocess_for_model
    from ..utils.text import decode_sequence
    from ._common import maybe_quantize, resolve_roi_impl

    params, extra = ckpt.load_params(args.checkpoint)
    params = maybe_quantize(params, args.quantize)
    meta = json.loads(str(extra["meta"])) if "meta" in extra else {}
    vocab_size = int(meta.get("vocab_size", 10000))
    idx_to_token = meta.get("idx_to_token", {})
    if "config" in meta:
        cfg = DenseCapConfig.from_json(meta["config"])
    else:
        cfg = DenseCapConfig(
            vocab_size=vocab_size,
            seq_length=int(meta.get("seq_length", 15)),
        )
    cfg = cfg.replace(
        image_size=args.image_size,
        test_rpn_nms_thresh=args.rpn_nms_thresh,
        test_final_nms_thresh=args.final_nms_thresh,
        test_max_proposals=args.num_proposals,
        test_pre_nms_topk=args.pre_nms_topk,
        roi_align_impl=resolve_roi_impl(
            args.roi_align or args.pallas_roi_align, cfg),
    )
    vocab_size = cfg.vocab_size

    os.makedirs(args.output_dir, exist_ok=True)

    if args.input_split:
        results = run_split(args, params, cfg, idx_to_token)
        with open(os.path.join(args.output_dir, "results.json"), "w") as f:
            json.dump({"results": results}, f)
        print(f"wrote {args.output_dir}/results.json")
        return

    fwd = jax.jit(
        lambda p, im, h, w: densecap.forward_test(
            p, im, h, w, cfg, use_beam=args.beam_size
        )
    )

    paths = get_input_images(args)
    use_native = False
    if args.native_io and args.input_dir and \
            all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        from .. import native_lib

        use_native = native_lib.is_available("dcio")
    if args.fast_io and not use_native:
        import sys

        print("warning: --fast_io requires the native decode path "
              "(--native_io with libdcio present, --input_dir, JPEG "
              "inputs); ignored on the PIL fallback", file=sys.stderr)

    def inputs():
        """Yields (path, canvas, h, w, scale)."""
        if not use_native:
            for path in paths:
                rgb = load_image(path)
                canvas, h, w, scale = preprocess_for_model(
                    rgb, args.image_size)
                yield path, canvas, h, w, scale
            return
        from concurrent.futures import ThreadPoolExecutor

        from .. import native_lib
        from ..config import VGG_MEAN_BGR

        CH = 16  # decode chunk size

        def decode(chunk):
            return native_lib.load_batch(chunk, args.image_size,
                                         VGG_MEAN_BGR,
                                         fast_dct=bool(args.fast_io))

        # one-chunk lookahead: the C++ thread pool decodes chunk i+1
        # while the device runs inference over chunk i
        chunks = [paths[i:i + CH] for i in range(0, len(paths), CH)]
        if not chunks:  # empty --input_dir
            return
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(decode, chunks[0])
            for ci, chunk in enumerate(chunks):
                canv, hts, wds, ohts, owds, _ = fut.result()
                if ci + 1 < len(chunks):
                    fut = pool.submit(decode, chunks[ci + 1])
                for j, path in enumerate(chunk):
                    if hts[j] == 0:
                        print(f"{path}: decode failed, skipping")
                        continue
                    scale = args.image_size / float(max(ohts[j], owds[j]))
                    yield (path, canv[j], float(hts[j]), float(wds[j]),
                           scale)

    if use_native:
        print(f"native IO: threaded C++ decode for {len(paths)} images")
    buckets = None
    if args.canvas_buckets:
        from ..utils.image import parse_buckets, pick_bucket

        buckets = parse_buckets(args.canvas_buckets, args.image_size)
    results = []
    for path, canvas, h, w, scale in inputs():
        if buckets is not None:
            bh, bw = pick_bucket(h, w, buckets)
            canvas = canvas[:bh, :bw]
        out = fwd(params, jnp.asarray(canvas), jnp.float32(h),
                  jnp.float32(w))
        valid = np.asarray(out.valid)
        boxes = np.asarray(out.boxes)[valid]
        scores = np.asarray(out.scores)[valid]
        captions = decode_sequence(
            np.asarray(out.captions)[valid], idx_to_token, vocab_size
        )
        # canvas coords -> original image coords, xywh (run_model.lua:78)
        boxes_xywh = np.array(xcycwh_to_xywh(jnp.asarray(boxes)))
        boxes_xywh[:, :2] = (boxes_xywh[:, :2] - 1) / scale + 1
        boxes_xywh[:, 2:] = boxes_xywh[:, 2:] / scale

        result = {
            "img_name": os.path.basename(path),
            "boxes": boxes_xywh.tolist(),
            "scores": scores.tolist(),
            "captions": captions,
        }
        results.append(result)
        print(f"{path}: {len(boxes)} regions")

        if args.copy_images:
            import shutil

            shutil.copy(path, os.path.join(args.output_dir,
                                           os.path.basename(path)))

        if args.output_images:
            from ..utils.vis import densecap_draw

            rgb = load_image(path)  # originals only needed for baking
            k = min(args.boxes_to_show, len(boxes_xywh))
            baked = densecap_draw(rgb, boxes_xywh[:k], captions[:k])
            from PIL import Image

            outp = os.path.join(
                args.output_dir,
                os.path.splitext(os.path.basename(path))[0] + "_boxes.png",
            )
            Image.fromarray(baked).save(outp)

    if args.output_vis:
        with open(os.path.join(args.output_dir, "results.json"), "w") as f:
            json.dump({"results": results}, f)
        print(f"wrote {args.output_dir}/results.json")


if __name__ == "__main__":
    main()
