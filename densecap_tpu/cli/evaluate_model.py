"""Evaluation CLI (reference evaluate_model.lua): load a checkpoint,
run eval_split on val/test with 1000 proposals, print mAP."""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data_h5", required=True)
    p.add_argument("--data_json", required=True)
    p.add_argument("--split", default="test", choices=("val", "test"))
    p.add_argument("--max_images", type=int, default=-1)
    p.add_argument("--num_proposals", type=int, default=1000)
    p.add_argument("--pre_nms_topk", type=int, default=6000,
                   help="NMS scans only the top-K scored anchors "
                        "(-1 = all ~24k, exact reference semantics). "
                        "6000 is survivor-identical on the measured "
                        "workload; 2000 is a measured fast-serving "
                        "mode (mAP +0.0001, doc/BENCH.md)")
    p.add_argument("--rpn_nms_thresh", type=float, default=0.7)
    p.add_argument("--final_nms_thresh", type=float, default=0.3)
    p.add_argument("--max_gt_boxes", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=1,
                   help="batched test pass (skips loss stats)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard the batched test pass over this many "
                        "devices (requires --batch_size multiple of it)")
    p.add_argument("--skip_losses", type=int, default=0)
    p.add_argument("--beam_size", type=int, default=0,
                   help="beam width for caption decoding (0 = greedy)")
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
                        "720x544,544x720) for the batched test pass; "
                        "each batch runs on the smallest listed bucket "
                        "covering its examples — identical outputs, "
                        "less padded-square conv waste")
    p.add_argument("--out_json", default="")
    from ._common import add_quantize_flag, setup_compilation_cache
    add_quantize_flag(p)
    args = p.parse_args(argv)
    setup_compilation_cache()

    from ..config import DenseCapConfig
    from ..data.loader import DenseCapLoader
    from ..eval.eval_split import eval_split
    from ..utils import checkpoint as ckpt

    loader = DenseCapLoader(args.data_h5, args.data_json,
                            max_gt_boxes=args.max_gt_boxes)
    params, extra = ckpt.load_params(args.checkpoint)
    meta = json.loads(str(extra["meta"])) if "meta" in extra else {}
    if "config" in meta:
        cfg = DenseCapConfig.from_json(meta["config"])
    else:
        cfg = DenseCapConfig(vocab_size=loader.vocab_size(),
                             seq_length=loader.seq_length())
    from ._common import maybe_quantize, resolve_roi_impl

    params = maybe_quantize(params, args.quantize)
    cfg = cfg.replace(
        image_size=loader.canvas,
        test_max_proposals=args.num_proposals,
        test_rpn_nms_thresh=args.rpn_nms_thresh,
        test_final_nms_thresh=args.final_nms_thresh,
        max_gt_boxes=args.max_gt_boxes,
        test_pre_nms_topk=args.pre_nms_topk,
        roi_align_impl=resolve_roi_impl(
            args.roi_align or args.pallas_roi_align, cfg),
    )
    mesh = None
    if args.data_parallel > 1:
        from ..parallel import mesh as meshlib

        if args.batch_size % args.data_parallel:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be a multiple of "
                f"--data_parallel {args.data_parallel}")
        mesh = meshlib.make_mesh(n_devices=args.data_parallel,
                                 model_parallel=1)
    buckets = None
    if args.canvas_buckets:
        from ..utils.image import parse_buckets

        buckets = parse_buckets(args.canvas_buckets, loader.canvas)
    split = {"val": 1, "test": 2}[args.split]
    results = eval_split(params, loader, cfg, split=split,
                         max_images=args.max_images,
                         beam_size=args.beam_size,
                         compute_losses=not args.skip_losses,
                         batch_size=args.batch_size, mesh=mesh,
                         canvas_buckets=buckets)
    print(json.dumps({
        "map": results["ap_results"]["map"],
        "detmap": results["ap_results"]["detmap"],
        "loss": results["loss_results"].get("total_loss"),
        "score_method": results["ap_results"]["score_method"],
    }))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
