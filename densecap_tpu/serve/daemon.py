"""Filesystem-watching inference daemon (reference webcam/daemon.lua).

Kept for drop-in compatibility with the reference's fs-IPC serving
contract (daemon.lua:55-103): watch an inputs directory for *.jpg,
run inference, write <name>.json to the outputs directory, delete the
input. Prefer serve.server for anything new — this exists so tooling
built against the reference daemon keeps working.

  python -m densecap_tpu.serve.daemon --checkpoint ck.npz \
      --input_dir webcam/inputs --output_dir webcam/outputs
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--input_dir", default="webcam/inputs")
    p.add_argument("--output_dir", default="webcam/outputs")
    p.add_argument("--image_size", type=int, default=480)
    p.add_argument("--num_proposals", type=int, default=50)
    p.add_argument("--max_boxes", type=int, default=50)
    p.add_argument("--poll_interval", type=float, default=0.05,
                   help="seconds between directory scans (daemon.lua:102)")
    from ..cli._common import (add_quantize_flag, maybe_quantize,
                               setup_compilation_cache)
    add_quantize_flag(p)
    args = p.parse_args(argv)
    setup_compilation_cache()

    from ..config import DenseCapConfig
    from ..utils import checkpoint as ckpt
    from ..utils.image import load_image
    from .engine import InferenceEngine

    params, extra = ckpt.load_params(args.checkpoint)
    params = maybe_quantize(params, args.quantize)
    meta = json.loads(str(extra["meta"])) if "meta" in extra else {}
    if "config" in meta:
        cfg = DenseCapConfig.from_json(meta["config"])
    else:
        cfg = DenseCapConfig(
            vocab_size=int(meta.get("vocab_size", 10000)),
            seq_length=int(meta.get("seq_length", 15)),
        )
    from ..cli._common import resolve_roi_impl

    cfg = cfg.replace(image_size=args.image_size,
                      test_max_proposals=args.num_proposals,
                      roi_align_impl=resolve_roi_impl(-1, cfg))
    engine = InferenceEngine(params, cfg, meta.get("idx_to_token", {}),
                             max_boxes=args.max_boxes)
    print("compiling model...")
    engine.warmup()

    os.makedirs(args.input_dir, exist_ok=True)
    os.makedirs(args.output_dir, exist_ok=True)
    print(f"watching {args.input_dir} -> {args.output_dir}")
    while True:
        handled = False
        for name in sorted(os.listdir(args.input_dir)):
            if not name.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            path = os.path.join(args.input_dir, name)
            try:
                rgb = load_image(path)
            except Exception as e:  # partial writes etc (daemon.lua:63)
                print(f"skipping {name}: {e}")
                continue
            t0 = time.time()
            result = engine.process_array(rgb)
            out_path = os.path.join(
                args.output_dir, os.path.splitext(name)[0] + ".json"
            )
            with open(out_path + ".tmp", "w") as f:
                json.dump(result, f)
            os.replace(out_path + ".tmp", out_path)
            os.remove(path)
            handled = True
            print(f"{name}: {len(result['boxes'])} regions "
                  f"in {1000 * (time.time() - t0):.0f} ms")
        if not handled:
            time.sleep(args.poll_interval)


if __name__ == "__main__":
    main()
