"""Convert a DenseCap .t7 checkpoint's VGG weights into our format.

Reads the torch checkpoint with the pure-python t7 reader, extracts the
13 VGG convs + fc6/fc7 (the ~119M-parameter bulk that matters for
transfer), converts layouts (NCHW->HWIO kernels, channel-major fc6
flatten), and writes a params .npz where the trunk/recognition weights
are pretrained and the RPN/branches/LM are freshly initialized — the
same situation the reference starts training from (loadcaffe VGG +
fresh heads, DenseCapModel.lua:53-111).

  python -m densecap_tpu.cli.convert_t7 --t7 densecap-pretrained.t7 \
      --vocab_size 10497 --output vgg-init.npz
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--t7", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--vocab_size", type=int, required=True)
    p.add_argument("--seq_length", type=int, default=15)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from ..config import DenseCapConfig
    from ..models import densecap
    from ..utils import checkpoint as ckpt
    from ..utils import t7_reader

    print(f"reading {args.t7} ...")
    loaded = t7_reader.load(args.t7)
    weights = t7_reader.extract_densecap_weights(loaded)
    print(f"extracted {len(weights)} tensors")

    trunk1, trunk2, recog = ckpt.convert_torch_vgg16(weights)

    cfg = DenseCapConfig(vocab_size=args.vocab_size,
                         seq_length=args.seq_length)
    params = densecap.init_params(jax.random.PRNGKey(args.seed), cfg)
    params["trunk1"] = trunk1
    params["trunk2"] = trunk2
    params["recog"] = recog

    meta = json.dumps({
        "vocab_size": cfg.vocab_size,
        "seq_length": cfg.seq_length,
        "config": cfg.to_json(),
        "note": "VGG trunk+recog from t7; RPN/branches/LM fresh",
    })
    ckpt.save_params(args.output, params, extra={"meta": meta})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
