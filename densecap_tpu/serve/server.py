"""HTTP serving endpoint (reference webcam/server.py + daemon.lua).

The reference split serving across a Flask HTTPS server and a Lua
daemon communicating through the filesystem (server.py:24-46 polling
outputs/, daemon.lua:55-103 polling inputs/ — 1-3 FPS, IO bound). Here
one process serves HTTP directly on top of InferenceEngine: POST a
base64 or raw JPEG, get boxes/captions JSON back. stdlib http.server
with a thread pool — no extra dependencies, TLS optional via --certfile.

  python -m densecap_tpu.serve.server --checkpoint ck.npz --port 8080

POST /api/infer   body: {"image": "<base64 jpeg>"} or raw jpeg bytes
GET  /            serves the webcam browser client
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import ssl
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "static")


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *a):  # quiet
            pass

        def do_GET(self):
            path = "client.html" if self.path in ("/", "") else \
                self.path.lstrip("/")
            full = os.path.normpath(os.path.join(_STATIC_DIR, path))
            if not full.startswith(_STATIC_DIR) or not os.path.isfile(full):
                self._send(404, b'{"error": "not found"}')
                return
            ctype = ("text/html" if full.endswith(".html")
                     else "application/javascript" if full.endswith(".js")
                     else "text/plain")
            with open(full, "rb") as f:
                self._send(200, f.read(), ctype)

        def do_POST(self):
            if self.path != "/api/infer":
                self._send(404, b'{"error": "not found"}')
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            # per-client smoothing stream: JSON "stream" field, or the
            # X-Stream-Id header for raw-JPEG posts
            stream_id = self.headers.get("X-Stream-Id")
            try:
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    payload = json.loads(body)
                    img_b64 = payload["image"]
                    stream_id = payload.get("stream", stream_id)
                    # data-URL prefix tolerated (web-client sends one)
                    if "," in img_b64[:64]:
                        img_b64 = img_b64.split(",", 1)[1]
                    jpg = base64.b64decode(img_b64)
                else:
                    jpg = body
                rgb = None
                try:  # native in-memory decode (native/dcio.cpp)
                    from .. import native_lib

                    if native_lib.is_available("dcio"):
                        rgb = native_lib.decode_jpeg_bytes(jpg)
                except Exception:
                    rgb = None
                if rgb is None:  # PIL fallback (also handles PNG etc)
                    from PIL import Image

                    rgb = np.asarray(
                        Image.open(io.BytesIO(jpg)).convert("RGB")
                    )
            except Exception as e:
                # payload problems (bad json/base64/image bytes)
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            try:
                result = engine.process_array(rgb, stream_id=stream_id)
                self._send(200, json.dumps(result).encode())
            except TimeoutError as e:
                self._send(504, json.dumps({"error": str(e)}).encode())
            except Exception as e:
                # engine-side failure: server fault, not client fault
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--image_size", type=int, default=480,
                   help="reference demo uses 480px for latency")
    p.add_argument("--num_proposals", type=int, default=50)
    p.add_argument("--pre_nms_topk", type=int, default=6000,
                   help="NMS scans only the top-K scored anchors "
                        "(-1 = all; 2000 is a measured fast-serving "
                        "mode, doc/BENCH.md serving-modes table)")
    p.add_argument("--max_boxes", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=1,
                   help="micro-batch concurrent requests into one "
                        "compiled step (throughput mode)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard each micro-batch over this many devices "
                        "(requires --batch_size multiple of it)")
    p.add_argument("--certfile", default="",
                   help="enable TLS (browser webcam needs HTTPS off "
                        "localhost)")
    p.add_argument("--keyfile", default="")
    from ..cli._common import add_quantize_flag, setup_compilation_cache
    add_quantize_flag(p)
    args = p.parse_args(argv)
    setup_compilation_cache()

    from ..config import DenseCapConfig
    from ..utils import checkpoint as ckpt
    from .engine import InferenceEngine

    params, extra = ckpt.load_params(args.checkpoint)
    from ..cli._common import maybe_quantize
    params = maybe_quantize(params, args.quantize)
    meta = json.loads(str(extra["meta"])) if "meta" in extra else {}
    if "config" in meta:
        cfg = DenseCapConfig.from_json(meta["config"])
    else:
        cfg = DenseCapConfig(
            vocab_size=int(meta.get("vocab_size", 10000)),
            seq_length=int(meta.get("seq_length", 15)),
        )
    import jax

    from ..cli._common import resolve_roi_impl

    cfg = cfg.replace(
        image_size=args.image_size,
        test_max_proposals=args.num_proposals,
        test_pre_nms_topk=args.pre_nms_topk,
        roi_align_impl=resolve_roi_impl(-1, cfg),
    )
    mesh = None
    if args.data_parallel > 1:
        from ..parallel import mesh as meshlib

        mesh = meshlib.make_mesh(n_devices=args.data_parallel,
                                 model_parallel=1)

    def build(cfg_):
        return InferenceEngine(
            params, cfg_, meta.get("idx_to_token", {}),
            max_boxes=args.max_boxes, batch_size=args.batch_size,
            mesh=mesh,
        )

    engine = build(cfg)
    print("compiling model...")
    try:
        engine.warmup()
    except Exception as e:
        if cfg.roi_align_impl in ("", "gather"):
            raise
        # the mxu/pallas RoI formulations support the flagship
        # geometry; unusual geometries can hit layout limits — fall
        # back to the XLA gather path rather than refuse to serve
        print(f"{cfg.roi_align_impl} roi_align failed to compile "
              f"({e!r}); falling back to the XLA gather path")
        cfg = cfg.replace(roi_align_impl="gather",
                          use_pallas_roi_align=False)
        engine = build(cfg)
        engine.warmup()

    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(engine))
    if args.certfile:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(args.certfile, args.keyfile or None)
        httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    print(f"serving on {args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
