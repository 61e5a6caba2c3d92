"""End-to-end HTTP serving measurement (VERDICT r4 weak #4).

Drives the REAL serve/server.py stack — base64 JPEG over HTTP, server-
side decode, engine micro-batch assembly, device step, JSON response —
with N concurrent synthetic webcam clients, and reports FPS and
latency percentiles. The reference's comparable figure is 1-3 FPS at
the browser (webcam/README.md:6-9, one GPU, client/server over HTTP).

Usage:
  python scripts/http_serving_bench.py --checkpoint /tmp/soak/densecap.npz \
      --clients 8 --batch_size 8 --seconds 30
The server is launched as a subprocess on --port with the webcam
setting (480px, 50 proposals) unless --no_server uses a running one.
"""

import argparse
import base64
import io
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_frames(n, size=480, seed=0):
    """Webcam-ish JPEG frames: moving colored boxes on noise."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    frames = []
    base = rng.randint(85, 135, (size, size, 3)).astype(np.uint8)
    for i in range(n):
        img = base.copy()
        for _ in range(3):
            w, h = rng.randint(60, 200, 2)
            x, y = rng.randint(0, size - w), rng.randint(0, size - h)
            img[y:y + h, x:x + w] = rng.randint(0, 255, 3)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=85)
        frames.append(base64.b64encode(buf.getvalue()).decode())
    return frames


def client_loop(url, stream_id, frames, stop, lat, errors):
    i = 0
    while not stop.is_set():
        payload = json.dumps({"image": frames[i % len(frames)],
                              "stream": stream_id}).encode()
        req = urllib.request.Request(
            url, data=payload, headers={"Content-Type": "application/json"})
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                out = json.loads(resp.read())
            assert "boxes" in out, out
            lat.append(time.perf_counter() - t0)
        except Exception as e:
            errors.append(repr(e))
            if len(errors) > 20:
                return
        i += 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--port", type=int, default=18923,
                    help="default avoids 80xx-81xx, which the axon "
                         "dev tunnel's port bank squats on localhost")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--image_size", type=int, default=480)
    ap.add_argument("--num_proposals", type=int, default=50)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--no_server", action="store_true",
                    help="use an already-running server on --port")
    args = ap.parse_args()

    proc = None
    if not args.no_server:
        proc = subprocess.Popen(
            [sys.executable, "-m", "densecap_tpu.serve.server",
             "--checkpoint", args.checkpoint, "--port", str(args.port),
             "--image_size", str(args.image_size),
             "--num_proposals", str(args.num_proposals),
             "--batch_size", str(args.batch_size)],
            cwd=os.path.join(os.path.dirname(__file__), ".."),
        )
    url = f"http://127.0.0.1:{args.port}/api/infer"

    frames = make_frames(16, args.image_size)
    # wait for the server to come up + compile (a cold remote-compile
    # tunnel can take >10 min; the persistent cache makes retries fast)
    deadline = time.time() + 1500
    try:
        while True:
            try:
                req = urllib.request.Request(
                    url, data=json.dumps({"image": frames[0]}).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=60) as resp:
                    json.loads(resp.read())
                break
            except Exception:
                if time.time() > deadline:
                    raise SystemExit("server never came up")
                if proc is not None and proc.poll() is not None:
                    raise SystemExit(
                        f"server exited rc={proc.returncode}")
                time.sleep(2.0)
    except BaseException:
        # never orphan the compiling server subprocess (it would hold
        # the port and poison the next run with 'address in use')
        if proc is not None:
            proc.terminate()
        raise

    lat, errors = [], []
    stop = threading.Event()
    threads = [
        threading.Thread(
            target=client_loop,
            args=(url, f"cam{c}", frames[c:] + frames[:c], stop, lat,
                  errors),
            daemon=True)
        for c in range(args.clients)
    ]
    # warm the micro-batcher, then measure a clean window
    for t in threads:
        t.start()
    time.sleep(5.0)
    lat.clear()
    t0 = time.perf_counter()
    time.sleep(args.seconds)
    n = len(lat)
    dt = time.perf_counter() - t0
    stop.set()
    for t in threads:
        t.join(timeout=35)
    if proc is not None:
        proc.terminate()
        proc.wait(timeout=20)

    if errors:
        print(f"errors ({len(errors)}): {errors[:3]}")
    arr = np.array(sorted(lat))
    print(f"HTTP-SERVING ({args.clients} clients, micro-batch "
          f"{args.batch_size}, {args.image_size}px, "
          f"{args.num_proposals} proposals): "
          f"{n / dt:.1f} FPS aggregate; latency p50 "
          f"{1e3 * arr[int(0.5 * n)]:.0f} ms, p90 "
          f"{1e3 * arr[int(0.9 * n)]:.0f} ms, p99 "
          f"{1e3 * arr[min(n - 1, int(0.99 * n))]:.0f} ms "
          f"over {n} requests / {dt:.1f}s")


if __name__ == "__main__":
    main()
