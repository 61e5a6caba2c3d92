"""Time the evaluator at real-eval scale (VERDICT r4 #2).

The full VG test split is ~5,000 images x up to 1,000 detections; the
reference evaluates 300 boxes per image by default (eval_utils.lua:
35-40), giving ~1.5M records. Phases timed here, all host-side:

  1. add_result      - merge gt + greedy assignment, per image;
  2. caption scoring - the pure-python fallback scorer over all records;
  3. AP grid         - DenseCaptioningEvaluator.evaluate() with scores
                       precomputed (the 5x7 grid + 101-pt interpolation);
  4. METEOR protocol - chunked pipelining vs the reference's per-record
                       synchronous round-trips, on a subset through the
                       fake jar from tests/test_meteor_fake_jar.py
                       (no Java in this image; the subprocess + pipe
                       costs are what's being measured).

Usage: python scripts/eval_scale_bench.py [--images 5000] [--dets 300]
"""

import argparse
import os
import subprocess
import sys
import tempfile
import textwrap
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from densecap_tpu.eval import meteor
from densecap_tpu.eval.evaluator import DenseCaptioningEvaluator

FAKE_JAR = textwrap.dedent("""
    import sys
    for line in sys.stdin:
        line = line.rstrip("\\n")
        if line.startswith("SCORE |||"):
            fields = [f.strip() for f in line.split("|||")[1:]]
            *refs, hyp = fields
            h = set(hyp.split())
            best = 0.0
            for r in refs:
                rs = set(r.split())
                inter = len(h & rs); union = len(h | rs)
                best = max(best, inter / union if union else 0.0)
            print(f"stats {best:.6f}", flush=True)
        elif line.startswith("EVAL |||"):
            print(line.split("|||")[1].strip().split()[1], flush=True)
""")


def synth_image(rng, n_dets, vocab):
    n_gt = rng.randint(3, 60)  # VG: ~43 regions/image
    gt_boxes = np.column_stack([
        rng.uniform(30, 600, n_gt), rng.uniform(30, 450, n_gt),
        rng.uniform(10, 200, n_gt), rng.uniform(10, 200, n_gt)])
    gt_text = [" ".join(rng.choice(vocab, rng.randint(2, 8)))
               for _ in range(n_gt)]
    picks = rng.randint(0, n_gt, n_dets)
    boxes = gt_boxes[picks] + rng.normal(0, 25, (n_dets, 4))
    boxes[:, 2:] = np.abs(boxes[:, 2:]) + 4
    text = [gt_text[p] if rng.rand() < 0.4
            else " ".join(rng.choice(vocab, rng.randint(2, 8)))
            for p in picks]
    logprobs = rng.uniform(0, 5, n_dets)
    return logprobs, boxes, text, gt_boxes, gt_text


def _score_sync(records, cmd):
    """The reference bridge's strictly synchronous per-record protocol
    (eval/meteor_bridge.py:26-45) — 4 blocking pipe ops per record."""
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True)
    scores = [0.0] * len(records)
    try:
        for i, rec in enumerate(records):
            refs = rec.get("references") or []
            if not refs:
                continue
            proc.stdin.write("SCORE ||| " + " ||| ".join(refs) + " ||| "
                             + rec.get("candidate", "") + "\n")
            proc.stdin.flush()
            stats = proc.stdout.readline().strip()
            proc.stdin.write(f"EVAL ||| {stats}\n")
            proc.stdin.flush()
            scores[i] = float(proc.stdout.readline().strip())
    finally:
        proc.stdin.close()
        proc.wait()
    return scores


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=5000)
    ap.add_argument("--dets", type=int, default=300)
    ap.add_argument("--meteor_subset", type=int, default=100_000)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    vocab = np.array([f"w{i}" for i in range(800)])

    ev = DenseCaptioningEvaluator()
    t0 = time.perf_counter()
    for i in range(args.images):
        ev.add_result(*synth_image(rng, args.dets, vocab))
        if (i + 1) % 1000 == 0:
            print(f"  added {i + 1}/{args.images} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
    t_add = time.perf_counter() - t0
    n_rec = len(ev.records)
    print(f"add_result: {args.images} images, {n_rec} records, "
          f"{t_add:.1f}s ({args.images / t_add:.0f} img/s)")

    t0 = time.perf_counter()
    scores = meteor.score_captions_fallback(ev.records)
    t_fb = time.perf_counter() - t0
    print(f"fallback scorer: {n_rec} records, {t_fb:.1f}s "
          f"({n_rec / t_fb / 1e3:.0f}k rec/s)")

    # AP grid alone: pin the scores so evaluate() skips re-scoring
    orig = meteor.score_captions
    meteor.score_captions = lambda records: {"scores": scores,
                                             "method": "pinned"}
    try:
        t0 = time.perf_counter()
        res = ev.evaluate(verbose=False)
        t_grid = time.perf_counter() - t0
    finally:
        meteor.score_captions = orig
    print(f"AP grid (35 cells + 101-pt interp): {t_grid:.1f}s   "
          f"mAP={res['map']:.4f} detmap={res['detmap']:.4f}")

    # METEOR stdio protocol: chunked vs per-record sync, twice —
    # against the scoring fake jar (realistic per-line work +
    # correctness assert) and against a minimal echo jar (the protocol
    # floor: what the pipes/context switches alone cost).
    ECHO_JAR = ("import sys\n"
                "for line in sys.stdin:\n"
                "    if line.startswith('SCORE'):\n"
                "        print('stats 0.5', flush=True)\n"
                "    else:\n"
                "        print('0.5', flush=True)\n")
    sub = ev.records[:args.meteor_subset]
    full = n_rec / len(sub)
    for label, src, check in (("scoring", FAKE_JAR, True),
                              ("echo", ECHO_JAR, False)):
        with tempfile.NamedTemporaryFile("w", suffix=".py",
                                         delete=False) as f:
            f.write(src)
            fake = f.name
        cmd = [sys.executable, fake]
        meteor._meteor_cmd, orig_cmd = (lambda jar: cmd), meteor._meteor_cmd
        try:
            t0 = time.perf_counter()
            s_chunk = meteor.score_captions_meteor(sub, fake)
            t_chunk = time.perf_counter() - t0
            t0 = time.perf_counter()
            s_sync = _score_sync(sub, cmd)
            t_sync = time.perf_counter() - t0
        finally:
            meteor._meteor_cmd = orig_cmd
            os.unlink(fake)
        if check:
            assert s_chunk == s_sync, "chunked protocol diverged from sync"
        print(f"METEOR protocol/{label} ({len(sub)} records): "
              f"chunked {t_chunk:.1f}s vs per-record sync {t_sync:.1f}s "
              f"({t_sync / t_chunk:.2f}x); extrapolated full-split: "
              f"{t_chunk * full / 60:.1f} vs {t_sync * full / 60:.1f} min")
    print(f"TOTAL time-to-mAP (ex-METEOR): "
          f"{(t_add + t_fb + t_grid) / 60:.1f} min")


if __name__ == "__main__":
    main()
