"""Caption scoring: METEOR 1.5 jar bridge with a pure-python fallback.

The reference shells out Lua -> python -> Java METEOR via JSON files
(eval/eval_utils.lua:94-102, eval/meteor_bridge.py:14-54). We keep the
same contract — records in, parallel list of scores out — but run the
jar behind a persistent subprocess when available, and otherwise fall
back to a METEOR-flavoured unigram matcher so evaluation runs
end-to-end on machines without Java/the jar (scores then are NOT
comparable to published METEOR numbers; the mAP pipeline and thresholds
are unchanged).

Record format (eval_utils.lua:208-215): each record has 'candidate'
(string) and 'references' (list of strings); score is the max over
references, 0 if references is empty.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from collections import Counter

METEOR_JAR_CANDIDATES = (
    "eval/meteor/meteor-1.5.jar",
    os.path.expanduser("~/meteor-1.5.jar"),
)


def _find_meteor_jar():
    if not shutil.which("java"):
        return None
    for p in METEOR_JAR_CANDIDATES:
        if os.path.exists(p):
            return p
    return None


def _fallback_pair_score(candidate: str, reference: str) -> float:
    """Unigram harmonic-mean matcher in the spirit of METEOR's base
    measure: P/R over unigram matches with recall-weighted F (alpha=0.9),
    without the synonym/stem modules or fragmentation penalty."""
    c = candidate.split()
    r = reference.split()
    if not c or not r:
        return 0.0
    overlap = sum((Counter(c) & Counter(r)).values())
    if overlap == 0:
        return 0.0
    p = overlap / len(c)
    rr = overlap / len(r)
    alpha = 0.9
    return p * rr / (alpha * p + (1 - alpha) * rr)


def score_captions_fallback(records):
    scores = []
    for rec in records:
        refs = rec.get("references") or []
        cand = rec.get("candidate", "")
        scores.append(
            max((_fallback_pair_score(cand, r) for r in refs), default=0.0)
        )
    return scores


def _clean(s):
    return s.replace("|||", "").replace("\n", " ").replace("  ", " ")


def _meteor_cmd(jar):
    """The exact invocation of the reference bridge
    (eval/meteor_bridge.py:19-25). Tests substitute this to point the
    unchanged protocol loop at a scripted fake process."""
    return ["java", "-jar", "-Xmx2G", jar, "-", "-", "-stdio", "-l", "en",
            "-norm"]


METEOR_CHUNK = 128


def score_captions_meteor(records, jar, chunk=METEOR_CHUNK):
    """Batch-score via one Java METEOR process in stdio mode.

    The per-record protocol is exactly the reference bridge's
    (eval/meteor_bridge.py:19-45): `java -jar -Xmx2G meteor-1.5.jar - -
    -stdio -l en -norm`, one `SCORE ||| ref1 ||| ... ||| refN |||
    hypothesis` line per record followed by `EVAL ||| <stats>`; METEOR
    handles multi-reference aggregation natively. Records with no
    references score 0 and never reach the jar.

    Unlike the reference's strictly synchronous loop, records are
    PIPELINED in chunks: write `chunk` SCORE lines, read their stats,
    write the EVAL lines, read the scores — 4 flushes per chunk instead
    of 4 blocking pipe round-trips per record (real VG eval scale is
    ~5M records). The chunk size keeps the child's pending stdout
    (stats/score lines, ~150 bytes each) well under the 64 KiB pipe
    buffer, so neither side ever blocks mid-chunk.
    """
    proc = subprocess.Popen(
        _meteor_cmd(jar),
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True,
        cwd=os.path.dirname(os.path.abspath(jar)) or None,
    )
    scores = [0.0] * len(records)
    idxs = [i for i, rec in enumerate(records) if rec.get("references")]
    try:
        for base in range(0, len(idxs), chunk):
            grp = idxs[base:base + chunk]
            lines = []
            for i in grp:
                refs = [_clean(r) for r in records[i]["references"]]
                hyp = _clean(records[i].get("candidate", ""))
                lines.append("SCORE ||| " + " ||| ".join(refs)
                             + " ||| " + hyp + "\n")
            proc.stdin.write("".join(lines))
            proc.stdin.flush()
            stats = [proc.stdout.readline().strip() for _ in grp]
            proc.stdin.write(
                "".join(f"EVAL ||| {s}\n" for s in stats))
            proc.stdin.flush()
            for i in grp:
                scores[i] = float(proc.stdout.readline().strip())
    finally:
        proc.stdin.close()
        proc.wait()
    return scores


def score_captions(records):
    """Score records; returns {'scores': [...], 'method': 'meteor'|'fallback'}."""
    jar = _find_meteor_jar()
    if jar is not None:
        try:
            return {"scores": score_captions_meteor(records, jar),
                    "method": "meteor"}
        except Exception as e:  # pragma: no cover - depends on env
            print(f"METEOR jar failed ({e}); using fallback scorer")
    return {"scores": score_captions_fallback(records),
            "method": "fallback"}
