"""Drive the real METEOR jar stdio protocol against a scripted fake.

No Java exists in this image, so the jar code path (persistent
subprocess, SCORE/EVAL line pairing, multi-reference lines, score
parsing) has never executed in CI — VERDICT round-1 item 5. Here a
small python process emulates METEOR 1.5's -stdio contract:

  in : SCORE ||| ref1 ||| ... ||| refN ||| hypothesis
  out: <stats line>
  in : EVAL ||| <stats>
  out: <score float>

and scores exact-match 1.0 / disjoint 0.0 like the reference's
evaluation_test.lua:8-25 sanity assertions. score_captions_meteor runs
UNCHANGED except for the substituted argv.
"""

import os
import sys
import textwrap

import pytest

from densecap_tpu.eval import meteor

FAKE_JAR = textwrap.dedent("""
    import sys

    pending = []
    for line in sys.stdin:
        line = line.rstrip("\\n")
        if line.startswith("SCORE |||"):
            fields = [f.strip() for f in line.split("|||")[1:]]
            *refs, hyp = fields
            h = set(hyp.split())
            best = 0.0
            for r in refs:
                rs = set(r.split())
                if not rs and not h:
                    continue
                inter = len(h & rs)
                union = len(h | rs)
                best = max(best, inter / union if union else 0.0)
            # stats line encodes the score; real METEOR emits counts
            print(f"stats {best:.6f}", flush=True)
        elif line.startswith("EVAL |||"):
            stats = line.split("|||")[1].strip()
            print(stats.split()[1], flush=True)
""")


@pytest.fixture
def fake_jar(tmp_path, monkeypatch):
    script = tmp_path / "fake_meteor.py"
    script.write_text(FAKE_JAR)
    monkeypatch.setattr(
        meteor, "_meteor_cmd",
        lambda jar: [sys.executable, str(script)])
    return str(script)


def test_protocol_roundtrip(fake_jar):
    records = [
        {"candidate": "a red car", "references": ["a red car"]},
        {"candidate": "zebra stripes", "references": ["blue ocean water"]},
        {"candidate": "a dog", "references": []},
        {"candidate": "green tree", "references": ["tall green tree",
                                                   "green tree"]},
    ]
    scores = meteor.score_captions_meteor(records, fake_jar)
    assert len(scores) == 4
    assert scores[0] == pytest.approx(1.0)      # exact match
    assert scores[1] == pytest.approx(0.0)      # disjoint
    assert scores[2] == 0.0                     # no references -> skipped
    assert scores[3] == pytest.approx(1.0)      # best-reference match


def test_pipe_delimiter_sanitized(fake_jar):
    """'|||' inside captions must not corrupt the protocol framing."""
    records = [{"candidate": "a ||| b", "references": ["a  b"]}]
    scores = meteor.score_captions_meteor(records, fake_jar)
    assert scores[0] == pytest.approx(1.0)


def test_many_records_one_process(fake_jar):
    """The persistent process handles a long interleaved stream."""
    records = [{"candidate": f"word{i}", "references": [f"word{i}"]}
               for i in range(50)]
    scores = meteor.score_captions_meteor(records, fake_jar)
    assert all(s == pytest.approx(1.0) for s in scores)


def test_chunked_pipelining_preserves_record_pairing(fake_jar):
    """Chunked writes (the real-scale protocol) must keep every score
    paired to its record across chunk boundaries, with no-reference
    records interleaved (they skip the jar entirely)."""
    records = []
    for i in range(23):
        if i % 5 == 2:
            records.append({"candidate": f"w{i}", "references": []})
        elif i % 2 == 0:
            records.append({"candidate": f"w{i}", "references": [f"w{i}"]})
        else:  # half-overlap: jaccard 1/3
            records.append({"candidate": f"w{i} x{i}",
                            "references": [f"w{i} y{i}"]})
    scores = meteor.score_captions_meteor(records, fake_jar, chunk=7)
    for i, (rec, s) in enumerate(zip(records, scores)):
        if not rec["references"]:
            assert s == 0.0, i
        elif i % 2 == 0:
            assert s == pytest.approx(1.0), i
        else:
            assert s == pytest.approx(1 / 3), i


def test_score_captions_dispatches_to_jar(tmp_path, monkeypatch):
    """With a jar present (and the argv substituted), score_captions
    reports method='meteor', not the fallback."""
    script = tmp_path / "fake_meteor.py"
    script.write_text(FAKE_JAR)
    jar = tmp_path / "meteor-1.5.jar"
    jar.write_text("placeholder")
    monkeypatch.setattr(meteor, "_meteor_cmd",
                        lambda j: [sys.executable, str(script)])
    monkeypatch.setattr(meteor, "_find_meteor_jar", lambda: str(jar))
    out = meteor.score_captions(
        [{"candidate": "x", "references": ["x"]}])
    assert out["method"] == "meteor"
    assert out["scores"][0] == pytest.approx(1.0)


def test_fallback_reference_sanity():
    """Port of evaluation_test.lua:8-25 against the fallback scorer:
    exact match ~1, disjoint 0."""
    out = meteor.score_captions_fallback([
        {"candidate": "a red car", "references": ["a red car"]},
        {"candidate": "zebra", "references": ["ocean water"]},
    ])
    assert out[0] == pytest.approx(1.0)
    assert out[1] == 0.0
