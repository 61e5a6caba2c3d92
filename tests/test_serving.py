"""Serving tests: engine round-trip, temporal smoothing ids, HTTP
server request/response, and CLI round-trips (run_model on a synthetic
checkpoint)."""

import base64
import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densecap_tpu.config import DenseCapConfig
from densecap_tpu.models import densecap
from densecap_tpu.serve.engine import InferenceEngine, TemporalSmoother
from densecap_tpu.utils import checkpoint as ckpt

TINY = DenseCapConfig(
    vocab_size=12,
    seq_length=4,
    image_size=64,
    anchors=((8, 8), (16, 16), (12, 24), (24, 12)),
    sampler_batch_size=8,
    max_gt_boxes=4,
    test_max_proposals=8,
    rnn_size=16,
    rnn_encoding_size=16,
    fc_dim=32,
    rpn_num_filters=16,
    compute_dtype=jnp.float32,
)
IDX_TO_TOKEN = {i: f"w{i}" for i in range(1, 13)}


@pytest.fixture(scope="module")
def engine():
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    return InferenceEngine(params, TINY, IDX_TO_TOKEN, max_boxes=5)


def test_engine_process(engine):
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (100, 80, 3), dtype=np.uint8)
    out = engine.process_array(rgb)
    assert set(out) == {"boxes", "scores", "captions", "ids"}
    n = len(out["boxes"])
    assert n == len(out["scores"]) == len(out["captions"]) == len(out["ids"])
    for b in out["boxes"]:
        # boxes are in the ORIGINAL 80x100 coordinate frame
        assert b[0] >= -5 and b[0] + b[2] <= 90
        assert b[1] >= -5 and b[1] + b[3] <= 110


def test_temporal_smoother_identity():
    sm = TemporalSmoother(iou_thresh=0.5)
    b1 = np.array([[20.0, 20.0, 10.0, 10.0], [50.0, 50.0, 8.0, 8.0]])
    ids1 = sm.assign_ids(b1)
    assert sorted(ids1.tolist()) == [0, 1]
    # same boxes slightly moved: ids persist
    b2 = b1 + np.array([[1.0, 1.0, 0.0, 0.0], [0.5, 0.0, 0.0, 0.0]])
    ids2 = sm.assign_ids(b2)
    np.testing.assert_array_equal(ids1, ids2)
    # a new far-away box gets a fresh id
    b3 = np.vstack([b2, [[200.0, 200.0, 10.0, 10.0]]])
    ids3 = sm.assign_ids(b3)
    assert ids3[2] == 2


def test_per_stream_smoothing(engine):
    """Two interleaved streams keep independent, stable box ids
    (multi-client generalization of single_machine_demo.lua:137-171)."""
    bA = np.array([[20.0, 20.0, 10.0, 10.0], [50.0, 50.0, 8.0, 8.0]])
    bB = np.array([[40.0, 10.0, 6.0, 6.0]])

    idsA1 = engine._assign_ids(bA, "streamA")
    idsB1 = engine._assign_ids(bB, "streamB")
    # each stream starts its own id space
    assert sorted(idsA1.tolist()) == [0, 1]
    assert idsB1.tolist() == [0]
    # interleaved second frames: ids persist per stream, no cross-talk
    idsA2 = engine._assign_ids(bA + 1.0, "streamA")
    idsB2 = engine._assign_ids(bB + 0.5, "streamB")
    np.testing.assert_array_equal(idsA1, idsA2)
    np.testing.assert_array_equal(idsB1, idsB2)
    # a shared-smoother regression would have advanced B's next_id past
    # 1 (A allocated ids first) or matched A's boxes against B's frame


def test_stream_lru_eviction():
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    eng = InferenceEngine(params, TINY, IDX_TO_TOKEN, max_boxes=5,
                          max_streams=2)
    b = np.array([[20.0, 20.0, 10.0, 10.0]])
    eng._assign_ids(b, "a")
    eng._assign_ids(b + 0.5, "a")  # a's smoother advanced: next id is 1
    eng._assign_ids(b, "b")
    eng._assign_ids(b, "c")  # evicts a (LRU)
    assert set(eng._smoothers) == {"b", "c"}
    # a comes back with FRESH state (ids restart at 0), b was kept warm
    assert eng._assign_ids(b + 1.0, "a").tolist() == [0]
    assert eng._assign_ids(b + 0.5, "b").tolist() == [0]


def test_http_server_roundtrip(engine):
    from http.server import ThreadingHTTPServer

    from densecap_tpu.serve.server import make_handler
    from PIL import Image

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(1)
        rgb = rng.randint(0, 255, (60, 60, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="JPEG")
        payload = json.dumps({
            "image": "data:image/jpeg;base64,"
                     + base64.b64encode(buf.getvalue()).decode()
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/infer", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        assert "boxes" in out and "captions" in out

        # raw jpeg body works too
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/infer", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out2 = json.loads(resp.read())
        assert out2["boxes"] == out["boxes"]

        # static client page is served
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ) as resp:
            assert b"DenseCap" in resp.read()
    finally:
        httpd.shutdown()


def test_run_model_cli(tmp_path):
    from PIL import Image

    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    ckpath = str(tmp_path / "ck.npz")
    meta = json.dumps({
        "vocab_size": TINY.vocab_size,
        "seq_length": TINY.seq_length,
        "idx_to_token": {str(k): v for k, v in IDX_TO_TOKEN.items()},
        "config": TINY.to_json(),
    })
    ckpt.save_params(ckpath, params, extra={"meta": meta})

    rng = np.random.RandomState(2)
    img_path = str(tmp_path / "img.jpg")
    Image.fromarray(
        rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
    ).save(img_path)

    from densecap_tpu.cli import run_model

    outdir = str(tmp_path / "out")
    run_model.main([
        "--checkpoint", ckpath,
        "--input_image", img_path,
        "--image_size", "64",
        "--num_proposals", "8",
        "--output_dir", outdir,
        "--output_images", "1",
    ])
    with open(os.path.join(outdir, "results.json")) as f:
        res = json.load(f)
    assert len(res["results"]) == 1
    r = res["results"][0]
    assert r["img_name"] == "img.jpg"
    assert len(r["boxes"]) == len(r["scores"]) == len(r["captions"])
    assert os.path.exists(os.path.join(outdir, "img_boxes.png"))


def test_run_model_input_dir_native_io(tmp_path):
    """--input_dir with the threaded C++ decode pipeline produces the
    same results.json schema (and equivalent boxes) as the PIL path."""
    from densecap_tpu import native_lib
    from densecap_tpu.cli import run_model
    from PIL import Image

    if not native_lib.is_available("dcio"):
        pytest.skip("libdcio unavailable")

    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    ckpath = str(tmp_path / "ck.npz")
    ckpt.save_params(ckpath, params, extra={"meta": json.dumps(
        {"config": TINY.to_json(),
         "idx_to_token": {str(k): v for k, v in IDX_TO_TOKEN.items()}})})
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(11)
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 255, (50 + 10 * i, 70, 3), dtype=np.uint8)
        ).save(str(img_dir / f"im{i}.jpg"), quality=95)

    outs = {}
    for native in (0, 1):
        outdir = str(tmp_path / f"out{native}")
        run_model.main([
            "--checkpoint", ckpath, "--input_dir", str(img_dir),
            "--image_size", "64", "--num_proposals", "8",
            "--output_dir", outdir, "--native_io", str(native),
        ])
        with open(os.path.join(outdir, "results.json")) as f:
            outs[native] = json.load(f)["results"]

    assert len(outs[0]) == len(outs[1]) == 3
    for r0, r1 in zip(outs[0], outs[1]):
        assert r0["img_name"] == r1["img_name"]
        # decoders share libjpeg but resamplers differ slightly; the
        # box GEOMETRY should agree to within a couple of pixels
        b0, b1 = np.asarray(r0["boxes"]), np.asarray(r1["boxes"])
        if b0.shape == b1.shape and len(b0):
            assert np.median(np.abs(b0 - b1)) < 5.0


def test_extract_features_cli(tmp_path):
    from PIL import Image

    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    ckpath = str(tmp_path / "ck.npz")
    meta = json.dumps({"vocab_size": TINY.vocab_size,
                       "seq_length": TINY.seq_length,
                       "config": TINY.to_json()})
    ckpt.save_params(ckpath, params, extra={"meta": meta})
    rng = np.random.RandomState(3)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(str(tmp_path / f"im{i}.jpg"))

    from densecap_tpu.cli import extract_features

    out_h5 = str(tmp_path / "feats.h5")
    # must match the tiny model's geometry: pass the tiny cfg via meta?
    # extract_features builds a default cfg from meta; override with the
    # fields it reads — image_size and boxes_per_image
    extract_features.main([
        "--checkpoint", ckpath,
        "--input_dir", str(tmp_path),
        "--output_h5", out_h5,
        "--image_size", "64",
        "--boxes_per_image", "4",
    ])
    import h5py

    with h5py.File(out_h5) as h5:
        assert h5["boxes"].shape == (2, 4, 4)
        assert h5["feats"].shape[0] == 2
        assert h5["valid"].shape == (2, 4)


def test_daemon_fs_contract(tmp_path, engine, monkeypatch):
    """Directory-watcher protocol: drop a jpg in, json comes out, input
    is deleted (webcam/daemon.lua contract) — exercised directly against
    the engine via one poll iteration's worth of logic."""
    from PIL import Image

    in_dir = tmp_path / "inputs"
    out_dir = tmp_path / "outputs"
    in_dir.mkdir()
    out_dir.mkdir()
    rng = np.random.RandomState(5)
    Image.fromarray(
        rng.randint(0, 255, (50, 50, 3), dtype=np.uint8)
    ).save(str(in_dir / "frame1.jpg"))

    # run one scan of the daemon loop body inline
    from densecap_tpu.utils.image import load_image

    for name in sorted(os.listdir(in_dir)):
        rgb = load_image(str(in_dir / name))
        result = engine.process_array(rgb)
        with open(out_dir / (name.rsplit(".", 1)[0] + ".json"), "w") as f:
            json.dump(result, f)
        os.remove(in_dir / name)

    assert not list(in_dir.iterdir())
    with open(out_dir / "frame1.json") as f:
        out = json.load(f)
    assert "boxes" in out and "captions" in out


def test_run_model_split_mode(tmp_path):
    """--input_split runs straight off the preprocessed h5."""
    from densecap_tpu.data import preprocess as pp
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(6)
    data = []
    for i in (1, 2):
        Image.fromarray(
            rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
        ).save(str(img_dir / f"{i}.jpg"))
        data.append({"id": i, "regions": [
            {"phrase": "a thing here", "x": 5, "y": 5,
             "width": 20, "height": 20},
        ]})
    with open(tmp_path / "regions.json", "w") as f:
        json.dump(data, f)
    with open(tmp_path / "splits.json", "w") as f:
        json.dump({"train": [1], "val": [2], "test": []}, f)
    pp.main([
        "--region_data", str(tmp_path / "regions.json"),
        "--image_dir", str(img_dir),
        "--split_json", str(tmp_path / "splits.json"),
        "--h5_output", str(tmp_path / "d.h5"),
        "--json_output", str(tmp_path / "d.json"),
        "--image_size", "64", "--max_token_length", "4",
        "--min_token_instances", "1", "--num_workers", "1",
    ])

    # checkpoint with vocab matching the dataset dicts
    with open(tmp_path / "d.json") as f:
        vocab_n = len(json.load(f)["token_to_idx"])
    cfg = TINY.replace(vocab_size=vocab_n)
    params = densecap.init_params(jax.random.PRNGKey(0), cfg)
    ckpath = str(tmp_path / "ck.npz")
    ckpt.save_params(ckpath, params, extra={"meta": json.dumps(
        {"config": cfg.to_json()})})

    from densecap_tpu.cli import run_model

    outdir = str(tmp_path / "out")
    run_model.main([
        "--checkpoint", ckpath,
        "--input_split", "val",
        "--data_h5", str(tmp_path / "d.h5"),
        "--data_json", str(tmp_path / "d.json"),
        "--output_dir", outdir,
        "--num_proposals", "8",
    ])
    with open(os.path.join(outdir, "results.json")) as f:
        res = json.load(f)
    assert len(res["results"]) == 1
    assert res["results"][0]["img_name"] == "2.jpg"


def test_evaluate_model_cli(tmp_path):
    """evaluate_model over a mini preprocessed dataset computes a mAP."""
    from densecap_tpu.data import preprocess as pp
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    data = []
    for i in (1, 2, 3):
        Image.fromarray(
            rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
        ).save(str(img_dir / f"{i}.jpg"))
        data.append({"id": i, "regions": [
            {"phrase": "a red thing", "x": 5, "y": 5,
             "width": 20, "height": 20},
            {"phrase": "blue thing here", "x": 40, "y": 20,
             "width": 25, "height": 20},
        ]})
    with open(tmp_path / "regions.json", "w") as f:
        json.dump(data, f)
    with open(tmp_path / "splits.json", "w") as f:
        json.dump({"train": [1], "val": [2], "test": [3]}, f)
    pp.main([
        "--region_data", str(tmp_path / "regions.json"),
        "--image_dir", str(img_dir),
        "--split_json", str(tmp_path / "splits.json"),
        "--h5_output", str(tmp_path / "d.h5"),
        "--json_output", str(tmp_path / "d.json"),
        "--image_size", "64", "--max_token_length", "4",
        "--min_token_instances", "1", "--num_workers", "1",
    ])
    with open(tmp_path / "d.json") as f:
        vocab_n = len(json.load(f)["token_to_idx"])
    cfg = TINY.replace(vocab_size=vocab_n)
    params = densecap.init_params(jax.random.PRNGKey(0), cfg)
    ckpath = str(tmp_path / "ck.npz")
    ckpt.save_params(ckpath, params, extra={"meta": json.dumps(
        {"config": cfg.to_json()})})

    from densecap_tpu.cli import evaluate_model

    out_json = str(tmp_path / "res.json")
    evaluate_model.main([
        "--checkpoint", ckpath,
        "--data_h5", str(tmp_path / "d.h5"),
        "--data_json", str(tmp_path / "d.json"),
        "--split", "test",
        "--num_proposals", "8",
        "--max_gt_boxes", "4",
        "--out_json", out_json,
    ])
    with open(out_json) as f:
        res = json.load(f)
    assert 0.0 <= res["ap_results"]["map"] <= 1.0
    assert "total_loss" in res["loss_results"]


def test_engine_micro_batching():
    """batch_size > 1: concurrent requests produce the same outputs as
    sequential single-image processing."""
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    single = InferenceEngine(params, TINY, IDX_TO_TOKEN, max_boxes=5,
                             smoothing=False)
    batched = InferenceEngine(params, TINY, IDX_TO_TOKEN, max_boxes=5,
                              smoothing=False, batch_size=3,
                              batch_window_ms=50.0)
    rng = np.random.RandomState(9)
    imgs = [rng.randint(0, 255, (60, 70, 3), dtype=np.uint8)
            for _ in range(3)]
    want = [single.process_array(im) for im in imgs]

    results = [None] * 3

    def worker(i):
        results[i] = batched.process_array(imgs[i])

    ts_ = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts_:
        t.start()
    for t in ts_:
        t.join(timeout=120)
    for got, ref in zip(results, want):
        assert got is not None
        np.testing.assert_allclose(got["boxes"], ref["boxes"],
                                   rtol=1e-4, atol=1e-3)
        assert got["captions"] == ref["captions"]


def test_engine_batch_error_propagates_not_deadlocks():
    """A throwing forward must raise in the CALLER's thread (previously
    clients waited on their Event forever; VERDICT round-1 weak #4)."""
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    eng = InferenceEngine(params, TINY, IDX_TO_TOKEN, smoothing=False,
                          batch_size=2, batch_window_ms=5.0,
                          request_timeout_s=30.0)

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    eng._fwd_batch = boom
    rgb = np.zeros((40, 40, 3), np.uint8)
    with pytest.raises(RuntimeError, match="injected device failure"):
        eng.process_array(rgb)
    # the worker loop survived: a working forward afterwards succeeds
    eng._fwd_batch = jax.jit(
        lambda p, ims, hs, ws: densecap.forward_test_batch(
            p, ims, hs, ws, TINY))
    out = eng.process_array(rgb)
    assert "boxes" in out


def test_engine_request_timeout():
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    eng = InferenceEngine(params, TINY, IDX_TO_TOKEN, smoothing=False,
                          batch_size=2, batch_window_ms=1.0,
                          request_timeout_s=0.2)

    def hang(*a, **k):
        import time
        time.sleep(3.0)
        raise AssertionError("unreachable in this test window")

    eng._fwd_batch = hang
    with pytest.raises(TimeoutError, match="timed out"):
        eng.process_array(np.zeros((40, 40, 3), np.uint8))


def test_http_engine_error_maps_to_500(engine, monkeypatch):
    """Engine failures return 500 (server fault), payload garbage 400."""
    from http.server import ThreadingHTTPServer

    from densecap_tpu.serve.server import make_handler

    class Broken:
        def process_array(self, rgb):
            raise RuntimeError("device fell over")

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(Broken()))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(
            buf, format="JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/infer", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 500

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/infer", data=b"not an image",
            headers={"Content-Type": "image/jpeg"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=10)
        assert exc.value.code == 400
    finally:
        httpd.shutdown()


def test_https_serving(engine, tmp_path):
    """TLS endpoint (reference webcam/server.py:56-59 requires SSL for
    getUserMedia off-localhost): self-signed cert, full round-trip."""
    import ssl
    import subprocess
    from http.server import ThreadingHTTPServer

    from densecap_tpu.serve.server import make_handler
    from PIL import Image

    cert = str(tmp_path / "cert.pem")
    key = str(tmp_path / "key.pem")
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        client_ctx = ssl.create_default_context()
        client_ctx.check_hostname = False
        client_ctx.verify_mode = ssl.CERT_NONE
        buf = io.BytesIO()
        Image.fromarray(
            np.random.RandomState(3).randint(
                0, 255, (50, 50, 3), dtype=np.uint8)).save(
            buf, format="JPEG")
        req = urllib.request.Request(
            f"https://127.0.0.1:{port}/api/infer", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"})
        with urllib.request.urlopen(req, timeout=30,
                                    context=client_ctx) as resp:
            out = json.loads(resp.read())
        assert "boxes" in out and "captions" in out
    finally:
        httpd.shutdown()


def test_beam_search_real_logprobs():
    """Beam path returns actual per-token logprobs (round 1 filled
    zeros): negative for pre-END tokens, summing to the beam score."""
    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    out = jax.jit(
        lambda p, im: densecap.forward_test(
            p, im, 64.0, 64.0, TINY, use_beam=3)
    )(params, jnp.zeros((64, 64, 3), jnp.float32))
    n = int(out.num)
    assert n > 0
    lps = np.asarray(out.caption_logprobs)[:n]
    caps = np.asarray(out.captions)[:n]
    assert lps.shape == caps.shape
    assert not np.all(lps == 0.0)
    # first token always has a real (negative) logprob
    assert np.all(lps[:, 0] < 0.0)
    # tokens after END contribute exactly 0 (the reference quirk)
    END = TINY.vocab_size + 1
    for i in range(n):
        ends = np.nonzero(caps[i] == END)[0]
        if len(ends) and ends[0] + 1 < lps.shape[1]:
            np.testing.assert_array_equal(lps[i, ends[0] + 1:], 0.0)


def test_engine_data_parallel_matches_single():
    """mesh-sharded micro-batching (multi-chip serving) produces the
    same outputs as the single-device engine."""
    from densecap_tpu.parallel import mesh as meshlib

    params = densecap.init_params(jax.random.PRNGKey(0), TINY)
    single = InferenceEngine(params, TINY, IDX_TO_TOKEN, max_boxes=5,
                             smoothing=False)
    mesh = meshlib.make_mesh(n_devices=4, model_parallel=1)
    dp = InferenceEngine(params, TINY, IDX_TO_TOKEN, max_boxes=5,
                         smoothing=False, batch_size=4,
                         batch_window_ms=50.0, mesh=mesh)
    rng = np.random.RandomState(11)
    imgs = [rng.randint(0, 255, (60, 70, 3), dtype=np.uint8)
            for _ in range(4)]
    want = [single.process_array(im) for im in imgs]

    results = [None] * 4

    def worker(i):
        results[i] = dp.process_array(imgs[i])

    ts_ = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts_:
        t.start()
    for t in ts_:
        t.join(timeout=180)
    for got, ref in zip(results, want):
        assert got is not None
        np.testing.assert_allclose(got["boxes"], ref["boxes"],
                                   rtol=1e-4, atol=1e-3)
        assert got["captions"] == ref["captions"]


def test_smoother_numpy_iou_matches_device_op():
    """The smoother's host-side IoU twin must match ops.boxes.iou_cwh.

    The smoother runs per request on dynamically-shaped box sets; it
    must stay pure numpy (a jnp call would compile one XLA program per
    (n_prev, n_new) shape pair on the serving critical path). This pins
    the numpy twin to the device op's continuous convention.
    """
    from densecap_tpu.ops.boxes import iou_cwh
    from densecap_tpu.serve.engine import _iou_cwh_np

    rng = np.random.RandomState(7)
    for n, m in [(1, 1), (3, 5), (50, 50), (17, 2)]:
        b1 = np.stack([rng.uniform(0, 480, n), rng.uniform(0, 480, n),
                       rng.uniform(4, 200, n), rng.uniform(4, 200, n)], 1)
        b2 = np.stack([rng.uniform(0, 480, m), rng.uniform(0, 480, m),
                       rng.uniform(4, 200, m), rng.uniform(4, 200, m)], 1)
        ref = np.asarray(iou_cwh(jnp.asarray(b1, jnp.float32),
                                 jnp.asarray(b2, jnp.float32)))
        got = _iou_cwh_np(b1, b2)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_smoother_makes_no_device_calls():
    """assign_ids on varying shapes must never trace/compile a jit."""
    import unittest.mock as mock

    sm = TemporalSmoother()
    rng = np.random.RandomState(0)
    with mock.patch.object(jax, "jit",
                           side_effect=AssertionError("jit on request path")):
        for n in [3, 7, 1, 12, 5]:
            boxes = np.stack(
                [rng.uniform(0, 480, n), rng.uniform(0, 480, n),
                 rng.uniform(10, 100, n), rng.uniform(10, 100, n)], 1)
            ids = sm.assign_ids(boxes)
            assert len(ids) == n


def test_engine_uint8_pipe_matches_host_f32_path():
    """The serving raw-uint8 pipe (uint8 BGR canvas + on-device
    normalize) must be bit-equal to the host f32 preprocessing it
    replaced — uint8->f32 conversion is exact, so boxes/scores/captions
    should match the direct forward_test on a host-normalized canvas
    to float tolerance."""
    from densecap_tpu.utils.image import preprocess_for_model

    params = densecap.init_params(jax.random.PRNGKey(3), TINY)
    eng = InferenceEngine(params, TINY, IDX_TO_TOKEN, max_boxes=5)
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 255, (100, 80, 3), dtype=np.uint8)

    got = eng.process_array(rgb)

    canvas, h, w, scale = preprocess_for_model(rgb, TINY.image_size)
    out = densecap.forward_test(params, jnp.asarray(canvas),
                                jnp.float32(h), jnp.float32(w), TINY)
    boxes = np.asarray(out.boxes)[np.asarray(out.valid)][:5]
    scores = np.asarray(out.scores)[np.asarray(out.valid)][:5]
    xywh = np.zeros_like(boxes)
    xywh[:, 0] = (boxes[:, 0] - (boxes[:, 2] - 1) / 2 - 1) / scale + 1
    xywh[:, 1] = (boxes[:, 1] - (boxes[:, 3] - 1) / 2 - 1) / scale + 1
    xywh[:, 2] = boxes[:, 2] / scale
    xywh[:, 3] = boxes[:, 3] / scale

    np.testing.assert_allclose(np.asarray(got["boxes"]), xywh,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["scores"]), scores,
                               rtol=1e-4, atol=1e-4)
