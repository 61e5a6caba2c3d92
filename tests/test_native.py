"""Native runtime tests: C++ geometry vs the jnp/numpy references, and
the C++ JPEG pipeline vs PIL."""

import numpy as np
import pytest

from densecap_tpu import native_lib

pytestmark = pytest.mark.skipif(
    not native_lib.is_available("dcgeom"),
    reason="native toolchain unavailable",
)


def _random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(1, 100, size=(n, 2))
    wh = rng.uniform(1, 60, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_iou_matrix_matches_jnp():
    from densecap_tpu.ops.boxes import iou_pascal

    b1, b2 = _random_boxes(40, 0), _random_boxes(30, 1)
    native = native_lib.iou_matrix(b1, b2)
    ref = np.asarray(iou_pascal(b1.astype(np.float64),
                                b2.astype(np.float64)))
    np.testing.assert_allclose(native, ref, rtol=1e-5, atol=1e-6)


def test_native_nms_matches_tpu_nms():
    import jax.numpy as jnp

    from densecap_tpu.ops.nms import nms as tpu_nms

    boxes = _random_boxes(200, 2)
    scores = np.random.RandomState(3).permutation(200).astype(np.float32)
    for thresh in (0.3, 0.5, 0.7):
        native = native_lib.nms(boxes, scores, thresh, max_out=60)
        idx, valid = tpu_nms(
            jnp.asarray(boxes), jnp.asarray(scores), thresh, 60
        )
        tpu = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(native, tpu)


def test_assign_greedy_semantics():
    det = np.array(
        [[10, 10, 20, 20], [11, 11, 21, 21], [100, 100, 110, 110]],
        np.float32,
    )
    gt = np.array([[10, 10, 20, 20]], np.float32)
    ov, asg, ok = native_lib.assign(det, gt)
    assert ok.tolist() == [1, 0, 0]      # second det: gt already used
    assert asg.tolist() == [0, 0, -1]    # third det: no overlap
    assert ov[0] == pytest.approx(1.0)
    assert ov[2] == 0.0


def test_merge_boxes_matches_python():
    from densecap_tpu.ops.boxes import merge_boxes as py_merge

    boxes = np.array(
        [[1, 1, 10, 10], [1, 1, 10, 11], [50, 50, 60, 60],
         [51, 50, 60, 60], [100, 100, 105, 105]],
        np.float64,
    )
    native = native_lib.merge_boxes(boxes, 0.7)
    ref = py_merge(boxes, 0.7)
    assert [sorted(g.tolist()) for g in native] == \
        [sorted(g.tolist()) for g in ref]


def test_dcio_roundtrip(tmp_path):
    if not native_lib.is_available("dcio"):
        pytest.skip("libdcio unavailable")
    from PIL import Image

    yy, xx = np.mgrid[0:60, 0:90]
    rgb = np.stack(
        [(yy * 4) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(rgb).save(p, quality=95)

    dec = native_lib.decode_jpeg(p)
    assert dec is not None and dec.shape == (60, 90, 3)
    pil = np.asarray(Image.open(p).convert("RGB"))
    # JPEG decode parity with PIL (both libjpeg; allow tiny drift)
    assert np.mean(np.abs(dec.astype(int) - pil.astype(int))) < 2.0

    canv, hts, wds, ohts, owds, ok = native_lib.load_batch(
        [p, p], 64, (103.939, 116.779, 123.68), num_threads=2
    )
    assert ok == 2
    assert (ohts[0], owds[0]) == (60.0, 90.0)
    assert canv.shape == (2, 64, 64, 3)
    # longest edge 90 -> scale 64/90 -> H ~ 43, W = 64
    assert wds[0] == 64
    assert 41 <= hts[0] <= 44
    h = int(hts[0])
    # padding region is zeros (mean subtracted only inside the image)
    assert np.all(canv[0, h:, :, :] == 0)
    # BGR ordering: canvas channel 0 == blue - mean_b inside the image
    from densecap_tpu.utils.image import preprocess_for_model

    # v3 resampler is PIL-parity: the whole canvas (decode -> resize ->
    # BGR -> mean-subtract -> pad) is bit-identical to the Python path
    ref_canvas, rh, rw, _ = preprocess_for_model(pil, 64)
    assert (rh, rw) == (hts[0], wds[0])
    np.testing.assert_array_equal(canv[0], ref_canvas)


def test_load_batch_fast_dct(tmp_path):
    """fast_dct decodes at a DCT-domain scale: same extents/origin dims
    as the exact path, pixels close but not identical on a downscale,
    EXACTLY identical when no DCT scaling kicks in (source <= canvas)."""
    if not native_lib.is_available("dcio"):
        pytest.skip("libdcio unavailable")
    from PIL import Image

    rng = np.random.RandomState(3)
    big = rng.randint(0, 256, (300, 400, 3), np.uint8)
    yy, xx = np.mgrid[0:300, 0:400]
    big = ((big // 4) + np.stack([yy % 200, xx % 200, (yy + xx) % 200],
                                 -1) // 2).astype(np.uint8)
    pb = str(tmp_path / "big.jpg")
    Image.fromarray(big).save(pb, quality=92)
    small = big[:40, :50]
    ps = str(tmp_path / "small.jpg")
    Image.fromarray(small).save(ps, quality=92)

    mean = (103.939, 116.779, 123.68)
    exact = native_lib.load_batch([pb, ps], 64, mean, num_threads=2)
    fast = native_lib.load_batch([pb, ps], 64, mean, num_threads=2,
                                 fast_dct=True)
    assert exact[5] == 2 and fast[5] == 2
    for k in (1, 2, 3, 4):  # extents + original dims identical
        np.testing.assert_array_equal(exact[k], fast[k])
    # big image: 400 -> 64 longest edge => DCT scale 2/8 kicks in;
    # close but not bit-equal
    d = np.abs(exact[0][0] - fast[0][0])
    assert d.max() > 0 and d.mean() < 3.0
    # small image (50 <= 64): no DCT scaling possible => bit-identical
    np.testing.assert_array_equal(exact[0][1], fast[0][1])


def test_dcio_resize_pil_parity():
    """native resize == PIL BILINEAR bit-for-bit (VERDICT-2 weak #8:
    the old 2-tap resampler was only 'few pixels' close when
    downscaling, making default-on native IO change outputs)."""
    if not native_lib.is_available("dcio"):
        pytest.skip("libdcio unavailable")
    from PIL import Image

    rng = np.random.RandomState(0)
    for sh, sw, dh, dw in [(60, 90, 43, 64), (240, 360, 160, 240),
                           (31, 47, 64, 97), (50, 50, 50, 50),
                           (5, 7, 3, 4)]:
        rgb = rng.randint(0, 256, (sh, sw, 3), dtype=np.uint8)
        ours = native_lib.resize_rgb(rgb, dh, dw)
        ref = np.asarray(
            Image.fromarray(rgb).resize((dw, dh), Image.BILINEAR))
        np.testing.assert_array_equal(
            ours, ref, err_msg=f"{sh}x{sw}->{dh}x{dw}")


def test_dcio_resize_pil_parity_randomized():
    """Randomized geometry sweep over the AVX-512 kernel's edge cases:
    dw % 16 tails, sh=1 (scalar-row-only path), big downscale factors
    (ksize*3 > gather-window), upscales, and the shipping 720-canvas
    shapes — all must stay bit-identical to PIL BILINEAR."""
    if not native_lib.is_available("dcio"):
        pytest.skip("libdcio unavailable")
    from PIL import Image

    rng = np.random.RandomState(7)
    cases = [(1, 37, 1, 16), (2, 33, 5, 17), (720, 33, 720, 32),
             (1080, 1620, 480, 720), (383, 511, 720, 960),
             (2500, 3000, 600, 720), (16, 16, 16, 16), (3, 3, 9, 9)]
    for _ in range(10):
        cases.append(tuple(int(v) for v in rng.randint(1, 300, 4)))
    for sh, sw, dh, dw in cases:
        rgb = rng.randint(0, 256, (sh, sw, 3), dtype=np.uint8)
        ours = native_lib.resize_rgb(rgb, dh, dw)
        ref = np.asarray(
            Image.fromarray(rgb).resize((dw, dh), Image.BILINEAR))
        np.testing.assert_array_equal(
            ours, ref, err_msg=f"{sh}x{sw}->{dh}x{dw}")


def test_load_batch_missing_file():
    if not native_lib.is_available("dcio"):
        pytest.skip("libdcio unavailable")
    canv, hts, wds, ohts, owds, ok = native_lib.load_batch(
        ["/nonexistent/file.jpg"], 32, (0, 0, 0), num_threads=1
    )
    assert ok == 0
    assert ohts[0] == 0
    assert hts[0] == 0 and np.all(canv == 0)


def test_decode_jpeg_bytes():
    if not native_lib.is_available("dcio"):
        pytest.skip("libdcio unavailable")
    import io

    from PIL import Image

    yy, xx = np.mgrid[0:40, 0:50]
    rgb = np.stack([(yy * 5) % 256, (xx * 4) % 256,
                    ((yy + xx) * 3) % 256], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=95)
    dec = native_lib.decode_jpeg_bytes(buf.getvalue())
    assert dec is not None and dec.shape == (40, 50, 3)
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(dec, pil)  # same libjpeg, bit-identical
    assert native_lib.decode_jpeg_bytes(b"not a jpeg") is None
