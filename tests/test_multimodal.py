"""Multimodal plumbing tests: schema, Arrow batch flow, determinism of
the stubbed featurizer, frame-sample explode shape."""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.multimodal import (
    FEATURE_DIM, MEDIA_SCHEMA, featurize_media, frame_sample_plan,
)

ROWS = [
    ("img-1", "image", b"\x89PNG....fakebytes", "image/png", 64, 48, None),
    ("img-2", "image", b"\xff\xd8\xff jpeg-ish", "image/jpeg", 32, 32, None),
    ("vid-1", "video", b"\x00\x00ftypmp42", "video/mp4", 640, 360, 4200),
    ("aud-1", "audio", None, "audio/wav", None, None, 1000),
]


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(ROWS, MEDIA_SCHEMA)


def test_featurize_schema_and_shape(spark, media):
    out = featurize_media(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {"img-1", "img-2", "vid-1", "aud-1"}
    for r in rows.values():
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    assert rows["aud-1"]["n_bytes"] == 0  # null payload -> empty feature basis


def test_featurize_deterministic_and_partition_invariant(spark, media):
    a = {r["media_id"]: r["feature"] for r in featurize_media(media).collect()}
    b = {r["media_id"]: r["feature"]
         for r in featurize_media(media.repartition(4)).collect()}
    assert a == b


def test_real_decoder_slot_falls_back(spark, media):
    rows = featurize_media(media, use_real_decoder=True).collect()
    status = {r["media_id"]: r["decode_status"] for r in rows}
    # compressed codecs (png/jpeg/mp4) fall through the pillow slot
    assert status["img-1"] == status["img-2"] == status["vid-1"] \
        == "stub-fallback"
    # a NULL payload is not a missing codec — it degrades per-row
    assert status["aud-1"] == "decode-error"
    # fallback feature values identical to the stub path (same kernel)
    stub = {r["media_id"]: r["feature"] for r in featurize_media(media).collect()}
    real = {r["media_id"]: r["feature"] for r in rows}
    assert stub == real


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # only the video row explodes; 4200ms -> frames at 0..3999
    assert {(r["media_id"], r["frame_idx"], r["frame_ts_ms"]) for r in frames} \
        == {("vid-1", i, i * 1000) for i in range(4)}


def test_resize_media_geometry(spark, media):
    from dxnn_ocr_cpp_spark.operators.multimodal import resize_media
    out = {r.media_id: r for r in resize_media(media, max_side=32).collect()}
    assert len(out) == 4
    # 64x48 -> scale 0.5 -> 32x24 (aspect preserved, max side capped)
    assert (out["img-1"].out_width, out["img-1"].out_height) == (32, 24)
    # 32x32 already within cap -> unchanged (never upscale)
    assert (out["img-2"].out_width, out["img-2"].out_height) == (32, 32)
    # 640x360 -> 32x18
    assert (out["vid-1"].out_width, out["vid-1"].out_height) == (32, 18)
    # null dims clamp to 1x1; payload passthrough flagged
    assert (out["aud-1"].out_width, out["aud-1"].out_height) == (1, 1)
    assert all(r.resize_status == "stub-passthrough" for r in out.values())
    assert out["img-1"].payload == ROWS[0][2]


def test_resize_long_side_exact(spark):
    """Rounding regression: 277x277 @ max 224 must give 224, not 223
    (float truncation made ~16% of sizes come out max_side-1)."""
    from dxnn_ocr_cpp_spark.operators.multimodal import resize_media
    rows = [("a", "image", b"x", "image/png", 277, 277, None),
            ("b", "image", b"x", "image/png", 299, 299, None),
            ("c", "image", b"x", "image/png", 314, 158, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: (r.out_width, r.out_height)
           for r in resize_media(df, max_side=224).collect()}
    assert out["a"] == (224, 224)
    assert out["b"] == (224, 224)
    assert out["c"] == (224, 113)  # round(158*224/314) = 113


# ---------- real codec-free decoders ----------

class TestDecoders:
    """Pure-Python decoder units (no JVM): netpbm, BMP, WAV."""

    def test_ppm_gradient_roundtrip(self):
        import numpy as np

        from dxnn_ocr_cpp_spark.operators.multimodal import (decode_image,
                                                             make_ppm)
        arr = (np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3) * 3)
        got, fmt = decode_image(make_ppm(5, 4, arr))
        assert fmt == "ppm"
        assert (got == arr).all()

    def test_ppm_header_comments_and_whitespace(self):
        from dxnn_ocr_cpp_spark.operators.multimodal import decode_image
        raw = b"P6 # magic comment\n# full line\n 2\t1 # w h\n255\n" \
              b"\x01\x02\x03\x04\x05\x06"
        got, fmt = decode_image(raw)
        assert got.shape == (1, 2, 3) and got.flatten().tolist() == [
            1, 2, 3, 4, 5, 6]

    def test_pgm_replicates_gray_to_3_channels(self):
        from dxnn_ocr_cpp_spark.operators.multimodal import decode_image
        raw = b"P5\n2 2\n255\n\x00\x40\x80\xff"
        got, fmt = decode_image(raw)
        assert fmt == "pgm" and got.shape == (2, 2, 3)
        assert (got[:, :, 0] == got[:, :, 1]).all()
        assert got[0, 1].tolist() == [0x40] * 3

    def test_bmp_bottom_up_orientation_and_padding(self):
        """w=3 forces a 1-byte row pad; distinct row colors prove the
        bottom-up flip happened."""
        import numpy as np

        from dxnn_ocr_cpp_spark.operators.multimodal import (decode_image,
                                                             make_bmp)
        arr = np.zeros((2, 3, 3), np.uint8)
        arr[0] = (10, 20, 30)   # top row
        arr[1] = (200, 0, 100)  # bottom row
        got, fmt = decode_image(make_bmp(3, 2, arr))
        assert fmt == "bmp"
        assert (got == arr).all()

    def test_bmp_topdown(self):
        import numpy as np

        from dxnn_ocr_cpp_spark.operators.multimodal import (decode_image,
                                                             make_bmp)
        arr = np.zeros((2, 2, 3), np.uint8)
        arr[0] = (1, 2, 3)
        arr[1] = (4, 5, 6)
        got, _ = decode_image(make_bmp(2, 2, arr, topdown=True))
        assert (got == arr).all()

    def test_bmp_32bpp_drops_alpha(self):
        import struct

        from dxnn_ocr_cpp_spark.operators.multimodal import decode_image
        # 1x1 top-down 32bpp BGRA pixel (B=9, G=8, R=7, A=255)
        body = bytes([9, 8, 7, 255])
        dib = struct.pack("<IiiHHIIiiII", 40, 1, -1, 1, 32, 0,
                          len(body), 0, 0, 0, 0)
        hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
        got, fmt = decode_image(hdr + dib + body)
        assert fmt == "bmp" and got[0, 0].tolist() == [7, 8, 9]

    def test_wav_roundtrip_and_chunk_skip(self):
        import struct

        import numpy as np

        from dxnn_ocr_cpp_spark.operators.multimodal import (decode_wav,
                                                             make_wav)
        samples = np.array([0, 100, -100, 32767, -32768], np.int16)
        raw = make_wav(samples, rate=12000)
        got, rate, ch = decode_wav(raw)
        assert rate == 12000 and ch == 1
        assert (got == samples).all()
        # inject a LIST chunk between fmt and data: walker must skip it
        fmt_end = raw.index(b"data")
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        got2, _, _ = decode_wav(raw[:fmt_end] + extra + raw[fmt_end:])
        assert (got2 == samples).all()

    def test_wav_stereo_reshape(self):
        import struct

        import numpy as np

        from dxnn_ocr_cpp_spark.operators.multimodal import decode_wav
        data = np.array([1, 2, 3, 4], np.int16).tobytes()
        fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        raw = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
        got, rate, ch = decode_wav(raw)
        assert ch == 2 and got.shape == (2, 2)
        assert got.tolist() == [[1, 2], [3, 4]]

    def test_truncation_and_unknown_codec_errors(self):
        import pytest

        from dxnn_ocr_cpp_spark.operators.multimodal import (decode_image,
                                                             decode_wav,
                                                             make_bmp,
                                                             make_ppm,
                                                             make_wav)
        with pytest.raises(ValueError):
            decode_image(make_ppm(4, 3, (1, 2, 3))[:10])
        with pytest.raises(ValueError):
            decode_image(make_bmp(4, 3, (1, 2, 3))[:10])
        with pytest.raises(ValueError):
            decode_wav(make_wav([1, 2, 3])[:10])
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG....")          # compressed: pillow slot
        with pytest.raises(NotImplementedError):
            decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")

    def test_pnm_crlf_separator_not_skewed(self):
        # a PNM written with CRLF after maxval must decode to the SAME
        # pixels as the LF form — not a raster shifted by one byte
        from dxnn_ocr_cpp_spark.operators.multimodal import decode_image
        raster = bytes([10, 20, 30, 40, 50, 60])  # 2x1 rgb
        lf = b"P6\n2 1\n255\n" + raster
        crlf = b"P6\n2 1\n255\r\n" + raster
        a, _ = decode_image(lf)
        b_, _ = decode_image(crlf)
        assert a.tolist() == b_.tolist()
        assert a[0, 0].tolist() == [10, 20, 30]

    def test_pnm_missing_separator_rejected(self):
        import pytest

        from dxnn_ocr_cpp_spark.operators.multimodal import decode_image
        # non-whitespace byte where the raster separator belongs:
        # malformed header, not a raster that starts early
        with pytest.raises(ValueError):
            decode_image(b"P6\n2 1\n255" + b"X" + bytes(6))

    def test_wav_oversized_chunk_rejected(self):
        import struct

        import pytest

        from dxnn_ocr_cpp_spark.operators.multimodal import (decode_wav,
                                                             make_wav)
        raw = bytearray(make_wav([1, 2, 3, 4]))
        # inflate the data chunk's declared size past the buffer end:
        # header-valid but truncated payload must surface as an error,
        # not a shorter successful decode
        i = raw.find(b"data")
        declared = struct.unpack_from("<I", raw, i + 4)[0]
        struct.pack_into("<I", raw, i + 4, declared + 64)
        with pytest.raises(ValueError):
            decode_wav(bytes(raw))

    def test_nn_resize_exact_indices(self):
        import numpy as np

        from dxnn_ocr_cpp_spark.operators.multimodal import _nn_resize
        arr = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
        small = _nn_resize(arr, 2, 2)
        # centers (0.5, 1.5)*4/2 -> source rows/cols 1 and 3
        assert small[:, :, 0].tolist() == [[5, 7], [13, 15]]


def test_featurize_real_decoder_decodes_codec_free(spark):
    """use_real_decoder=True REALLY decodes ppm/bmp/wav and derives the
    feature from pixels/samples; compressed codecs still stub-fall."""
    import numpy as np

    from dxnn_ocr_cpp_spark.operators.multimodal import (featurize_media,
                                                         make_bmp,
                                                         make_ppm,
                                                         make_wav)
    rows = [
        ("p", "image", make_ppm(4, 2, (255, 0, 0)), None, 4, 2, None),
        ("b", "image", make_bmp(4, 2, (0, 255, 0)), None, 4, 2, None),
        ("w", "audio", make_wav(np.full(100, 1000, np.int16)), None,
         None, None, 12),
        ("j", "image", b"\xff\xd8\xff jpeg", None, 2, 2, None),
        ("t", "image", make_ppm(4, 2, (255, 0, 0))[:5], None, 4, 2, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           featurize_media(df, use_real_decoder=True).collect()}
    assert out["p"].decode_status == "decoded:ppm"
    assert out["b"].decode_status == "decoded:bmp"
    assert out["w"].decode_status == "decoded:wav"
    assert out["j"].decode_status == "stub-fallback"
    assert out["t"].decode_status == "decode-error"
    # pixel-derived feature: solid red -> channel means (1, 0, 0)
    f = out["p"].feature
    assert abs(f[0] - 1.0) < 1e-6 and f[1] == 0.0 and f[2] == 0.0
    # sample-derived feature: constant 1000 -> mean|x| = 1000/32768
    assert abs(out["w"].feature[0] - 1000 / 32768) < 1e-6


def test_resize_real_kernel_resamples_pixels(spark):
    from dxnn_ocr_cpp_spark.operators.multimodal import (decode_image,
                                                         make_ppm,
                                                         resize_media)
    rows = [("p", "image", make_ppm(64, 48, (9, 8, 7)), None, 64, 48,
             None),
            ("j", "image", b"\xff\xd8\xff jpeg", None, 640, 480, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           resize_media(df, max_side=32, real_kernel=True).collect()}
    assert out["p"].resize_status == "resized:ppm"
    arr, fmt = decode_image(bytes(out["p"].payload))
    assert fmt == "ppm" and arr.shape == (24, 32, 3)
    assert (arr.reshape(-1, 3) == [9, 8, 7]).all()
    # compressed codec: geometry still computed, payload passthrough
    assert out["j"].resize_status == "stub-passthrough"
    assert (out["j"].out_width, out["j"].out_height) == (32, 24)


def test_decode_media_fault_containment(spark):
    """One corrupt payload degrades ONE row, never the batch, and the
    planted values come back exactly."""
    import numpy as np

    from dxnn_ocr_cpp_spark.operators.multimodal import (decode_media,
                                                         make_ppm,
                                                         make_wav)
    rows = [("a", "image", make_ppm(3, 2, (10, 20, 30))),
            ("bad", "image", b"P6\n3 2\n255\n\x00"),
            ("c", "audio", make_wav(np.full(7, 55, np.int16), 9000)),
            ("png", "image", b"\x89PNG....")]
    df = spark.createDataFrame(rows, "media_id string, kind string, "
                                     "payload binary").repartition(1)
    out = {r.media_id: r for r in decode_media(df).collect()}
    a = out["a"]
    assert (a.fmt, a.width, a.height, a.mean_r, a.mean_g, a.mean_b,
            a.decode_status) == ("ppm", 3, 2, 10, 20, 30, "decoded")
    c = out["c"]
    assert (c.fmt, c.n_samples, c.mean_abs, c.sample_rate) == \
        ("wav", 7, 55, 9000)
    assert out["bad"].decode_status == "decode-error"
    assert out["bad"].width is None
    assert out["png"].decode_status == "needs-codec"
