"""Multimodal plumbing: binary payload schema, Arrow-batched decode shape,
determinism of the stub decoder, frame-sampling fanout."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from hnsw_vector_db_spark.operators.multimodal import (
    FEATURE_DIM,
    _decode_one,
    attach_payload,
    decode_features,
    frame_sample_plan,
)
from hnsw_vector_db_spark.sources.parquet import load_table


def test_payload_schema_is_binary(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents"))
    assert isinstance(media.schema["payload"].dataType, BinaryType)
    assert set(media.columns) == {"doc_id", "payload", "modality", "payload_bytes"}


def test_decode_features_shape_and_determinism(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents")).limit(50)
    out = decode_features(media)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["features"])
        assert abs(r["feature_norm"] - float(np.linalg.norm(r["features"]))) < 1e-5
    # Spark-side decode must equal a local call on the same bytes
    one = media.filter(F.col("doc_id") == rows[0]["doc_id"]).first()
    local, codec = _decode_one(bytes(one["payload"]), "text")
    assert codec == "stub"  # raw utf-8 text is no container
    got = np.array(rows[0]["features"], dtype=np.float32)
    assert np.allclose(local, got)


def test_decode_none_payload_is_zero_vector():
    feats, codec = _decode_one(None, "image")
    assert feats.tolist() == [0.0] * FEATURE_DIM and codec == "stub"


def test_frame_sample_fanout(spark, sf_dir):
    media = attach_payload(load_table(spark, sf_dir, "documents")).limit(20)
    frames = frame_sample_plan(media, every_n=10)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    sizes = {r["doc_id"]: r["payload_bytes"] for r in media.collect()}
    for doc_id, n in per_doc.items():
        expected = (sizes[doc_id] // 50) // 10 + 1
        assert n == expected
    assert set(per_doc) == set(sizes)


def test_resize_media_shapes(spark, sf_dir):
    from hnsw_vector_db_spark.operators.multimodal import resize_media

    media = attach_payload(load_table(spark, sf_dir, "documents")).limit(20)
    out = resize_media(media, target_w=16, target_h=8)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["payload_bytes"] == 16 * 8
        assert len(bytes(r["payload"])) == 16 * 8
        assert (r["width"], r["height"]) == (16, 8)
    # deterministic: same input bytes -> same output bytes
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_media(media, 16, 8).collect()}
    assert all(bytes(r["payload"]) == again[r["doc_id"]] for r in rows)


# ---- golden-bytes contract for the REAL codec path (PPM/P6) ---------------

# 2x1 image: pure red pixel, pure blue pixel
_GOLDEN_PPM = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])


def test_ppm_decode_golden_bytes():
    """Exact feature values from known pixels — real pixel math, not the
    hash stub. mean=(.5,0,.5), std=(.5,0,.5), aspect=h/w=0.5,
    luma=.299*.5+.114*.5."""
    from hnsw_vector_db_spark.operators.multimodal import parse_ppm

    img = parse_ppm(_GOLDEN_PPM)
    assert img.shape == (1, 2, 3)
    assert img.tolist() == [[[255, 0, 0], [0, 0, 255]]]
    feats, codec = _decode_one(_GOLDEN_PPM, "image")
    assert codec == "ppm"
    expected = np.array(
        [0.5, 0.0, 0.5, 0.5, 0.0, 0.5, 0.5, 0.299 * 0.5 + 0.114 * 0.5],
        dtype=np.float32,
    )
    assert np.allclose(feats, expected, atol=1e-7), feats


def test_ppm_header_tolerance_and_rejects():
    from hnsw_vector_db_spark.operators.multimodal import parse_ppm

    # comments + extra whitespace in header are legal netpbm
    commented = b"P6 # comment\n 2 # w\n1\t255\n" + bytes([255, 0, 0, 0, 0, 255])
    assert parse_ppm(commented).tolist() == [[[255, 0, 0], [0, 0, 255]]]
    assert parse_ppm(b"not an image") is None          # non-P6 -> stub path
    assert parse_ppm(b"P6\n2 1\n255\n\xff") is None    # truncated raster
    assert parse_ppm(b"P6\n2 1\n65535\n" + b"\0" * 12) is None  # 16-bit depth


def test_ppm_resize_golden_bytes(spark):
    """Nearest-neighbor resample of the golden image to 2x2: rows repeat,
    cols map [0,1] -> exact output bytes."""
    from hnsw_vector_db_spark.operators.multimodal import resize_media

    media = spark.createDataFrame(
        [(1, bytearray(_GOLDEN_PPM), "image", len(_GOLDEN_PPM))],
        "doc_id long, payload binary, modality string, payload_bytes long",
    )
    out = resize_media(media, target_w=2, target_h=2).first()
    expected = b"P6\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 0, 255] * 2
    )
    assert bytes(out["payload"]) == expected


def test_ppm_roundtrip_through_spark_decode(spark):
    """The real codec path survives the Arrow binary round-trip: Spark-side
    decode_features of a PPM payload equals the local golden decode."""
    media = spark.createDataFrame(
        [(7, bytearray(_GOLDEN_PPM), "image", len(_GOLDEN_PPM))],
        "doc_id long, payload binary, modality string, payload_bytes long",
    )
    row = decode_features(media).first()
    assert row["codec"] == "ppm"
    assert np.allclose(
        np.array(row["features"], dtype=np.float32),
        _decode_one(_GOLDEN_PPM, "image")[0],
    )


def test_wav_decode_golden_sine(spark):
    """Real audio math on a synthesized 440 Hz sine: duration, RMS
    (amp/sqrt(2)), zero-crossing rate (2f/sr), peak, rate, channels all
    recovered from the PCM bytes through the Spark decode stage."""
    import numpy as np
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.multimodal import decode_features, encode_wav

    sr, f, dur, amp = 8000, 440.0, 0.5, 0.6
    t = np.arange(int(sr * dur)) / sr
    wav_bytes = encode_wav(amp * np.sin(2 * np.pi * f * t), sr)
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(wav_bytes), modality="audio")]
    )
    feats = decode_features(df).collect()[0]["features"]
    duration, rms, zcr, peak, sr_norm, channels, dc, _ = feats
    assert abs(duration - dur) < 1e-3
    assert abs(rms - amp / np.sqrt(2)) < 1e-3
    assert abs(zcr - 2 * f / sr) < 0.01
    assert abs(peak - amp) < 1e-3
    assert abs(sr_norm - sr / 48000) < 1e-6
    assert channels == 1.0 and abs(dc) < 1e-3


def test_wav_stereo_downmix_and_corrupt_fallback():
    import numpy as np

    from hnsw_vector_db_spark.operators.multimodal import (
        _decode_one,
        encode_wav,
        parse_wav,
    )

    # stereo: L = -R cancels to silence under mono downmix
    sr = 4000
    left = 0.5 * np.sin(2 * np.pi * 100 * np.arange(sr) / sr)
    inter = np.empty(2 * sr)
    inter[0::2], inter[1::2] = left, -left
    mono, rate, ch = parse_wav(encode_wav(inter, sr, channels=2))
    assert (rate, ch) == (sr, 2)
    assert np.abs(mono).max() < 1e-4
    # truncated/corrupt payloads fall through to the deterministic stub
    bad = encode_wav(left, sr)[:20]
    out, codec = _decode_one(bad, "audio")
    assert codec == "stub"
    assert out.shape == (8,) and np.all((out >= 0) & (out < 1))


# ---- golden-bytes contract for the REAL PNG codec path --------------------

def test_png_roundtrip_identity():
    """encode_png -> parse_png is the identity on pixels (filter-0 encode,
    full inflate+unfilter decode) — a real compressed-image round trip
    through stdlib zlib, no imaging libraries."""
    from hnsw_vector_db_spark.operators.multimodal import encode_png, parse_png

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)
    back = parse_png(encode_png(img))
    assert back is not None and back.tolist() == img.tolist()


def test_png_all_filter_types_decode():
    """Hand-built IDAT exercising every PNG scanline filter (0 None,
    1 Sub, 2 Up, 3 Average, 4 Paeth) decodes to the reference
    reconstruction (PNG spec §6)."""
    import struct
    import zlib

    from hnsw_vector_db_spark.operators.multimodal import _PNG_SIG, parse_png

    w, h = 3, 5
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)

    # forward-filter each row with a different filter type
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        if ftype == 0:
            enc = cur.copy()
        elif ftype == 1:
            enc = cur.copy()
            enc[3:] = (cur[3:] - cur[:-3]) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            enc = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                enc[i] = (cur[i] - ((left + prev[i]) >> 1)) % 256
        else:
            enc = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b, c = prev[i], (prev[i - 3] if i >= 3 else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) % 256
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(typ, body):
        return (
            len(body).to_bytes(4, "big") + typ + body
            + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    back = parse_png(png)
    assert back is not None and back.tolist() == img.tolist()


def test_png_gray_and_rgba_normalize_to_rgb():
    import struct
    import zlib

    from hnsw_vector_db_spark.operators.multimodal import _PNG_SIG, parse_png

    def chunk(typ, body):
        return (
            len(body).to_bytes(4, "big") + typ + body
            + (zlib.crc32(typ + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    # 2x1 grayscale: values 10, 200 -> replicated channels
    raw = b"\x00" + bytes([10, 200])
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert parse_png(png).tolist() == [[[10, 10, 10], [200, 200, 200]]]

    # 1x1 RGBA: alpha dropped
    raw = b"\x00" + bytes([1, 2, 3, 99])
    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert parse_png(png).tolist() == [[[1, 2, 3]]]


def test_png_rejects_malformed():
    from hnsw_vector_db_spark.operators.multimodal import encode_png, parse_png

    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    assert parse_png(b"not a png") is None
    assert parse_png(good[:20]) is None                  # truncated chunks
    corrupt = good[:40] + b"\x00" + good[41:]            # broken IDAT stream
    assert parse_png(corrupt) is None


def test_png_resize_real_resample(spark):
    """PNG payloads resize through a REAL decode -> index resample ->
    re-encode cycle (not the byte-cycling stub): output parses back as
    PNG with the target dims and nearest-neighbor pixels."""
    from hnsw_vector_db_spark.operators.multimodal import (
        encode_png,
        parse_png,
        resize_media,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]
    img[1, 1] = [0, 0, 255]
    payload = encode_png(img)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image", len(payload))],
        "doc_id long, payload binary, modality string, payload_bytes long",
    )
    out = resize_media(media, target_w=4, target_h=4).first()
    back = parse_png(bytes(out["payload"]))
    assert back is not None and back.shape == (4, 4, 3)
    rows = (np.arange(4) * 2) // 4
    assert back.tolist() == img[rows][:, rows].tolist()


def test_synthesize_media_real_decode_all_modalities(spark, sf_dir):
    """Every synthesized payload decodes through a REAL codec — the
    driver entry's real_decode flag, asserted here per modality."""
    from hnsw_vector_db_spark.operators.multimodal import (
        decode_features,
        synthesize_media,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = synthesize_media(docs).cache()
    feats = decode_features(media)
    got = {
        r["doc_id"]: (r["codec"], r["feature_norm"])
        for r in feats.collect()
    }
    mods = {r["doc_id"]: r["modality"] for r in media.collect()}
    expect = {"image_ppm": "ppm", "image_png": "png", "audio_wav": "wav"}
    assert len(got) == 30
    for doc_id, (codec, norm) in got.items():
        assert codec == expect[mods[doc_id]]
        assert norm > 0
    assert set(expect[m] for m in mods.values()) == {"ppm", "png", "wav"}


def test_synthesize_media_empty_text_still_real_decodes(spark):
    """Null/empty text must not strand a row on the stub path: the
    1-byte seed keeps every container (incl. WAV's nonzero-sample
    requirement) decodable by its real codec."""
    from hnsw_vector_db_spark.operators.multimodal import (
        decode_features,
        synthesize_media,
    )

    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, "")], "doc_id long, text string"
    )
    media = synthesize_media(docs)
    got = {r["doc_id"]: r["codec"] for r in decode_features(media).collect()}
    assert got == {0: "ppm", 1: "png", 2: "wav"}


# ---- spectral features -----------------------------------------------------

def test_spectral_features_recover_planted_sine(spark):
    import numpy as np

    from hnsw_vector_db_spark.operators.multimodal import (
        encode_wav,
        parse_wav,
        spectral_features_np,
    )

    rate, n = 8000, 2048
    t = np.arange(n) / rate
    for f0 in (440.0, 1500.0, 3000.0):
        wav = encode_wav(0.5 * np.sin(2 * np.pi * f0 * t), rate)
        mono, r, _ = parse_wav(wav)
        feats = spectral_features_np(mono, r, n_fft=n)
        bin_w = rate / n
        assert abs(feats["dominant_hz"] - f0) <= bin_w, (f0, feats)
        assert abs(feats["centroid_hz"] - f0) <= 25.0  # leakage tolerance
        assert abs(feats["rms"] - 0.5 / np.sqrt(2)) < 0.01
        assert (feats["low_band_ratio"] > 0.9) == (f0 < 1000.0)


def test_spectral_features_silence_and_stronger_tone_wins(spark):
    import numpy as np

    from hnsw_vector_db_spark.operators.multimodal import spectral_features_np

    z = spectral_features_np(np.zeros(512), 8000)
    assert z["dominant_hz"] == 0.0 and z["rms"] == 0.0
    t = np.arange(2048) / 8000.0
    mix = 0.2 * np.sin(2 * np.pi * 500 * t) + 0.6 * np.sin(2 * np.pi * 2200 * t)
    f = spectral_features_np(mix, 8000)
    assert abs(f["dominant_hz"] - 2200) <= 8000 / 2048


def test_audio_spectral_features_quarantines_bad_payloads(spark):
    import numpy as np
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.multimodal import (
        audio_spectral_features,
        encode_wav,
    )

    t = np.arange(2048) / 8000.0
    good = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), 8000)
    df = spark.createDataFrame([
        Row(doc_id=1, payload=bytearray(good)),
        Row(doc_id=2, payload=bytearray(b"not a wav at all")),
    ])
    out = {r["doc_id"]: r for r in audio_spectral_features(df).collect()}
    assert abs(out[1]["dominant_hz"] - 440) <= 8000 / 2048
    assert out[2]["dominant_hz"] is None  # quarantined, not crashed


# ---- JPEG header tier (r7) --------------------------------------------------

def test_jpeg_header_roundtrip_golden():
    """encode_jpeg_stub -> parse_jpeg_header round-trips every field
    across baseline/progressive, grey/RGB, all 8 orientations."""
    from hnsw_vector_db_spark.operators.multimodal import (
        encode_jpeg_stub,
        parse_jpeg_header,
    )

    for w, h, nc, prog, orient in [
        (1, 1, 1, False, None),
        (640, 480, 3, False, 1),
        (65535, 65535, 3, True, 8),
        (17, 9, 1, True, None),
        (224, 224, 3, False, 6),
    ]:
        m = parse_jpeg_header(encode_jpeg_stub(w, h, nc, prog, orient))
        assert m == {
            "precision": 8, "height": h, "width": w, "n_components": nc,
            "progressive": prog, "orientation": orient,
        }


def test_jpeg_header_big_endian_exif():
    """Hand-built MM (big-endian) TIFF blob — the parser must honor the
    byte-order mark, not assume II."""
    from hnsw_vector_db_spark.operators.multimodal import (
        encode_jpeg_stub,
        parse_jpeg_header,
    )

    tiff = (
        b"MM" + (42).to_bytes(2, "big") + (8).to_bytes(4, "big")
        + (1).to_bytes(2, "big")
        + (0x0112).to_bytes(2, "big") + (3).to_bytes(2, "big")
        + (1).to_bytes(4, "big") + (5).to_bytes(2, "big") + b"\x00\x00"
        + (0).to_bytes(4, "big")
    )
    app1 = b"Exif\x00\x00" + tiff
    seg = bytes([0xFF, 0xE1]) + (len(app1) + 2).to_bytes(2, "big") + app1
    base = encode_jpeg_stub(10, 20, 3)
    jpg = base[:2] + seg + base[2:]
    assert parse_jpeg_header(jpg)["orientation"] == 5


def test_jpeg_header_rejects_corrupt():
    from hnsw_vector_db_spark.operators.multimodal import (
        encode_jpeg_stub,
        parse_jpeg_header,
    )

    good = encode_jpeg_stub(64, 64, 3, orientation=3)
    assert parse_jpeg_header(None) is None
    assert parse_jpeg_header(b"") is None
    assert parse_jpeg_header(b"\x89PNG") is None
    assert parse_jpeg_header(b"\x00\x00" + good[2:]) is None  # bad SOI
    assert parse_jpeg_header(good[:7]) is None  # truncated mid-segment
    # EXIF garbage degrades to orientation=None, not a parse failure
    mangled = good.replace(b"II", b"XX")
    m = parse_jpeg_header(mangled)
    assert m is not None and m["orientation"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_jpeg_stub(0, 5)
    with _pytest.raises(ValueError):
        encode_jpeg_stub(5, 70000)


def test_image_meta_operator_quarantines(spark):
    """image_meta over a mixed batch: valid rows extract every field,
    corrupt rows quarantine to NULLs + parse_ok=false."""
    from hnsw_vector_db_spark.operators.multimodal import (
        encode_jpeg_stub,
        image_meta,
    )

    rows = [
        (0, encode_jpeg_stub(100, 50, 3, False, 6)),
        (1, encode_jpeg_stub(8, 8, 1, True, None)),
        (2, b"not a jpeg"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in image_meta(df).collect()}
    assert got[0] == {
        "doc_id": 0, "width": 100, "height": 50, "n_components": 3,
        "precision": 8, "progressive": False, "orientation": 6,
        "parse_ok": True,
    }
    assert got[1]["progressive"] is True and got[1]["orientation"] is None
    for bad in (2, 3):
        assert got[bad]["parse_ok"] is False
        assert got[bad]["width"] is None and got[bad]["orientation"] is None
