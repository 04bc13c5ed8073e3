"""Multimodal column plumbing: schema, mapInPandas batch shape, row
fan-out, meta/payload agreement, codec-stub gating."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from text_sentiment_classification_hadoop_spark_spark.operators import multimodal as MM
from text_sentiment_classification_hadoop_spark_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select("doc_id", "text").limit(50)


def test_synth_schema(spark, docs):
    mm = MM.synth_multimodal(docs, "image")
    assert dict(mm.dtypes)["content"] == "binary"
    meta_type = dict(mm.dtypes)["meta"]
    for field in ("mime:string", "width:int", "height:int", "channels:int",
                  "sample_rate:int", "n_frames:int"):
        assert field.replace(":", ",").split(",")[0] in meta_type
    row = mm.head()
    assert bytes(row["content"]).decode() == docs.head()["text"]
    assert row["meta"]["mime"] == "image/x-fake"


def test_decode_matches_meta(spark, docs):
    """Fake decode re-derives width/height from bytes; must equal the
    JVM-side md5-derived meta (header parse == synth)."""
    mm = MM.synth_multimodal(docs, "image")
    dec = MM.decode_image_features(mm)
    joined = mm.select("doc_id", F.col("meta.width").alias("mw"),
                       F.col("meta.height").alias("mh")).join(dec, "doc_id")
    bad = joined.filter((F.col("mw") != F.col("width"))
                        | (F.col("mh") != F.col("height"))).count()
    assert bad == 0
    r = dec.orderBy("doc_id").head()
    txt = docs.orderBy("doc_id").head()["text"].encode()
    assert r["checksum"] == int(hashlib.md5(txt).hexdigest()[:15], 16)
    assert r["byte_len"] == len(txt)


def test_resize_checksum(spark, docs):
    mm = MM.synth_multimodal(docs, "image")
    out = MM.resize_images(mm, 64, 64).orderBy("doc_id").head()
    txt = docs.orderBy("doc_id").head()["text"].encode()
    expect = int(hashlib.md5(b"resize64x64:" + txt).hexdigest()[:15], 16)
    assert (out["out_width"], out["out_height"]) == (64, 64)
    assert out["resized_checksum"] == expect


def test_frame_sample_fanout(spark, docs):
    """One row per sampled frame; count must equal sum of per-doc
    ceil(len/frame_bytes) sampled at stride `every`."""
    mm = MM.synth_multimodal(docs, "video")
    frames = MM.sample_video_frames(mm, frame_bytes=64, every=2)
    got = frames.count()
    expect = 0
    for r in docs.collect():
        n = math.ceil(len(r["text"].encode()) / 64)
        expect += len(range(0, n, 2))
    assert got == expect
    # frame 0 checksum = md5(b"frame:" + first 64 bytes)
    first = frames.filter("frame_idx = 0").orderBy("doc_id").head()
    txt = docs.orderBy("doc_id").head()["text"].encode()
    assert first["frame_checksum"] == int(
        hashlib.md5(b"frame:" + txt[:64]).hexdigest()[:15], 16)


def test_audio_duration(spark, docs):
    mm = MM.synth_multimodal(docs, "audio")
    r = MM.audio_features(mm).orderBy("doc_id").head()
    nbytes = len(docs.orderBy("doc_id").head()["text"].encode())
    assert r["n_samples"] == nbytes // 2
    assert r["duration_s"] == pytest.approx((nbytes // 2) / 16000)


def _has_av() -> bool:
    try:
        import av  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has_av(), reason="codec library present: guard inactive")
def test_real_backend_gated(spark, docs):
    """Video real decode of a CODEC container must fail loudly (no
    codec library here; PPMV payloads take the stdlib path and never
    reach the guard); the real image path must fail loudly on a
    non-PPM payload rather than decode garbage silently."""
    mm = MM.synth_multimodal(docs, "video")  # text bytes: not P6 ⇒ codec path
    with pytest.raises(Exception, match="codec library|NotImplemented"):
        MM.sample_video_frames(mm, backend="real").collect()
    img = MM.synth_multimodal(docs, "image")  # text bytes, not PPM
    with pytest.raises(Exception, match="PPM|PYTHON"):
        MM.decode_image_features(img, backend="real").collect()


def test_real_ppmv_video_frames(spark):
    """backend='real' on a PPMV stream (concatenated P6 frames —
    stdlib decode, no codec library): 6 frames sampled every 2nd,
    checksums verified against independently-built pixel buffers."""
    frames = [(4, 3, bytes([i, 2 * i, 3 * i]) * 12) for i in range(6)]
    raw = MM.encode_ppmv(frames)
    rows = (MM.sample_video_frames(_mm_row(spark, raw, "video"),
                                   every=2, backend="real")
            .orderBy("frame_idx").collect())
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert [r["frame_checksum"] for r in rows] == [
        int(hashlib.md5(b"frame:" + frames[i][2]).hexdigest()[:15], 16)
        for i in (0, 2, 4)]


def test_ppmv_roundtrip_and_malformed():
    """Pure-python container invariants: encode∘parse identity for
    mixed-size frame streams; truncated mid-stream frames fail loudly."""
    frames = [(2, 2, bytes(range(12))), (1, 3, bytes(range(9))),
              (3, 1, bytes(range(9)))]
    assert MM.parse_ppmv(MM.encode_ppmv(frames)) == frames
    with pytest.raises(ValueError, match="truncated"):
        MM.parse_ppmv(MM.encode_ppmv(frames)[:-4])
    with pytest.raises(ValueError, match="P6"):
        MM.parse_ppmv(b"RIFFxxxx")


def test_real_ppmv_fixture_golden(spark):
    """backend='real' on the committed tiny.ppmv: frame count and
    per-frame dimensions from the actual container bytes."""
    raw = open(f"{FIXDIR}/tiny.ppmv", "rb").read()
    parsed = MM.parse_ppmv(raw)
    assert [(w, h) for w, h, _ in parsed] == [(4, 3), (4, 3), (4, 3), (4, 3)]
    rows = (MM.sample_video_frames(_mm_row(spark, raw, "video"),
                                   every=2, backend="real")
            .orderBy("frame_idx").collect())
    assert [r["frame_idx"] for r in rows] == [0, 2]
    assert rows[0]["frame_checksum"] == int(
        hashlib.md5(b"frame:" + parsed[0][2]).hexdigest()[:15], 16)


@pytest.mark.skipif(not _has_av(), reason="PyAV not installed")
def test_real_video_decode_with_av(spark):
    """Runs only where PyAV exists: encode a 6-frame synthetic mp4,
    sample every 2nd frame through backend='real', and check the
    fan-out (frames 0, 2, 4) and checksum determinism."""
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        vs = out.add_stream("mpeg4", rate=4)
        vs.width, vs.height, vs.pix_fmt = 32, 16, "yuv420p"
        for i in range(6):
            arr = np.full((16, 32, 3), i * 40, dtype=np.uint8)
            for packet in vs.encode(av.VideoFrame.from_ndarray(arr, format="rgb24")):
                out.mux(packet)
        for packet in vs.encode():
            out.mux(packet)
    raw = buf.getvalue()
    rows = (MM.sample_video_frames(_mm_row(spark, raw, "video"),
                                   every=2, backend="real")
            .orderBy("frame_idx").collect())
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    again = (MM.sample_video_frames(_mm_row(spark, raw, "video"),
                                    every=2, backend="real")
             .orderBy("frame_idx").collect())
    assert [r["frame_checksum"] for r in rows] == \
        [r["frame_checksum"] for r in again]


FIXDIR = __file__.rsplit("/", 2)[0] + "/fixtures/multimodal"


def _mm_row(spark, raw: bytes, modality: str):
    meta = (modality + "/x-real", 0, 0, 0, 0, 0)
    return spark.createDataFrame(
        [(1, modality, bytearray(raw), meta)],
        f"doc_id long, modality string, content binary, "
        f"meta struct<{MM.META_FIELDS.replace(' string', ':string').replace(' int', ':int').replace(', ', ',')}>")


def test_real_ppm_decode(spark):
    """backend='real' on the committed tiny.ppm: dimensions from the
    actual netpbm header, checksum over the decoded pixel buffer."""
    raw = open(f"{FIXDIR}/tiny.ppm", "rb").read()
    r = MM.decode_image_features(
        _mm_row(spark, raw, "image"), backend="real").head()
    assert (r["width"], r["height"], r["channels"]) == (4, 3, 3)
    # independent expectation: pixels start after the 4th header token
    pixels = raw.split(b"255\n", 1)[1]
    assert len(pixels) == 4 * 3 * 3
    assert r["checksum"] == int(hashlib.md5(pixels).hexdigest()[:15], 16)
    assert r["byte_len"] == len(raw)


def test_real_ppm_resize(spark):
    """Nearest-neighbor 4x3 → 2x2, expected buffer built independently."""
    raw = open(f"{FIXDIR}/tiny.ppm", "rb").read()
    pixels = raw.split(b"255\n", 1)[1]
    expect = bytearray()
    for y in (0, 1):
        sy = y * 3 // 2
        for x in (0, 1):
            sx = x * 4 // 2
            off = (sy * 4 + sx) * 3
            expect += pixels[off:off + 3]
    r = MM.resize_images(_mm_row(spark, raw, "image"), 2, 2,
                         backend="real").head()
    assert r["resized_checksum"] == int(
        hashlib.md5(bytes(expect)).hexdigest()[:15], 16)


def test_real_wav_audio(spark):
    """backend='real' on the committed tiny.wav: rate/frames from the
    WAV header via the stdlib wave module, checksum over PCM frames."""
    import io
    import wave
    raw = open(f"{FIXDIR}/tiny.wav", "rb").read()
    with wave.open(io.BytesIO(raw)) as wf:
        n, rate = wf.getnframes(), wf.getframerate()
        pcm = wf.readframes(n)
    assert (n, rate) == (40, 8000)
    r = MM.audio_features(_mm_row(spark, raw, "audio"),
                          backend="real").head()
    assert r["n_samples"] == 40
    assert r["duration_s"] == pytest.approx(40 / 8000)
    assert r["checksum"] == int(hashlib.md5(pcm).hexdigest()[:15], 16)


def test_dedup_frames_planted_collisions(spark):
    from text_sentiment_classification_hadoop_spark_spark.operators import multimodal as MM
    docs = spark.createDataFrame(
        [(1, "x" * 200), (2, "x" * 200 + "TAIL"), (3, "y" * 100)],
        "doc_id long, text string")
    frames = MM.sample_video_frames(MM.synth_multimodal(docs, "video"),
                                    frame_bytes=64, every=2)
    out = {r["frame_checksum"]: r for r in MM.dedup_frames(frames).collect()}
    # docs 1 and 2 share the all-'x' 64-byte frame at indices 0 and 2
    # (4 occurrences total); keeper is the earliest (doc 1, frame 0)
    dup = [r for r in out.values() if r["dup_count"] == 4]
    assert len(dup) == 1
    assert (dup[0]["keeper_doc"], dup[0]["keeper_frame"]) == (1, 0)
    # doc 3's frame is unique
    assert sorted(r["dup_count"] for r in out.values()) == [1, 4]
