"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

North-star extension (SURVEY.md §2.11) — the reference is text-only, so
this module defines how a 100 TB training-data pipeline carries non-text
payloads through the same engine:

- **Data model**: one row per asset — ``(doc_id, modality, content:binary,
  meta:struct)``. The payload is opaque to Catalyst (no codegen over it);
  everything the *planner* needs (modality, sizes, rates) lives in the
  typed ``meta`` struct so filters/partition-pruning never touch bytes.
- **Compute model**: decode / feature-extract / resize / frame-sample run
  as Arrow-batched ``mapInPandas`` stages — the UDF sees an iterator of
  pandas batches, stays vectorized inside each batch, and never collects
  to the driver. This is the designed slow path: everything else in the
  engine is JVM-side expressions; bytes → features is the one stage that
  genuinely needs Python (or a JVM codec library at production scale).
- **Codec backends**: the default ``backend="fake"`` is a *deterministic*
  fake decode — md5-derived dimensions, byte-level checksums — so the
  Spark plumbing (schema, batch shape, exchange placement, row fan-out)
  is real and oracle-checkable even though no pixels are decoded.
  ``backend="real"`` decodes genuinely, stdlib-only: binary PPM (P6)
  for images (hand-rolled netpbm header parse + nearest-neighbor
  resample), WAV for audio (the ``wave`` module), and PPMV for video
  (concatenated P6 frames — the MJPEG shape with netpbm stills; see
  :func:`parse_ppmv`). Codec containers (mp4/jpeg/flac/…) need a codec
  library absent from this container and raise ``NotImplementedError``
  at decode; at deploy time swap in PIL/soundfile/av inside the same
  mapInPandas bodies — the plumbing doesn't change.

Scale notes (100 TB): binary rows are wide — keep
``spark.sql.files.maxPartitionBytes`` at/below 128 MB so a partition of
payloads fits executor memory; frame sampling fans out rows (one per
sampled frame) *after* the narrow mapInPandas, so no shuffle is
introduced; all feature outputs are narrow columnar rows that downstream
joins/aggs handle normally.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

META_FIELDS = (
    "mime string, width int, height int, channels int, "
    "sample_rate int, n_frames int"
)

SYNTH_MIME = {"image": "image/x-fake", "audio": "audio/x-fake",
              "video": "video/x-fake"}


def _h60(b: bytes) -> int:
    """60-bit int from md5 — the Python mirror of
    ``functions.hashing.portable_hash64`` (identical for UTF-8 text)."""
    return int(hashlib.md5(b).hexdigest()[:15], 16)


def _require_real_codecs(modality: str) -> None:
    """Video (and any non-PPM/WAV format) needs a codec library this
    container doesn't have; image/PPM and audio/WAV have stdlib-only
    real decoders below and never reach this guard."""
    try:  # pragma: no cover - container has no codec libs
        import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"real {modality} decode needs a codec library not present in "
            "this container; use backend='fake' (deterministic, tested "
            "plumbing) — swap in the real decoder here at deploy time"
        ) from exc


def _parse_ppm_at(raw: bytes, i: int = 0) -> tuple[int, int, bytes, int]:
    """Parse one binary PPM (P6) image starting at offset ``i`` →
    ``(width, height, pixel_bytes, next_offset)``.

    Netpbm header grammar: ``P6``, then three whitespace-separated
    decimal fields (width, height, maxval) with ``#`` comments allowed
    between them, then ONE whitespace byte, then ``3·w·h`` raw RGB
    bytes. Stdlib-only on purpose — the container has no PIL."""
    if raw[i:i + 2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    vals: list[int] = []
    i += 2
    while len(vals) < 3:
        while i < len(raw) and raw[i:i + 1].isspace():
            i += 1
        if raw[i:i + 1] == b"#":
            while i < len(raw) and raw[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(raw) and not raw[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(raw[i:j]))
        i = j
    i += 1  # the single whitespace byte terminating the header
    width, height, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = width * height * 3
    pixels = raw[i:i + need]
    if len(pixels) != need:
        raise ValueError("truncated PPM pixel data")
    return width, height, pixels, i + need


def parse_ppm(raw: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) payload → ``(width, height, pixel_bytes)``."""
    width, height, pixels, _ = _parse_ppm_at(raw)
    return width, height, pixels


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize raw RGB bytes as a binary PPM (P6) payload."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def parse_ppmv(raw: bytes) -> list[tuple[int, int, bytes]]:
    """Parse a PPMV payload — this engine's stdlib-only video container:
    back-to-back binary PPM (P6) frames, the exact shape MJPEG has with
    JPEG frames (a video stream as a concatenation of self-delimiting
    still images; netpbm streams are read the same way by netpbm's own
    tools). Returns ``[(width, height, pixel_bytes), …]`` in stream
    order. Frames may differ in size; any malformed frame fails loudly
    mid-stream rather than decoding garbage."""
    frames: list[tuple[int, int, bytes]] = []
    i = 0
    while i < len(raw):
        w, h, px, i = _parse_ppm_at(raw, i)
        frames.append((w, h, px))
    return frames


def encode_ppmv(frames: list[tuple[int, int, bytes]]) -> bytes:
    """Serialize ``(width, height, pixel_bytes)`` frames as a PPMV
    stream (concatenated P6 images) — the fixture/test encoder for the
    real video path."""
    return b"".join(encode_ppm(w, h, px) for w, h, px in frames)


def resize_ppm_nearest(width: int, height: int, pixels: bytes,
                       out_width: int, out_height: int) -> bytes:
    """Nearest-neighbor RGB resample (floor mapping ``src = y·H/H'``) —
    the real resize for the stdlib PPM path."""
    out = bytearray(out_width * out_height * 3)
    o = 0
    for y in range(out_height):
        sy = y * height // out_height
        row = sy * width * 3
        for x in range(out_width):
            sx = row + (x * width // out_width) * 3
            out[o:o + 3] = pixels[sx:sx + 3]
            o += 3
    return bytes(out)


def parse_wav(raw: bytes) -> tuple[int, int, int, bytes]:
    """Parse a WAV payload with the stdlib ``wave`` module →
    ``(sample_rate, n_channels, n_frames, pcm_bytes)``."""
    import io
    import wave
    with wave.open(io.BytesIO(raw), "rb") as wf:
        return (wf.getframerate(), wf.getnchannels(), wf.getnframes(),
                wf.readframes(wf.getnframes()))


def synth_multimodal(docs: DataFrame, modality: str = "image",
                     text_col: str = "text", id_col: str = "doc_id",
                     frame_bytes: int = 64) -> DataFrame:
    """Deterministic multimodal table from a text corpus: ``content`` is
    the UTF-8 bytes of the text (stand-in payload), ``meta`` is a typed
    struct whose fields are md5-derived — all JVM-side expressions, so
    synthesis is shuffle-free and reproducible by the SQL oracle.
    """
    txt = F.col(text_col)
    width = (F.lit(16) + portable_hash64(F.concat(F.lit("img:w:"), txt)) % 112).cast("int")
    height = (F.lit(16) + portable_hash64(F.concat(F.lit("img:h:"), txt)) % 112).cast("int")
    byte_len = F.octet_length(txt)
    return docs.select(
        F.col(id_col),
        F.lit(modality).alias("modality"),
        F.encode(txt, "UTF-8").alias("content"),
        F.struct(
            F.lit(SYNTH_MIME[modality]).alias("mime"),
            width.alias("width"),
            height.alias("height"),
            F.lit(3).alias("channels"),
            F.lit(16000).alias("sample_rate"),
            F.ceil(byte_len / F.lit(frame_bytes)).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image_features(mm: DataFrame, backend: str = "fake") -> DataFrame:
    """Decode stage: bytes → ``(doc_id, width, height, channels, byte_len,
    checksum)``. Fake backend re-derives width/height from the *payload*
    (as a real header parse would) rather than trusting ``meta`` — tests
    assert the two agree. ``backend="real"`` parses binary PPM (P6)
    headers/pixels with the stdlib-only :func:`parse_ppm` (checksum over
    the decoded pixel buffer, not the container bytes)."""
    if backend == "real":
        def decode(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                ws, hs, bls, cks = [], [], [], []
                for c in pdf["content"]:
                    raw = bytes(c)
                    w, h, px = parse_ppm(raw)
                    ws.append(w)
                    hs.append(h)
                    bls.append(len(raw))
                    cks.append(_h60(px))
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"], "width": ws, "height": hs,
                    "channels": 3, "byte_len": bls, "checksum": cks,
                })
    elif backend == "fake":
        def decode(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                content = pdf["content"]
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "width": [16 + _h60(b"img:w:" + bytes(c)) % 112 for c in content],
                    "height": [16 + _h60(b"img:h:" + bytes(c)) % 112 for c in content],
                    "channels": 3,
                    "byte_len": [len(bytes(c)) for c in content],
                    "checksum": [_h60(bytes(c)) for c in content],
                })
    else:
        raise ValueError(f"unknown backend: {backend!r}")

    out_schema = ("doc_id long, width int, height int, channels int, "
                  "byte_len long, checksum long")
    return mm.select("doc_id", "content").mapInPandas(decode, out_schema)


def resize_images(mm: DataFrame, out_width: int = 64, out_height: int = 64,
                  backend: str = "fake") -> DataFrame:
    """Resize stage: ``(doc_id, out_width, out_height, resized_checksum)``.
    The fake 'resample' checksums ``b'resize{W}x{H}:' + content`` — a
    deterministic stand-in for the resampled pixel buffer.
    ``backend="real"`` decodes PPM and checksums the actual
    nearest-neighbor-resampled RGB buffer."""
    prefix = f"resize{out_width}x{out_height}:".encode()

    if backend == "real":
        def resize(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                cks = []
                for c in pdf["content"]:
                    w, h, px = parse_ppm(bytes(c))
                    cks.append(_h60(
                        resize_ppm_nearest(w, h, px, out_width, out_height)))
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "out_width": out_width,
                    "out_height": out_height,
                    "resized_checksum": cks,
                })
    elif backend == "fake":
        def resize(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "out_width": out_width,
                    "out_height": out_height,
                    "resized_checksum": [_h60(prefix + bytes(c)) for c in pdf["content"]],
                })
    else:
        raise ValueError(f"unknown backend: {backend!r}")

    return mm.select("doc_id", "content").mapInPandas(
        resize, "doc_id long, out_width int, out_height int, resized_checksum long")


def sample_video_frames(mm: DataFrame, frame_bytes: int = 64,
                        every: int = 2, backend: str = "fake") -> DataFrame:
    """Frame-sample stage (row fan-out: one output row per sampled frame):
    the payload is treated as ``n_frames`` fixed-size frames; frames
    ``0, every, 2·every, …`` are 'decoded' to
    ``(doc_id, frame_idx, frame_checksum)``.

    This is the UDTF-shaped mapInPandas pattern — output rows ≠ input
    rows — which Spark permits because mapInPandas only fixes the output
    *schema*, not cardinality. The fan-out happens inside the narrow
    stage; no shuffle.

    ``backend="real"`` genuinely decodes, per container format:

    - **PPMV payloads** (magic ``P6`` — concatenated binary-PPM frames,
      see :func:`parse_ppmv`) decode stdlib-only: every ``every``-th
      frame yields ``(doc_id, frame_idx, checksum(raw RGB bytes))``.
      This is the container-native real path, end-to-end testable here.
    - **Codec containers** (mp4/webm/…) decode via PyAV when installed;
      the probe raises ``NotImplementedError`` when the codec library
      is absent (this container has none). Same schema and fan-out
      shape — swap-in at deploy time changes nothing upstream."""
    if backend == "real":
        def sample(batches: Iterator) -> Iterator:
            import io

            import pandas as pd
            for pdf in batches:
                ids, idxs, sums = [], [], []
                for doc_id, c in zip(pdf["doc_id"], pdf["content"]):
                    raw = bytes(c)
                    if raw[:2] == b"P6":
                        for i, (_w, _h, rgb) in enumerate(parse_ppmv(raw)):
                            if i % every:
                                continue
                            ids.append(doc_id)
                            idxs.append(i)
                            sums.append(_h60(b"frame:" + rgb))
                        continue
                    _require_real_codecs("video")
                    import av
                    with av.open(io.BytesIO(raw)) as container:
                        for i, frame in enumerate(container.decode(video=0)):
                            if i % every:
                                continue
                            rgb = frame.to_ndarray(format="rgb24").tobytes()
                            ids.append(doc_id)
                            idxs.append(i)
                            sums.append(_h60(b"frame:" + rgb))
                yield pd.DataFrame(
                    {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums})
    elif backend == "fake":
        def sample(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                ids, idxs, sums = [], [], []
                for doc_id, c in zip(pdf["doc_id"], pdf["content"]):
                    raw = bytes(c)
                    n_frames = math.ceil(len(raw) / frame_bytes)
                    for i in range(0, n_frames, every):
                        ids.append(doc_id)
                        idxs.append(i)
                        sums.append(_h60(
                            b"frame:" + raw[i * frame_bytes:(i + 1) * frame_bytes]))
                yield pd.DataFrame(
                    {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums})
    else:
        raise ValueError(f"unknown backend: {backend!r}")

    return mm.select("doc_id", "content").mapInPandas(
        sample, "doc_id long, frame_idx long, frame_checksum long")


def audio_features(mm: DataFrame, bytes_per_sample: int = 2,
                   backend: str = "fake") -> DataFrame:
    """Audio feature stage: ``(doc_id, duration_s, n_samples, checksum)``
    assuming PCM at ``meta.sample_rate`` — duration math is real, the
    'waveform' is the fake payload. ``backend="real"`` parses WAV
    containers with the stdlib ``wave`` module (rate/frames from the
    header, checksum over the decoded PCM frames)."""
    if backend == "real":
        def feats(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                durs, ns, cks = [], [], []
                for c in pdf["content"]:
                    rate, _nch, n_frames, pcm = parse_wav(bytes(c))
                    durs.append(n_frames / rate)
                    ns.append(n_frames)
                    cks.append(_h60(pcm))
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"], "duration_s": durs,
                    "n_samples": ns, "checksum": cks,
                })
    elif backend == "fake":
        def feats(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                content = [bytes(c) for c in pdf["content"]]
                rates = pdf["sample_rate"]
                n_samples = [len(c) // bytes_per_sample for c in content]
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "duration_s": [n / r for n, r in zip(n_samples, rates)],
                    "n_samples": n_samples,
                    "checksum": [_h60(c) for c in content],
                })
    else:
        raise ValueError(f"unknown backend: {backend!r}")

    flat = mm.select("doc_id", "content", F.col("meta.sample_rate").alias("sample_rate"))
    return flat.mapInPandas(
        feats, "doc_id long, duration_s double, n_samples long, checksum long")


def dedup_frames(frames: DataFrame) -> DataFrame:
    """Cross-video frame dedup: group sampled frames by checksum, keep
    the first (doc, frame_idx) occurrence →
    ``(frame_checksum, dup_count, keeper_doc, keeper_frame)``.

    The multimodal analogue of :func:`dedup.exact_dedup` — near-copy
    videos share most frames, and collapsing them before feature
    extraction is the big saving in a video pipeline. The shuffle
    carries 8-byte checksums; the arg-min rides the same encoded
    ``doc_id*1e5 + frame_idx`` key as ``c4_line_clean`` (frame counts
    per doc are bounded far below 1e5) and partial-aggregates
    map-side, so a viral clip duplicated a million times collapses
    before the exchange."""
    key = F.col("doc_id") * F.lit(100000) + F.col("frame_idx")
    agg = (frames.groupBy("frame_checksum")
           .agg(F.count(F.lit(1)).alias("dup_count"),
                F.min(key).alias("mk")))
    return agg.select(
        "frame_checksum", "dup_count",
        (F.col("mk") / 100000).cast("long").alias("keeper_doc"),
        (F.col("mk") % 100000).cast("long").alias("keeper_frame"))
