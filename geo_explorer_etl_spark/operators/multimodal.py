"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode/feature steps as Arrow-batched Pandas functions
over ``mapInPandas``.

The Spark-side plumbing — schema, partition sizing, UDF signatures,
batch shapes — is real and tested. Three REAL decode paths exist with
no external codec libraries: uncompressed PCM-16 WAV (stdlib ``wave``),
uncompressed 24-bit BMP (hand-parsed RIFF/DIB headers), and 8-bit
RGB/RGBA PNG (stdlib ``zlib`` + the five PNG row filters). Formats
needing a true codec (JPEG/MP3/H.264...) raise ``NotImplementedError``
— those codecs are not in this container; ``fake=True`` substitutes a
deterministic content-hash pseudo-decode so downstream plumbing can be
exercised uniformly for any mime type.

Scale notes:
- media rows are wide (MBs) — ``MEDIA_PARTITION_TARGET_BYTES`` is the
  repartition knob so a batch of decoded frames fits executor memory;
- feature extraction is embarrassingly parallel: no shuffle until the
  (tiny) feature aggregation;
- mapInPandas streams Arrow batches — peak memory is one batch, not
  one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_sha int, "
    "feat array<double>"
)

MEDIA_PARTITION_TARGET_BYTES = 128 * 1024 * 1024


def _pseudo_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes -> fixed-dim
    'feature' vector derived from a rolling hash. Stable, fast, and
    shaped exactly like a real embedding so downstream operators
    (similarity search, dedup) compose with it."""
    h = 2166136261
    feats = []
    for i, b in enumerate(content or b"\x00"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
        if i % max(1, len(content) // dim) == 0 and len(feats) < dim:
            feats.append((h % 2000 - 1000) / 1000.0)
    while len(feats) < dim:
        h = (h * 16777619 + 17) & 0xFFFFFFFF
        feats.append((h % 2000 - 1000) / 1000.0)
    return feats[:dim]


def decode_wav(content: bytes) -> tuple[int, int, list[float]]:
    """Real audio decode, stdlib-only: PCM-16 WAV -> (sample_rate,
    n_channels, mono samples in [-1, 1])."""
    import io
    import struct as st
    import wave

    with wave.open(io.BytesIO(content)) as w:
        sr, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw != 2:
        raise NotImplementedError(f"only PCM-16 WAV supported, got width {sw}")
    vals = st.unpack(f"<{len(raw) // 2}h", raw)
    mono = [
        sum(vals[i : i + nch]) / nch / 32768.0 for i in range(0, len(vals), nch)
    ]
    return sr, nch, mono


def decode_bmp(content: bytes) -> tuple[int, int, list[float]]:
    """Real image decode, stdlib-only: uncompressed 24-bit BMP ->
    (width, height, row-major grayscale pixels in [0, 1])."""
    import struct as st

    if content[:2] != b"BM":
        raise NotImplementedError("not a BMP stream")
    (pix_off,) = st.unpack_from("<I", content, 10)
    width, height = st.unpack_from("<ii", content, 18)
    (bpp,) = st.unpack_from("<H", content, 28)
    (compression,) = st.unpack_from("<I", content, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    stride = ((width * 3 + 3) // 4) * 4
    flipped = height > 0                       # positive height = bottom-up rows
    height = abs(height)
    gray: list[float] = []
    for row in range(height):
        src_row = (height - 1 - row) if flipped else row
        base = pix_off + src_row * stride
        for col in range(width):
            b, g, r = content[base + col * 3 : base + col * 3 + 3]
            gray.append((0.299 * r + 0.587 * g + 0.114 * b) / 255.0)
    return width, height, gray


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> tuple[int, int, list[float]]:
    """Real image decode, stdlib-only: 8-bit non-interlaced RGB/RGBA
    PNG -> (width, height, row-major grayscale pixels in [0, 1]).

    PNG is zlib (stdlib ``zlib.decompress`` over the concatenated IDAT
    chunks) + five per-row byte filters (None/Sub/Up/Average/Paeth),
    all reversible with pure integer arithmetic — no codec library
    needed. Palette, 16-bit, and Adam7-interlaced images raise
    honestly, like every other unsupported codec here.
    """
    import struct as st
    import zlib

    if content[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG stream")
    pos, header, idat = 8, None, b""
    while pos + 8 <= len(content):
        (length,) = st.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            header = st.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if header is None:
        raise NotImplementedError("PNG missing IHDR")
    width, height, depth, color, _comp, _filt, interlace = header
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced RGB/RGBA PNG supported"
        )
    ch = 3 if color == 2 else 4
    raw = zlib.decompress(idat)
    stride = width * ch
    prev = bytearray(stride)
    gray: list[float] = []
    pos = 0
    for _row in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub: add the pixel to the left
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up: add the pixel above
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average of left and above
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth predictor
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise NotImplementedError(f"PNG filter type {ftype}")
        for col in range(width):
            r, g, b = line[col * ch], line[col * ch + 1], line[col * ch + 2]
            gray.append((0.299 * r + 0.587 * g + 0.114 * b) / 255.0)
        prev = line
    return width, height, gray


def _signal_features(samples: list[float], dim: int) -> list[float]:
    """Fixed-dim feature: mean absolute level per equal-width chunk —
    deterministic, shape-compatible with the similarity operators."""
    if not samples:
        return [0.0] * dim
    step = max(1, len(samples) // dim)
    feats = [
        sum(abs(x) for x in samples[i * step : (i + 1) * step])
        / max(1, len(samples[i * step : (i + 1) * step]))
        for i in range(dim)
    ]
    return [round(f, 6) for f in feats]


def _real_decode(content: bytes, mime: str, dim: int) -> list[float]:
    blob = content or b""
    # Null/empty content raises the documented NotImplementedError up
    # front — a mime-matched row with no bytes must not reach a decoder
    # with None (TypeError) or a truncated stream (codec-internal error)
    if not blob:
        raise NotImplementedError(
            f"empty or null content for {mime!r} (pass fake=True for the "
            "pseudo-decode)"
        )
    # RIFF is a container family (WAV, WebP, AVI…): require the WAVE
    # form type at bytes 8:12 before dispatching to the WAV decoder, so
    # a WebP/AVI blob falls through to the honest NotImplementedError
    # instead of a wave.Error deep in the decoder
    if mime in ("audio/wav", "audio/x-wav") or (
        blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    ):
        _, _, samples = decode_wav(blob)
        return _signal_features(samples, dim)
    if mime == "image/bmp" or blob[:2] == b"BM":
        _, _, pixels = decode_bmp(blob)
        return _signal_features(pixels, dim)
    if mime == "image/png" or blob[:8] == _PNG_SIG:
        _, _, pixels = decode_png(blob)
        return _signal_features(pixels, dim)
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment (WAV/BMP/PNG decode "
        "natively; pass fake=True for the pseudo-decode)"
    )


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = False
) -> DataFrame:
    """Decode + featurize each media blob via mapInPandas (Arrow
    batches). ``fake=False`` really decodes PCM-16 WAV and 24-bit BMP
    (stdlib-only); other formats raise — their codecs are not in this
    image. ``fake=True`` pseudo-decodes every format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def featurize(row) -> list[float]:
            if fake:
                return _pseudo_decode(row["content"], dim)
            return _real_decode(row["content"], row["mime"], dim)

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda c: len(c or b"")),
                    "content_sha": pdf["content"].map(
                        lambda c: int.from_bytes(
                            hashlib.sha256(c or b"").digest()[:4], "big"
                        )
                        % 2_000_000_000
                    ),
                    "feat": pdf.apply(featurize, axis=1),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp
    (the decode of each frame is the stubbed step). The fan-out is a
    sequence/explode — executor-side, no driver loop."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
        )
    )
