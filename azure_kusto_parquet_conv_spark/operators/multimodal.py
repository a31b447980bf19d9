"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

Header-level decoding is REAL and dependency-free: ``png_dimensions``
and ``wav_header`` parse dims / sample rate straight out of the payload
bytes as JVM expressions (substring/hex/conv, whole-stage codegen) —
the metadata-prune-before-decode step needs no media library at all.
Only pixel/sample decoding is library-gated (below).

The decode/feature kernels are gated on the environment: with Pillow
importable, ``fake=False`` decodes for real (_extract_features_pil);
without it, the socket raises NotImplementedError(NO_DECODER_MSG) at
plan-build time and the deterministic fake kernel stands in. Everything
Spark-side is identical between the two branches and tested: the schema
contract, the batch shape, the UDF signatures, and the partitioning
story — swapping kernels touches no plan.

Scale notes baked into the design:
- payloads stay ``binary`` end-to-end (no base64 round trips, Arrow moves
  them zero-copy into pandas);
- ``mapInPandas`` (not collect/loop) so decode parallelism == partition
  count; repartition by size before heavy decodes so batches are balanced;
- metadata travels in a sibling struct column so filters on it (codec,
  dims, duration) prune before any decode happens.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

#: The canonical multimodal record contract.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),       # opaque encoded bytes
    StructField("meta", StructType([            # typed, filterable metadata
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from the documents fixture:
    payload = utf-8 text bytes, metadata derived from lengths. Exercises
    the full binary/struct path with reproducible content."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            F.pmod(F.col("n_chars"), 640).cast("int").alias("width"),
            F.pmod(F.col("n_chars"), 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: dim floats derived from
    the payload digest. Replace with a real decode when libs exist."""
    digest = hashlib.sha256(payload).digest()
    return [int.from_bytes(digest[4 * i:4 * i + 4], "big") / 2**32
            for i in range(dim)]


NO_DECODER_MSG = (
    "real media decoding requires image/audio libraries (Pillow) not "
    "available in this environment; use fake=True for the "
    "deterministic stand-in kernel")


#: PNG signature + "IHDR" tag, RIFF/WAVE/fmt tags — hex, uppercase as
#: Spark's hex() renders them.
_PNG_MAGIC = "89504E470D0A1A0A"
_IHDR = "49484452"
_RIFF, _WAVE, _FMT = "52494646", "57415645", "666D7420"


def _be_uint(c: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from a byte slice, pure JVM:
    substring(binary) -> hex -> conv(16, 10)."""
    return F.conv(F.hex(F.substring(c, pos, nbytes)), 16, 10).cast("long")


def _le_uint(c: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned int: per-byte hex concatenated reversed."""
    parts = [F.hex(F.substring(c, pos + i, 1))
             for i in reversed(range(nbytes))]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


def png_dimensions(payload: Column | str) -> Column:
    """REAL image-header decode with zero media libraries: parse
    width/height/bit-depth straight out of the PNG IHDR chunk as pure
    JVM byte expressions (substring/hex/conv — whole-stage codegen, no
    Python, no UDF). Null for payloads that are not PNG. This is the
    metadata-extraction step a 100 TB media pipeline runs BEFORE any
    expensive pixel decode: filters on parsed dims prune payloads while
    the scan is still columnar."""
    c = F.col(payload) if isinstance(payload, str) else payload
    is_png = ((F.hex(F.substring(c, 1, 8)) == _PNG_MAGIC)
              & (F.hex(F.substring(c, 13, 4)) == _IHDR))
    return F.when(is_png, F.struct(
        _be_uint(c, 17, 4).cast("int").alias("width"),
        _be_uint(c, 21, 4).cast("int").alias("height"),
        _be_uint(c, 25, 1).cast("int").alias("bit_depth")))


def wav_header(payload: Column | str) -> Column:
    """REAL audio-header decode, same zero-dependency JVM approach:
    channels / sample rate / bits-per-sample from a canonical RIFF/WAVE
    ``fmt `` chunk (little-endian fields, reversed per-byte hex). Null
    for non-WAV payloads; assumes the standard chunk layout (fmt at
    offset 12 — the overwhelmingly common case; a chunk-walking variant
    belongs in a kernel, not an expression)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    is_wav = ((F.hex(F.substring(c, 1, 4)) == _RIFF)
              & (F.hex(F.substring(c, 9, 4)) == _WAVE)
              & (F.hex(F.substring(c, 13, 4)) == _FMT))
    return F.when(is_wav, F.struct(
        _le_uint(c, 23, 2).cast("int").alias("channels"),
        _le_uint(c, 25, 4).cast("int").alias("sample_rate"),
        _le_uint(c, 35, 2).cast("int").alias("bits_per_sample")))


def gif_dimensions(payload: Column | str) -> Column:
    """GIF logical-screen dimensions — fixed little-endian uint16
    fields right after the GIF87a/GIF89a magic, so the whole decode is
    pure JVM byte expressions like PNG/WAV (codegen, no Python). Null
    for non-GIF payloads."""
    c = F.col(payload) if isinstance(payload, str) else payload
    sig = F.substring(c, 1, 6).cast("string")
    is_gif = sig.isin("GIF87a", "GIF89a")
    return F.when(is_gif, F.struct(
        _le_uint(c, 7, 2).cast("int").alias("width"),
        _le_uint(c, 9, 2).cast("int").alias("height")))


def flac_header(payload: Column | str) -> Column:
    """FLAC STREAMINFO decode, pure JVM like PNG/WAV/GIF: the spec
    REQUIRES STREAMINFO to be the first metadata block after the
    ``fLaC`` magic, so every field sits at a fixed offset — sample
    rate (20 bits), channels (3 bits + 1) and bits-per-sample (5 bits
    + 1) unpack from bytes 19-22 with shift/mask arithmetic on
    per-byte values. Null for non-FLAC payloads."""
    c = F.col(payload) if isinstance(payload, str) else payload
    is_flac = ((F.substring(c, 1, 4).cast("string") == "fLaC")
               # block type 0 (STREAMINFO), possibly with the
               # last-block bit set (0x80)
               & (_be_uint(c, 5, 1).bitwiseAND(F.lit(127)) == 0))
    b19, b20 = _be_uint(c, 19, 1), _be_uint(c, 20, 1)
    b21, b22 = _be_uint(c, 21, 1), _be_uint(c, 22, 1)
    sample_rate = (F.shiftleft(b19, 12) + F.shiftleft(b20, 4)
                   + F.shiftright(b21, 4))
    channels = F.shiftright(b21, 1).bitwiseAND(F.lit(7)) + 1
    bps = (F.shiftleft(b21.bitwiseAND(F.lit(1)), 4)
           + F.shiftright(b22, 4) + 1)
    return F.when(is_flac, F.struct(
        channels.cast("int").alias("channels"),
        sample_rate.cast("int").alias("sample_rate"),
        bps.cast("int").alias("bits_per_sample")))


def mp3_header(payload: Column | str) -> Column:
    """MP3 (MPEG-1 Layer III) frame-header decode as pure SQL
    expressions. Unlike the fixed-offset formats the first frame
    FLOATS: an ID3v2 tag prefixes it, so the frame offset is computed
    (10 + the syncsafe 28-bit tag size) and fed to substr via expr —
    still JVM-side, no UDF. Bitrate/sample-rate come from the
    spec's index tables rendered as CASE chains. Null when no valid
    MPEG-1 Layer III sync lands at the computed offset (free-format,
    MPEG-2, or garbage payloads — a chunk-scanning fallback belongs
    in a kernel, not an expression)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    has_id3 = F.substring(c, 1, 3).cast("string") == "ID3"
    # ID3v2 size: 4 syncsafe bytes (7 bits each) at offsets 7-10
    tag = (F.shiftleft(_be_uint(c, 7, 1), 21)
           + F.shiftleft(_be_uint(c, 8, 1), 14)
           + F.shiftleft(_be_uint(c, 9, 1), 7)
           + _be_uint(c, 10, 1))
    off = F.when(has_id3, tag + 11).otherwise(F.lit(1))

    def byte_at(o):
        # Spark 4 substring accepts a COLUMN position — the whole
        # floating-offset read stays a codegen expression
        return F.conv(F.hex(F.substring(c, o.cast("int"), F.lit(1))),
                      16, 10).cast("long")
    h1, h2 = byte_at(off), byte_at(off + 1)
    h3 = byte_at(off + 2)
    # sync 0xFF + 0b111 prefix; version 11 (MPEG-1) = bits 4-3 of h2
    # == 0b11; layer III = bits 2-1 == 0b01
    ok = ((h1 == 255)
          & (F.shiftright(h2, 5) == 7)
          & (F.shiftright(h2, 3).bitwiseAND(F.lit(3)) == 3)
          & (F.shiftright(h2, 1).bitwiseAND(F.lit(3)) == 1))
    br_idx = F.shiftright(h3, 4)
    sr_idx = F.shiftright(h3, 2).bitwiseAND(F.lit(3))
    # MPEG-1 Layer III bitrate table (kbps), index 1-14; 0/15 invalid
    kbps = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
            224, 256, 320]
    bitrate = F.lit(None).cast("int")
    for i in range(14, 0, -1):
        bitrate = F.when(br_idx == i, F.lit(kbps[i])).otherwise(bitrate)
    sample_rate = (F.when(sr_idx == 0, 44100)
                    .when(sr_idx == 1, 48000)
                    .when(sr_idx == 2, 32000)
                    .cast("int"))
    return F.when(ok & br_idx.between(1, 14) & (sr_idx != 3),
                  F.struct(bitrate.alias("bitrate_kbps"),
                           sample_rate.alias("sample_rate")))


def bmp_dimensions(payload: Column | str) -> Column:
    """BMP (BITMAPINFOHEADER) dimensions — little-endian int32 at
    fixed offsets after the BM magic; height may be negative
    (top-down rows), reported as its magnitude with the orientation
    flag. Pure JVM like the other fixed-offset formats."""
    c = F.col(payload) if isinstance(payload, str) else payload
    is_bmp = ((F.substring(c, 1, 2).cast("string") == "BM")
              # header size 40 (BITMAPINFOHEADER) pins the layout
              & (_le_uint(c, 15, 4) == 40))
    h = _le_uint(c, 23, 4)
    # int32 two's complement: values >= 2^31 are negative (top-down)
    signed_h = F.when(h >= F.lit(1 << 31), h - F.lit(1 << 32)) \
                .otherwise(h)
    return F.when(is_bmp, F.struct(
        _le_uint(c, 19, 4).cast("int").alias("width"),
        F.abs(signed_h).cast("int").alias("height"),
        (signed_h < 0).alias("top_down")))


def mp4_brand(payload: Column | str) -> Column:
    """MP4/ISO-BMFF container identification: the ``ftyp`` box is
    first in every compliant file, so the major brand ('isom',
    'mp42', 'M4A ', 'qt  ', ...) and minor version sit at fixed
    offsets — the container-routing step before any box-walking
    kernel. Null when the first box is not ftyp."""
    c = F.col(payload) if isinstance(payload, str) else payload
    is_mp4 = F.substring(c, 5, 4).cast("string") == "ftyp"
    return F.when(is_mp4, F.struct(
        F.substring(c, 9, 4).cast("string").alias("major_brand"),
        _be_uint(c, 13, 4).cast("int").alias("minor_version")))


JPEG_DIM_SCHEMA = "width int, height int"


def jpeg_dimensions_kernel(payload: bytes | None):
    """JPEG dimensions by SEGMENT WALK: markers are variable-offset, so
    unlike PNG/WAV/GIF this cannot be a fixed-position expression — it
    is the documented Python-kernel case (wrap with the pandas UDF
    below; the walk itself is dependency-free). Returns (width,
    height) or None for non-JPEG/corrupt payloads."""
    b = payload
    if not b or len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            i += 2
            continue
        seglen = int.from_bytes(b[i + 2:i + 4], "big")
        if seglen < 2:
            return None
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                return None
            h = int.from_bytes(b[i + 5:i + 7], "big")
            w = int.from_bytes(b[i + 7:i + 9], "big")
            return (w, h)
        i += 2 + seglen
    return None


def jpeg_dimensions_udf():
    """Arrow-batched pandas UDF over jpeg_dimensions_kernel — the
    variable-offset marker walk in a vectorized batch loop (one Python
    call per Arrow batch, not per row)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(JPEG_DIM_SCHEMA)
    def dims(payloads: pd.Series) -> pd.DataFrame:
        out = {"width": [], "height": []}
        for b in payloads:
            r = jpeg_dimensions_kernel(bytes(b) if b is not None
                                       else None)
            out["width"].append(r[0] if r else None)
            out["height"].append(r[1] if r else None)
        return pd.DataFrame(out)

    return dims


def synth_png_header(width: Column, height: Column) -> Column:
    """A valid PNG signature + IHDR prefix for the given dims (binary
    Column) — enough header for any IHDR parser; used to exercise
    png_dimensions against payloads the engine itself constructs."""
    return F.concat(
        F.unhex(F.lit(_PNG_MAGIC + "0000000D" + _IHDR)),
        F.unhex(F.lpad(F.hex(width), 8, "0")),
        F.unhex(F.lpad(F.hex(height), 8, "0")),
        F.unhex(F.lit("0806000000")))  # 8-bit RGBA, std methods


def synth_wav_header(channels: Column, sample_rate: Column) -> Column:
    """A canonical RIFF/WAVE fmt-chunk prefix (16-bit PCM) with the
    given channel count and sample rate."""
    def le(col, nbytes):
        padded = F.lpad(F.hex(col), 2 * nbytes, "0")
        parts = [F.substring(padded, 2 * i + 1, 2)
                 for i in reversed(range(nbytes))]
        return F.concat(*parts)
    return F.unhex(F.concat(
        F.lit(_RIFF + "24000000" + _WAVE + _FMT + "10000000" + "0100"),
        le(channels, 2), le(sample_rate, 4),
        F.lit("00000000" + "0400"), F.lit("1000")))


def extract_features(media: DataFrame, fake: bool = True,
                     dim: int = 8) -> DataFrame:
    """Decode + featurize each payload via mapInPandas (Arrow batches of
    binary; one output row per input row). ``fake=False`` is the socket
    where a real decoder plugs in: when Pillow is importable it decodes
    each payload as an image and emits mean-pixel features from a
    ``dim``-cell grayscale thumbnail (same FEATURE_SCHEMA, same batch
    shape); without Pillow it raises NotImplementedError(NO_DECODER_MSG)
    at plan-build time, before any job runs."""
    if not fake:
        import importlib.util
        if importlib.util.find_spec("PIL") is None:
            raise NotImplementedError(NO_DECODER_MSG)
        return _extract_features_pil(media, dim)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        need = 4 * dim
        for pdf in batches:
            # One pass, one sha256 per payload: hex digest AND the fake
            # feature vector both derive from the same digest (the old
            # three-.map version hashed every payload twice and paid
            # lambda dispatch 3x per row — the r3 bench regression).
            payloads = pdf["payload"].to_numpy()
            n = len(payloads)
            n_bytes = np.empty(n, dtype=np.int64)
            hexes: list[str] = [""] * n
            feats: list[list[float]] = [[]] * n
            for i, b in enumerate(payloads):
                if b is None:
                    b = b""
                n_bytes[i] = len(b)
                d = hashlib.sha256(b).digest()
                hexes[i] = d.hex()
                # dim > 8 pads with zeros, matching _fake_features'
                # out-of-range int.from_bytes(b"") == 0 behavior
                buf = d[:need] if need <= 32 else d + b"\0" * (need - 32)
                feats[i] = (np.frombuffer(buf, dtype=">u4")
                            / np.float64(2**32)).tolist()
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": n_bytes,
                "sha256": hexes,
                "features": feats,
            })

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def _extract_features_pil(media: DataFrame, dim: int = 8) -> DataFrame:
    """The real-decoder branch of the socket (only reachable when
    Pillow is importable): decode each payload with PIL, thumbnail to a
    1 x dim grayscale strip, features = per-cell mean pixel / 255.
    Undecodable payloads yield null features (schema intact, no task
    failure) — a real pipeline filters them by meta before decode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np
        from PIL import Image

        for pdf in batches:
            n_bytes, hexes, feats = [], [], []
            for b in pdf["payload"].to_numpy():
                if b is None:
                    b = b""
                n_bytes.append(len(b))
                hexes.append(hashlib.sha256(b).hexdigest())
                try:
                    img = Image.open(io.BytesIO(b)).convert("L")
                    img = img.resize((dim, 1))
                    feats.append(
                        (np.asarray(img, dtype=np.float64).ravel()
                         / 255.0).tolist())
                except Exception:
                    feats.append(None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pd.Series(n_bytes, dtype="int64"),
                "sha256": hexes,
                "features": feats,
            })

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize pipeline stage: passes payloads through the same
    mapInPandas shape a real resizer would use; the pixel kernel is a
    stub that tags the metadata (real implementation: PIL thumbnail per
    row inside the batch loop)."""
    out_schema = StructType(MEDIA_SCHEMA.fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["meta"].map(lambda m: {**(m or {}),
                                              "width": width,
                                              "height": height,
                                              "format": "fake-resized"})
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": pdf["payload"],
                "meta": meta,
            })

    return media.mapInPandas(kernel, out_schema)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling stage: one output row per sampled frame
    (row explosion inside mapInPandas — the shape that matters at scale,
    since a 2 GB video must not become one task). Frame payloads are
    deterministic digests standing in for decoded frames."""
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"] or {}).get("duration_ms") or 0
                for i, ms in enumerate(range(0, int(dur), every_ms)):
                    fake_frame = hashlib.sha256(
                        (r["payload"] or b"") + ms.to_bytes(4, "big")).digest()
                    rows.append((r["media_id"], i, ms, fake_frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_ms", "frame"])

    return media.mapInPandas(kernel, schema)
