"""Multimodal (image/audio/video) column plumbing (north-star).

Design: media are opaque ``binary`` columns + a typed metadata struct.
All Spark-side plumbing — schema, partition sizing, Arrow batch shape,
mapInPandas signatures — is real and tested; the codec step itself is
stubbed (this container has no image/audio libs) behind
``decode_fn=None`` -> deterministic fake, or raises NotImplementedError
when a real decode is demanded.

At 100 TB: binary payloads dominate row size, so ``bytes_per_batch``
bounds Arrow batch memory, and media tables should be stored with
``spark.sql.files.maxPartitionBytes`` sized to a handful of rows.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_KINDS = ("image", "video", "audio", "text")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("n_frames", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_meta(df: DataFrame, content_col: str = "content", kind: str = "image") -> DataFrame:
    """Derive cheap metadata (byte length, md5 digest) JVM-side —
    no decode needed, no Python."""
    c = F.col(content_col)
    return df.withColumn("n_bytes", F.octet_length(c)).withColumn("digest", F.md5(c)).withColumn(
        "kind", F.lit(kind)
    )


# --------------------------------------------------------------------------
# real image header codec (no external libs needed: container headers are
# fixed-format byte layouts). PNG/GIF dims sit at FIXED offsets, so they
# parse JVM-side (hex/conv — zero Python); JPEG needs a variable-offset
# SOF-marker scan, done in the Arrow-batched Python parser below.
# --------------------------------------------------------------------------

_PNG_MAGIC = "89504E47"
_GIF_MAGIC = "47494638"
_JPEG_MAGIC = "FFD8FF"


def sniff_mime_expr(content):
    """Magic-byte mime sniff, JVM-side."""
    h = F.upper(F.hex(F.substring(content, 1, 4)))
    return (
        F.when(h.startswith(_PNG_MAGIC), F.lit("image/png"))
        .when(h.startswith(_GIF_MAGIC), F.lit("image/gif"))
        .when(h.startswith(_JPEG_MAGIC), F.lit("image/jpeg"))
    )


def image_meta_native(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mime/width/height from image container headers — pure JVM
    expressions, no Python, no image library.

    PNG: IHDR width/height are big-endian uint32 at bytes 16..23.
    GIF: logical-screen width/height are little-endian uint16 at 6..9.
    JPEG dims live behind a variable-offset SOF marker — left null here;
    use :func:`decode_image_meta` for the scan.
    """
    c = F.col(content_col)
    hx = F.upper(F.hex(F.substring(c, 1, 32)))

    def be32(byte_off: int):
        return F.conv(F.substring(hx, byte_off * 2 + 1, 8), 16, 10).cast("int")

    mime = sniff_mime_expr(c)
    width = F.when(mime == "image/png", be32(16)).when(
        mime == "image/gif", _hex_le16(hx, 6)
    )
    height = F.when(mime == "image/png", be32(20)).when(
        mime == "image/gif", _hex_le16(hx, 8)
    )
    return (
        df.withColumn("mime", mime)
        .withColumn("width", width)
        .withColumn("height", height)
    )


_WAV_MAGIC = "52494646"  # 'RIFF'


def wav_encode_pcm(
    n_samples: int,
    sample_rate: int = 8000,
    channels: int = 1,
    bits: int = 16,
    fmt_ext: bool = False,
    list_info: bytes | None = None,
    samples: bytes | None = None,
    fmt_tag: int = 1,
) -> bytes:
    """Spec-valid PCM WAV — pure stdlib, used to generate deterministic
    audio fixtures the parsers below are oracle-checked against.

    Default is the canonical layout (16-byte fmt chunk, 'data' at byte
    36). ``fmt_ext=True`` writes the equally spec-valid 18-byte fmt
    chunk (cbSize=0 extension — what many real encoders emit), and
    ``list_info`` inserts a LIST/INFO metadata chunk between fmt and
    data; both shift 'data' off offset 36, which is exactly the layout
    class the fixed-offset parser must refuse and the chunk-walk parser
    must handle. ``fmt_tag`` selects the codec id (1=PCM, 6=A-law,
    7=µ-law — the G.711 tags use bits=8 and byte-per-sample payloads)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    fmt_payload = (
        fmt_tag.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    if fmt_ext:
        fmt_payload += (0).to_bytes(2, "little")  # cbSize = 0
    chunks = b"fmt " + len(fmt_payload).to_bytes(4, "little") + fmt_payload
    if list_info is not None:
        payload = b"INFO" + list_info
        if len(payload) % 2:  # RIFF chunks are word-aligned
            payload += b"\x00"
        chunks += b"LIST" + len(payload).to_bytes(4, "little") + payload
    if samples is None:
        payload_bytes = b"\x00" * data_size
    else:
        # caller-provided PCM payload (padded/truncated to the declared size)
        payload_bytes = samples[:data_size].ljust(data_size, b"\x00")
    chunks += b"data" + data_size.to_bytes(4, "little") + payload_bytes
    return (
        b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    )


def _hex_le16(hx, byte_off: int):
    """u16 little-endian at ``byte_off`` of a hex-string column -> int."""
    swapped = F.concat(
        F.substring(hx, byte_off * 2 + 3, 2), F.substring(hx, byte_off * 2 + 1, 2)
    )
    return F.conv(swapped, 16, 10).cast("int")


def _hex_le32(hx, byte_off: int):
    """u32 little-endian at ``byte_off`` of a hex-string column -> bigint."""
    parts = [F.substring(hx, byte_off * 2 + 1 + 2 * i, 2) for i in range(4)]
    return F.conv(F.concat(*reversed(parts)), 16, 10).cast("bigint")


def audio_meta_native(df: DataFrame, content_col: str = "content") -> DataFrame:
    """channels/sample_rate/bits/duration from the CANONICAL 44-byte PCM
    WAV header — pure JVM expressions (hex/conv at fixed little-endian
    offsets), no Python, no audio library. Non-WAV rows get nulls —
    and so do spec-valid but non-canonical layouts (e.g. the common
    18-byte fmt chunk): the 'data' tag is REQUIRED at offset 36, else
    offsets 40+ land inside a shifted layout and would misparse
    silently. Shifted-layout files go through the chunk-walk scan
    parser instead (:func:`parse_wav_header` via
    :func:`decode_audio_meta` — the audio twin of the MP4 box walk).

    Mirrors :func:`image_meta_native` for the audio modality; real
    sample decode (beyond the header) stays behind the declared codec
    stub like pixel decode does for JPEG.
    """
    c = F.col(content_col)
    hx = F.upper(F.hex(F.substring(c, 1, 44)))

    is_wav = (
        F.substring(hx, 1, 8).eqNullSafe(F.lit(_WAV_MAGIC))
        & F.substring(hx, 17, 8).eqNullSafe(F.lit("57415645"))  # 'WAVE'
        # 'fmt ' REQUIRED at offset 12: without this check a junk/LIST
        # chunk at 12 with 'data' landing at 36 would pass and report
        # garbage payload bytes as channels/rate/bits (r11 review) —
        # exactly the silent misparse the data@36 guard exists to stop
        & F.substring(hx, 25, 8).eqNullSafe(F.lit("666D7420"))  # 'fmt ' @ 12
        & F.substring(hx, 73, 8).eqNullSafe(F.lit("64617461"))  # 'data' @ 36
    )
    channels = F.when(is_wav, _hex_le16(hx, 22))
    sample_rate = F.when(is_wav, _hex_le32(hx, 24))
    bits = F.when(is_wav, _hex_le16(hx, 34))
    data_size = F.when(is_wav, _hex_le32(hx, 40))
    byte_rate = F.when(is_wav, _hex_le32(hx, 28))
    # floor of the double quotient, NOT a bare bigint cast: Spark's cast
    # truncates while DuckDB's rounds — floor is identical on both
    duration_ms = F.when(
        is_wav & (byte_rate > 0), F.floor((data_size * 1000) / byte_rate)
    ).cast("bigint")
    return (
        df.withColumn("channels", channels)
        .withColumn("sample_rate", sample_rate)
        .withColumn("bits_per_sample", bits)
        .withColumn("duration_ms", duration_ms)
    )


def _riff_chunks(content: bytes | None):
    """Yield ``(chunk_id, payload_start, declared_size)`` for each RIFF
    chunk of a RIFF/WAVE blob, word-aligned (odd sizes pad one byte);
    yields nothing for non-WAV or too-short input. THE shared walk:
    the four sample/meta parsers previously inlined four subtly
    divergent copies of this loop (r11 review) — keeping the guards in
    one place is what makes their refusal contracts stay consistent."""
    if (
        not content
        or len(content) < 12
        or content[:4] != b"RIFF"
        or content[8:12] != b"WAVE"
    ):
        return
    i, n = 12, len(content)
    while i + 8 <= n:
        cid = content[i : i + 4]
        size = int.from_bytes(content[i + 4 : i + 8], "little")
        yield cid, i + 8, size
        i = i + 8 + size + (size % 2)


def _signal_feats(vals) -> dict:
    """Exact-integer clip features shared by the PCM16 / G.711 / ADPCM
    sample decoders (previously three inline copies — r11 review):
    sample count, energy (sum of squares), peak |amplitude|, sign-flip
    zero crossings, and ppm-quantized RMS (the one double op,
    floor-half-up). ``vals`` must be non-empty."""
    import math

    energy = sum(v * v for v in vals)
    return {
        "n_samples": len(vals),
        "energy": energy,
        "peak": max(abs(v) for v in vals),
        "zero_crossings": sum(
            1 for a, b in zip(vals, vals[1:]) if (a < 0) != (b < 0)
        ),
        "rms_ppm": math.floor(math.sqrt(energy / len(vals)) * 1000000.0 + 0.5),
    }


def parse_wav_header(content: bytes | None) -> dict:
    """Pure-Python RIFF chunk walk (the audio twin of the MP4 box walk,
    cf. reference datasets/attachments.csv:1 audio media): RIFF/WAVE
    magic, then chunks scanned as (id, u32le size, payload) with word
    alignment (odd sizes pad one byte) until both 'fmt ' and 'data' are
    seen. Handles the layouts the fixed-offset parser
    (:func:`audio_meta_native`) refuses by design: 18-byte fmt chunks
    (cbSize extension), LIST/INFO metadata before data, any chunk
    order. Returns channels/sample_rate/bits_per_sample/duration_ms
    with Nones when unrecognized or truncated."""
    none = {
        "channels": None,
        "sample_rate": None,
        "bits_per_sample": None,
        "duration_ms": None,
    }
    fmt = None
    data_size = None
    n = len(content) if content else 0
    for cid, body, size in _riff_chunks(content):
        if cid == b"fmt " and size >= 16 and body + 16 <= n:
            fmt = content[body : body + 16]
        elif cid == b"data":
            # size may legitimately exceed the staged bytes (streamed
            # or truncated file): trust the header for duration
            data_size = size
        if fmt is not None and data_size is not None:
            break
    if fmt is None or data_size is None:
        return none
    audio_format = int.from_bytes(fmt[0:2], "little")
    if audio_format not in (1, 6, 7):
        # PCM + G.711 A-law/mu-law — the encoder's ACTUAL scope
        # (wav_encode_pcm emits fmt_tag 6/7 too); the old PCM-only
        # guard nulled metadata on G.711 files that the fixed-offset
        # parser happily reports, inverting the documented
        # superset-fallback relationship (r11 review)
        return none
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    byte_rate = int.from_bytes(fmt[8:12], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    ms = (data_size * 1000) // byte_rate if byte_rate else None
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "duration_ms": ms,
    }


def wav_decode_samples(content: bytes | None) -> dict:
    """REAL sample-level PCM16 decode + signal features — closes the
    audio-sample codec stub the same way png_decode closed the pixel
    one. Chunk-walks to the 'data' payload (any RIFF layout), decodes
    16-bit little-endian mono PCM with the stdlib, and computes the
    classic clip statistics in exact integer arithmetic: sample count,
    energy (sum of squares), peak |amplitude|, zero crossings (sign
    flips, negative-vs-nonnegative), and ppm-quantized RMS (the one
    double op, floor-half-up on sqrt(energy/n)). Non-PCM16-mono or
    malformed input returns all-None."""

    none = {
        "n_samples": None,
        "energy": None,
        "peak": None,
        "zero_crossings": None,
        "rms_ppm": None,
    }
    vals = _wav_pcm16_mono(content)
    if vals is None:
        return none
    return _signal_feats(vals)


def _wav_pcm16_mono(content: bytes | None) -> tuple | None:
    """Chunk-walk a RIFF/WAVE blob to its 'data' payload and decode
    16-bit little-endian MONO PCM samples (any chunk layout, padded
    odd-size chunks handled).  Returns None for malformed input or any
    non-PCM16-mono format — the shared guard for every sample-level
    audio operator (features, resample)."""
    import struct

    fmt = None
    data = None
    n = len(content) if content else 0
    for cid, body, size in _riff_chunks(content):
        if cid == b"fmt " and size >= 16 and body + 16 <= n:
            fmt = content[body : body + 16]
        elif cid == b"data":
            data = content[body : min(body + size, n)]
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None:
        return None
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or channels != 1 or bits != 16:
        return None
    count = len(data) // 2
    if count == 0:
        return None
    return struct.unpack(f"<{count}h", data[: count * 2])


def wav_resample_linear_feats(content: bytes | None, l_up: int, m_down: int) -> dict:
    """REAL sample-rate conversion: rational-ratio (l_up/m_down) LINEAR
    resampler over decoded PCM16 mono, entirely in exact integer
    fixed-point.  Output position j maps to input position j·m/l:
    idx = (j·m) div l, rem = (j·m) mod l, and the interpolated sample
    is (x'[idx]·(l-rem) + x'[idx+1]·rem) div l on the +32768-offset
    signal (keeping the numerator non-negative so floor division is
    truncation on every engine — the round-4 integer-div discipline).
    Returns per-clip aggregate features (count, sum, order-weighted
    checksum) so the Arrow exchange stays one row per clip; the
    checksum pins every output sample's value AND position.
    Malformed / non-PCM16-mono input returns all-None."""
    none = {"n_in": None, "n_out": None, "sum_out": None, "chk_out": None}
    # Bad ratio params get the same refusal contract as malformed bytes:
    # l_up=0 would divide by zero and m_down<=0 would loop nonsensically
    # inside the Arrow batch on an executor.
    if l_up <= 0 or m_down <= 0:
        return none
    xs = _wav_pcm16_mono(content)
    if xs is None:
        return none
    n = len(xs)
    n_out = ((n - 1) * l_up) // m_down + 1
    total = 0
    chk = 0
    for j in range(n_out):
        pos = j * m_down
        idx = pos // l_up
        rem = pos % l_up
        a = xs[idx] + 32768
        b = (xs[idx + 1] if idx + 1 < n else xs[idx]) + 32768
        out = (a * (l_up - rem) + b * rem) // l_up - 32768
        total += out
        chk += (j + 1) * out
    return {"n_in": n, "n_out": n_out, "sum_out": total, "chk_out": chk}


def decode_audio_resample(
    df: DataFrame,
    l_up: int,
    m_down: int,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched rational-ratio linear resample
    (:func:`wav_resample_linear_feats` per blob) — the sample-rate-
    conversion member of the audio family (decode → features →
    codec-expand → RESAMPLE).  Per-partition streaming over bounded
    batches; one aggregate row per clip crosses the Arrow boundary."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("n_in", LongType(), True),
            StructField("n_out", LongType(), True),
            StructField("sum_out", LongType(), True),
            StructField("chk_out", LongType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [
                    wav_resample_linear_feats(c, l_up, m_down)
                    for c in chunk[content_col]
                ]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "n_in": pd.array([f["n_in"] for f in feats], dtype="Int64"),
                        "n_out": pd.array([f["n_out"] for f in feats], dtype="Int64"),
                        "sum_out": pd.array(
                            [f["sum_out"] for f in feats], dtype="Int64"
                        ),
                        "chk_out": pd.array(
                            [f["chk_out"] for f in feats], dtype="Int64"
                        ),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def ulaw_to_linear(u: int) -> int:
    """G.711 µ-law byte -> linear PCM16 (ITU-T G.711 Table 2a/2b;
    bit-exact vs the CPython audioop reference for all 256 codes).
    Pure closed form: complement, then ((m<<3)+0x84)<<e minus bias."""
    u = ~u & 0xFF
    sign = u & 0x80
    e = (u >> 4) & 7
    m = u & 0x0F
    mag = (((m << 3) + 0x84) << e) - 0x84
    return -mag if sign else mag


def alaw_to_linear(a: int) -> int:
    """G.711 A-law byte -> linear PCM16 (ITU-T G.711 Table 1a/1b;
    bit-exact vs audioop for all 256 codes). XOR 0x55 toggle, then
    segment expansion; A-law's sign bit SET means POSITIVE — the
    opposite of µ-law."""
    a ^= 0x55
    sign = a & 0x80
    e = (a >> 4) & 7
    m = a & 0x0F
    mag = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
    return mag if sign else -mag


def wav_decode_samples_g711(content: bytes | None) -> dict:
    """REAL compressed-audio sample decode: G.711 µ-law (fmt tag 7) and
    A-law (fmt tag 6) WAVs expanded to linear PCM16 and reduced to the
    same exact-integer signal features as :func:`wav_decode_samples` —
    the first telephony-codec step past raw PCM, pure stdlib. Chunk-
    walks the RIFF layout, requires mono/8-bit/G.711, expands each byte
    through the closed-form segment tables (bit-exact vs the audioop
    reference), then computes n_samples / energy / peak /
    zero_crossings / ppm RMS identically to the PCM path. Non-G.711 or
    malformed input returns all-None; ``codec`` reports 'ulaw'/'alaw'."""

    none = {
        "codec": None,
        "n_samples": None,
        "energy": None,
        "peak": None,
        "zero_crossings": None,
        "rms_ppm": None,
    }
    fmt = None
    data = None
    n = len(content) if content else 0
    for cid, body, size in _riff_chunks(content):
        if cid == b"fmt " and size >= 16 and body + 16 <= n:
            fmt = content[body : body + 16]
        elif cid == b"data":
            data = content[body : min(body + size, n)]
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None or len(data) == 0:
        return none
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format not in (6, 7) or channels != 1 or bits != 8:
        return none
    expand = ulaw_to_linear if audio_format == 7 else alaw_to_linear
    vals = [expand(b) for b in data]
    return {"codec": "ulaw" if audio_format == 7 else "alaw", **_signal_feats(vals)}


def decode_audio_features_g711(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched G.711 sample decode + features
    (:func:`wav_decode_samples_g711` per blob) — same scan shape as
    :func:`decode_audio_features`, plus the codec tag."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("codec", StringType(), True),
            StructField("n_samples", LongType(), True),
            StructField("energy", LongType(), True),
            StructField("peak", IntegerType(), True),
            StructField("zero_crossings", LongType(), True),
            StructField("rms_ppm", LongType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [wav_decode_samples_g711(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "codec": [f["codec"] for f in feats],
                        "n_samples": pd.array(
                            [f["n_samples"] for f in feats], dtype="Int64"
                        ),
                        "energy": pd.array([f["energy"] for f in feats], dtype="Int64"),
                        "peak": pd.array([f["peak"] for f in feats], dtype="Int32"),
                        "zero_crossings": pd.array(
                            [f["zero_crossings"] for f in feats], dtype="Int64"
                        ),
                        "rms_ppm": pd.array(
                            [f["rms_ppm"] for f in feats], dtype="Int64"
                        ),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


# IMA/DVI ADPCM (WAV fmt tag 0x11): 89-entry step table + 16-entry index
# table per IMA spec; decode loop bit-exact vs the CPython audioop
# reference (tests/test_operators.py adpcm test) for all states.
ADPCM_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
ADPCM_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def ima_adpcm_expand(pred: int, idx: int, nibbles) -> list[int]:
    """IMA ADPCM nibble stream -> linear PCM16 samples, starting from
    block-header state (predictor, step index). Emits the header
    predictor as sample 0 (the IMA WAV block contract), then one sample
    per nibble. Stateful by construction — each sample's step size
    depends on the whole prefix — which is exactly why the oracle for
    this codec is a recursive CTE rather than a per-row expression."""
    out = [pred]
    for nb in nibbles:
        step = ADPCM_STEP_TABLE[idx]
        diff = step >> 3
        if nb & 4:
            diff += step
        if nb & 2:
            diff += step >> 1
        if nb & 1:
            diff += step >> 2
        pred = pred - diff if nb & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + ADPCM_INDEX_TABLE[nb]))
        out.append(pred)
    return out


def wav_encode_adpcm(
    blocks: list[tuple[int, int, list[int]]],
    samples_per_block: int,
    sample_rate: int = 8000,
) -> bytes:
    """Spec-valid mono IMA-ADPCM WAV (fmt tag 0x11, 20-byte fmt chunk
    with samplesPerBlock extension, fact chunk with the true sample
    count): each block is (initial predictor, initial step index,
    nibble list); nibbles pack LOW-first per byte (IMA WAV order — the
    opposite of audioop's high-first packing). The final block may be
    partial; earlier blocks must carry samples_per_block-1 nibbles."""
    block_align = 4 + (samples_per_block - 1 + 1) // 2
    total = sum(1 + len(nbs) for _, _, nbs in blocks)
    fmt_payload = (
        (0x11).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + ((sample_rate * block_align) // samples_per_block).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")  # bits per (compressed) sample
        + (2).to_bytes(2, "little")  # cbSize
        + samples_per_block.to_bytes(2, "little")
    )
    data = b""
    for pred, idx, nbs in blocks:
        body = pred.to_bytes(2, "little", signed=True) + bytes([idx, 0])
        padded = list(nbs) + ([0] if len(nbs) % 2 else [])
        body += bytes(
            (padded[i] & 0xF) | ((padded[i + 1] & 0xF) << 4)
            for i in range(0, len(padded), 2)
        )
        data += body
    chunks = (
        b"fmt " + len(fmt_payload).to_bytes(4, "little") + fmt_payload
        + b"fact" + (4).to_bytes(4, "little") + total.to_bytes(4, "little")
        + b"data" + len(data).to_bytes(4, "little")
        + (data if len(data) % 2 == 0 else data + b"\x00")
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def wav_decode_samples_adpcm(content: bytes | None) -> dict:
    """REAL stateful-codec sample decode: IMA/DVI ADPCM WAVs (fmt tag
    0x11 — the dictation/telephony 4-bit codec) expanded block-by-block
    to linear PCM16 and reduced to the same exact-integer signal
    features as :func:`wav_decode_samples`. Walks the RIFF chunks,
    reads samplesPerBlock from the fmt extension and the true sample
    count from the fact chunk, then walks ``data`` in block_align
    strides: each block restarts state from its 4-byte header
    (predictor int16le, step index u8) and expands low-first nibbles
    through the shared :func:`ima_adpcm_expand` loop (bit-exact vs the
    CPython audioop reference). Trailing partial blocks and the odd
    padding nibble are bounded by the fact count. Non-ADPCM or
    malformed input returns all-None."""

    none = {
        "n_samples": None,
        "energy": None,
        "peak": None,
        "zero_crossings": None,
        "rms_ppm": None,
    }
    fmt = None
    fact = None
    data = None
    n = len(content) if content else 0
    # no early break: fact may legitimately follow data in chunk order
    for cid, body, size in _riff_chunks(content):
        if cid == b"fmt " and size >= 20 and body + 20 <= n:
            fmt = content[body : body + 20]
        elif cid == b"fact" and size >= 4 and body + 4 <= n:
            fact = int.from_bytes(content[body : body + 4], "little")
        elif cid == b"data":
            data = content[body : min(body + size, n)]
    if fmt is None or data is None or len(data) < 4:
        return none
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    samples_per_block = int.from_bytes(fmt[18:20], "little")
    if audio_format != 0x11 or channels != 1 or bits != 4 or block_align < 5:
        return none
    remaining = fact if fact is not None else (1 << 62)
    vals: list[int] = []
    for off in range(0, len(data), block_align):
        if remaining <= 0:
            break
        block = data[off : off + block_align]
        if len(block) < 4:
            break
        pred = int.from_bytes(block[0:2], "little", signed=True)
        idx = min(88, block[2])
        avail = 2 * (len(block) - 4)
        want = min(samples_per_block - 1, avail, remaining - 1)
        nibbles = []
        for j in range(want):
            byte = block[4 + j // 2]
            nibbles.append(byte & 0xF if j % 2 == 0 else (byte >> 4) & 0xF)
        vals.extend(ima_adpcm_expand(pred, idx, nibbles))
        remaining -= 1 + want
    if not vals:
        return none
    return _signal_feats(vals)


def decode_audio_features_adpcm(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched IMA-ADPCM sample decode + features
    (:func:`wav_decode_samples_adpcm` per blob) — same scan shape as
    :func:`decode_audio_features`."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("n_samples", LongType(), True),
            StructField("energy", LongType(), True),
            StructField("peak", IntegerType(), True),
            StructField("zero_crossings", LongType(), True),
            StructField("rms_ppm", LongType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [wav_decode_samples_adpcm(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "n_samples": pd.array(
                            [f["n_samples"] for f in feats], dtype="Int64"
                        ),
                        "energy": pd.array([f["energy"] for f in feats], dtype="Int64"),
                        "peak": pd.array([f["peak"] for f in feats], dtype="Int32"),
                        "zero_crossings": pd.array(
                            [f["zero_crossings"] for f in feats], dtype="Int64"
                        ),
                        "rms_ppm": pd.array(
                            [f["rms_ppm"] for f in feats], dtype="Int64"
                        ),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def decode_audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched sample-level audio feature extraction
    (:func:`wav_decode_samples` per blob) — the audio twin of the
    pixel-decode path."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("n_samples", LongType(), True),
            StructField("energy", LongType(), True),
            StructField("peak", IntegerType(), True),
            StructField("zero_crossings", LongType(), True),
            StructField("rms_ppm", LongType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [wav_decode_samples(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "n_samples": pd.array(
                            [f["n_samples"] for f in feats], dtype="Int64"
                        ),
                        "energy": pd.array([f["energy"] for f in feats], dtype="Int64"),
                        "peak": pd.array([f["peak"] for f in feats], dtype="Int32"),
                        "zero_crossings": pd.array(
                            [f["zero_crossings"] for f in feats], dtype="Int64"
                        ),
                        "rms_ppm": pd.array(
                            [f["rms_ppm"] for f in feats], dtype="Int64"
                        ),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def decode_audio_meta(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched WAV metadata decode via mapInPandas — the scan
    path for non-canonical chunk layouts (chunk offsets are variable,
    exactly like the MP4 box walk in :func:`decode_video_meta`; the
    canonical fixed-offset fast path stays pure-JVM in
    :func:`audio_meta_native`). Sample-level PCM16 decode is real too —
    :func:`wav_decode_samples` / :func:`decode_audio_features`; only
    compressed codecs (MP3/AAC) remain environment-gated."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("channels", IntegerType(), True),
            StructField("sample_rate", LongType(), True),
            StructField("bits_per_sample", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                metas = [parse_wav_header(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "channels": pd.array(
                            [m["channels"] for m in metas], dtype="Int32"
                        ),
                        "sample_rate": pd.array(
                            [m["sample_rate"] for m in metas], dtype="Int64"
                        ),
                        "bits_per_sample": pd.array(
                            [m["bits_per_sample"] for m in metas], dtype="Int32"
                        ),
                        "duration_ms": pd.array(
                            [m["duration_ms"] for m in metas], dtype="Int64"
                        ),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def mp4_encode_skeleton(timescale: int, duration: int, brand: bytes = b"isom") -> bytes:
    """Minimal spec-valid MP4 skeleton (ftyp + moov/mvhd v0) — pure
    stdlib, deterministic fixture generator for the box-walk parser."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + typ + payload

    ftyp = box(b"ftyp", brand + (0).to_bytes(4, "big") + brand)
    mvhd_payload = (
        (0).to_bytes(4, "big")  # version 0 + flags
        + (0).to_bytes(4, "big")  # creation_time
        + (0).to_bytes(4, "big")  # modification_time
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
    )
    moov = box(b"moov", box(b"mvhd", mvhd_payload))
    return ftyp + moov


def parse_mp4_header(content: bytes | None) -> dict:
    """Pure-Python MP4 box walk: top-level boxes to moov, then moov's
    children to mvhd (version 0: timescale/duration are u32 BE at
    payload offsets 12/16). Variable box order/sizes make this a scan,
    not a fixed offset — the video twin of the JPEG SOF scan. Returns
    {timescale, duration, duration_ms} with Nones when unrecognized."""
    none = {"timescale": None, "duration": None, "duration_ms": None}
    if not content or len(content) < 16 or content[4:8] != b"ftyp":
        return none

    def walk(buf: bytes, start: int, end: int, typ: bytes) -> tuple[int, int] | None:
        i = start
        while i + 8 <= end:
            size = int.from_bytes(buf[i : i + 4], "big")
            if size < 8 or i + size > end:
                return None
            if buf[i + 4 : i + 8] == typ:
                return i + 8, i + size
            i += size
        return None

    moov = walk(content, 0, len(content), b"moov")
    if moov is None:
        return none
    mvhd = walk(content, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        return none
    p, pend = mvhd
    # length guard BEFORE indexing: an empty 8-byte mvhd at buffer end
    # has p == len(content) and content[p] would raise
    if pend - p < 20 or content[p] != 0:  # only version 0 supported here
        return none
    timescale = int.from_bytes(content[p + 12 : p + 16], "big")
    duration = int.from_bytes(content[p + 16 : p + 20], "big")
    ms = (duration * 1000) // timescale if timescale else None
    return {"timescale": timescale, "duration": duration, "duration_ms": ms}


def decode_video_meta(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched MP4 metadata decode via mapInPandas (box offsets
    are variable, so this is the scan path like the JPEG SOF parser;
    frame-level decode stays behind the declared codec stub)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("timescale", LongType(), True),
            StructField("duration", LongType(), True),
            StructField("duration_ms", LongType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                metas = [parse_mp4_header(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "timescale": pd.array(
                            [m["timescale"] for m in metas], dtype="Int64"
                        ),
                        "duration": pd.array(
                            [m["duration"] for m in metas], dtype="Int64"
                        ),
                        "duration_ms": pd.array(
                            [m["duration_ms"] for m in metas], dtype="Int64"
                        ),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def exif_encode(
    orientation: int, make: str, dt: str, big_endian: bool = False
) -> bytes:
    """Minimal valid JPEG carrying a real EXIF APP1 segment: TIFF
    header + IFD0 with Make (ASCII), Orientation (SHORT, inlined in
    the value field), DateTime (ASCII 20 bytes). Per TIFF 6.0 §2
    ("Value Offset"), any value whose total byte count is <= 4 is
    stored INLINE in the 4-byte value field, left-justified — so a
    short Make like ``'LGE'`` (4 bytes with its NUL) inlines while
    DateTime (20 bytes) goes out-of-line after the entry table.
    ``big_endian`` selects MM vs II TIFF byte order so the parser's
    both endianness paths get exercised by the fixtures."""
    import struct

    e = ">" if big_endian else "<"
    make_b = make.encode() + b"\0"
    dt_b = dt.encode() + b"\0"
    n = 3
    # IFD0 starts right after the 8-byte TIFF header; out-of-line data
    # follows the entry table + next-IFD pointer
    data_start = 8 + 2 + n * 12 + 4
    tail = b""

    def ascii_entry(tag: int, raw: bytes) -> bytes:
        nonlocal tail
        if len(raw) <= 4:
            # TIFF 6.0: fits the value field — inline, zero-padded right
            return struct.pack(e + "HHI", tag, 2, len(raw)) + raw.ljust(4, b"\0")
        off = data_start + len(tail)
        tail += raw
        return struct.pack(e + "HHI", tag, 2, len(raw)) + struct.pack(e + "I", off)

    entries = (
        ascii_entry(0x010F, make_b)
        + struct.pack(e + "HHI", 0x0112, 3, 1)
        + struct.pack(e + "H", orientation)
        + b"\0\0"
        + ascii_entry(0x0132, dt_b)
    )
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)
        + struct.pack(e + "H", n)
        + entries
        + struct.pack(e + "I", 0)
        + tail
    )
    app1 = b"Exif\0\0" + tiff
    return b"\xff\xd8\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1 + b"\xff\xd9"


def parse_exif(content: bytes | None) -> dict:
    """Pure-Python EXIF reader: JPEG marker walk to APP1, TIFF header
    (both II and MM byte orders), IFD0 entry scan for Make (0x010F),
    Orientation (0x0112), DateTime (0x0132). Per TIFF 6.0, ANY value
    whose byte count is <= 4 lives inline in the left-justified value
    field (a short Make like 'LGE\\0' is NOT offset-addressed); longer
    ASCII values follow their offset. Defensive on truncation —
    returns Nones, never raises (labelspark masks undecodable media
    the same way, client.py:49-52)."""
    none = {"byte_order": None, "orientation": None, "make": None, "datetime": None}
    if not content or len(content) < 4 or content[:2] != b"\xff\xd8":
        return none
    # marker walk to APP1 (skips any other APPn/COM segments first)
    i = 2
    tiff_off = None
    while i + 4 <= len(content):
        if content[i] != 0xFF:
            return none
        marker = content[i + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > len(content):
            return none
        if marker == 0xE1 and content[i + 4 : i + 10] == b"Exif\0\0":
            tiff_off = i + 10
            break
        i += 2 + seg_len
    if tiff_off is None or tiff_off + 8 > len(content):
        return none
    t = content[tiff_off:]
    order = t[:2]
    if order == b"II":
        bo, bo_name = "little", "II"
    elif order == b"MM":
        bo, bo_name = "big", "MM"
    else:
        return none

    def u16(b: bytes) -> int:
        return int.from_bytes(b, bo)

    def u32(b: bytes) -> int:
        return int.from_bytes(b, bo)

    if len(t) < 8 or u16(t[2:4]) != 42:
        return none
    ifd = u32(t[4:8])
    if ifd + 2 > len(t):
        return none
    n = u16(t[ifd : ifd + 2])
    out = dict(none)
    out["byte_order"] = bo_name

    def ascii_val(val: bytes, count: int) -> str | None:
        if count < 1:
            return None
        if count <= 4:
            # TIFF 6.0: byte count <= 4 -> value is INLINE in the
            # 4-byte value field, not an offset
            raw = val[:count]
        else:
            off = u32(val)
            if off + count > len(t):
                return None
            raw = t[off : off + count]
        return raw.rstrip(b"\0").decode("ascii", errors="replace")

    for k in range(n):
        e0 = ifd + 2 + k * 12
        if e0 + 12 > len(t):
            break
        tag = u16(t[e0 : e0 + 2])
        typ = u16(t[e0 + 2 : e0 + 4])
        count = u32(t[e0 + 4 : e0 + 8])
        val = t[e0 + 8 : e0 + 12]
        if tag == 0x0112 and typ == 3 and count == 1:
            out["orientation"] = u16(val[:2])
        elif tag == 0x010F and typ == 2:
            out["make"] = ascii_val(val, count)
        elif tag == 0x0132 and typ == 2:
            out["datetime"] = ascii_val(val, count)
    return out


def decode_exif_meta(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched EXIF decode via mapInPandas (the TIFF IFD walk is
    offset-chasing, so it is the scan path like the MP4 box walk)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("byte_order", StringType(), True),
            StructField("orientation", IntegerType(), True),
            StructField("make", StringType(), True),
            StructField("datetime", StringType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                metas = [parse_exif(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "byte_order": [m["byte_order"] for m in metas],
                        "orientation": pd.array(
                            [m["orientation"] for m in metas], dtype="Int32"
                        ),
                        "make": [m["make"] for m in metas],
                        "datetime": [m["datetime"] for m in metas],
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def tiff_encode_header(
    width: int, height: int, bits: int, big_endian: bool = False
) -> bytes:
    """Minimal standalone TIFF: header + IFD0 with ImageWidth (LONG),
    ImageLength (LONG), BitsPerSample (SHORT inline) — the raw-scan /
    geo-imagery container, and the same IFD machinery EXIF wraps."""
    import struct

    e = ">" if big_endian else "<"
    entries = (
        struct.pack(e + "HHI", 0x0100, 4, 1)
        + struct.pack(e + "I", width)
        + struct.pack(e + "HHI", 0x0101, 4, 1)
        + struct.pack(e + "I", height)
        + struct.pack(e + "HHI", 0x0102, 3, 1)
        + struct.pack(e + "H", bits)
        + b"\0\0"
    )
    return (
        (b"MM" if big_endian else b"II")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)
        + struct.pack(e + "H", 3)
        + entries
        + struct.pack(e + "I", 0)
    )


def parse_tiff_header(content: bytes | None) -> dict:
    """Standalone-TIFF IFD0 walk (both byte orders): ImageWidth /
    ImageLength (SHORT or LONG per spec), BitsPerSample. Defensive on
    truncation — Nones, never raises."""
    none = {"byte_order": None, "width": None, "height": None, "bits": None}
    if not content or len(content) < 8:
        return none
    order = content[:2]
    if order == b"II":
        bo, bo_name = "little", "II"
    elif order == b"MM":
        bo, bo_name = "big", "MM"
    else:
        return none

    def u(b: bytes) -> int:
        return int.from_bytes(b, bo)

    if u(content[2:4]) != 42:
        return none
    ifd = u(content[4:8])
    if ifd + 2 > len(content):
        return none
    n = u(content[ifd : ifd + 2])
    out = dict(none)
    out["byte_order"] = bo_name
    for k in range(n):
        e0 = ifd + 2 + k * 12
        if e0 + 12 > len(content):
            break
        tag = u(content[e0 : e0 + 2])
        typ = u(content[e0 + 2 : e0 + 4])
        val = content[e0 + 8 : e0 + 12]
        # inline value: SHORT (type 3) left-justified in 2 bytes, LONG
        # (type 4) the full 4
        v = u(val[:2]) if typ == 3 else u(val) if typ == 4 else None
        if tag == 0x0100:
            out["width"] = v
        elif tag == 0x0101:
            out["height"] = v
        elif tag == 0x0102:
            out["bits"] = v
    return out


def decode_tiff_meta(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched standalone-TIFF metadata decode via mapInPandas."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("byte_order", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("bits", IntegerType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                metas = [parse_tiff_header(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "byte_order": [m["byte_order"] for m in metas],
                        "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                        "height": pd.array(
                            [m["height"] for m in metas], dtype="Int32"
                        ),
                        "bits": pd.array([m["bits"] for m in metas], dtype="Int32"),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def parse_image_header(content: bytes | None) -> dict:
    """Pure-Python image header parser (the real codec for metadata):
    PNG IHDR, GIF logical screen, JPEG SOF0/1/2 marker scan. Returns
    {mime, width, height} with Nones when unrecognized/truncated."""
    none = {"mime": None, "width": None, "height": None}
    if not content or len(content) < 10:
        return none
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        if len(content) < 24:
            return {"mime": "image/png", "width": None, "height": None}
        w = int.from_bytes(content[16:20], "big")
        h = int.from_bytes(content[20:24], "big")
        return {"mime": "image/png", "width": w, "height": h}
    if content[:4] in (b"GIF8",):
        w = int.from_bytes(content[6:8], "little")
        h = int.from_bytes(content[8:10], "little")
        return {"mime": "image/gif", "width": w, "height": h}
    if content[:3] == b"\xff\xd8\xff":
        # scan segment markers for a start-of-frame (SOF0/1/2: C0/C1/C2)
        i = 2
        n = len(content)
        while i + 9 < n:
            if content[i] != 0xFF:
                i += 1
                continue
            # 0xFF fill/padding bytes may precede a marker: skip them so
            # the byte we read as "marker" is the real one (otherwise a
            # fill byte falls into the segment-length branch and reads a
            # bogus length, skipping straight past the SOF)
            while i + 1 < n and content[i + 1] == 0xFF:
                i += 1
            if i + 9 >= n:
                break
            marker = content[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                h = int.from_bytes(content[i + 5 : i + 7], "big")
                w = int.from_bytes(content[i + 7 : i + 9], "big")
                return {"mime": "image/jpeg", "width": w, "height": h}
            if marker in (0xD9, 0xDA):
                # EOI / start-of-scan: entropy-coded data follows, no
                # length-bearing segments to walk — stop scanning
                break
            if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
            i += 2 + seg_len
        return {"mime": "image/jpeg", "width": None, "height": None}
    return none


def decode_image_meta(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched header decode via mapInPandas — the REAL codec for
    image metadata (PNG/GIF/JPEG incl. the JPEG SOF scan that fixed
    offsets can't express). Pixel-level decode (resize, pixel features)
    remains the one stubbed step (no image libs in this environment)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("mime", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                metas = [parse_image_header(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "mime": [m["mime"] for m in metas],
                        "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                        "height": pd.array([m["height"] for m in metas], dtype="Int32"),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, schema=out_schema)


def phash_bands_from_gray(pixels: bytes) -> tuple[int, int, int, int] | None:
    """Average-hash perceptual fingerprint of a small grayscale image
    (the aHash member of the pHash family): bit k is 1 iff pixel k is
    strictly above the image mean (compared as 64*p > sum — exact
    integer arithmetic, no division), returned as FOUR 16-bit band
    values rather than one packed int64. The band split serves the
    scale plan directly: near-dup candidates are pairs sharing ANY
    intact band, and by pigeonhole that banding is LOSSLESS for
    hamming distance <= 3 (4 bands, <=3 differing bits leave one band
    untouched) — so the banded join provably equals all-pairs at the
    declared threshold. Requires exactly 64 pixels (an 8x8 thumbnail,
    e.g. from resize_nearest)."""
    if pixels is None or len(pixels) != 64:
        return None
    s = sum(pixels)
    bits = [1 if 64 * p > s else 0 for p in pixels]
    return tuple(
        sum(bits[16 * b + i] << i for i in range(16)) for b in range(4)
    )


def decode_phash_bands(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched REAL-decode perceptual hashing: PNG pixel decode
    (:func:`png_decode`) -> 8x8 aHash band values per blob. Images that
    are not 8x8 grayscale PNGs yield null bands."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("b0", IntegerType(), True),
            StructField("b1", IntegerType(), True),
            StructField("b2", IntegerType(), True),
            StructField("b3", IntegerType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out = []
                for content in chunk[content_col]:
                    decoded = png_decode(content)
                    bands = None
                    if decoded is not None:
                        w, h, ch, px = decoded
                        if (w, h, ch) == (8, 8, 1):
                            bands = phash_bands_from_gray(px)
                    out.append(bands or (None, None, None, None))
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "b0": pd.array([o[0] for o in out], dtype="Int32"),
                        "b1": pd.array([o[1] for o in out], dtype="Int32"),
                        "b2": pd.array([o[2] for o in out], dtype="Int32"),
                        "b3": pd.array([o[3] for o in out], dtype="Int32"),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, out_schema)


def png_encode_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 8-bit grayscale PNG encoder — pure stdlib (struct + zlib).

    One IHDR + one IDAT (filter 0 per row) + IEND. Used to generate
    real, spec-valid PNG containers for fixtures and declared queries;
    the decoder below round-trips them.
    """
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def bmp_encode_gray24(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (BITMAPINFOHEADER,
    BI_RGB) — pure stdlib. Gray values are written as equal BGR
    triples, rows BOTTOM-UP with 4-byte stride padding: the two spec
    quirks that make BMP a distinct codec attestation rather than a
    PNG re-skin. The decoder below round-trips them."""
    import struct

    stride = (width * 3 + 3) & ~3
    rows = []
    for r in range(height - 1, -1, -1):  # bottom-up
        row = b"".join(
            bytes((v, v, v))
            for v in pixels[r * width : (r + 1) * width]
        )
        rows.append(row + b"\x00" * (stride - len(row)))
    body = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return hdr + info + body


def bmp_decode(content: bytes | None):
    """REAL BMP pixel decode: 24-bit BI_RGB with BITMAPINFOHEADER,
    handling bottom-up (positive biHeight) AND top-down (negative)
    row order and the 4-byte row stride. Returns (width, height,
    channels, pixels) with pixels flattened top-down in BGR order, or
    None for anything malformed / unsupported (refuse-don't-raise, the
    corpus-scale codec contract)."""
    import struct

    if not content or len(content) < 54 or content[:2] != b"BM":
        return None
    try:
        off = struct.unpack_from("<I", content, 10)[0]
        hdr_size = struct.unpack_from("<I", content, 14)[0]
        if hdr_size < 40:
            return None
        width, biheight = struct.unpack_from("<ii", content, 18)
        planes, bpp = struct.unpack_from("<HH", content, 26)
        compression = struct.unpack_from("<I", content, 30)[0]
    except struct.error:
        return None
    if planes != 1 or bpp != 24 or compression != 0:
        return None
    height = abs(biheight)
    if width <= 0 or height == 0 or width > 1 << 15 or height > 1 << 15:
        return None
    stride = (width * 3 + 3) & ~3
    if off + stride * height > len(content):
        return None
    out = bytearray()
    # stored bottom-up when biHeight > 0; emit top-down either way
    row_ids = range(height - 1, -1, -1) if biheight > 0 else range(height)
    for r in row_ids:
        base = off + r * stride
        out += content[base : base + width * 3]
    return width, height, 3, bytes(out)


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(content: bytes | None):
    """Pure-stdlib PNG PIXEL decode: zlib inflate + per-row unfilter.

    Supports non-interlaced 8-bit-per-sample images in grayscale (0),
    RGB (2), gray+alpha (4), and RGBA (6) — i.e. everything the encoder
    above and typical ML fixtures produce. Returns
    ``(width, height, channels, pixels: bytes)`` in row-major scanline
    order, or ``None`` when the payload is not such a PNG. This unstubs
    the pixel step of ``decode_features`` for PNG; JPEG/audio/video
    pixel decode remains the documented NotImplementedError stub (no
    image/audio libraries in this environment).
    """
    import zlib

    if not content or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n = 8, len(content)
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= n:
        clen = int.from_bytes(content[pos : pos + 4], "big")
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            if len(data) < 13:
                return None
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, _comp, _filt, interlace = data[8:13]
            if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                return None
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if width is None or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        return None
    out = bytearray(height * stride)
    bpp = channels  # bytes per pixel at bit depth 8
    for r in range(height):
        fpos = r * (stride + 1)
        filt = raw[fpos]
        row = raw[fpos + 1 : fpos + 1 + stride]
        base = r * stride
        prev = out[base - stride : base] if r else bytes(stride)
        if filt == 0:
            out[base : base + stride] = row
        elif filt == 1:  # Sub
            for i in range(stride):
                left = out[base + i - bpp] if i >= bpp else 0
                out[base + i] = (row[i] + left) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                out[base + i] = (row[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = out[base + i - bpp] if i >= bpp else 0
                out[base + i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                left = out[base + i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                p = left + prev[i] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[i]), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else prev[i] if pb <= pc else ul
                out[base + i] = (row[i] + pred) & 0xFF
        else:
            return None
    return width, height, channels, bytes(out)


def png_pixel_decode_fn(content: bytes | None, kind: str) -> dict:
    """``decode_fn`` adapter for :func:`decode_features`: REAL pixel
    decode (mean sample value over all decoded bytes, dim = decoded
    sample count) via whichever real codec recognizes the payload —
    PNG, baseline grayscale JPEG, or GIF (first frame); None features
    for anything else. Name kept for back-compat from when PNG was the
    only real codec."""
    decoded = _any_pixel_decode(content)
    if decoded is None:
        g = gif_decode(content)
        if g is None:
            return {"feat_mean": None, "feat_dim": 0}
        px = g[2][0]
        return {"feat_mean": sum(px) / max(len(px), 1), "feat_dim": len(px)}
    w, h, c, px = decoded
    return {"feat_mean": sum(px) / max(len(px), 1), "feat_dim": len(px)}


def _lzw_compress_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW compressor (variable-width codes, LSB-first bit
    packing, CLEAR/EOI codes, 12-bit cap with dictionary reset) — pure
    stdlib, used by :func:`gif_encode_gray` to emit real compressed
    streams the decoder below round-trips."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for b in data:
        probe = prefix + bytes([b])
        if probe in table:
            prefix = probe
            continue
        emit(table[prefix])
        table[probe] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12) - 1:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress_gif(data: bytes, min_code_size: int) -> bytes | None:
    """GIF-flavor LZW decoder: the inverse of the compressor above, but
    spec-complete (handles the KwKwK self-referential case and streams
    from ANY conformant encoder, not just ours)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate, return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            return None  # corrupt stream
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def gif_encode_gray(
    frames: list[bytes], width: int, height: int
) -> bytes:
    """Minimal spec-valid animated GIF89a encoder — pure stdlib: 256-
    entry grayscale global color table (palette[i] = i,i,i so the pixel
    byte IS the gray value), one image descriptor + real LZW stream per
    frame. The multi-frame layout is what the frame-sampling plumbing
    decodes back."""
    lsd = (
        width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes([0xF7, 0, 0])  # global table, 8-bit, 256 entries
    )
    palette = bytes(v for i in range(256) for v in (i, i, i))
    out = bytearray(b"GIF89a" + lsd + palette)
    for px in frames:
        out += b"\x2c" + (0).to_bytes(4, "little")  # descriptor @ (0,0)
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out += b"\x00"  # no local table, not interlaced
        out += bytes([8])  # LZW min code size
        stream = _lzw_compress_gif(px, 8)
        for i in range(0, len(stream), 255):  # 255-byte sub-blocks
            block = stream[i : i + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def gif_decode(content: bytes | None):
    """Pure-stdlib GIF PIXEL decode: block walk + full LZW decompression
    of every frame (the GIF twin of :func:`png_decode`, one real-codec
    frontier further per the round-4 plan). Handles global/local color
    tables, graphic-control/comment/application extensions, and any
    conformant LZW stream. Returns ``(width, height, frames)`` where
    each frame is row-major gray bytes (palette looked up, red channel
    — identical to gray for grayscale palettes), or ``None`` when not a
    decodable non-interlaced GIF."""
    if not content or len(content) < 13 or content[:4] != b"GIF8":
        return None
    width = int.from_bytes(content[6:8], "little")
    height = int.from_bytes(content[8:10], "little")
    flags = content[10]
    pos = 13
    n = len(content)
    global_table: bytes | None = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        if pos + 3 * size > n:
            return None
        global_table = content[pos : pos + 3 * size]
        pos += 3 * size
    frames: list[bytes] = []
    while pos < n:
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < n and content[pos]:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:
            return None
        if pos + 9 > n:
            return None
        fw = int.from_bytes(content[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(content[pos + 6 : pos + 8], "little")
        iflags = content[pos + 8]
        pos += 9
        if iflags & 0x40:  # interlaced: out of scope
            return None
        table = global_table
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            if pos + 3 * size > n:
                return None
            table = content[pos : pos + 3 * size]
            pos += 3 * size
        if table is None or pos >= n:
            return None
        min_code = content[pos]
        pos += 1
        stream = bytearray()
        while pos < n and content[pos]:
            ln = content[pos]
            stream += content[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # terminator
        idx = _lzw_decompress_gif(bytes(stream), min_code)
        if idx is None or len(idx) < fw * fh:
            return None
        # refuse, don't raise: LZW output can carry palette indexes past
        # the color table (min-code-size larger than the table warrants)
        # — indexing would IndexError and kill the Spark task (r11
        # review, verified on a 2-entry table with 8-bit codes)
        limit = len(table) // 3
        if any(i >= limit for i in idx[: fw * fh]):
            return None
        frames.append(bytes(table[i * 3] for i in idx[: fw * fh]))
    if not frames:
        return None
    return width, height, frames


_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    import numpy as np

    r = np.arange(8)
    C = np.cos((2 * r[None, :] + 1) * r[:, None] * np.pi / 16) / 2.0
    C[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return C  # orthonormal: F = C @ A @ C.T, A = C.T @ F @ C


# Encoder Huffman tables (canonical, minimal-but-complete): DC size
# categories 0..11 at 5 bits; ALL 256 AC run/size symbols (255 at 9
# bits + 0xFF at 10 — a DHT length byte caps at 255). Any conformant
# decoder accepts them; OUR decoder builds its tables from the DHT
# marker generically, so it also reads streams from other encoders.
_ENC_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 8 + [255, 1] + [0] * 6
_ENC_AC_VALS = list(range(255)) + [255]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG code assignment (T.81 C.2): {symbol: (code, len)}."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            b = ((self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n = 0
        return bytes(self.out)


def _jpeg_category(v: int) -> tuple[int, int]:
    """(size category, value bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def jpeg_encode_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal spec-valid BASELINE JPEG encoder (grayscale, quant table
    all ones) — stdlib + numpy. Width/height must be multiples of 8.
    With unit quantization, blocks whose DCT is integral (e.g. constant
    blocks: only the DC term, 8*(v-128)) round-trip EXACTLY — the
    property the oracle-checked query exploits; general content is
    lossy like any JPEG."""
    import struct

    import numpy as np

    if width % 8 or height % 8:
        raise ValueError("encoder requires multiple-of-8 dims")
    C = _dct_matrix()
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).astype(np.float64)
    dc_codes = _huff_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _huff_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            block = img[by : by + 8, bx : bx + 8] - 128.0
            F = C @ block @ C.T
            q = np.rint(F).astype(np.int64)
            zz = [int(q.flat[_JPEG_ZIGZAG[i]]) for i in range(64)]
            size, bits = _jpeg_category(zz[0] - prev_dc)
            prev_dc = zz[0]
            w.put(*dc_codes[size])
            if size:
                w.put(bits, size)
            run = 0
            for coef in zz[1:]:
                if coef == 0:
                    run += 1
                    continue
                while run > 15:
                    w.put(*ac_codes[0xF0])  # ZRL
                    run -= 16
                s, b = _jpeg_category(coef)
                w.put(*ac_codes[(run << 4) | s])
                if s:
                    w.put(b, s)
                run = 0
            if run:
                w.put(*ac_codes[0x00])  # EOB
    data = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + bytes(1 for _ in range(64)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS)
        + b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
    )
    sos = seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + data + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int | None:
        while self.n == 0:
            if self.pos >= len(self.data):
                return None
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # unstuff
                else:
                    return None  # marker: entropy stream ends
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int | None:
        v = 0
        for _ in range(k):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v


def _huff_decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} lookup built from a DHT segment."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _extend(bits: int, size: int) -> int:
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode_gray(content: bytes | None):
    """Pure stdlib+numpy BASELINE JPEG pixel decoder for single-
    component (grayscale) images: marker walk, arbitrary DQT/DHT,
    Huffman entropy decode with byte unstuffing and restart markers,
    dequant + dezigzag + IDCT. Returns ``(width, height, pixels)`` or
    ``None`` for anything it does not support (progressive, color,
    12-bit). The last real-codec frontier from the round-4 plan: PNG
    and GIF decode bit-exactly; JPEG is lossy by nature, exact only for
    DC-only (per-block-constant) content, which is what the declared
    query stages."""
    import numpy as np

    if not content or len(content) < 4 or content[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(content)
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = None
    restart = 0
    data_start = None
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            return None
        marker = content[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(content[pos + 2 : pos + 4], "big")
        body = content[pos + 4 : pos + 2 + ln]
        # every segment body below is length-checked before indexing:
        # a TRUNCATED segment (ln past the real payload) must refuse
        # with None like every other malformed shape, not crash the
        # Spark task with IndexError (r11 review, verified: short SOF,
        # empty SOS, and short DQT bodies all raised)
        if marker == 0xDB:
            i = 0
            while i < len(body):
                if i + 65 > len(body):
                    return None  # truncated quant table
                prec_id = body[i]
                if prec_id >> 4:
                    return None  # 16-bit tables unsupported
                qt[prec_id & 0x0F] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC0 or marker == 0xC1:
            if len(body) < 9:
                return None  # truncated SOF
            if body[0] != 8 or body[5] != 1:
                return None  # 8-bit single-component only
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            if body[7] != 0x11:
                return None  # no subsampling in one component
            comp_qt = body[8]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # progressive / extended: unsupported
        elif marker == 0xC4:
            i = 0
            while i + 17 <= len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(vals) < nv:
                    return None  # truncated Huffman values
                huff[(tc_th >> 4, tc_th & 0x0F)] = _huff_decode_tree(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            if len(body) < 2:
                return None
            restart = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:
            if len(body) < 3 or body[0] != 1:
                return None
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if data_start is None or width is None or not qt:
        return None
    dc_tab = huff.get((0, dc_id))
    ac_tab = huff.get((1, ac_id))
    q = qt.get(comp_qt)
    if dc_tab is None or ac_tab is None or q is None:
        return None
    C = _dct_matrix()
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    r = _BitReader(content[data_start:])

    def read_symbol(tab) -> int | None:
        code = 0
        for ln2 in range(1, 17):
            b = r.bit()
            if b is None:
                return None
            code = (code << 1) | b
            if (ln2, code) in tab:
                return tab[(ln2, code)]
        return None

    prev_dc = 0
    nblocks = 0
    for by in range(bh):
        for bx in range(bw):
            if restart and nblocks and nblocks % restart == 0:
                # byte-align and swallow the RSTn marker
                r.n = 0
                while r.pos + 1 < len(r.data) and r.data[r.pos] == 0xFF and 0xD0 <= r.data[r.pos + 1] <= 0xD7:
                    r.pos += 2
                prev_dc = 0
            size = read_symbol(dc_tab)
            if size is None:
                return None
            diff = 0
            if size:
                vb = r.bits(size)
                if vb is None:
                    return None
                diff = _extend(vb, size)
            prev_dc += diff
            zz = [0] * 64
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = read_symbol(ac_tab)
                if sym is None:
                    return None
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                k += sym >> 4
                s = sym & 0x0F
                if k > 63 or s == 0:
                    return None
                vb = r.bits(s)
                if vb is None:
                    return None
                zz[k] = _extend(vb, s)
                k += 1
            F = np.zeros(64, dtype=np.float64)
            for i in range(64):
                F[_JPEG_ZIGZAG[i]] = zz[i] * q[i]
            block = C.T @ F.reshape(8, 8) @ C + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            nblocks += 1
    px = np.clip(np.rint(out[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, px.tobytes()


def decode_gif_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 64,
) -> DataFrame:
    """Arrow-batched GIF frame decode via mapInPandas: one OUTPUT ROW
    PER FRAME (id, frame_id, width, height, mean_pixel) — the frame-
    sampling shape at the decode level. Undecodable rows yield a single
    all-null frame row so ids are never silently dropped."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("frame_id", IntegerType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("mean_pixel", DoubleType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                ids, fids, ws, hs, means = [], [], [], [], []
                for mid, c in zip(chunk[id_col], chunk[content_col]):
                    r = gif_decode(c)
                    if r is None:
                        ids.append(mid); fids.append(None)
                        ws.append(None); hs.append(None); means.append(None)
                        continue
                    w, h, frames = r
                    for fi, px in enumerate(frames):
                        ids.append(mid); fids.append(fi)
                        ws.append(w); hs.append(h)
                        means.append(sum(px) / max(len(px), 1))
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "frame_id": pd.array(fids, dtype="Int32"),
                        "width": pd.array(ws, dtype="Int32"),
                        "height": pd.array(hs, dtype="Int32"),
                        "mean_pixel": means,
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, schema=out_schema)


def _any_pixel_decode(content: bytes | None):
    """(width, height, channels, pixels) via whichever real codec
    recognizes the payload: PNG (any supported color type), baseline
    grayscale JPEG, or 24-bit BI_RGB BMP."""
    r = png_decode(content)
    if r is not None:
        return r
    j = jpeg_decode_gray(content)
    if j is not None:
        return j[0], j[1], 1, j[2]
    b = bmp_decode(content)
    if b is not None:
        return b
    return None


def decode_pixels(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 64,
) -> DataFrame:
    """REAL pixel-level decode for PNG and baseline-grayscale-JPEG
    payloads via Arrow-batched mapInPandas: (id, width, height,
    channels, mean_pixel). Other formats yield nulls — color/
    progressive JPEG decode would need the absent image libs and stays
    the documented stub."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("channels", IntegerType(), True),
            StructField("mean_pixel", DoubleType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = [_any_pixel_decode(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "width": pd.array(
                            [r[0] if r else None for r in rows], dtype="Int32"
                        ),
                        "height": pd.array(
                            [r[1] if r else None for r in rows], dtype="Int32"
                        ),
                        "channels": pd.array(
                            [r[2] if r else None for r in rows], dtype="Int32"
                        ),
                        "mean_pixel": [
                            (sum(r[3]) / max(len(r[3]), 1)) if r else None
                            for r in rows
                        ],
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, schema=out_schema)


def _fake_decode(content: bytes | None, kind: str) -> dict:
    """Deterministic stand-in for a real codec: features derived from
    the bytes themselves so tests are stable."""
    if content is None:
        return {"feat_mean": None, "feat_dim": 0}
    s = sum(content[:256]) if content else 0
    return {"feat_mean": float(s % 997) / 997.0, "feat_dim": min(len(content), 2048)}


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    kind: str = "image",
    decode_fn: Callable[[bytes | None, str], dict] | None = None,
    require_real_codec: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    ``decode_fn`` is the pluggable codec (bytes -> feature dict). The
    default is the deterministic fake; ``require_real_codec=True``
    raises NotImplementedError — the real image/audio libraries are not
    available in this environment (STUB, clearly marked).
    ``batch_rows`` caps Arrow batch height so big payloads don't blow
    executor memory.
    """
    if require_real_codec and decode_fn is None:
        # a caller-supplied decode_fn IS the real codec — the env stub
        # below only fires when we would have to provide one ourselves
        # (r11 review: the old branch raised even WITH a decode_fn,
        # contradicting its own 'pass decode_fn=' message)
        if kind == "image":
            decode_fn = png_pixel_decode_fn  # real codecs: PNG/GIF/baseline JPEG
        else:
            raise NotImplementedError(
                "real codecs for audio/video SAMPLE decode beyond PCM/"
                "containers (e.g. MP3/AAC/H.264 — PIL/av/librosa) are not "
                "installed in this environment; pixel decode is real for "
                "PNG, GIF, and baseline grayscale JPEG — pass decode_fn= "
                "for other formats"
            )
    fn = decode_fn or _fake_decode

    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("feat_mean", DoubleType(), True),
            StructField("feat_dim", IntegerType(), True),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [fn(c, kind) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "feat_mean": [f["feat_mean"] for f in feats],
                        "feat_dim": [f["feat_dim"] for f in feats],
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_decode, schema=out_schema)


def sample_frames(
    df: DataFrame,
    n_frames_col: str = "meta.n_frames",
    every: int = 10,
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling plan for video: one row per sampled frame index.

    Pure ``sequence``+``explode`` — the decode of each frame is then a
    :func:`decode_features` pass over (media_id, frame_idx).
    """
    n = F.coalesce(F.col(n_frames_col), F.lit(0))
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every))
        ).alias("frame_idx"),
    ).filter(n > 0)


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize request plan: records target dims + scale factors JVM-side;
    the real pixel resample for decodable formats is
    :func:`resize_nearest` / :func:`decode_resize_features`."""
    return df.withColumn("target_w", F.lit(target_w)).withColumn(
        "target_h", F.lit(target_h)
    ).withColumn(
        "scale_x", F.col("target_w") / F.col("meta.width")
    ).withColumn("scale_y", F.col("target_h") / F.col("meta.height"))


def resize_nearest(
    pixels: bytes, w: int, h: int, channels: int, tw: int, th: int
) -> bytes:
    """REAL nearest-neighbor resample over a decoded row-major pixel
    buffer (source index = dst * src_size // dst_size — the standard
    floor mapping): closes the resize half of the decode/resize stub
    for every format the pure-stdlib codecs decode (PNG/GIF). Exact
    integer index math, so results are bit-deterministic."""
    out = bytearray(tw * th * channels)
    o = 0
    for r in range(th):
        sr = r * h // th
        for c in range(tw):
            sc = c * w // tw
            s = (sr * w + sc) * channels
            out[o : o + channels] = pixels[s : s + channels]
            o += channels
    return bytes(out)


def decode_resize_features(
    df: DataFrame,
    target_w: int,
    target_h: int,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched decode -> nearest-neighbor resize -> exact-integer
    features (sum, first/last pixel) — the full decode+resize stage of
    an image-curation pipeline, real end to end for PNG."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("out_w", IntegerType(), True),
            StructField("out_h", IntegerType(), True),
            StructField("pix_sum", LongType(), True),
            StructField("p_first", IntegerType(), True),
            StructField("p_last", IntegerType(), True),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for c in chunk[content_col]:
                    dec = png_decode(c)
                    if dec is None:
                        rows.append((None, None, None, None, None))
                        continue
                    w, h, ch, pix = dec
                    rp = resize_nearest(pix, w, h, ch, target_w, target_h)
                    rows.append(
                        (target_w, target_h, sum(rp), rp[0], rp[-1])
                    )
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "out_w": pd.array([r[0] for r in rows], dtype="Int32"),
                        "out_h": pd.array([r[1] for r in rows], dtype="Int32"),
                        "pix_sum": pd.array([r[2] for r in rows], dtype="Int64"),
                        "p_first": pd.array([r[3] for r in rows], dtype="Int32"),
                        "p_last": pd.array([r[4] for r in rows], dtype="Int32"),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_run, out_schema)


def wav_trim_silence_feats(content: bytes | None) -> dict:
    """REAL leading/trailing silence trim over decoded PCM16 mono — the
    audio-curation step before feature extraction (silence padding
    inflates sequence length and skews energy stats): exact zero
    samples are stripped from both ends and the clip reports
    (n_samples, lead_zeros, trail_zeros, body_sum) so both the trim
    BOUNDS and the surviving signal are attested. All-zero clips trim
    to an empty body (trail counts the remainder). Malformed /
    non-PCM16-mono input returns the all-None refusal dict."""
    none = {
        "n_samples": None,
        "lead_zeros": None,
        "trail_zeros": None,
        "body_sum": None,
    }
    xs = _wav_pcm16_mono(content)
    if xs is None:
        return none
    n = len(xs)
    lead = 0
    while lead < n and xs[lead] == 0:
        lead += 1
    trail = 0
    while trail < n - lead and xs[n - 1 - trail] == 0:
        trail += 1
    return {
        "n_samples": n,
        "lead_zeros": lead,
        "trail_zeros": trail,
        "body_sum": sum(xs[lead : n - trail]),
    }


def decode_trim_silence(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched silence-trim features: one row per clip."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("n_samples", IntegerType(), True),
            StructField("lead_zeros", IntegerType(), True),
            StructField("trail_zeros", IntegerType(), True),
            StructField("body_sum", LongType(), True),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = [wav_trim_silence_feats(c) for c in chunk[content_col]]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "n_samples": pd.array([r["n_samples"] for r in rows], dtype="Int32"),
                        "lead_zeros": pd.array([r["lead_zeros"] for r in rows], dtype="Int32"),
                        "trail_zeros": pd.array([r["trail_zeros"] for r in rows], dtype="Int32"),
                        "body_sum": pd.array([r["body_sum"] for r in rows], dtype="Int64"),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_run, out_schema)


def decode_tile_sums(
    df: DataFrame,
    grid: int = 2,
    content_col: str = "content",
    id_col: str = "media_id",
    batch_rows: int = 256,
) -> DataFrame:
    """Arrow-batched decode -> grid-tile EXACT pixel sums (one output
    row per tile) — the spatial-addressing stage of an image-curation
    pipeline (per-region stats, crop scoring): the image splits into a
    ``grid x grid`` tile lattice (image dims must divide evenly, else
    the refusal row) and each tile reports its integer pixel sum and
    count across channels. Real end to end for any codec
    _any_pixel_decode handles (PNG, baseline JPEG, BMP); malformed
    payloads yield one all-NULL row, never an exception."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("tile_r", IntegerType(), True),
            StructField("tile_c", IntegerType(), True),
            StructField("n_px", IntegerType(), True),
            StructField("px_sum", LongType(), True),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                ids, trs, tcs, nps, sums = [], [], [], [], []
                for mid, c in zip(chunk[id_col], chunk[content_col]):
                    dec = _any_pixel_decode(c)
                    if dec is None or dec[0] % grid or dec[1] % grid:
                        ids.append(mid)
                        trs.append(None); tcs.append(None)
                        nps.append(None); sums.append(None)
                        continue
                    w, h, ch, pix = dec
                    tw, th = w // grid, h // grid
                    row_bytes = w * ch
                    for tr in range(grid):
                        for tc in range(grid):
                            s = 0
                            n = 0
                            for r in range(tr * th, (tr + 1) * th):
                                base = r * row_bytes + tc * tw * ch
                                seg = pix[base : base + tw * ch]
                                s += sum(seg)
                                n += len(seg)
                            ids.append(mid)
                            trs.append(tr); tcs.append(tc)
                            nps.append(n); sums.append(s)
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "tile_r": pd.array(trs, dtype="Int32"),
                        "tile_c": pd.array(tcs, dtype="Int32"),
                        "n_px": pd.array(nps, dtype="Int32"),
                        "px_sum": pd.array(sums, dtype="Int64"),
                    }
                )

    return df.select(id_col, content_col).mapInPandas(_run, out_schema)
