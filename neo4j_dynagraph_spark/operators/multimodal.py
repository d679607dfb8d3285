"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct. The Spark-side plumbing — schemas, batch iteration,
partition sizing — is real and tested; the actual media decode is
STUBBED (the container has no image/audio libraries): `decode_stub`
raises NotImplementedError unless `fake=True`, in which case it emits a
deterministic fake feature vector so pipelines are testable end-to-end.

Scale design:
- payloads never pass through Python row-at-a-time: mapInPandas streams
  Arrow record batches, and the decode UDF sees a pandas Series of
  bytes per batch.
- binary-heavy tables should be repartitioned by size, not row count
  (`target_partition_bytes`) before heavy UDF stages, so one task's
  Arrow batch fits executor memory even when payloads are MBs each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("payload_len", LongType()),
        StructField("payload_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_len", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column — computed JVM-side
    (length + digest), no decode required."""
    p = F.col(payload_col)
    return df.withColumn("payload_len", F.length(p).cast("long")).withColumn(
        "payload_md5", F.md5(p)
    )


def docs_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Test adapter: wrap documents.text as a binary payload so the
    multimodal path is exercisable on the driver testdata."""
    return attach_payload_meta(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit(kind).alias("kind"),
            F.encode("text", "UTF-8").alias("payload"),
        )
    ).select([f.name for f in MEDIA_SCHEMA.fields])


def decode_ppm(payload: bytes) -> dict:
    """REAL image decode for the PPM/PGM container (P6/P5): pure-Python
    header parse + raw pixel plane — no external codec needed. Returns
    width/height/maxval plus byte statistics over the pixel plane
    (mean/min/max), which downstream features and the SQL oracles
    consume. Raises ValueError on malformed input."""
    d = decode_ppm_pixels(payload)
    plane = d["plane"]
    return {
        "width": d["width"],
        "height": d["height"],
        "maxval": d["maxval"],
        "n_bytes": len(plane),
        "mean_byte": sum(plane) / len(plane),
        "min_byte": min(plane),
        "max_byte": max(plane),
    }


def decode_ppm_pixels(payload: bytes) -> dict:
    """The PPM/PGM parse half of decode_ppm, returning the raw pixel
    plane (row-major, ``channels`` bytes per pixel) for operators that
    need spatial structure (tiling) rather than summary statistics."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a P6/P5 netpbm payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; '#' starts a comment running to end-of-line
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace byte after maxval, then raster starts
    width, height, maxval = (int(t) for t in tokens)
    if width <= 0 or height <= 0 or not 0 < maxval < 65536:
        raise ValueError("invalid netpbm dimensions")
    bpp = (3 if payload[:2] == b"P6" else 1) * (2 if maxval > 255 else 1)
    plane = payload[i : i + width * height * bpp]
    if len(plane) != width * height * bpp:
        raise ValueError("pixel plane shorter than header promises")
    if len(payload) != i + width * height * bpp:
        # strict both ways: trailing bytes mean the header lies about
        # the raster (e.g. a bit-flipped P6 magic reinterpreting an RGB
        # plane as grayscale) — found by the mutation fuzzer
        raise ValueError("trailing bytes after the pixel plane")
    return {
        "width": width,
        "height": height,
        "maxval": maxval,
        "channels": bpp,  # bytes per pixel (doubled for 16-bit samples)
        "plane": plane,
    }


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG filter type 4): pick whichever of
    left/up/up-left is closest to a+b-c, ties resolved a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter_line(line: bytes, prev: bytes, ftype: int, bpp: int) -> bytes:
    """Apply PNG scanline filter `ftype` (encoder direction)."""
    out = bytearray(len(line))
    for j, x in enumerate(line):
        a = line[j - bpp] if j >= bpp else 0
        b = prev[j]
        c = prev[j - bpp] if j >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[j] = (x - pred) & 0xFF
    return bytes(out)


def _png_unfilter_line(line: bytearray, prev: bytes, ftype: int, bpp: int) -> None:
    """Invert PNG scanline filter `ftype` in place (decoder direction).
    Predictors read RECONSTRUCTED bytes (line[j-bpp] already unfiltered
    when j is reached), per the PNG spec."""
    if ftype == 0:
        return
    for j in range(len(line)):
        a = line[j - bpp] if j >= bpp else 0
        b = prev[j]
        c = prev[j - bpp] if j >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        line[j] = (line[j] + pred) & 0xFF


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def decode_png(payload: bytes) -> dict:
    """REAL image decode for PNG: pure-Python chunk walk with CRC
    verification, stdlib-zlib inflate of the IDAT stream, and
    per-scanline unfiltering (None/Sub/Up/Average/Paeth) — no external
    codec. Supports the common non-interlaced 8-bit-depth color types
    (gray / RGB / gray+alpha / RGBA); palette (type 3), 16-bit, and
    interlaced images raise. Returns width/height/bit depth/color type
    plus byte statistics over the unfiltered pixel plane. Raises
    ValueError on malformed input (bad signature, truncated chunk,
    CRC mismatch, short pixel plane)."""
    d = decode_png_pixels(payload)
    plane = d["plane"]
    return {
        "width": d["width"],
        "height": d["height"],
        "maxval": d["maxval"],
        "color_type": d["color_type"],
        "n_bytes": len(plane),
        "mean_byte": sum(plane) / len(plane),
        "min_byte": min(plane),
        "max_byte": max(plane),
    }


def decode_png_pixels(payload: bytes) -> dict:
    """The chunk-walk/inflate/unfilter half of decode_png, returning
    the raw unfiltered pixel plane (row-major, ``channels`` bytes per
    pixel) for operators that need spatial structure (tiling)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, seen_iend = 8, None, b"", False
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(
                f"truncated {ctype!r} chunk: declared {length} bytes, "
                f"got {len(data)}"
            )
        crc = payload[pos + 8 + length : pos + 12 + length]
        if len(crc) != 4:
            raise ValueError(f"truncated CRC on {ctype!r} chunk")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != struct.unpack(">I", crc)[0]:
            raise ValueError(f"CRC mismatch on {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("missing or malformed IHDR chunk")
    if not idat:
        raise ValueError("missing IDAT chunk")
    if not seen_iend:
        raise ValueError("missing IEND chunk")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width <= 0 or height <= 0:
        raise ValueError("invalid PNG dimensions")
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if depth != 8 or color not in _PNG_CHANNELS:
        raise ValueError(
            f"only 8-bit gray/RGB/gray+A/RGBA supported, "
            f"got depth={depth} color={color}"
        )
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT zlib stream: {exc}") from exc
    bpp = _PNG_CHANNELS[color]
    stride = width * bpp
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"pixel plane is {len(raw)} bytes, header promises "
            f"{height * (1 + stride)}"
        )
    plane = bytearray()
    prev: bytes = bytes(stride)
    for y in range(height):
        off = y * (1 + stride)
        line = bytearray(raw[off + 1 : off + 1 + stride])
        _png_unfilter_line(line, prev, raw[off], bpp)
        plane += line
        prev = bytes(line)
    return {
        "width": width,
        "height": height,
        "maxval": (1 << depth) - 1,
        "color_type": color,
        "channels": bpp,
        "plane": bytes(plane),
    }


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode for RIFF/WAVE PCM: pure-Python chunk walk +
    fmt parse + int16/uint8 sample statistics. Raises ValueError on
    malformed input."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack(
            "<I", payload[pos + 4 : pos + 8]
        )[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            # a truncated chunk must be the documented ValueError, not
            # silent statistics over partial samples
            raise ValueError(
                f"truncated {cid!r} chunk: declared {size} bytes, "
                f"got {len(body)}"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk too short: {len(fmt)} < 16 bytes")
    audio_format, channels, sample_rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only PCM 8/16-bit supported, got fmt={audio_format} bits={bits}")
    if channels == 0 or sample_rate == 0:
        raise ValueError(
            f"invalid fmt: channels={channels} sample_rate={sample_rate}"
        )
    if bits == 16:
        n = len(data) // 2
        samples = struct.unpack(f"<{n}h", data[: n * 2])
    else:
        samples = tuple(b - 128 for b in data)
    n_samples = len(samples) // max(1, channels)
    peak = max(abs(s) for s in samples) if samples else 0
    mean = sum(samples) / len(samples) if samples else 0.0
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_samples": n_samples,
        "peak": peak,
        "mean_sample": mean,
    }


def decode_stub(payload: bytes, kind: str, fake: bool = False) -> list[float]:
    """THE decode boundary. PPM/PGM and PNG images and PCM WAV audio are
    decoded FOR REAL (pure-Python parsers above — no external libraries
    needed); the remaining containers (JPEG/MP3/MP4...) require entropy
    codecs not present here, so they fall back to a deterministic fake
    8-dim feature when `fake=True` and raise otherwise."""
    if payload[:2] in (b"P6", b"P5"):
        d = decode_ppm(payload)
        return [
            float(d["width"]), float(d["height"]), float(d["maxval"]),
            float(d["n_bytes"]), d["mean_byte"] / 255.0,
            d["min_byte"] / 255.0, d["max_byte"] / 255.0, 1.0,
        ]
    if payload[:8] == _PNG_SIG:
        d = decode_png(payload)
        return [
            float(d["width"]), float(d["height"]), float(d["color_type"]),
            float(d["n_bytes"]), d["mean_byte"] / 255.0,
            d["min_byte"] / 255.0, d["max_byte"] / 255.0, 3.0,
        ]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        d = decode_wav(payload)
        return [
            float(d["sample_rate"]), float(d["channels"]), float(d["bits"]),
            float(d["n_samples"]), float(d["peak"]), d["mean_sample"],
            0.0, 2.0,
        ]
    if not fake:
        raise NotImplementedError(
            "no pure-Python decoder for this container (JPEG/MP3/MP4 need "
            "entropy codecs not available here); PPM/PGM, PNG, and PCM WAV "
            "decode for real — or run with fake=True for the deterministic "
            "double"
        )
    acc = [0] * 8
    for i, byte in enumerate(payload[:4096]):
        acc[i % 8] = (acc[i % 8] * 31 + byte) % 100003
    return [a / 100003.0 for a in acc]


def encode_test_media(ids: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic REAL media encoder (mapInPandas): builds valid PPM
    (P6) images or PCM16 WAV audio whose dimensions and byte content are
    closed-form functions of media_id — so a SQL oracle can state what a
    correct decoder must recover, and the decode→oracle hash comparison
    verifies the parser byte-for-byte (a wrong pixel/sample read cannot
    match). ``ids`` needs one `media_id` long column."""
    import struct

    import pandas as pd

    def ppm(mid: int) -> bytes:
        w, h, v = 4 + mid % 13, 3 + mid % 7, mid % 251
        return f"P6\n{w} {h}\n255\n".encode() + bytes([v]) * (w * h * 3)

    def png(mid: int) -> bytes:
        # RGB with a horizontal byte gradient (v+x mod 256, so some
        # payloads wrap past 255), pushed through a NONTRIVIAL filter
        # schedule — Sub on row 0, Up on row 1, Paeth after — so the
        # hash-matched decode proves real unfiltering arithmetic, not
        # just an inflate of filter-0 scanlines
        import zlib as _z

        w, h, v = 4 + mid % 13, 3 + mid % 7, mid % 251
        row = bytes((v + x) % 256 for x in range(w) for _ in range(3))
        raw = bytearray()
        prev: bytes = bytes(3 * w)
        for y in range(h):
            ftype = 1 if y == 0 else (2 if y == 1 else 4)
            raw.append(ftype)
            raw += _png_filter_line(row, prev, ftype, 3)
            prev = row

        def chunk(ctype: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            _PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    def wav(mid: int) -> bytes:
        sr, ch = 8000 * (1 + mid % 3), 1 + mid % 2
        n, amp = 100 + mid % 50, (mid % 1000) - 500
        data = struct.pack(f"<{n * ch}h", *([amp] * (n * ch)))
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16)
            + b"data" + struct.pack("<I", len(data))
        )
        return hdr + data

    enc = {"image": ppm, "png": png}.get(kind, wav)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kind,
                    "payload": [enc(int(m)) for m in pdf["media_id"]],
                }
            )

    media = ids.select("media_id").mapInPandas(
        run, "media_id long, kind string, payload binary"
    )
    return attach_payload_meta(media).select([f.name for f in MEDIA_SCHEMA.fields])


def decode_image_meta(media: DataFrame) -> DataFrame:
    """mapInPandas REAL image decode, dispatched on the container magic:
    netpbm (decode_ppm) or PNG (decode_png) — no fake path, no codec
    library. Both decoders share the (width, height, maxval, byte
    statistics) output contract."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                d = decode_png(b) if b[:8] == _PNG_SIG else decode_ppm(b)
                rows.append(
                    (int(mid), d["width"], d["height"], d["maxval"],
                     d["n_bytes"], d["mean_byte"], d["min_byte"], d["max_byte"])
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "maxval",
                         "n_bytes", "mean_byte", "min_byte", "max_byte"],
            )

    return media.mapInPandas(
        run,
        "media_id long, width long, height long, maxval long, "
        "n_bytes long, mean_byte double, min_byte long, max_byte long",
    )


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """mapInPandas REAL audio decode: RIFF/WAVE chunk walk + PCM sample
    statistics per payload (decode_wav)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_wav(bytes(p))
                rows.append(
                    (int(mid), d["sample_rate"], d["channels"], d["bits"],
                     d["n_samples"], d["peak"], d["mean_sample"])
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "channels", "bits",
                         "n_samples", "peak", "mean_sample"],
            )

    return media.mapInPandas(
        run,
        "media_id long, sample_rate long, channels long, bits long, "
        "n_samples long, peak long, mean_sample double",
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each UDF call receives a record batch; per-row Python
    touches only the payload bytes. The output schema is fixed
    (FEATURE_SCHEMA) so downstream similarity operators can consume the
    `feature` column like any embedding.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, k, fake=fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_len": pdf["payload_len"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("payload", BinaryType()),
        StructField("payload_len", LongType()),
    ]
)


def resize_stub(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Resize decode boundary (images). The fake double is deterministic:
    it re-chunks the payload to exactly width*height bytes (truncate or
    cycle), so tests can assert output size without a codec."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an image library not available here; "
            "run with fake=True for the deterministic test double"
        )
    target = max(1, width * height)
    if not payload:
        return bytes(target)
    reps = (target + len(payload) - 1) // len(payload)
    return (payload * reps)[:target]


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """mapInPandas image resize: payload -> payload (1:1 rows), metadata
    recomputed JVM-side afterwards so it can never drift from the new
    bytes. Same batch-shape discipline as extract_features."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [
                        resize_stub(p, width, height, fake=fake)
                        for p in pdf["payload"]
                    ],
                }
            )

    resized = media.mapInPandas(
        run, "media_id long, kind string, payload binary"
    )
    return attach_payload_meta(resized).select(
        [f.name for f in MEDIA_SCHEMA.fields]
    )


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_nth: int = 2, fake: bool = True
) -> DataFrame:
    """mapInPandas frame sampling (video): each payload expands to 0..N
    frame rows — the 1-to-many batch shape (generator output rows need
    not align with input rows). The fake double treats the payload as a
    concatenation of fixed-size frames and keeps every `every_nth` one;
    a real implementation would seek keyframes via a codec."""
    import pandas as pd

    if not fake:
        raise NotImplementedError(
            "video frame extraction requires a codec not available here; "
            "run with fake=True for the deterministic test double"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_frames = len(p) // frame_bytes
                for i in range(0, n_frames, every_nth):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(p[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "payload": frames,
                    "payload_len": [len(f) for f in frames],
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def repartition_by_bytes(
    df: DataFrame, total_bytes: int, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Size-based repartitioning before heavy per-payload stages: pick
    the partition count from data volume, not row count."""
    n = max(1, total_bytes // target_partition_bytes)
    return df.repartition(int(n))


def tile_images(
    media: DataFrame, tile_w: int = 4, tile_h: int = 2
) -> DataFrame:
    """ViT-style patch tiling (mapInPandas, 1-to-many): REAL-decode each
    image payload (PPM or PNG, dispatched on the container magic), split
    the pixel plane into a ceil(w/tile_w) x ceil(h/tile_h) grid with
    ragged right/bottom edges, and emit one row per tile with its byte
    mean — the patch-embedding precursor shape (decode + patchify)
    of a vision-transformer ingest pipeline.

    Batch shape: 1:N Arrow expansion like sample_frames; each output
    row is O(1) metadata + one float, so the expansion is bounded by
    (w/tile_w)*(h/tile_h) per image regardless of payload size. At
    100 TB this runs where the bytes live — no shuffle until whatever
    aggregates the tiles.

    Columns: media_id, tx, ty, tile_w, tile_h, mean_byte (rounded 1e-6
    for cross-engine export).
    """
    if tile_w < 1 or tile_h < 1:
        raise ValueError("tile dimensions must be >= 1")
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                d = (
                    decode_png_pixels(b)
                    if b[:8] == _PNG_SIG
                    else decode_ppm_pixels(b)
                )
                w, h, ch, plane = d["width"], d["height"], d["channels"], d["plane"]
                stride = w * ch
                for ty in range((h + tile_h - 1) // tile_h):
                    th = min(tile_h, h - ty * tile_h)
                    for tx in range((w + tile_w - 1) // tile_w):
                        tw = min(tile_w, w - tx * tile_w)
                        tot = 0
                        for y in range(ty * tile_h, ty * tile_h + th):
                            off = y * stride + tx * tile_w * ch
                            tot += sum(plane[off : off + tw * ch])
                        rows.append(
                            (int(mid), tx, ty, tw, th,
                             round(tot / (tw * th * ch), 6))
                        )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "tx", "ty", "tile_w", "tile_h", "mean_byte"],
            )

    return media.mapInPandas(
        run,
        "media_id long, tx int, ty int, tile_w int, tile_h int, mean_byte double",
    )
