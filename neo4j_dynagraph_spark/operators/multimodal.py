"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct. The Spark-side plumbing — schemas, batch iteration,
partition sizing — is real and tested. Decode is REAL for netpbm
(PPM/PGM), PNG (inflate + unfilter), baseline-sequential JPEG
(Huffman + dequant + IDCT + YCbCr), PCM WAV, and the MP4/ISO-BMFF
DEMUX layer (box-tree walk: mvhd/tkhd/stsd/stsz/mdat, decode_mp4) —
all pure Python, no codec library. Only entropy-coded SAMPLE decode
(MP3 audio, MPEG-4/H.264 video) stays gated: `decode_stub` raises
NotImplementedError for those unless `fake=True`, which emits a
deterministic fake feature vector so pipelines are testable
end-to-end.

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


def decode_mp4(payload: bytes) -> dict:
    """REAL MP4/ISO-BMFF demux: pure-Python recursive box-tree walk
    (uint32-BE size + fourcc, 64-bit largesize supported, containers
    moov/trak/mdia/minf/stbl recursed) extracting mvhd
    timescale/duration, per-track tkhd dimensions (16.16 fixed
    point), the stsd sample-entry fourcc, the stsz sample-size table,
    and the mdat payload — then VERIFIES sum(stsz) == mdat length, so
    a parse that misreads any table cannot return. This is the demux
    layer of the video container (the part a training pipeline needs
    for routing/budgeting/frame indexing); SAMPLE decode (MPEG-4
    part-2/H.264 entropy coding) remains the documented env-gate.
    Raises ValueError on malformed input."""
    import struct

    if len(payload) < 8 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no leading ftyp)")

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos < end:
            if end - pos < 8:
                raise ValueError("truncated box header")
            size = struct.unpack(">I", buf[pos : pos + 4])[0]
            four = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:
                if end - pos < 16:
                    raise ValueError("truncated largesize")
                size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
                body = pos + 16
            elif size == 0:
                size = end - pos
            if size < body - pos or pos + size > end:
                raise ValueError(f"box {four!r} overruns its parent")
            yield four, body, pos + size
            pos += size

    out = {
        "timescale": None, "duration": None, "n_tracks": 0,
        "codec": None, "width": None, "height": None,
        "sample_sizes": [], "mdat_bytes": None,
    }

    def full(buf, body, bend, four):  # version/flags header of a FullBox
        if bend - body < 4:
            raise ValueError(f"{four.decode('latin1')} too short for FullBox")
        return buf[body], body + 4

    def need(bend, upto, four):
        # inner-field reads must stay inside the DECLARED box end: a
        # box-tree-consistent payload with an undersized body must
        # raise ValueError (the documented contract), never a bare
        # struct.error / silently-truncated slice (r12 advice)
        if upto > bend:
            raise ValueError(
                f"{four.decode('latin1')} body shorter than its fixed layout"
            )

    def parse(buf, start, end, depth=0):
        for four, body, bend in walk(buf, start, end):
            if four in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                parse(buf, body, bend, depth + 1)
            elif four == b"mvhd":
                ver, p2 = full(buf, body, bend, four)
                if ver != 0:
                    raise ValueError("mvhd v1 not emitted by the fixture")
                need(bend, p2 + 16, four)
                out["timescale"], out["duration"] = struct.unpack(
                    ">II", buf[p2 + 8 : p2 + 16]
                )
            elif four == b"tkhd":
                out["n_tracks"] += 1
                # v0 tkhd: width/height are the LAST 8 bytes, 16.16
                need(bend, body + 8, four)
                w, h = struct.unpack(">II", buf[bend - 8 : bend])
                out["width"], out["height"] = w >> 16, h >> 16
            elif four == b"stsd":
                _, p2 = full(buf, body, bend, four)
                need(bend, p2 + 12, four)
                (n_entries,) = struct.unpack(">I", buf[p2 : p2 + 4])
                if n_entries < 1:
                    raise ValueError("empty stsd")
                out["codec"] = buf[p2 + 8 : p2 + 12].decode("ascii")
            elif four == b"stsz":
                _, p2 = full(buf, body, bend, four)
                need(bend, p2 + 8, four)
                fixed, cnt = struct.unpack(">II", buf[p2 : p2 + 8])
                if fixed:
                    out["sample_sizes"] = [fixed] * cnt
                else:
                    need(bend, p2 + 8 + 4 * cnt, four)
                    out["sample_sizes"] = list(
                        struct.unpack(
                            f">{cnt}I", buf[p2 + 8 : p2 + 8 + 4 * cnt]
                        )
                    )
            elif four == b"mdat":
                out["mdat_bytes"] = bend - body

    try:
        parse(payload, 0, len(payload))
    except (struct.error, IndexError) as exc:  # belt-and-braces: any
        # remaining short read still honors the ValueError contract
        raise ValueError(f"malformed ISO-BMFF structure: {exc}") from exc
    if out["timescale"] is None or out["mdat_bytes"] is None:
        raise ValueError("missing mvhd or mdat")
    if sum(out["sample_sizes"]) != out["mdat_bytes"]:
        raise ValueError(
            f"stsz total {sum(out['sample_sizes'])} != mdat payload "
            f"{out['mdat_bytes']} — corrupt sample table"
        )
    n = len(out["sample_sizes"])
    return {
        "timescale": out["timescale"],
        "duration": out["duration"],
        "n_tracks": out["n_tracks"],
        "codec": out["codec"],
        "width": out["width"],
        "height": out["height"],
        "n_samples": n,
        "sample_bytes": out["mdat_bytes"],
        "mean_sample": out["mdat_bytes"] / n if n else 0.0,
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


# ---------------------------------------------------------------------------
# Baseline-sequential JPEG (ITU T.81): pure-Python Huffman + dequant +
# IDCT + (for 3 components) YCbCr->RGB. Same offline-feasible-codec
# proof as the PNG/inflate decoder above: no external library, the
# encoder half exists so fixtures are self-contained and a SQL oracle
# can state what a correct decoder must recover.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)
# ITU T.81 Annex K.3 example tables (public spec text): luminance DC
# and AC. BITS = #codes per length 1..16; VALS in code order.
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


def _jpeg_canonical_codes(bits, vals):  # noqa: ANN001
    """Canonical Huffman assignment (T.81 C.2): per ascending code
    length, codes count up from the left. Returns {symbol: (code, n)}."""
    out, code, i = {}, 0, 0
    for n in range(1, 17):
        for _ in range(bits[n - 1]):
            out[vals[i]] = (code, n)
            code += 1
            i += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit packer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)

    def align(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # 1-pad to the byte boundary

    def restart(self, i: int) -> None:
        """Byte-align and emit RSTi (T.81 F.1.2.3 restart markers)."""
        self.align()
        self.buf += bytes((0xFF, 0xD0 + (i % 8)))

    def done(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; any other 0xFF-marker mid-stream is a hard error."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("entropy stream truncated at 0xFF")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                elif 0xD0 <= nxt <= 0xD7:
                    raise ValueError(
                        "unexpected RST marker (use align_restart)"
                    )
                else:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy stream"
                    )
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume a byte-aligned RSTn marker (DRI > 0 streams)."""
        self.nbits = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected RST marker at restart interval")
        self.pos += 2

    def huff(self, table: dict) -> int:
        """Decode one symbol from a {(code, length): symbol} map."""
        code, n = 0, 0
        while n < 16:
            code = (code << 1) | self.bit()
            n += 1
            sym = table.get((code, n))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code (no match in 16 bits)")


def _jpeg_extend(v: int, ssss: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a ssss-bit magnitude to its signed
    value (low half of the range encodes negatives)."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _jpeg_category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def jpeg_gray_from_qblocks(
    width: int,
    height: int,
    qblocks: list,
    qtable: list,
    restart_interval: int = 0,
) -> bytes:
    """Emit a valid baseline-sequential GRAYSCALE JPEG whose quantized
    coefficient blocks are given directly (zigzag order, MCU raster
    order) — the encoder half that makes decoder fixtures
    self-contained: tests and the q_jpeg_decode oracle choose
    coefficients whose decode is closed-form (DC-only constant blocks
    survive quantization exactly), while the differential test feeds
    arbitrary AC patterns. Standard Annex K Huffman tables, one DQT.
    Width/height must be multiples of 8 (no partial-MCU padding)."""
    import struct

    if width % 8 or height % 8 or width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive multiples of 8")
    if len(qblocks) != (width // 8) * (height // 8):
        raise ValueError(
            f"need {(width // 8) * (height // 8)} blocks, got {len(qblocks)}"
        )
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    prev_dc = 0
    rst = 0
    for mcu, blk in enumerate(qblocks):
        if restart_interval and mcu and mcu % restart_interval == 0:
            w.restart(rst)
            rst += 1
            prev_dc = 0
        diff = blk[0] - prev_dc
        prev_dc = blk[0]
        ssss = _jpeg_category(diff)
        code, n = dc_codes[ssss]
        w.put(code, n)
        if ssss:
            w.put(diff if diff >= 0 else diff + (1 << ssss) - 1, ssss)
        run = 0
        last_nz = max((i for i in range(1, 64) if blk[i]), default=0)
        for i in range(1, last_nz + 1):
            if blk[i] == 0:
                run += 1
                continue
            while run > 15:
                code, n = ac_codes[0xF0]  # ZRL
                w.put(code, n)
                run -= 16
            ssss = _jpeg_category(blk[i])
            code, n = ac_codes[(run << 4) | ssss]
            w.put(code, n)
            v = blk[i]
            w.put(v if v >= 0 else v + (1 << ssss) - 1, ssss)
            run = 0
        if last_nz < 63:
            code, n = ac_codes[0x00]  # EOB
            w.put(code, n)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    # qtable arrives in NATURAL order; DQT stores zigzag order
    dqt = seg(0xFFDB, bytes([0]) + bytes(qtable[z] for z in _JPEG_ZIGZAG))
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + w.done() + b"\xff\xd9"
    )


def jpeg_ycc_from_qblocks(
    width: int, height: int, comps: list, qtable: list
) -> bytes:
    """3-component (YCbCr, 1x1 sampling) twin of
    :func:`jpeg_gray_from_qblocks`: ``comps`` is [y_blocks, cb_blocks,
    cr_blocks], each a list of zigzag-order quantized blocks in MCU
    raster order, all sharing one quant table. Exercises the decoder's
    interleaved-MCU and YCbCr->RGB paths."""
    import struct

    if width % 8 or height % 8 or width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive multiples of 8")
    n_mcu = (width // 8) * (height // 8)
    if len(comps) != 3 or any(len(c) != n_mcu for c in comps):
        raise ValueError(f"need 3 components x {n_mcu} blocks")
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    pred = [0, 0, 0]
    for m in range(n_mcu):
        for ci in range(3):
            blk = comps[ci][m]
            diff = blk[0] - pred[ci]
            pred[ci] = blk[0]
            ssss = _jpeg_category(diff)
            code, n = dc_codes[ssss]
            w.put(code, n)
            if ssss:
                w.put(diff if diff >= 0 else diff + (1 << ssss) - 1, ssss)
            run = 0
            last_nz = max((i for i in range(1, 64) if blk[i]), default=0)
            for i in range(1, last_nz + 1):
                if blk[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, n = ac_codes[0xF0]
                    w.put(code, n)
                    run -= 16
                ssss = _jpeg_category(blk[i])
                code, n = ac_codes[(run << 4) | ssss]
                w.put(code, n)
                v = blk[i]
                w.put(v if v >= 0 else v + (1 << ssss) - 1, ssss)
                run = 0
            if last_nz < 63:
                code, n = ac_codes[0x00]
                w.put(code, n)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0]) + bytes(qtable[z] for z in _JPEG_ZIGZAG))
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(
        0xFFC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + w.done() + b"\xff\xd9"


_JPEG_IDCT_COS = None


def _jpeg_idct_block(coef: list) -> list:
    """Float separable 2-D inverse DCT of one 8x8 block (natural-order
    coefficients), T.81 A.3.3. Returns 64 floats (pre level-shift)."""
    global _JPEG_IDCT_COS
    if _JPEG_IDCT_COS is None:
        import math

        _JPEG_IDCT_COS = [
            [
                (math.sqrt(0.125) if u == 0 else 0.5)
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for u in range(8)
            ]
            for x in range(8)
        ]
    c = _JPEG_IDCT_COS
    # rows then columns
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8 : y * 8 + 8]
        for x in range(8):
            cx = c[x]
            tmp[y * 8 + x] = sum(row[u] * cx[u] for u in range(8))
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            cy = c[y]
            out[y * 8 + x] = sum(col[v] * cy[v] for v in range(8))
    return out


def decode_jpeg_pixels(payload: bytes) -> dict:
    """REAL image decode for baseline-sequential JPEG (SOF0): marker
    walk, DQT/DHT parse, MSB-first entropy decode (byte unstuffing,
    DC-diff EXTEND, AC run-length with ZRL/EOB, restart intervals),
    dequantize, float IDCT, level shift + clamp, and JFIF YCbCr->RGB
    for 3-component images (1x1 sampling only; 2x1/2x2 chroma
    subsampling, progressive SOF2, arithmetic coding, and 12-bit
    precision raise ValueError). Returns width/height/channels and the
    row-major pixel plane like decode_png_pixels."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, list] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS: malformed
            raise ValueError("EOI before SOS")
        length = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                zz = body[i + 1 : i + 65]
                if len(zz) != 64:
                    raise ValueError("truncated DQT table")
                nat = [0] * 64
                for k, z in enumerate(_JPEG_ZIGZAG):
                    nat[z] = zz[k]
                qtables[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = body[i + 1 : i + 17]
                n = sum(bits)
                vals = body[i + 17 : i + 17 + n]
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("truncated DHT table")
                codes = _jpeg_canonical_codes(list(bits), list(vals))
                decode_map = {(c, ln): sym for sym, (c, ln) in codes.items()}
                (dc_tabs if tc == 0 else ac_tabs)[th] = decode_map
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"only 8-bit precision, got {prec}")
            if nc not in (1, 3):
                raise ValueError(f"only 1 or 3 components, got {nc}")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling not supported (1x1 only)"
                    )
                comps.append({"id": cid, "tq": tq})
            sof = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline SOF 0xFF{marker:02X} (progressive/"
                "arithmetic/lossless) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            if ns != len(sof["comps"]):
                raise ValueError("SOS component count != SOF")
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                sof["comps"][ci]["dc"] = tabs >> 4
                sof["comps"][ci]["ac"] = tabs & 0x0F
                if sof["comps"][ci]["id"] != cid:
                    raise ValueError("SOS/SOF component id mismatch")
            pos = pos + 2 + length
            return _jpeg_scan(
                payload, pos, sof, qtables, dc_tabs, ac_tabs,
                restart_interval,
            )
        # APPn / COM / other tables: skip
        pos += 2 + length
    raise ValueError("no SOS marker found")


def _jpeg_scan(
    payload, pos, sof, qtables, dc_tabs, ac_tabs, restart_interval
):  # noqa: ANN001
    """Entropy-decode the (single, interleaved) baseline scan and
    reconstruct the pixel plane."""
    w, h, comps = sof["w"], sof["h"], sof["comps"]
    if w <= 0 or h <= 0:
        raise ValueError("invalid JPEG dimensions")
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError(f"missing quant table {c['tq']}")
        if c["dc"] not in dc_tabs or c["ac"] not in ac_tabs:
            raise ValueError("missing Huffman table referenced by SOS")
    r = _JpegBitReader(payload, pos)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    nc = len(comps)
    planes = [bytearray(bw * 8 * bh * 8) for _ in range(nc)]
    pred = [0] * nc
    mcu_count = 0
    for by in range(bh):
        for bx in range(bw):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                r.align_restart()
                pred = [0] * nc
            mcu_count += 1
            for ci, c in enumerate(comps):
                coef = [0] * 64
                ssss = r.huff(dc_tabs[c["dc"]])
                diff = _jpeg_extend(r.bits(ssss), ssss) if ssss else 0
                pred[ci] += diff
                q = qtables[c["tq"]]
                coef[0] = pred[ci] * q[0]
                k = 1
                while k < 64:
                    rs = r.huff(ac_tabs[c["ac"]])
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    ssss = rs & 0x0F
                    if k > 63:
                        raise ValueError("AC run past block end")
                    coef[_JPEG_ZIGZAG[k]] = (
                        _jpeg_extend(r.bits(ssss), ssss)
                        * q[_JPEG_ZIGZAG[k]]
                    )
                    k += 1
                px = _jpeg_idct_block(coef)
                plane = planes[ci]
                row0 = by * 8
                for yy in range(8):
                    base = (row0 + yy) * bw * 8 + bx * 8
                    for xx in range(8):
                        v = int(round(px[yy * 8 + xx])) + 128
                        plane[base + xx] = 0 if v < 0 else (
                            255 if v > 255 else v
                        )
    # crop the (possibly padded) MCU grid to w x h and interleave
    out = bytearray()
    for y in range(h):
        for x in range(w):
            i = y * bw * 8 + x
            if nc == 1:
                out.append(planes[0][i])
            else:
                yv, cb, cr = planes[0][i], planes[1][i], planes[2][i]
                rr = yv + 1.402 * (cr - 128)
                gg = yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
                bb = yv + 1.772 * (cb - 128)
                for v in (rr, gg, bb):
                    v = int(round(v))
                    out.append(0 if v < 0 else (255 if v > 255 else v))
    return {
        "width": w,
        "height": h,
        "maxval": 255,
        "channels": 1 if nc == 1 else 3,
        "plane": bytes(out),
    }


def decode_jpeg(payload: bytes) -> dict:
    """Stats contract over :func:`decode_jpeg_pixels` — the JPEG member
    of the decode_png/decode_ppm family (same output keys)."""
    d = decode_jpeg_pixels(payload)
    plane = d["plane"]
    return {
        "width": d["width"],
        "height": d["height"],
        "maxval": d["maxval"],
        "channels": d["channels"],
        "n_bytes": len(plane),
        "mean_byte": sum(plane) / len(plane),
        "min_byte": min(plane),
        "max_byte": max(plane),
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
    if payload[:3] == b"\xff\xd8\xff":
        d = decode_jpeg(payload)
        return [
            float(d["width"]), float(d["height"]), float(d["channels"]),
            float(d["n_bytes"]), d["mean_byte"] / 255.0,
            d["min_byte"] / 255.0, d["max_byte"] / 255.0, 4.0,
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
            "no pure-Python SAMPLE decoder for this container (MP3/"
            "MP4 sample data needs audio/video entropy codecs not "
            "available here; MP4 DEMUX is real — decode_mp4); PPM/PGM, "
            "PNG, baseline JPEG, and PCM WAV decode for real — or run "
            "with fake=True for the deterministic double"
        )
    acc = [0] * 8
    for i, byte in enumerate(payload[:4096]):
        acc[i % 8] = (acc[i % 8] * 31 + byte) % 100003
    return [a / 100003.0 for a in acc]


def mp4_fixture(mid: int) -> bytes:
    # minimal spec-shaped ISO BMFF: ftyp + moov{mvhd, trak{tkhd,
    # mdia{mdhd, hdlr, minf{stbl{stsd(mp4v), stts, stsz, stco}}}}}
    # + mdat. Every field the demuxer must recover is a closed
    # form of media_id; stsz's per-sample sizes must sum to the
    # mdat payload length or decode_mp4 refuses — so the oracle
    # hash-match proves a real table parse.
    import struct

    dur = 500 + mid % 977
    w, h = 64 + mid % 16, 48 + mid % 9
    nsamp = 1 + mid % 7
    sizes = [16 + (mid + i) % 32 for i in range(nsamp)]
    payload = b"".join(
        bytes([(mid + i + j) % 256 for j in range(sz)])
        for i, sz in enumerate(sizes)
    )

    def box(four: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + four + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, dur) + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100) + bytes(10)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24) + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x03" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1, 0) + struct.pack(">I", dur) + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = box(
        b"mdhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, dur) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = box(
        b"hdlr", bytes(8) + b"vide" + bytes(12) + b"\x00"
    )
    entry = struct.pack(">I", 16) + b"mp4v" + bytes(6) + struct.pack(">H", 1)
    stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    stts = box(
        b"stts", bytes(4) + struct.pack(">III", 1, nsamp, max(1, dur // nsamp))
    )
    stsz = box(
        b"stsz",
        bytes(4) + struct.pack(">II", 0, nsamp)
        + struct.pack(f">{nsamp}I", *sizes),
    )
    # stco needs the absolute mdat payload offset, which depends
    # on moov's own length — build once with 0, then rebuild with
    # the measured offset (stco's size is constant, so the layout
    # is a fixpoint after one patch)
    stco = box(b"stco", bytes(4) + struct.pack(">II", 1, 0))
    stbl = box(b"stbl", stsd + stts + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    mdat_payload_off = len(ftyp) + len(moov) + 8
    stco = box(b"stco", bytes(4) + struct.pack(">II", 1, mdat_payload_off))
    stbl = box(b"stbl", stsd + stts + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov + box(b"mdat", payload)


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

    def jpeg(mid: int) -> bytes:
        # grayscale baseline JPEG of 8x8 constant blocks whose DC
        # coefficients survive quantization EXACTLY (qtable all 8s:
        # FDCT DC of a constant block v is 8*(v-128), quantized to the
        # integer v-128), so the decode is closed-form in media_id and
        # a SQL oracle can hash-verify it — while the DC-diff Huffman
        # path still exercises multi-category codes and negatives
        # (block values vary, so diffs span both signs)
        w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
        blocks = []
        for by in range(h // 8):
            for bx in range(w // 8):
                v = (mid * 31 + bx * 97 + by * 53) % 251
                blk = [0] * 64
                blk[0] = v - 128
                blocks.append(blk)
        return jpeg_gray_from_qblocks(w, h, blocks, [8] * 64)

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

    enc = {
        "image": ppm, "png": png, "jpeg": jpeg,
        "mp4": mp4_fixture, "mp3": mp3_fixture,
    }.get(kind, wav)

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
                if b[:8] == _PNG_SIG:
                    d = decode_png(b)
                elif b[:3] == b"\xff\xd8\xff":
                    d = decode_jpeg(b)
                else:
                    d = decode_ppm(b)
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


def demux_video_meta(media: DataFrame) -> DataFrame:
    """mapInPandas REAL MP4 demux: ISO-BMFF box-tree walk per payload
    (decode_mp4) — duration, track count, sample-entry codec, track
    dimensions, sample table totals. No fake path; the entropy-coded
    SAMPLE decode stays env-gated (module docstring)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_mp4(bytes(p))
                rows.append(
                    (int(mid), d["timescale"], d["duration"],
                     d["n_tracks"], d["codec"], d["width"], d["height"],
                     d["n_samples"], d["sample_bytes"], d["mean_sample"])
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "timescale", "duration", "n_tracks",
                         "codec", "width", "height", "n_samples",
                         "sample_bytes", "mean_sample"],
            )

    return media.mapInPandas(
        run,
        "media_id long, timescale long, duration long, n_tracks long, "
        "codec string, width long, height long, n_samples long, "
        "sample_bytes long, mean_sample double",
    )


# MPEG-1 Layer III header tables (ISO/IEC 11172-3): bitrate kbps by
# bitrate_index, sample rate Hz by samplerate_index
_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320, 0]
_MP3_RATES = [44100, 48000, 32000, 0]


def mp3_fixture(mid: int) -> bytes:
    """Deterministic spec-shaped MPEG-1 Layer III stream: valid frame
    HEADERS (sync, version, layer, CRC-off, bitrate/samplerate
    indices, padding bit alternating by frame parity) whose frame
    lengths follow the standard 144*bitrate/samplerate + padding
    arithmetic; frame bodies are deterministic filler (a frame WALK
    needs valid headers and exact lengths, not valid Huffman data —
    the sample decode is the documented env-gate)."""
    br_idx = 1 + mid % 14          # 32..320 kbps, never free/bad
    sr_idx = mid % 3               # 44100/48000/32000
    nframes = 3 + mid % 9
    bitrate = _MP3_BITRATES[br_idx] * 1000
    rate = _MP3_RATES[sr_idx]
    out = bytearray()
    for f in range(nframes):
        pad = (mid + f) % 2
        flen = (144 * bitrate) // rate + pad
        hdr = (
            0b11111111111 << 21          # sync
            | 0b11 << 19                 # MPEG-1
            | 0b01 << 17                 # Layer III
            | 0b1 << 16                  # no CRC
            | br_idx << 12
            | sr_idx << 10
            | pad << 9
            | 0b11 << 6                  # mono
        )
        out += hdr.to_bytes(4, "big")
        out += bytes((mid + f + j) % 256 for j in range(flen - 4))
    return bytes(out)


def decode_mp3_frames(payload: bytes) -> dict:
    """REAL MP3 frame walk: per frame, re-derive the sync word,
    version/layer, bitrate and sample-rate table lookups, padding
    bit, and the 144*bitrate/samplerate + padding frame length — and
    require each frame to END exactly where the next sync begins (or
    at EOF), so a misparsed header cannot walk the stream. Returns
    frame count, total samples (1152/frame), duration_ms, mean
    bitrate, and the byte total. Entropy-coded sample data is never
    interpreted (env-gate). Raises ValueError on malformed input."""
    pos, n, kbps_sum, rate0 = 0, 0, 0, None
    while pos < len(payload):
        if len(payload) - pos < 4:
            raise ValueError("truncated frame header")
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        if hdr >> 21 != 0b11111111111:
            raise ValueError(f"lost sync at byte {pos}")
        if (hdr >> 19) & 0b11 != 0b11 or (hdr >> 17) & 0b11 != 0b01:
            raise ValueError("not MPEG-1 Layer III")
        br_idx = (hdr >> 12) & 0xF
        sr_idx = (hdr >> 10) & 0b11
        pad = (hdr >> 9) & 0b1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free/bad bitrate or reserved sample rate")
        bitrate = _MP3_BITRATES[br_idx] * 1000
        rate = _MP3_RATES[sr_idx]
        if rate0 is None:
            rate0 = rate
        elif rate != rate0:
            raise ValueError("sample-rate change mid-stream")
        flen = (144 * bitrate) // rate + pad
        if pos + flen > len(payload):
            raise ValueError("frame overruns payload")
        pos += flen
        n += 1
        kbps_sum += _MP3_BITRATES[br_idx]
    if n == 0:
        raise ValueError("no frames")
    samples = 1152 * n
    return {
        "n_frames": n,
        "sample_rate": rate0,
        "n_samples": samples,
        "duration_ms": (samples * 1000) // rate0,
        "mean_kbps": kbps_sum / n,
        "n_bytes": len(payload),
    }


def demux_audio_frames(media: DataFrame) -> DataFrame:
    """mapInPandas REAL MP3 frame walk per payload
    (decode_mp3_frames) — the audio twin of :func:`demux_video_meta`."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_mp3_frames(bytes(p))
                rows.append(
                    (int(mid), d["n_frames"], d["sample_rate"],
                     d["n_samples"], d["duration_ms"], d["mean_kbps"],
                     d["n_bytes"])
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_frames", "sample_rate",
                         "n_samples", "duration_ms", "mean_kbps",
                         "n_bytes"],
            )

    return media.mapInPandas(
        run,
        "media_id long, n_frames long, sample_rate long, "
        "n_samples long, duration_ms long, mean_kbps double, "
        "n_bytes long",
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
    """Legacy fake resize double (kept for the batch-shape tests): it
    re-chunks the payload to exactly width*height bytes (truncate or
    cycle) with no decode. The REAL path is :func:`resize_image_nn`."""
    if not fake:
        raise NotImplementedError(
            "resize_stub is the deterministic test double; the real "
            "resample is resize_image_nn (used by resize_images "
            "fake=False, the default)"
        )
    target = max(1, width * height)
    if not payload:
        return bytes(target)
    reps = (target + len(payload) - 1) // len(payload)
    return (payload * reps)[:target]


def resize_image_nn(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor image resample over the already-real
    decoded pixel plane (PPM/PGM or PNG, dispatched on the container
    magic — decode_ppm_pixels / decode_png_pixels), re-encoded as an
    8-bit P6 PPM. Pure integer index map src = (dst * src_dim) //
    dst_dim (the classic NN grid, deterministic — no float sampling),
    grayscale planes replicate to RGB on the way out. Raises
    ValueError on malformed input or 16-bit samples (the documented
    8-bit contract; 16-bit needs a resample-then-requantize policy
    decision, not silent truncation)."""
    if width < 1 or height < 1:
        raise ValueError("resize dimensions must be >= 1")
    b = bytes(payload)
    d = decode_png_pixels(b) if b[:8] == _PNG_SIG else decode_ppm_pixels(b)
    if d["maxval"] > 255:
        raise ValueError("16-bit resample not supported (8-bit contract)")
    w, h, ch, plane = d["width"], d["height"], d["channels"], d["plane"]
    out = bytearray()
    for y in range(height):
        base = ((y * h) // height) * w * ch
        for x in range(width):
            off = base + ((x * w) // width) * ch
            px = plane[off : off + ch]
            out += px if ch == 3 else bytes(px) * 3
    return f"P6\n{width} {height}\n255\n".encode() + bytes(out)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = False
) -> DataFrame:
    """mapInPandas image resize: payload -> payload (1:1 rows), metadata
    recomputed JVM-side afterwards so it can never drift from the new
    bytes. Same batch-shape discipline as extract_features. The default
    is the REAL nearest-neighbor resample (:func:`resize_image_nn`)
    over real decoded pixels; ``fake=True`` keeps the legacy
    size-contract double for payloads that aren't decodable images."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [
                        resize_stub(p, width, height, fake=True)
                        if fake
                        else resize_image_nn(p, width, height)
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


def mp4_samples(payload: bytes) -> list[bytes]:
    """REAL sample extraction over the MP4 demux: decode_mp4 recovers
    the stsz size table (and verifies sum(stsz) == mdat length), then
    a top-level box walk locates the mdat body and slices it into the
    per-sample byte ranges — the 'frame' units a training pipeline
    samples/budgets on. Entropy DECODE of the samples stays the
    documented env-gate; the container-level sample walk is exact.
    Raises ValueError on malformed input (decode_mp4's contract)."""
    import struct

    meta = decode_mp4(payload)  # validates the whole tree first
    sizes: list[int] = []
    pos, end = 0, len(payload)
    body = None
    while pos < end:
        size = struct.unpack(">I", payload[pos : pos + 4])[0]
        four = payload[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            size = struct.unpack(">Q", payload[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if four == b"mdat":
            body = pos + hdr
            break
        pos += size
    if body is None:  # decode_mp4 already required mdat; belt-and-braces
        raise ValueError("mdat not found at top level")
    out, off = [], body
    for sz in _mp4_stsz_sizes(payload, meta):
        out.append(payload[off : off + sz])
        off += sz
    return out


def _mp4_stsz_sizes(payload: bytes, meta: dict) -> list[int]:
    """Recover the per-sample size list consistent with decode_mp4's
    verified totals (n_samples / sample_bytes): re-walk to stsz.
    Kept separate so mp4_samples slices with the SAME table the
    demux verified against mdat."""
    import struct

    i = payload.index(b"stsz") + 4
    fixed, cnt = struct.unpack(">II", payload[i + 4 : i + 12])
    if fixed:
        sizes = [fixed] * cnt
    else:
        sizes = list(struct.unpack(f">{cnt}I", payload[i + 12 : i + 12 + 4 * cnt]))
    if len(sizes) != meta["n_samples"] or sum(sizes) != meta["sample_bytes"]:
        raise ValueError("stsz re-walk disagrees with verified demux")
    return sizes


MP4_FRAME_SCHEMA = (
    "media_id long, frame_idx long, payload binary, "
    "payload_len long, byte_sum long"
)


def sample_mp4_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """mapInPandas REAL video frame sampling: each MP4 payload demuxes
    into its stsz-delimited samples (:func:`mp4_samples`) and every
    ``every_nth`` sample becomes one output row with its bytes, length,
    and byte sum (the oracle's closed-form cross-check) — the same
    1-to-many Arrow-batch contract as the fake-frame sibling, now over
    a real container walk. At 100 TB this runs where the bytes live;
    nothing shuffles until whatever consumes the frames."""
    import pandas as pd

    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                samples = mp4_samples(bytes(p))
                for i in range(0, len(samples), every_nth):
                    s = samples[i]
                    rows.append((int(mid), i, s, len(s), sum(s)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "payload",
                    "payload_len", "byte_sum",
                ],
            )

    return media.mapInPandas(run, MP4_FRAME_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_nth: int = 2, fake: bool = True
) -> DataFrame:
    """mapInPandas frame sampling (video): each payload expands to 0..N
    frame rows — the 1-to-many batch shape (generator output rows need
    not align with input rows). The fake double treats the payload as a
    concatenation of fixed-size frames and keeps every `every_nth` one;
    the REAL container-walk sibling is :func:`sample_mp4_frames`
    (stsz-delimited samples over the verified MP4 demux)."""
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
