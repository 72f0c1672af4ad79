"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas.

Decode kernels (VERDICT r4 next #5): PNG and BMP are decoded with a
pure-stdlib codec (zlib + struct + numpy — full scanline-filter
reconstruction for 8-bit gray/RGB/RGBA PNG, full 24-bit BI_RGB BMP), so
image rows get REAL width/height/pixel stats with no external library.
JPEG and every other format still require PIL, which is NOT in this
container: `decode_image` raises NotImplementedError for those, and the
deterministic fake stats keep the schema/batch shape for undecodable
payloads.  Everything Spark-side — schema, partition sizing, Arrow batch
flow, UDF signatures — is real and tested either way.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha string, "
    "decoded boolean, width int, height int, "
    "mean_luma double, aspect double, frames_sampled int"
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"

try:  # real decode path for JPEG etc. — absent in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# -- stdlib PNG codec (8-bit, non-interlaced; gray / gray+A / RGB / RGBA) ----

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode → uint8 array (H, W) or (H, W, C).

    Supports the common web shapes: bit depth 8, color types
    0/2/4/6, non-interlaced.  Full scanline reconstruction for all
    five filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6);
    ancillary chunks are skipped, IDAT chunks concatenated."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = color_type = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 crc
        if ctype == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type}")
            if interlace != 0:
                raise NotImplementedError("interlaced (Adam7) PNG")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 2:  # Up: fully vectorizable
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth need the left pixel
            cur = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, ch)
    return px[:, :, 0] if ch == 1 else px


def encode_png(px: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal stdlib PNG encoder (8-bit gray/gray+A/RGB/RGBA); the
    deterministic payload source for synth_media and the round-trip
    counterpart of decode_png.  ``filter_type`` applies one filter to
    every scanline so tests can exercise each decode path."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int64)
    stride = w * ch
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 2:
            filt = (cur - prev) & 0xFF
        elif filter_type in (1, 3, 4):
            filt = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if filter_type == 1:
                    pred = a
                elif filter_type == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                filt[x] = (int(cur[x]) - pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {filter_type}")
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines), 6))
        + chunk(b"IEND", b"")
    )


# -- stdlib BMP codec (24-bit uncompressed BI_RGB) ---------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → uint8 (H, W, 3) RGB.  Handles 4-byte row
    padding and both bottom-up (positive height) and top-down rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (bad magic)")
    (off,) = struct.unpack("<I", payload[10:14])
    _hsz, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", payload[14:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} (only 24-bit BI_RGB)")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, np.uint8, count=stride * h, offset=off).reshape(
        h, stride
    )
    px = arr[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_bmp(px: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BI_RGB BMP encoder (RGB uint8 input)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    bgr = px[:, :, ::-1]
    body = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    off = 14 + 40
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return hdr + info + body


# -- decode dispatch ---------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to a uint8 pixel array.  PNG and BMP go
    through the stdlib codecs above (no external deps); anything else
    (JPEG, WebP, …) requires PIL, absent in this container by design."""
    b = bytes(payload)
    if b[:8] == PNG_SIG:
        return decode_png(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if not HAVE_PIL:
        raise NotImplementedError(
            "decoding non-PNG/BMP images requires PIL, which is not in this "
            "container; PNG and BMP decode via the stdlib codec"
        )
    import io  # pragma: no cover - no PIL in sandbox

    return np.asarray(PIL.Image.open(io.BytesIO(b)))  # pragma: no cover


def _luma(px: np.ndarray) -> float:
    """Mean Rec.601 luma in [0, 1] (gray mean for 1/2-channel images;
    alpha ignored)."""
    a = px.astype(np.float64)
    if a.ndim == 2:
        y = a
    elif a.shape[2] < 3:
        y = a[:, :, 0]
    else:
        y = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return float(y.mean()) / 255.0


# -- synthetic media ---------------------------------------------------------


def _synth_pixels(media_id: int, seed: int) -> np.ndarray:
    """Deterministic small RGB test pattern (no RNG: pure modular
    gradients keyed on media_id, so any partitioning reproduces it)."""
    w = 8 + (media_id * 7 + seed) % 25
    h = 8 + (media_id * 13 + seed) % 17
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 7 + yy * 3 + media_id) % 256
    g = (xx * 5 + yy * 11 + media_id * 2) % 256
    b = (xx * 13 + yy * 17 + media_id * 3) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media rows.  Image rows carry REAL payloads — PNG
    (even media_id) or BMP (odd) of a seeded gradient pattern, encoded
    by the stdlib codecs — with metadata matching the true dimensions;
    audio/video stay opaque seeded pseudo-bytes (no stdlib decoder
    exists for them).  Payload attachment runs in mapInPandas (Arrow
    batches), keeping the generator distributed."""
    df = spark.range(n)
    h = F.xxhash64("id", F.lit(seed))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        F.pmod(h, F.lit(3)).cast("int") + 1,
    )
    payload = F.sha2(
        F.concat(F.lit("payload:"), F.col("id").cast("string")), 512
    ).cast("binary")
    base = df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.pmod(h, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1080)) + 16)
        .cast("int")
        .alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(600000)))
        .cast("int")
        .alias("duration_ms"),
    )

    def _attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf["kind"] == "image"
            if img.any():
                pl, mm, ww, hh = [], [], [], []
                for mid in pdf.loc[img, "media_id"]:
                    px = _synth_pixels(int(mid), seed)
                    if mid % 2 == 0:
                        pl.append(encode_png(px))
                        mm.append("image/png")
                    else:
                        pl.append(encode_bmp(px))
                        mm.append("image/bmp")
                    hh.append(px.shape[0])
                    ww.append(px.shape[1])
                pdf = pdf.copy()
                pdf.loc[img, "payload"] = pd.Series(pl, index=pdf.index[img])
                pdf.loc[img, "mime"] = mm
                pdf.loc[img, "width"] = np.asarray(ww, dtype=pdf["width"].dtype)
                pdf.loc[img, "height"] = np.asarray(hh, dtype=pdf["height"].dtype)
            yield pdf

    return base.mapInPandas(_attach, schema=MEDIA_SCHEMA)


def extract_media_features(media: DataFrame, frame_stride_ms: int = 1000) -> DataFrame:
    """mapInPandas feature extraction with the production batch shape:
    per-batch vectorized numpy over the payload bytes.  PNG/BMP payloads
    are REALLY decoded (stdlib codec) — width/height/mean_luma come from
    the pixels, `decoded` is true; other payloads keep the deterministic
    fake stats (same dtypes/shape the full-library kernel would emit)."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            shas = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16])
            decoded, widths, heights, lumas = [], [], [], []
            for b, w0, h0 in zip(payloads, pdf["width"], pdf["height"]):
                bb = bytes(b)
                if bb[:8] == PNG_SIG or bb[:2] == b"BM":
                    px = decode_image(bb)
                    decoded.append(True)
                    heights.append(px.shape[0])
                    widths.append(px.shape[1])
                    lumas.append(_luma(px))
                else:
                    # fake luma: mean of payload bytes scaled — deterministic,
                    # same dtype/shape the real kernel produces
                    decoded.append(False)
                    widths.append(w0)
                    heights.append(h0)
                    lumas.append(
                        float(np.frombuffer(bb, dtype=np.uint8).mean()) / 255.0
                    )
            widths = np.asarray(widths, dtype=np.int64)
            heights = np.asarray(heights, dtype=np.int64)
            frames = np.where(
                pdf["kind"] == "video",
                np.maximum(pdf["duration_ms"] // frame_stride_ms, 1),
                1,
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "sha": shas,
                    "decoded": decoded,
                    "width": widths.astype("int32"),
                    "height": heights.astype("int32"),
                    "mean_luma": lumas,
                    "aspect": widths / np.maximum(heights, 1),
                    "frames_sampled": frames.astype("int32"),
                }
            )

    return media.mapInPandas(_features, schema=FEATURE_SCHEMA)
