"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

Three decode tiers, graded by what the environment allows:

1. HEADER-level decode (``sniff_media`` / ``extract_media_metadata``) —
   REAL, pure stdlib: container sniffing + width/height/sample-rate
   extraction + corrupt-file flagging for PNG/GIF/BMP/JPEG/WAV. This is
   the first pass a 100 TB multimodal ingest actually runs over raw bytes.
2. PIXEL-level decode (``decode_media``) — real code, capability-gated on
   Pillow (absent in this container; the gate itself is tested, same
   pattern as the Delta seam).
3. Byte-level features (``extract_byte_features``) — a deterministic
   stand-in that exercises the Arrow batch path end-to-end.

All three share the same Spark-side plumbing: binary column + metadata
through scans/shuffles, ``mapInPandas`` with an explicit output schema,
per-partition Arrow batch iteration, and partition-count preservation
(no shuffle introduced by the map).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ab_inbev_big_data_case_spark.operators.partitioning import spread


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "text/plain"
) -> DataFrame:
    """Model a multimodal row: opaque ``binary`` payload + typed metadata.

    (Fixtures have no real media; UTF-8-encoded text stands in as the opaque
    payload — the engine treats it as bytes from here on.)
    """
    # Python-path parallelism: unlike JVM expressions, each partition pays a
    # Python-worker spin-up, so cap the fan-out (8 measured optimal cold;
    # workers are reused on subsequent batches).
    return spread(df, min_partitions=8).select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
    )


def pil_available() -> bool:
    """Capability probe for Pillow (same pattern as the Delta seam in
    sources/writers.py): decides at runtime whether pixel-level decode is
    possible. Absent in this container — probed each round, still absent
    r6 — so ``decode_media`` stays gated, while HEADER-level decode below
    is real stdlib code with no gate at all."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """PIXEL-level media decode, capability-gated on Pillow.

    With PIL present (any real cluster), decodes each payload to
    (doc_id, fmt, width, height, mode) via Arrow-batched mapInPandas —
    same batch shape as every other decoder seam here. Without it, raises
    with a pointer to ``extract_media_metadata``, which extracts
    format/dimensions/sample-rate from container HEADERS in pure stdlib
    and therefore works everywhere.
    """
    if not pil_available():
        raise NotImplementedError(
            "pixel-level decode requires Pillow (absent in this container); "
            "header-level metadata decode needs no libraries — use "
            "extract_media_metadata"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            fmts, widths, heights, modes = [], [], [], []
            for b in pdf[payload_col]:
                try:
                    with Image.open(io.BytesIO(bytes(b))) as im:
                        fmts.append((im.format or "unknown").lower())
                        widths.append(im.width)
                        heights.append(im.height)
                        modes.append(im.mode)
                except Exception:
                    fmts.append("unknown")
                    widths.append(-1)
                    heights.append(-1)
                    modes.append("")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": fmts,
                    "width": pd.Series(widths, dtype="int64"),
                    "height": pd.Series(heights, dtype="int64"),
                    "mode": modes,
                }
            )

    return df.mapInPandas(
        gen, schema="doc_id long, fmt string, width long, height long, mode string"
    )


def _fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level 'decode': stands in for a real decoder while
    exercising the Arrow batch path end-to-end."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                    "int64"
                ),
                "byte_checksum": payloads.map(lambda b: int(sum(b[:8]) % 256)).astype(
                    "int64"
                ),
            }
        )


def extract_byte_features(df: DataFrame) -> DataFrame:
    """Feature-extract every payload via mapInPandas (Arrow-vectorized,
    per-partition batch iterator; no shuffle)."""
    return df.mapInPandas(
        _fake_decode_features,
        schema=(
            "doc_id long, media_type string, n_bytes long, "
            "first_byte long, byte_checksum long"
        ),
    )


# ---------------------------------------------------------------------------
# Header-level media decode — REAL, pure stdlib, no capability gate.
#
# A 100 TB multimodal ingest's first pass over raw bytes is exactly this:
# container sniffing + dimension/sample-rate extraction + corrupt-file
# flagging, reading a few dozen bytes per blob. PNG/GIF/BMP/JPEG/WAV
# headers are published byte layouts, so this needs no image library at
# all — it is the decode step the brief allows us to make real.


def make_png(width: int, height: int) -> bytes:
    """Minimal VALID 8-bit grayscale PNG (zlib-compressed zero scanlines).
    Used by tests and the synthetic-payload query; a real PNG reader (PIL,
    browsers) accepts the output."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer (header-complete;
    no frame data — the sniffer reads only the screen descriptor)."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


def make_bmp(width: int, height: int) -> bytes:
    """Minimal VALID 24-bit BMP (BITMAPINFOHEADER, zeroed pixels)."""
    row = (width * 3 + 3) // 4 * 4
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + row * height, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, row * height,
            2835, 2835, 0, 0,
        )
    )
    return header + bytes(row * height)


def make_wav(sample_rate: int, channels: int, n_samples: int = 8) -> bytes:
    """Minimal VALID 16-bit PCM WAV (silence)."""
    data = bytes(n_samples * channels * 2)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def sniff_media(payload: bytes | None) -> tuple[str, int, int]:
    """Header-level decode: (fmt, width, height) for images; for WAV the
    pair is (sample_rate, channels); ("unknown", -1, -1) for anything
    unrecognized or truncated — the corrupt-file flag a curation pipeline
    filters on."""
    b = bytes(payload) if payload is not None else b""
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("png", w, h)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return ("gif", w, h)
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return ("bmp", w, abs(h))  # negative height = top-down rows
        if b[:2] == b"\xff\xd8":
            i = 2  # walk JFIF segments to the start-of-frame marker
            while i + 9 < len(b) and b[i] == 0xFF:
                marker = b[i + 1]
                seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return ("jpeg", w, h)
                i += 2 + seglen
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and b[12:16] == b"fmt ":
            channels, rate = struct.unpack("<HI", b[22:28])
            return ("wav", rate, channels)
    except (struct.error, IndexError):
        pass
    return ("unknown", -1, -1)


def extract_media_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Header-decode every payload via Arrow-batched mapInPandas — the
    real (non-stubbed) decode path: no shuffle, a few dozen bytes read per
    blob, output (id, fmt, width, height)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_media(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fmt": [m[0] for m in metas],
                    "width": pd.Series([m[1] for m in metas], dtype="int64"),
                    "height": pd.Series([m[2] for m in metas], dtype="int64"),
                }
            )

    return df.mapInPandas(
        gen, schema=f"{id_col} long, fmt string, width long, height long"
    )
