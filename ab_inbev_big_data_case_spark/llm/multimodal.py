"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

Real image/audio/video decoding libraries are not in this container, so the
decode step is STUBBED (``decode_media`` raises NotImplementedError; the
feature extractor uses a deterministic byte-level fake). What IS real — and
tested — is the Spark-side plumbing a 100 TB multimodal pipeline needs:

- binary column + metadata columns travelling through scans/shuffles,
- ``mapInPandas`` with an output schema, Arrow batch transfer, and
  per-partition batch iteration (the exact shape a real decoder plugs into),
- partition-count preservation (no shuffle introduced by the map).

A production deployment replaces ``_fake_decode_features`` with e.g. a
PIL/ffmpeg call over ``pdf["payload"]`` — same signature, same schema
discipline.
"""

from __future__ import annotations

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


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real media decode — NOT IMPLEMENTED in this container (no PIL/ffmpeg).

    Kept as the explicit extension point; see module docstring.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; plug a decoder into extract_byte_features' mapInPandas"
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
