"""Multimodal (opaque-binary) column operators — Plane C spec
(SURVEY.md §2.12; north-star extension, no reference implementation).

Media assets ride through the engine as ``BinaryType`` payload columns
plus typed metadata — Parquet stores both natively, partition pruning and
column projection work unchanged, and the bytes never pass through Python
except inside explicitly Arrow-batched ``mapInPandas`` stages.

The decode stage is where a real deployment plugs in PIL / ffmpeg /
librosa.  Those libraries are not in this container, so ``decode_batch``
routes through a DETERMINISTIC FAKE decoder (feature values derived from
the payload's md5 — stable across engines, so the whole pipeline is
oracle-checkable); the real-decoder hook is a clearly-marked
``NotImplementedError`` branch.  Everything around the stub — schemas,
batch iteration, fan-out row generation, partitioning — is real engine
code.

Fake-decode contract (mirrored exactly by the DuckDB oracles):

- ``media_type``: doc_id % 3 → image / audio / video.
- ``h`` = md5 hex of the payload bytes.
- image/video: ``width  = 64 + 4 * int(h[0:2], 16)``,
               ``height = 64 + 4 * int(h[2:4], 16)``; audio: null.
- audio/video: ``duration_ms = int(h[4:8], 16)``; image: null.
- video: ``n_frames = 1 + int(h[8:10], 16) % 8``; else null.
- frame sampling (video only): frame ``i`` in [0, n_frames) has
  ``frame_md5 = md5(h || ':' || i)``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from discogs_etl_spark.registry import register
from discogs_etl_spark.tables import load

_MEDIA_TYPES = ("image", "audio", "video")

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def with_payload(df: DataFrame) -> DataFrame:
    """Materialize the opaque-binary payload column + media_type tag.

    The fixtures carry text documents; their UTF-8 bytes stand in for
    media bytes.  In production this column comes straight off the
    source (S3 object bytes, inlined thumbnails, audio chunks, ...)."""
    return df.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(F.lit(list(_MEDIA_TYPES)), (F.col("doc_id") % 3 + 1).cast("int"))
        .alias("media_type"),
    )


def _decode_one(payload: bytes, media_type: str) -> dict:
    """The decode kernel.  REAL decoders plug in here."""
    use_real_decoders = False  # flip when PIL/ffmpeg/librosa are deployed
    if use_real_decoders:  # pragma: no cover - library-gated production path
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg/librosa; not in this container"
        )
    h = hashlib.md5(payload).hexdigest()
    is_img, is_aud, is_vid = (
        media_type == "image",
        media_type == "audio",
        media_type == "video",
    )
    return {
        "byte_len": len(payload),
        "content_md5": h,
        "width": 64 + 4 * int(h[0:2], 16) if (is_img or is_vid) else None,
        "height": 64 + 4 * int(h[2:4], 16) if (is_img or is_vid) else None,
        "duration_ms": int(h[4:8], 16) if (is_aud or is_vid) else None,
        "n_frames": 1 + int(h[8:10], 16) % 8 if is_vid else None,
    }


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extraction over payload bytes.

    Scale: mapInPandas keeps whole Arrow batches in flight (no
    row-at-a-time Python); the stage is map-only — it inherits the scan's
    partitioning, shuffles nothing, and parallelizes per input split.
    Real image decode is CPU-bound, so at 100 TB this stage is sized by
    cores, not by shuffle capacity — exactly what a map-only stage wants."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def sample_frames(decoded: DataFrame) -> DataFrame:
    """Fan-out stage: one row per sampled video frame (frame extraction in
    production; deterministic frame ids here).  Demonstrates the 1→N
    mapInPandas batch shape (output batches are unrelated to input row
    count)."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple[int, int, str]] = []
            for doc_id, h, n in zip(pdf["doc_id"], pdf["content_md5"], pdf["n_frames"]):
                if pd.isna(n):
                    continue
                rows.extend(
                    (
                        int(doc_id),
                        i,
                        hashlib.md5(f"{h}:{i}".encode()).hexdigest(),
                    )
                    for i in range(int(n))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return decoded.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def resize_images(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """STUB — real resize needs PIL; the Spark-side contract (input/output
    schema, map-only batch shape) is what this function pins."""
    raise NotImplementedError(
        "image resize requires PIL; wire a mapInPandas stage shaped like "
        "decode_features with payload→payload output when the library lands"
    )


# ---------------------------------------------------------------------------
# registered queries (oracle-checked end to end, stub decoder included)
# ---------------------------------------------------------------------------

_SQL_MEDIA = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
_SQL_H = "md5(text)"


@register(
    "multimodal_decode_features",
    oracle=f"""
        SELECT doc_id,
               {_SQL_MEDIA} AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               {_SQL_H} AS content_md5,
               CASE WHEN doc_id % 3 IN (0, 2)
                    THEN 64 + 4 * ('0x' || substr({_SQL_H}, 1, 2))::BIGINT END AS width,
               CASE WHEN doc_id % 3 IN (0, 2)
                    THEN 64 + 4 * ('0x' || substr({_SQL_H}, 3, 2))::BIGINT END AS height,
               CASE WHEN doc_id % 3 IN (1, 2)
                    THEN ('0x' || substr({_SQL_H}, 5, 4))::BIGINT END AS duration_ms,
               CASE WHEN doc_id % 3 = 2
                    THEN 1 + ('0x' || substr({_SQL_H}, 9, 2))::BIGINT % 8 END AS n_frames
        FROM documents
    """,
    tags=("multimodal", "mapInPandas", "pandas_udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → typed media features via Arrow-batched mapInPandas
    (deterministic stub decoder; see module docstring for the contract)."""
    return decode_features(with_payload(load(spark, sf_dir, "documents")))


@register(
    "multimodal_frame_sample",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {_SQL_H} AS h,
                   1 + ('0x' || substr({_SQL_H}, 9, 2))::BIGINT % 8 AS n_frames
            FROM documents WHERE doc_id % 3 = 2
        )
        SELECT doc_id, gs.i AS frame_idx, md5(h || ':' || gs.i) AS frame_md5
        FROM d, LATERAL (SELECT unnest(range(n_frames)) AS i) gs
    """,
    tags=("multimodal", "mapInPandas", "fanout"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video frame sampling: decode → 1→N frame fan-out, both as
    Arrow-batched map stages."""
    decoded = decode_features(with_payload(load(spark, sf_dir, "documents")))
    return sample_frames(decoded.where(F.col("media_type") == "video"))
