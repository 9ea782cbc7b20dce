"""Spark-native XML source fast path (SURVEY.md §2.1 S1 option (a)).

Two ingest paths exist by design:

- **Fidelity path** (`xml_ingest.py`): iterparse kernel inside executor
  tasks — handles the reference's dirty-XML repairs (stray wrappers,
  invalid chars, truncated gzip) and reproduces every §1.2 coercion
  bit-for-bit.  This is the default.
- **Fast path** (this module): Spark's built-in XML source (`format
  ("xml")`, JVM-side parse, built into Spark 4) for CLEAN dumps.  The
  source needs the document-shaped RAW schema (attributes prefixed,
  list elements wrapped in their container struct); the entity schema
  is then produced by a declarative projection that applies the same
  defaults the reference's parser applies (qty→'1', dims→0, missing
  collections→[]).

Only `release` — the largest and most deeply nested entity (3 levels,
reference schema.py:52-78) — is wired here; it's the path-proving case.
The fidelity kernel remains the canonical implementation for all four
entities (tests assert the two paths agree on clean input).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from discogs_etl_spark.schemas import XML_TAGS

_S = T.StringType()


def _arr(*fields: T.StructField) -> T.ArrayType:
    return T.ArrayType(T.StructType(list(fields)))


# Document-shaped schema for <release> as the XML source sees it:
# attributes carry the "_" prefix, repeated elements sit inside their
# container struct (images.image, formats.format.descriptions.description).
RELEASE_RAW_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("_status", _S),
        T.StructField("title", _S),
        T.StructField("country", _S),
        T.StructField("released", _S),
        T.StructField("notes", _S),
        T.StructField(
            "images",
            T.StructType(
                [
                    T.StructField(
                        "image",
                        _arr(
                            T.StructField("_height", T.IntegerType()),
                            T.StructField("_width", T.IntegerType()),
                            T.StructField("_type", _S),
                            T.StructField("_uri", _S),
                            T.StructField("_uri150", _S),
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "artists",
            T.StructType([T.StructField("artist", _arr(T.StructField("name", _S)))]),
        ),
        T.StructField(
            "labels",
            T.StructType(
                [
                    T.StructField(
                        "label",
                        _arr(
                            T.StructField("_name", _S),
                            T.StructField("_catno", _S),
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "formats",
            T.StructType(
                [
                    T.StructField(
                        "format",
                        _arr(
                            T.StructField("_name", _S),
                            T.StructField("_qty", _S),
                            T.StructField(
                                "descriptions",
                                T.StructType(
                                    [
                                        T.StructField(
                                            "description", T.ArrayType(_S)
                                        )
                                    ]
                                ),
                            ),
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "genres", T.StructType([T.StructField("genre", T.ArrayType(_S))])
        ),
        T.StructField(
            "styles", T.StructType([T.StructField("style", T.ArrayType(_S))])
        ),
    ]
)


def _empty(elem_type: str = "string") -> Column:
    return F.array().cast(f"array<{elem_type}>")


def _project_release(raw: DataFrame) -> DataFrame:
    """Raw XML shape → entity schema, applying the reference parser's
    defaults (reference parser.py:100-144): id→0, qty→'1', image dims→0,
    absent collections→[] (never null)."""
    images = F.coalesce(
        F.transform(
            F.col("images.image"),
            lambda i: F.struct(
                F.coalesce(i["_height"], F.lit(0)).alias("height"),
                F.coalesce(i["_width"], F.lit(0)).alias("width"),
                i["_type"].alias("type"),
                i["_uri"].alias("uri"),
                i["_uri150"].alias("uri150"),
            ),
        ),
        _empty("struct<height:int,width:int,type:string,uri:string,uri150:string>"),
    )
    formats = F.coalesce(
        F.transform(
            F.col("formats.format"),
            lambda f: F.struct(
                f["_name"].alias("name"),
                F.coalesce(F.nullif(f["_qty"], F.lit("")), F.lit("1")).alias("qty"),
                F.coalesce(f["descriptions"]["description"], _empty()).alias(
                    "descriptions"
                ),
            ),
        ),
        _empty("struct<name:string,qty:string,descriptions:array<string>>"),
    )
    labels = F.coalesce(
        F.transform(
            F.col("labels.label"),
            lambda lb: F.struct(lb["_name"].alias("name"), lb["_catno"].alias("catno")),
        ),
        _empty("struct<name:string,catno:string>"),
    )
    return raw.select(
        F.coalesce(F.col("_id"), F.lit(0)).alias("id"),
        F.col("_status").alias("status"),
        "title",
        "country",
        "released",
        "notes",
        images.alias("images"),
        F.coalesce(
            F.transform(F.col("artists.artist"), lambda a: a["name"]), _empty()
        ).alias("artists"),
        labels.alias("labels"),
        formats.alias("formats"),
        F.coalesce(F.col("genres.genre"), _empty()).alias("genres"),
        F.coalesce(F.col("styles.style"), _empty()).alias("styles"),
    )


def ingest_release_native(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Release dumps via the built-in XML source: JVM-side parse (no
    Python worker round-trip), schema-projected to the entity schema.

    Scale: same file-level parallelism as the kernel path (gzip remains
    unsplittable) but each task parses in the JVM at whole-stage-codegen
    speed — prefer this for clean post-2010 dumps and fall back to the
    kernel for the dirty era."""
    from discogs_etl_spark.schemas import SCHEMAS

    _, item_tag = XML_TAGS["release"]
    raw = (
        spark.read.format("xml")
        .option("rowTag", item_tag)
        .schema(RELEASE_RAW_SCHEMA)
        .load(paths if isinstance(paths, str) else ",".join(paths))
    )
    # .to() reconciles nullability flags with the canonical entity schema
    # (coalesce(..., lit) marks columns non-nullable; the contract says
    # everything is nullable like the kernel path).
    return _project_release(raw).to(SCHEMAS["release"])
