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

All four entities are wired (``NATIVE_INGESTORS``); tests assert each
path agrees with the kernel value-for-value on clean input, including
the subtle null semantics: list items read via ``elem.text`` are None
for empty elements while struct fields read via ``findtext`` are '' —
the reference's own asymmetry (parser.py:50 vs parser.py:63).  The
fidelity kernel remains the canonical implementation for dirty dumps.
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
                F.coalesce(
                    F.transform(
                        f["descriptions"]["description"],
                        lambda d: F.nullif(d, F.lit("")),
                    ),
                    _empty(),
                ).alias("descriptions"),
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
            F.transform(F.col("artists.artist"), lambda a: F.nullif(a["name"], F.lit(""))),
            _empty(),
        ).alias("artists"),
        labels.alias("labels"),
        formats.alias("formats"),
        _text_list("genres.genre").alias("genres"),
        _text_list("styles.style").alias("styles"),
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


# ---------------------------------------------------------------------------
# artist / label / master raw schemas + projections (same pattern as release)
# ---------------------------------------------------------------------------

_IMAGES_RAW = T.StructType(
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
)


def _name_list(container: str) -> T.StructField:
    return T.StructField(
        container, T.StructType([T.StructField("name", T.ArrayType(_S))])
    )


ARTIST_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", _S),
        T.StructField("realname", _S),
        T.StructField("profile", _S),
        T.StructField("data_quality", _S),
        T.StructField("urls", T.StructType([T.StructField("url", T.ArrayType(_S))])),
        _name_list("namevariations"),
        _name_list("aliases"),
        _name_list("groups"),
        _name_list("members"),
        T.StructField("images", _IMAGES_RAW),
    ]
)

LABEL_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", _S),
        T.StructField("contactinfo", _S),
        T.StructField("profile", _S),
        T.StructField("data_quality", _S),
        T.StructField("images", _IMAGES_RAW),
        T.StructField("urls", T.StructType([T.StructField("url", T.ArrayType(_S))])),
        T.StructField(
            "sublabels", T.StructType([T.StructField("label", T.ArrayType(_S))])
        ),
    ]
)

MASTER_RAW_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("main_release", T.LongType()),
        T.StructField(
            "artists",
            T.StructType(
                [
                    T.StructField(
                        "artist",
                        _arr(
                            T.StructField("id", T.LongType()),
                            T.StructField("name", _S),
                            T.StructField("anv", _S),
                            T.StructField("join", _S),
                            T.StructField("role", _S),
                            T.StructField("tracks", _S),
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
        T.StructField("year", T.IntegerType()),
        T.StructField("title", _S),
        T.StructField("data_quality", _S),
        T.StructField("images", _IMAGES_RAW),
        T.StructField(
            "videos",
            T.StructType(
                [
                    T.StructField(
                        "video",
                        _arr(
                            T.StructField("_duration", T.IntegerType()),
                            T.StructField("_embed", _S),
                            T.StructField("_src", _S),
                            T.StructField("title", _S),
                            T.StructField("description", _S),
                        ),
                    )
                ]
            ),
        ),
    ]
)


def _images_proj(height_first: bool) -> Column:
    """Entity-specific image struct: label declares (width, height, ...),
    the others (height, width, ...) (reference parser.py:43-47 vs 82-88)."""
    dims = [
        F.coalesce(F.col("i._height"), F.lit(0)).alias("height"),
        F.coalesce(F.col("i._width"), F.lit(0)).alias("width"),
    ]
    if not height_first:
        dims = dims[::-1]

    def build(i):
        d = [
            F.coalesce(i["_height"], F.lit(0)).alias("height"),
            F.coalesce(i["_width"], F.lit(0)).alias("width"),
        ]
        if not height_first:
            d = d[::-1]
        return F.struct(
            *d, i["_type"].alias("type"), i["_uri"].alias("uri"), i["_uri150"].alias("uri150")
        )

    order = "height:int,width:int" if height_first else "width:int,height:int"
    return F.coalesce(
        F.transform(F.col("images.image"), build),
        _empty(f"struct<{order},type:string,uri:string,uri150:string>"),
    )


def _text_list(path: str) -> Column:
    """Text-element lists: the kernel reads list items via ``elem.text``
    which is None for an empty <url/>, while the XML source yields '' —
    nullif aligns them.  (STRUCT text fields go through findtext, which
    returns '' for empty elements, so they need no such fix-up.)"""
    return F.coalesce(
        F.transform(F.col(path), lambda x: F.nullif(x, F.lit(""))), _empty()
    )


def ingest_artist_native(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """reference parser.py:146-169 semantics on the JVM fast path."""
    from discogs_etl_spark.schemas import SCHEMAS

    raw = _load_raw(spark, paths, "artist", ARTIST_RAW_SCHEMA)
    return raw.select(
        F.coalesce(F.col("id"), F.lit(0)).alias("id"),
        "name",
        "realname",
        "profile",
        "data_quality",
        _text_list("urls.url").alias("urls"),
        _text_list("namevariations.name").alias("namevariations"),
        _text_list("aliases.name").alias("aliases"),
        _text_list("groups.name").alias("groups"),
        _text_list("members.name").alias("members"),
        _images_proj(height_first=True).alias("images"),
    ).to(SCHEMAS["artist"])


def ingest_label_native(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """reference parser.py:30-52 semantics on the JVM fast path."""
    from discogs_etl_spark.schemas import SCHEMAS

    raw = _load_raw(spark, paths, "label", LABEL_RAW_SCHEMA)
    return raw.select(
        F.coalesce(F.col("id"), F.lit(0)).alias("id"),
        "name",
        "contactinfo",
        "profile",
        "data_quality",
        _images_proj(height_first=False).alias("images"),
        _text_list("urls.url").alias("urls"),
        _text_list("sublabels.label").alias("sublabels"),
    ).to(SCHEMAS["label"])


def ingest_master_native(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """reference parser.py:54-98 semantics on the JVM fast path (master id
    is the required 'id' attribute; embed is true only for the literal
    string 'true')."""
    from discogs_etl_spark.schemas import SCHEMAS

    raw = _load_raw(spark, paths, "master", MASTER_RAW_SCHEMA)
    artists = F.coalesce(
        F.transform(
            F.col("artists.artist"),
            lambda a: F.struct(
                F.coalesce(a["id"], F.lit(0)).alias("id"),
                a["name"].alias("name"),
                a["anv"].alias("anv"),
                a["join"].alias("join"),
                a["role"].alias("role"),
                a["tracks"].alias("tracks"),
            ),
        ),
        _empty(
            "struct<id:bigint,name:string,anv:string,join:string,role:string,tracks:string>"
        ),
    )
    videos = F.coalesce(
        F.transform(
            F.col("videos.video"),
            lambda v: F.struct(
                F.coalesce(v["_duration"], F.lit(0)).alias("duration"),
                # missing attr must be False, not null (parser.py:93)
                F.coalesce(v["_embed"] == "true", F.lit(False)).alias("embed"),
                v["_src"].alias("src"),
                v["title"].alias("title"),
                v["description"].alias("description"),
            ),
        ),
        _empty(
            "struct<duration:int,embed:boolean,src:string,title:string,description:string>"
        ),
    )
    return raw.select(
        F.col("_id").alias("id"),
        F.coalesce(F.col("main_release"), F.lit(0)).alias("main_release"),
        artists.alias("artists"),
        _text_list("genres.genre").alias("genres"),
        _text_list("styles.style").alias("styles"),
        F.coalesce(F.col("year"), F.lit(0)).alias("year"),
        "title",
        "data_quality",
        _images_proj(height_first=True).alias("images"),
        videos.alias("videos"),
    ).to(SCHEMAS["master"])


def _load_raw(
    spark: SparkSession, paths: list[str] | str, data_type: str, schema: T.StructType
) -> DataFrame:
    _, item_tag = XML_TAGS[data_type]
    return (
        spark.read.format("xml")
        .option("rowTag", item_tag)
        .schema(schema)
        .load(paths if isinstance(paths, str) else ",".join(paths))
    )


NATIVE_INGESTORS = {
    "artist": ingest_artist_native,
    "label": ingest_label_native,
    "master": ingest_master_native,
    "release": ingest_release_native,
}
