"""Static Spark schemas for the four Discogs entity types.

Transcribed (types only, independently re-expressed) from the reference's
fixed PyArrow schemas — reference schema.py:3-33 (master), 35-50 (label),
52-78 (release), 80-98 (artist); SCHEMAS dict at schema.py:100-105.  The
reference never infers schemas and neither do we: parsing coerces into
these exactly (SURVEY.md §1.4).

Intentional oddities preserved (SURVEY.md §1.2):
- ``release.formats.qty`` is a STRING defaulted to "1" (schema.py:73,
  parser.py:137).
- ``release.artists`` is ``array<string>`` of names while
  ``master.artists`` is an array of 6-field structs (schema.py:66 vs 6-13).
- ``released`` stays a free-form string (partial dates like '1999-00-00').
- ``master.year`` is int32; image dims int32; numeric defaults are 0, text
  defaults are null, empty collections are [] (never null).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# image struct is shared by all four entities (reference schema.py:6-13 et al.)
IMAGE = StructType(
    [
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("type", StringType()),
        StructField("uri", StringType()),
        StructField("uri150", StringType()),
    ]
)

ARTIST_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("realname", StringType()),
        StructField("profile", StringType()),
        StructField("data_quality", StringType()),
        StructField("urls", ArrayType(StringType())),
        StructField("namevariations", ArrayType(StringType())),
        StructField("aliases", ArrayType(StringType())),
        StructField("groups", ArrayType(StringType())),
        StructField("members", ArrayType(StringType())),
        StructField("images", ArrayType(IMAGE)),
    ]
)

# label images carry width BEFORE height, unlike the other three entities
# (reference schema.py:41-47, parser.py:44-45)
LABEL_IMAGE = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("type", StringType()),
        StructField("uri", StringType()),
        StructField("uri150", StringType()),
    ]
)

LABEL_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("contactinfo", StringType()),
        StructField("profile", StringType()),
        StructField("data_quality", StringType()),
        StructField("images", ArrayType(LABEL_IMAGE)),
        StructField("urls", ArrayType(StringType())),
        StructField("sublabels", ArrayType(StringType())),
    ]
)

MASTER_ARTIST = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("anv", StringType()),
        StructField("join", StringType()),
        StructField("role", StringType()),
        StructField("tracks", StringType()),
    ]
)

VIDEO = StructType(
    [
        StructField("duration", IntegerType()),
        StructField("embed", BooleanType()),
        StructField("src", StringType()),
        StructField("title", StringType()),
        StructField("description", StringType()),
    ]
)

MASTER_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("main_release", LongType()),
        StructField("artists", ArrayType(MASTER_ARTIST)),
        StructField("genres", ArrayType(StringType())),
        StructField("styles", ArrayType(StringType())),
        StructField("year", IntegerType()),
        StructField("title", StringType()),
        StructField("data_quality", StringType()),
        StructField("images", ArrayType(IMAGE)),
        StructField("videos", ArrayType(VIDEO)),
    ]
)

RELEASE_LABEL = StructType(
    [
        StructField("name", StringType()),
        StructField("catno", StringType()),
    ]
)

RELEASE_FORMAT = StructType(
    [
        StructField("name", StringType()),
        StructField("qty", StringType()),  # STRING on purpose (schema.py:73)
        StructField("descriptions", ArrayType(StringType())),
    ]
)

RELEASE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("status", StringType()),
        StructField("title", StringType()),
        StructField("country", StringType()),
        StructField("released", StringType()),
        StructField("notes", StringType()),
        StructField("images", ArrayType(IMAGE)),
        StructField("artists", ArrayType(StringType())),
        StructField("labels", ArrayType(RELEASE_LABEL)),
        StructField("formats", ArrayType(RELEASE_FORMAT)),
        StructField("genres", ArrayType(StringType())),
        StructField("styles", ArrayType(StringType())),
    ]
)

SCHEMAS: dict[str, StructType] = {
    "artist": ARTIST_SCHEMA,
    "label": LABEL_SCHEMA,
    "master": MASTER_SCHEMA,
    "release": RELEASE_SCHEMA,
}

# (root_tag, item_tag) per entity — reference config.py:2-7.
XML_TAGS: dict[str, tuple[str, str]] = {
    "artist": ("artists", "artist"),
    "label": ("labels", "label"),
    "master": ("masters", "master"),
    "release": ("releases", "release"),
}
