"""discogs_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
``tweddielin/discogs-etl`` (a pure-Python Discogs XML → Parquet → S3 ETL
tool whose analytics layer is DuckDB SQL over the produced lake), plus the
LLM-data-pipeline operator set (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
  - ``session``    — tuned SparkSession builder (AQE, partition sizing).
  - ``schemas``    — static StructType constants (reference schema.py).
  - ``tables``     — fixture-table loaders.
  - ``sources``    — XML ingest kernel + dump manifest/catalog ops.
  - ``transforms`` — cleaning/coercion column semantics (reference
    parser.py / utils.py behavior, re-expressed as Spark exprs).
  - ``lake``       — Hive-partitioned Parquet lake write/read.
  - ``queries``    — Plane B analytics + Plane C LLM-op query builders,
    each registered with a DuckDB oracle twin.
  - ``registry``   — the query/oracle registry consumed by
    ``__spark_entry__.py`` and ``bench.py``.
"""

__version__ = "0.1.0"
