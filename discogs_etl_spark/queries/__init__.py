"""Query builders (Plane B analytics + Plane C LLM ops).

Importing the submodules populates ``discogs_etl_spark.registry``.
"""
