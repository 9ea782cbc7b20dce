from discogs_etl_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    run_stream_to_table,
)
