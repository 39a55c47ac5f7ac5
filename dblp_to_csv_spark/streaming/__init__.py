from dblp_to_csv_spark.streaming.events_stream import (  # noqa: F401
    load_events_stream,
    stream_session_windows,
    stream_tumbling_counts,
)
