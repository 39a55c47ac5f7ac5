from dblp_to_csv_spark.streaming.events_stream import (  # noqa: F401
    load_events_stream,
    stream_dedup_events,
    stream_session_windows,
    stream_static_enrich,
    stream_stream_purchase_attribution,
    stream_tumbling_counts,
)
