from hbase_snapshot_spark.streaming.ingest import stream_ingest_corpus
from hbase_snapshot_spark.streaming.replication import (
    cell_stream,
    replicate,
    sessionize_events,
    stateful_streaming_dedup,
    streaming_heavy_hitters,
    windowed_event_counts,
)
