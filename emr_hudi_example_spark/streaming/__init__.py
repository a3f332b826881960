"""Structured-Streaming helpers: test sources and foreachBatch wiring."""

from emr_hudi_example_spark.streaming.sources import (
    drain,
    json_lines_stream,
    kafka_like_stream,
    start_foreach_batch,
)
from emr_hudi_example_spark.streaming.stateful import (
    streaming_first_seen,
    streaming_running_sum,
)
from emr_hudi_example_spark.streaming.windows import streaming_tumbling_agg

__all__ = [
    "json_lines_stream",
    "kafka_like_stream",
    "start_foreach_batch",
    "drain",
    "streaming_first_seen",
    "streaming_running_sum",
    "streaming_tumbling_agg",
]
