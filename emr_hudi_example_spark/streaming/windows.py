"""Event-time windowed aggregation with watermark-driven late-data
handling — the Structured-Streaming-native form of the engine's batch
tumbling-window aggregate (catalog ``a6_tumbling_window``).

The reference's poll loops have no event-time semantics (processing-time
partitions only, ``SRC/Log2Hudi.scala:62-66``); this is the Spark-first
upgrade: declare a watermark and let the engine finalize windows, drop
late rows, and bound state — no hand-rolled lateness bookkeeping.

Scale: state per open window×key lives in the partitioned state store;
the watermark EXPIRES closed windows so state is bounded by
(watermark delay / window size) × key cardinality, not by stream length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_tumbling_agg(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str,
    watermark_delay: str,
    key_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time windows over a stream with a watermark.

    In append output mode a window is emitted exactly once — when the
    watermark (max seen event time − ``watermark_delay``) passes the
    window end and its state is evicted. Rows arriving behind the
    watermark after eviction are dropped; Spark's guarantee is
    one-directional (within-delay rows are never dropped; beyond-delay
    rows MAY still count if they land before eviction — same-batch
    stragglers do). Defaults to ``count(*) AS n``.
    """
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    keys = key_cols or []
    out = (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("window", *keys)],
    )
