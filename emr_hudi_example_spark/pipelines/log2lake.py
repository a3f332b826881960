"""Streaming JSON ingest → lake table with processing-time partitions.

Port of ``Log2Hudi`` (``SRC/Log2Hudi.scala:20-86``): Kafka(-shaped)
stream of JSON strings → per micro-batch: null-filter, empty guard,
``from_json`` against a schema inferred from ONE sample document,
flatten, add ``logday``/``hm`` partitions (driver-computed per batch —
all rows of a batch share one wall-clock stamp), global-index upsert
(GLOBAL_BLOOM + partition-path update → late data MOVES records).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from emr_hudi_example_spark.functions.json_schema import schema_from_sample_json
from emr_hudi_example_spark.lake import LakeTable
from emr_hudi_example_spark.streaming.sources import start_foreach_batch


def _processing_time_partitions(now: datetime) -> tuple[str, str]:
    """logday=yyyyMMdd, hm=HHmm floored to 10 minutes — the driver-side
    computation of SRC/Log2Hudi.scala:63-75 (last digit → '0')."""
    hm = now.strftime("%H%M")
    return now.strftime("%Y%m%d"), hm[:-1] + "0"


def log2lake_batch(
    batch_df: DataFrame,
    schema,
    table: LakeTable,
    now: datetime | None = None,
    op: str = "upsert",
    batch_id: int | None = None,
) -> None:
    """One micro-batch — the foreachBatch closure body
    (SRC/Log2Hudi.scala:62-83). ``batch_id`` (the foreachBatch epoch)
    makes the apply exactly-once even for ``op="insert"``: a checkpoint
    replay of an already-committed batch is skipped via the commit-
    metadata checkpoint."""
    if batch_df.isEmpty():  # F6 empty-batch guard (SRC/Log2Hudi.scala:67)
        return
    logday, hm = _processing_time_partitions(
        now or datetime.now(timezone.utc)
    )
    rows = batch_df.select(
        F.from_json(F.col("value"), schema).alias("data_event")
    ).select("data_event.*")
    rows = rows.withColumn("logday", F.lit(logday)).withColumn(
        "hm", F.lit(hm)
    )
    checkpoint = (
        {"source_id": "log2lake", "batch_id": batch_id}
        if batch_id is not None
        else None
    )
    table.write(rows, op=op, checkpoint=checkpoint)


def run_log2lake(
    spark: SparkSession,
    stream_df: DataFrame,
    sample_json: str,
    table: LakeTable,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    op: str = "upsert",
) -> StreamingQuery:
    """Wire the full streaming query (schema bootstrap from one sample →
    foreachBatch ingest). The caller supplies any Kafka-shaped stream
    (``value`` string column). ``op`` mirrors the reference's
    ``hudiWriteOperation`` flag (SRC/conf/Config.scala:25)."""
    schema = schema_from_sample_json(spark, sample_json)
    return start_foreach_batch(
        stream_df,
        lambda bdf, bid: log2lake_batch(bdf, schema, table, op=op,
                                        batch_id=bid),
        checkpoint_dir,
        query_name="Log2Lake",
        trigger_seconds=trigger_seconds,
    )
