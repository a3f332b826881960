"""Kinesis(-shaped) DMS CDC stream → lake table.

Port of ``KDS2Hudi`` (``SRC/KDS2Hudi.scala:83-133``): DMS envelope JSON
→ ``from_json`` against the hand-declared 2-level struct schema →
``where data is not null`` (drops DMS control records, F4) → flatten
``data.*`` → ``created_ts`` stamp → keyed upsert. The reference reads
Kinesis with the KDS connector; the engine consumes any stream with a
string ``value`` column (``build_stream_source`` supplies Kafka or the
sandbox file stream — the Kinesis connector is a third reader producing
the same envelope).

The reference runs ASYNC compaction here (``SRC/KDS2Hudi.scala:131-133``):
pass ``async_compact_every=N`` to ``run_kds2lake`` and the micro-batch
tick *schedules* a compaction plan every N batches while an
:class:`~emr_hudi_example_spark.lake.AsyncCompactor` daemon thread
*executes* pending plans off the ingest critical path (retrying on
writer-lock contention, the role Hudi's lock provider plays). MOR
tables can still compact inline via ``inline_compact_deltas`` — the
synchronous alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from emr_hudi_example_spark.cdc.dms import DMS_ENVELOPE_SCHEMA
from emr_hudi_example_spark.functions.core import created_ts_expr
from emr_hudi_example_spark.lake import LakeTable
from emr_hudi_example_spark.lake.locks import retry_on_contention
from emr_hudi_example_spark.streaming.sources import start_foreach_batch


def dms2lake_batch(
    batch_df: DataFrame,
    table: LakeTable,
    created_ts_millis: int | None = None,
    batch_id: int | None = None,
) -> None:
    """One micro-batch (SRC/KDS2Hudi.scala:104-121)."""
    if batch_df.isEmpty():
        return
    parsed = batch_df.select(
        F.from_json(
            F.col("value").cast("string"), DMS_ENVELOPE_SCHEMA
        ).alias("rec")
    )
    rows = (
        parsed.where(F.col("rec.data").isNotNull())
        .select("rec.data.*")
        .withColumn("created_ts", created_ts_expr(created_ts_millis))
    )
    checkpoint = (
        {"source_id": "kds2lake", "batch_id": batch_id}
        if batch_id is not None
        else None
    )
    # retry on writer-lock contention rather than crash the streaming
    # query: with --asyncCompactEvery a compaction longer than the lock
    # wait would otherwise terminate ingest (round-2 advice); only a
    # lock that outlives every retry (stale/crashed writer) still fails
    retry_on_contention(
        lambda: table.write(rows, op="upsert", checkpoint=checkpoint)
    )


def run_kds2lake(
    stream_df: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    async_compact_every: int | None = None,
) -> StreamingQuery:
    """Start the ingest query. With ``async_compact_every=N``, every Nth
    micro-batch schedules a compaction plan and a daemon
    :class:`AsyncCompactor` executes it concurrently with later batches;
    the compactor is attached to the returned query as
    ``q.async_compactor`` — call ``.stop()`` after ``q.stop()`` to drain.
    """
    compactor = None
    if async_compact_every:
        from emr_hudi_example_spark.lake import AsyncCompactor

        compactor = AsyncCompactor(table).start()

    def tick(bdf, bid):
        dms2lake_batch(bdf, table, batch_id=bid)
        if (
            async_compact_every
            and bid > 0
            and bid % async_compact_every == 0
        ):
            # same contention guard as the write (r13 review):
            # schedule_compaction takes the SAME writer lock, and an
            # unguarded LockContention here would kill the whole
            # streaming query at a batch boundary — the exact
            # crash-the-ingest mode retry_on_contention exists for
            from emr_hudi_example_spark.lake.locks import (
                retry_on_contention,
            )

            retry_on_contention(table.schedule_compaction)

    q = start_foreach_batch(
        stream_df,
        tick,
        checkpoint_dir,
        query_name="KDS2Lake",
        trigger_seconds=trigger_seconds,
    )
    q.async_compactor = compactor
    return q
