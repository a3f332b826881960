"""Streaming sources and sinks.

The reference consumes Kafka (``SRC/Log2Hudi.scala:29-37``) and Kinesis
(``SRC/KDS2Hudi.scala:83-89``). Structured Streaming's Kafka connector is
the drop-in on a real cluster (``spark.readStream.format("kafka")`` with
the same subscribe/startingOffsets/failOnDataLoss options); the test
harness has no brokers, so these helpers expose *file-stream* sources that
produce the SAME envelope columns (``value`` string; optional ``topic``),
making every downstream transform identical to the Kafka path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def json_lines_stream(
    spark: SparkSession, path: str, repartition: int | None = None
) -> DataFrame:
    """Stream of raw message strings in a ``value`` column — the shape of
    a Kafka source after ``CAST(value AS STRING)`` (P1). One JSON doc per
    line; new files are new micro-batches."""
    df = spark.readStream.format("text").load(path)  # column is `value`
    if repartition:
        # stream repartition right after the source — T6,
        # SRC/Log2Hudi.scala:38 (default 16, SRC/conf/Config.scala:20)
        df = df.repartition(repartition)
    return df


def kafka_like_stream(spark: SparkSession, path: str) -> DataFrame:
    """Multi-topic envelope stream: files of ``{"topic":..,"value":..}``
    JSON lines → columns (topic, value) — the shape the multi-table CDC
    fan-out consumes (``SRC/package.scala:145-183``)."""
    return (
        spark.readStream.format("json")
        .schema("topic STRING, value STRING")
        .load(path)
    )


def kafka_reader_options(
    brokers: str,
    topic: str,
    consumer_group: str | None = None,
    start_pos: str = "latest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The reference's Kafka reader options verbatim
    (``SRC/Log2Hudi.scala:29-37``, ``SRC/MSK2Hudi.scala:30-38``):
    bootstrap servers, subscribe topic, starting offsets
    (latest|earliest), failOnDataLoss=false (the reference hard-codes
    it), and the consumer group id. Returned as a plain dict so the
    option surface is unit-testable without a broker."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": start_pos,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if consumer_group:
        opts["kafka.consumer.commit.groupid"] = consumer_group
    return opts


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    consumer_group: str | None = None,
    start_pos: str = "latest",
    repartition: int | None = None,
) -> DataFrame:
    """The REAL Kafka source plan (``format("kafka")`` + the reference's
    options + ``CAST(value AS STRING)`` + stream repartition). Requires
    the spark-sql-kafka connector on the classpath (any real cluster;
    not this sandbox — use ``build_stream_source(source="files")``
    there, which produces the identical envelope)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        brokers, topic, consumer_group, start_pos
    ).items():
        reader = reader.option(k, v)
    df = reader.load()
    if repartition:
        df = df.repartition(repartition)  # SRC/Log2Hudi.scala:38
    return df.select(
        F.col("topic"), F.col("value").cast("string").alias("value")
    )


def build_stream_source(
    spark: SparkSession,
    source: str = "files",
    path: str | None = None,
    brokers: str | None = None,
    topic: str | None = None,
    consumer_group: str | None = None,
    start_pos: str = "latest",
    repartition: int | None = None,
) -> DataFrame:
    """Source switch for every streaming pipeline: ``"kafka"`` builds
    the real connector plan (cluster), ``"files"`` the envelope-
    equivalent file stream (sandbox/tests). Downstream transforms are
    identical — both emit a string ``value`` column."""
    if source == "kafka":
        if not brokers or not topic:
            raise ValueError("source='kafka' requires brokers and topic")
        return kafka_stream(
            spark, brokers, topic, consumer_group, start_pos, repartition
        )
    if source == "files":
        if not path:
            raise ValueError("source='files' requires path")
        return json_lines_stream(spark, path, repartition)
    raise ValueError(f"unknown stream source: {source!r}")


def start_foreach_batch(
    df: DataFrame,
    fn,
    checkpoint_dir: str,
    query_name: str = "pipeline",
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """``writeStream`` + queryName + checkpoint + trigger + foreachBatch —
    the exact sink wiring of ``SRC/Log2Hudi.scala:56-83`` (K6/T1/T2/T3).
    ``trigger_seconds=None`` → as-fast-as-possible (the reference's
    ``trigger=0`` note)."""
    w = (
        df.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fn)
    )
    if trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


def drain(query: StreamingQuery) -> None:
    """Synchronously process everything available, then stop — the test
    analog of ``query.awaitTermination()``."""
    query.processAllAvailable()
    query.stop()
    query.awaitTermination()


class BatchProgressListener:
    """T4 — query/offset listener (``StreamingQueryListener``,
    ``SRC/Log2Hudi.scala:40-48``): records per-batch progress
    (query name, batch id, input rows) exactly like the reference's
    onQueryProgress println. Attach with ``listener.attach(spark)``."""

    def __init__(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        records = self.records = []

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                records.append((p.name, p.batchId, p.numInputRows))

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        self._listener = _L()

    def attach(self, spark) -> None:
        spark.streams.addListener(self._listener)

    def detach(self, spark) -> None:
        spark.streams.removeListener(self._listener)
