"""SparkSession factory.

Port of the reference's ``SRC/util/SparkHelper.scala:12-45`` (prod = YARN +
Hive + Kryo + CBO, dev = local[6]) to idiomatic PySpark. We keep the same
optimizer posture (CBO on) and add the modern knobs the reference predates
(AQE, Arrow) — all public Spark configuration.

Scale note (100 TB): on a real cluster the same builder is used with
``master`` unset (picked up from spark-submit), ``spark.sql.shuffle.
partitions`` sized to ~2–3× total cores, and
``spark.sql.files.maxPartitionBytes`` at the default 128 MB so scan tasks
stay memory-bounded regardless of total data size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark_session(
    app_name: str = "emr-hudi-example-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession.

    Mirrors ``SparkHelper.getSparkSession`` (SRC/util/SparkHelper.scala:12-45):
    Kryo serializer, CBO enabled; local master for dev. Adds AQE + Arrow.
    """
    if master is None:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Driver fixtures write TIMESTAMP(NANOS) (events.ts); Spark has no
        # nanos timestamp — read as long and convert at the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
