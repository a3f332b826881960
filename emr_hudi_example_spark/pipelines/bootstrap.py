"""Bootstrap load: parquet files → lake table.

Port of ``Hive2Hudi`` (``SRC/Hive2Hudi.scala:23-35``): scan parquet →
optional limit → null/PK filters → cast partition column to string →
stamp ``created_ts`` → repartition for write parallelism → upsert.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from emr_hudi_example_spark.functions.core import created_ts_expr
from emr_hudi_example_spark.lake import LakeTable


def bootstrap_parquet(
    spark: SparkSession,
    source_path: str,
    table: LakeTable,
    limit: int | None = None,
    partition_as_string: bool = True,
    repartition: int = 16,
    created_ts_millis: int | None = None,
) -> str:
    """Returns the committed instant. ``repartition`` default 16 matches
    the reference's write parallelism (``SRC/conf/Config.scala:20``)."""
    df = spark.read.parquet(source_path)
    if limit is not None:
        df = df.limit(limit)  # SRC/Hive2Hudi.scala:25
    if partition_as_string:
        for k in table.partition_keys:  # SRC/Hive2Hudi.scala:28
            df = df.withColumn(k, F.col(k).cast("string"))
    df = df.withColumn("created_ts", created_ts_expr(created_ts_millis))
    df = df.repartition(repartition)  # SRC/Hive2Hudi.scala:30
    return table.write(df, op="upsert")
