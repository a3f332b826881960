"""Hive2Hudi equivalent: bootstrap a lake table from parquet files
(``SRC/Hive2Hudi.scala``): scan → optional limit → PK filters →
partition cast → created_ts stamp → repartition → upsert.

Example::

    python -m emr_hudi_example_spark.cli.hive2hudi -e dev \\
        -g /lake -s ods -u orders -z o_orderkey \\
        --hiveTablePath /data/orders.parquet --partitionNum 16
"""

from __future__ import annotations

from emr_hudi_example_spark.cli._conf import base_parser, get_spark, lake_table
from emr_hudi_example_spark.pipelines.bootstrap import bootstrap_parquet


def main(argv: list[str] | None = None, spark=None):
    p = base_parser("hive2hudi", __doc__.splitlines()[0])
    p.add_argument("--hiveTablePath", required=True,
                   help="source parquet path (the 'hive table' files)")
    p.add_argument("--limit", type=int, default=None,
                   help="optional row limit (SRC/Hive2Hudi.scala:25)")
    args = p.parse_args(argv)
    own = spark is None
    spark = spark or get_spark(args, "Hive2Hudi")
    table = lake_table(spark, args)
    instant = bootstrap_parquet(
        spark, args.hiveTablePath, table,
        limit=args.limit, repartition=args.partitionNum,
    )
    if own:
        spark.stop()
    return instant


if __name__ == "__main__":
    main()
