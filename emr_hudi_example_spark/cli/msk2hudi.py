"""MSK2Hudi equivalent: Kafka(-shaped) JSON stream → ODS lake table,
schema-on-target (``SRC/MSK2Hudi.scala``). The target table must exist
(its logical schema drives ``from_json``) — seed it with hive2hudi or
a first batch write.

Example::

    python -m emr_hudi_example_spark.cli.msk2hudi -e dev \\
        --source files --sourcePath /data/in --runOnce \\
        -g /lake -s ods -u orders -z o_orderkey -c /tmp/ckpt
"""

from __future__ import annotations

from emr_hudi_example_spark.cli._conf import (
    base_parser,
    finish,
    get_spark,
    lake_table,
    stream_source,
    trigger_seconds,
)
from emr_hudi_example_spark.pipelines.stream2ods import run_stream2ods


def main(argv: list[str] | None = None, spark=None):
    p = base_parser("msk2hudi", __doc__.splitlines()[0])
    args = p.parse_args(argv)
    own = spark is None
    spark = spark or get_spark(args, "MSK2Hudi")
    table = lake_table(spark, args)
    q = run_stream2ods(
        stream_source(spark, args), table, args.checkpointDir,
        trigger_seconds(args),
    )
    finish(q, args)
    if own:
        spark.stop()
    return table


if __name__ == "__main__":
    main()
