"""Log2Hudi equivalent: JSON log stream → lake with logday/hm
processing-time partitions and a global index (``SRC/Log2Hudi.scala``).

Example::

    python -m emr_hudi_example_spark.cli.log2hudi -e dev \\
        --source files --sourcePath /data/in --runOnce \\
        -g /lake -s ods -u event_log -z id \\
        --jsonMetaSample '{"id":"1","name":"x"}' -c /tmp/ckpt
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
from emr_hudi_example_spark.pipelines.log2lake import run_log2lake


def main(argv: list[str] | None = None, spark=None):
    p = base_parser("log2hudi", __doc__.splitlines()[0])
    p.add_argument("--jsonMetaSample", required=True,
                   help="one sample JSON document for schema inference "
                        "(or @path to read it from a file)")
    args = p.parse_args(argv)
    own = spark is None
    spark = spark or get_spark(args, "Log2Hudi")
    sample = args.jsonMetaSample
    if sample.startswith("@"):
        with open(sample[1:]) as fh:
            sample = fh.read()
    # Log2Hudi writes GLOBAL_BLOOM with partition-path update
    # (SRC/util/HudiConfig.scala:21-24): late data MOVES records
    table = lake_table(spark, args, global_index=True,
                       default_partition="logday,hm")
    q = run_log2lake(
        spark, stream_source(spark, args), sample, table,
        args.checkpointDir, trigger_seconds(args),
        op=args.hudiWriteOperation,
    )
    finish(q, args)
    if own:
        spark.stop()
    return table


if __name__ == "__main__":
    main()
