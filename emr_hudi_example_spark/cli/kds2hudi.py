"""KDS2Hudi equivalent: DMS CDC envelope stream → lake table
(``SRC/KDS2Hudi.scala``): parse the 2-level DMS struct, drop control
records, flatten ``data.*``, keyed upsert.

Example::

    python -m emr_hudi_example_spark.cli.kds2hudi -e dev \\
        --source files --sourcePath /data/in --runOnce \\
        -g /lake -s cdc -u taxi_order -z id -y MOR -c /tmp/ckpt
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
from emr_hudi_example_spark.pipelines.kds2lake import run_kds2lake


def main(argv: list[str] | None = None, spark=None):
    p = base_parser("kds2hudi", __doc__.splitlines()[0])
    args = p.parse_args(argv)
    own = spark is None
    spark = spark or get_spark(args, "KDS2Hudi")
    table = lake_table(spark, args)
    q = run_kds2lake(
        stream_source(spark, args), table, args.checkpointDir,
        trigger_seconds(args),
        async_compact_every=args.asyncCompactEvery or None,
    )
    finish(q, args)
    if getattr(q, "async_compactor", None) is not None:
        q.async_compactor.stop()  # drains pending plans
    if own:
        spark.stop()
    return table


if __name__ == "__main__":
    main()
