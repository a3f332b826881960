"""Hudi2MSK equivalent: lake table → JSON messages (``value`` column)
into a stream sink (``SRC/Hudi2MSK.scala``). ``--runOnce`` exports the
current snapshot (the reference's one-shot shape); without it, the
commit-log stream feeds the sink continuously. On a cluster the sink is
``format("kafka")``; here it is JSON-lines files under ``--sinkPath``.

Example::

    python -m emr_hudi_example_spark.cli.hudi2msk -e dev --runOnce \\
        -g /lake -s ods -u orders -z o_orderkey --sinkPath /data/out
"""

from __future__ import annotations

from emr_hudi_example_spark.cli._conf import (
    base_parser,
    get_spark,
    lake_table,
)
from emr_hudi_example_spark.pipelines.lake2stream import (
    lake_to_json_lines,
    run_lake2stream,
)
from emr_hudi_example_spark.streaming.sources import drain


def main(argv: list[str] | None = None, spark=None):
    p = base_parser("hudi2msk", __doc__.splitlines()[0])
    p.add_argument("--sinkPath", required=True,
                   help="output dir for JSON-lines messages")
    args = p.parse_args(argv)
    own = spark is None
    spark = spark or get_spark(args, "Hudi2MSK")
    table = lake_table(spark, args)
    if args.runOnce:
        lake_to_json_lines(table, args.sinkPath)
    else:
        q = run_lake2stream(table, args.sinkPath, args.checkpointDir)
        try:
            q.awaitTermination()
        finally:
            drain(q)
    if own:
        spark.stop()
    return args.sinkPath


if __name__ == "__main__":
    main()
