"""ODS2DWD equivalent: incremental fact reads joined to a dimension,
upserted into the DWD table on a poll loop (``SRC/ODS2DWD.scala``).

The reference hard-codes its demo tables/SQL; the engine parameterizes
them: ``--odsTable``/``-u`` (DWD target) name the lake tables under the
same base path, ``--dimPath`` is the dimension parquet, ``--factKey``/
``--dimKey`` the join keys, ``--enrich col=default,...`` the nvl'd
dimension columns.

Example::

    python -m emr_hudi_example_spark.cli.ods2dwd -e dev \\
        -g /lake -s dwd -u orders_dwd --odsTable orders_ods \\
        -z o_orderkey --dimPath /data/customer.parquet \\
        --factKey o_custkey --dimKey c_custkey \\
        --enrich c_mktsegment=N/A --hudiIntervel 0 --maxTicks 1
"""

from __future__ import annotations

from emr_hudi_example_spark.cli._conf import base_parser, get_spark, lake_table
from emr_hudi_example_spark.pipelines.ods2dwd import run_ods2dwd_loop


def _parse_enrich(spec: str) -> dict[str, object]:
    out: dict[str, object] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        col, _, default = part.partition("=")
        out[col.strip()] = default
    return out


def main(argv: list[str] | None = None, spark=None):
    p = base_parser("ods2dwd", __doc__.splitlines()[0])
    p.add_argument("--odsTable", required=True, help="source ODS table name")
    p.add_argument("--dimPath", required=True, help="dimension parquet path")
    p.add_argument("--factKey", required=True)
    p.add_argument("--dimKey", required=True)
    p.add_argument("--enrich", default="",
                   help="dimension columns with nvl defaults: col=dflt,...")
    p.add_argument("--hudiIntervel", type=int, default=30000,
                   help="poll interval ms (reference default 30000)")
    p.add_argument("--maxTicks", type=int, default=None,
                   help="bound the loop (default: run forever)")
    p.add_argument("--cursorFile", default=None,
                   help="persist the slice-end cursor (closes the "
                        "reference's restart-skip hazard)")
    args = p.parse_args(argv)
    own = spark is None
    spark = spark or get_spark(args, "ODS2DWD")
    ods = lake_table(spark, args, table=args.odsTable)
    dwd = lake_table(spark, args)
    dim = spark.read.parquet(args.dimPath)
    cursor = run_ods2dwd_loop(
        ods, dim, dwd,
        fact_key=args.factKey, dim_key=args.dimKey,
        enrich_cols=_parse_enrich(args.enrich) or None,
        interval_seconds=args.hudiIntervel / 1000.0,
        max_ticks=args.maxTicks,
        cursor_file=args.cursorFile,
    )
    if own:
        spark.stop()
    return cursor


if __name__ == "__main__":
    main()
