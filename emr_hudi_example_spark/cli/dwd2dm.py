"""DWD2DM equivalent: per tick, aggregate the incremental DWD slice and
delta-merge running sums into the mart (``SRC/DWD2DM.scala``).

Example::

    python -m emr_hudi_example_spark.cli.dwd2dm -e dev \\
        -g /lake -s dm -u orders_dm --dwdTable orders_dwd \\
        -z c_mktsegment --groupCols c_mktsegment \\
        --valueCol o_totalprice --sumAlias price_sum \\
        --hudiIntervel 0 --maxTicks 1
"""

from __future__ import annotations

from emr_hudi_example_spark.cli._conf import base_parser, get_spark, lake_table
from emr_hudi_example_spark.pipelines.dwd2dm import run_dwd2dm_loop


def main(argv: list[str] | None = None, spark=None):
    p = base_parser("dwd2dm", __doc__.splitlines()[0])
    p.add_argument("--dwdTable", required=True, help="source DWD table name")
    p.add_argument("--groupCols", required=True,
                   help="mart group-by columns, comma-separated")
    p.add_argument("--valueCol", required=True, help="summed value column")
    p.add_argument("--sumAlias", default="sum", help="running-sum column")
    p.add_argument("--hudiIntervel", type=int, default=30000,
                   help="poll interval ms (reference default 30000)")
    p.add_argument("--maxTicks", type=int, default=None,
                   help="bound the loop (default: run forever)")
    p.add_argument("--cursorFile", default=None,
                   help="persist the slice-end cursor (for the delta-merge "
                        "a lost cursor is data loss AND a replay is "
                        "double-add — see run_dwd2dm_loop)")
    args = p.parse_args(argv)
    own = spark is None
    spark = spark or get_spark(args, "DWD2DM")
    dwd = lake_table(spark, args, table=args.dwdTable)
    dm = lake_table(spark, args)
    cursor = run_dwd2dm_loop(
        dwd, dm,
        group_cols=[c.strip() for c in args.groupCols.split(",") if c.strip()],
        value_col=args.valueCol,
        sum_alias=args.sumAlias,
        interval_seconds=args.hudiIntervel / 1000.0,
        max_ticks=args.maxTicks,
        cursor_file=args.cursorFile,
    )
    if own:
        spark.stop()
    return cursor


if __name__ == "__main__":
    main()
