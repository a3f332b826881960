"""Shared CLI flag surface — the reference's scopt parser
(``SRC/conf/Config.scala:43-89``) ported to argparse.

Every reference flag keeps its long name (and short letter where scopt
itself didn't overload it — scopt reuses ``-t`` for sourceTopic AND
morCompact, ``-m`` for combineField AND inlineMax; argparse can't, so
the collided pairs are long-only here). Engine additions, all optional:

- ``--source files|kafka`` — real Kafka connector plan vs the
  envelope-equivalent file stream (no broker in the sandbox);
  ``--sourcePath`` is the file-stream input dir.
- ``--runOnce`` — process everything available, then stop (the test /
  batch-backfill mode; the reference's loops run forever).
- ``--maxTicks`` — bound the ODS2DWD / DWD2DM poll loops.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession

from emr_hudi_example_spark.lake import LakeTable


def base_parser(prog: str, description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description=description)
    p.add_argument("-e", "--env", required=True, choices=["dev", "prod"],
                   help="env: dev or prod")
    p.add_argument("-b", "--brokerList", default="",
                   help="kafka broker list, comma-separated")
    p.add_argument("-t", "--sourceTopic", default="", help="kafka topic")
    p.add_argument("-p", "--consumerGroup", default="",
                   help="kafka consumer group")
    p.add_argument("-o", "--startPos", default="latest",
                   choices=["latest", "earliest"],
                   help="kafka start position (default latest)")
    p.add_argument("-i", "--trigger", default="300",
                   help="streaming trigger interval, seconds (default 300; "
                        "0 = as fast as possible)")
    p.add_argument("-c", "--checkpointDir", default="",
                   help="streaming checkpoint dir")
    p.add_argument("-g", "--lakeBasePath", "--hudiBasePath",
                   dest="lakeBasePath", default="",
                   help="lake table base path")
    p.add_argument("-y", "--tableType", default="COW",
                   choices=["COW", "MOR"],
                   help="table type MOR or COW (default COW)")
    p.add_argument("-s", "--syncDB", default="default",
                   help="target database name")
    p.add_argument("-u", "--syncTableName", default="",
                   help="target table name")
    p.add_argument("-w", "--hudiWriteOperation", default="upsert",
                   choices=["insert", "bulk_insert", "upsert"],
                   help="write operation (default upsert)")
    p.add_argument("-z", "--hudiKeyField", default="",
                   help="record key field(s), comma-separated")
    p.add_argument("--hudiCombineField", default="created_ts",
                   help="precombine field (default created_ts)")
    p.add_argument("-q", "--hudiPartition", default="",
                   help="partition column(s), comma-separated")
    p.add_argument("--morCompact", default="true",
                   help="MOR inline compaction on/off (default true)")
    p.add_argument("--inlineMax", default="20",
                   help="compact every N delta commits (default 20)")
    p.add_argument("--asyncCompactEvery", type=int, default=0,
                   help="schedule a compaction plan every N micro-batches"
                        " and execute it on a background thread (the "
                        "reference's async-compaction mode; 0 = off)")
    p.add_argument("--partitionNum", type=int, default=16,
                   help="stream repartition parallelism (default 16)")
    p.add_argument("--concurrent", default="false",
                   help="accepted for flag parity; the engine is "
                        "single-writer (file lock)")
    p.add_argument("-l", "--zookeeperUrl", default="",
                   help="accepted for flag parity; the engine's OCC lock "
                        "is a local file, not ZooKeeper")
    p.add_argument("--source", default="files", choices=["files", "kafka"],
                   help="stream source implementation (default files)")
    p.add_argument("--sourcePath", default="",
                   help="file-stream input dir (source=files)")
    p.add_argument("--runOnce", action="store_true",
                   help="process available input, then stop")
    return p


def get_spark(args, app_name: str) -> SparkSession:
    """dev → the engine's local-master factory (SparkHelper's dev leg);
    prod → bare builder so master/conf come from spark-submit."""
    if args.env == "prod":
        return SparkSession.builder.appName(app_name).getOrCreate()
    from emr_hudi_example_spark.session import get_spark_session

    return get_spark_session(app_name=app_name)


def lake_table(
    spark: SparkSession,
    args,
    table: str | None = None,
    keys: list[str] | None = None,
    global_index: bool = False,
    default_partition: str = "",
) -> LakeTable:
    """LakeTable from the flag surface (writer options mapping,
    ``SRC/package.scala:49-56``)."""
    ttype = (
        "MERGE_ON_READ" if args.tableType.upper() == "MOR"
        else "COPY_ON_WRITE"
    )
    part = args.hudiPartition or default_partition
    parts = [c.strip() for c in part.split(",") if c.strip()]
    inline = (
        int(args.inlineMax)
        if ttype == "MERGE_ON_READ" and args.morCompact.lower() == "true"
        else None
    )
    record_keys = keys or [
        k.strip() for k in args.hudiKeyField.split(",") if k.strip()
    ]
    if not record_keys:
        raise SystemExit("missing record key: pass -z/--hudiKeyField")
    if not args.lakeBasePath or not args.syncTableName:
        raise SystemExit(
            "missing table location: pass -g/--lakeBasePath and "
            "-u/--syncTableName"
        )
    return LakeTable(
        spark,
        args.lakeBasePath,
        args.syncDB,
        table or args.syncTableName,
        record_keys=record_keys,
        precombine=args.hudiCombineField,
        partition_keys=parts,
        global_index=global_index,
        table_type=ttype,
        inline_compact_deltas=inline,
    )


def stream_source(spark: SparkSession, args) -> DataFrame:
    from emr_hudi_example_spark.streaming.sources import build_stream_source

    return build_stream_source(
        spark,
        args.source,
        path=args.sourcePath or None,
        brokers=args.brokerList or None,
        topic=args.sourceTopic or None,
        consumer_group=args.consumerGroup or None,
        start_pos=args.startPos,
        repartition=args.partitionNum,
    )


def trigger_seconds(args) -> int | None:
    s = int(args.trigger)
    return None if (s <= 0 or args.runOnce) else s


def finish(query, args) -> None:
    """--runOnce drains and stops; otherwise block forever like the
    reference's awaitTermination."""
    from emr_hudi_example_spark.streaming.sources import drain

    if args.runOnce:
        drain(query)
    else:
        query.awaitTermination()
