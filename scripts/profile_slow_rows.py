"""Decompose the two slowest catalog rows (r11 verdict #5):
``pipe_stream_dedup_endstate`` (~6.2 s) and ``pipe_dwd2dm_endstate``
(~5.5 s) — stage-level wall timings at the bench scale (sf0.1), so
BASELINE.md can either prove the cost irreducible (fixed stream-startup
/ per-commit overhead) or point at the stage worth cutting.

Usage: python scripts/profile_slow_rows.py [sf_dir]
Prints one JSON line per (row, stage).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def timed(row: str, stage: str, fn):
    t0 = time.perf_counter()
    out = fn()
    wall = round(time.perf_counter() - t0, 3)
    print(json.dumps({"row": row, "stage": stage, "wall_sec": wall}),
          flush=True)
    return out


def profile_stream_dedup(spark, sf_dir: str) -> None:
    """pipe_stream_dedup_endstate, stage by stage (mirrors the catalog
    body; the catalog entry stays the single graded source of truth)."""
    import glob
    import shutil

    from emr_hudi_example_spark.catalog_pipelines import _tmp_base
    from emr_hudi_example_spark.operators.text import fingerprint
    from emr_hudi_example_spark.streaming.stateful import (
        streaming_first_seen,
    )
    from emr_hudi_example_spark.catalog import load

    row = "pipe_stream_dedup_endstate"
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_replace("text", " table ", "\n\n").alias("text")
    )
    paras = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", r"\n\n")).alias("para_idx", "para"),
        )
        .withColumn("para", F.trim("para"))
        .filter(F.length("para") > 0)
        .select(
            fingerprint("para").alias("fp"),
            "doc_id",
            "para_idx",
            (F.col("doc_id") % 2).cast("int").alias("first_batch"),
            (F.col("doc_id") * 100000 + F.col("para_idx")).alias("_ord"),
        )
    )
    base = _tmp_base()
    ind = os.path.join(base, "in")
    os.makedirs(ind)
    stage_dir = os.path.join(base, "stage")

    def _stage_inputs():
        paras.repartition(2, "first_batch").write.partitionBy(
            "first_batch"
        ).parquet(stage_dir)
        for i in (0, 1):
            for j, part in enumerate(
                sorted(
                    glob.glob(
                        os.path.join(
                            stage_dir, f"first_batch={i}", "part-*.parquet"
                        )
                    )
                )
            ):
                shutil.move(part, os.path.join(ind, f"batch{i}_{j}.parquet"))
        shutil.rmtree(stage_dir)

    timed(row, "stage_inputs_write", _stage_inputs)

    stream_schema = paras.drop("first_batch").schema
    outd = os.path.join(base, "out")
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def _run_stream():
        # mirror the catalog body: state shuffle sized to cores (the
        # r12 fix; re-pinning 8 here would profile the rejected config)
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(spark.sparkContext.defaultParallelism),
        )
        try:
            stream = (
                spark.readStream.schema(stream_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(ind)
            )
            out = streaming_first_seen(stream, ["fp"], order_col="_ord")

            def land(bdf, bid):
                bdf.withColumn(
                    "first_batch", F.lit(bid).cast("int")
                ).write.mode("append").parquet(outd)

            q = (
                out.writeStream.outputMode("update")
                .option("checkpointLocation", os.path.join(base, "ckpt"))
                .foreachBatch(land)
                .start()
            )
            t_start = time.perf_counter()
            q.processAllAvailable()
            drain = round(time.perf_counter() - t_start, 3)
            q.stop()
            q.awaitTermination()
            # per-batch durations from the progress log: how much of the
            # drain is micro-batch work vs trigger scheduling gaps
            batches = [
                {
                    "batch": p["batchId"],
                    "duration_ms": p["durationMs"],
                    "rows": p["numInputRows"],
                }
                for p in (q.recentProgress or [])
            ]
            print(json.dumps({"row": row, "stage": "per_batch",
                              "drain_sec": drain, "batches": batches}),
                  flush=True)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    timed(row, "stream_lifecycle_total", _run_stream)
    timed(row, "endstate_read",
          lambda: spark.read.parquet(outd).count())


def profile_dwd2dm(spark, sf_dir: str) -> None:
    """pipe_dwd2dm_endstate: the full 3-table 2-tick medallion,
    per-commit walls."""
    from emr_hudi_example_spark.catalog import load
    from emr_hudi_example_spark.catalog_pipelines import (
        _orders_batches, _tmp_base,
    )
    from emr_hudi_example_spark.lake import LakeTable
    from emr_hudi_example_spark.pipelines.dwd2dm import dm_increment, dm_init
    from emr_hudi_example_spark.pipelines.ods2dwd import (
        dwd_increment, init_cursor,
    )

    row = "pipe_dwd2dm_endstate"
    base = _tmp_base()
    _orders, b1, b2 = _orders_batches(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ods = LakeTable(spark, base, "p", "ods", ["o_orderkey"], "created_ts",
                    table_type="MERGE_ON_READ")
    dwd = LakeTable(
        spark, base, "p", "dwd", ["o_orderkey", "c_mktsegment"],
        "created_ts", table_type="MERGE_ON_READ",
    )
    dm = LakeTable(spark, base, "p", "dm", ["c_mktsegment"], "created_ts")

    timed(row, "tick1_ods_upsert",
          lambda: ods.write(b1, op="upsert", instant="100"))
    timed(
        row, "tick1_dwd_increment",
        lambda: dwd_increment(
            ods, cust, dwd, begin=None, end="100",
            fact_key="o_custkey", dim_key="c_custkey",
            enrich_cols={"c_mktsegment": "N/A"}, created_ts_millis=1,
        ),
    )
    timed(row, "tick1_dm_init",
          lambda: dm_init(dwd, dm, ["c_mktsegment"], "o_totalprice",
                          "price_sum", created_ts_millis=10))
    dm_begin = timed(row, "init_cursor", lambda: init_cursor(dwd))
    timed(row, "tick2_ods_upsert",
          lambda: ods.write(b2, op="upsert", instant="200"))
    timed(
        row, "tick2_dwd_increment",
        lambda: dwd_increment(
            ods, cust, dwd, begin="100", end="200",
            fact_key="o_custkey", dim_key="c_custkey",
            enrich_cols={"c_mktsegment": "N/A"}, created_ts_millis=2,
        ),
    )
    timed(
        row, "tick2_dm_increment",
        lambda: dm_increment(
            dwd, dm, dm_begin, None, ["c_mktsegment"], "o_totalprice",
            "price_sum", created_ts_millis=20,
        ),
    )
    timed(row, "endstate_read", lambda: dm.logical().count())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("profile-slow-rows")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM so stage walls measure steady state, not first-job JIT
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for _run in range(2):
        print(json.dumps({"run": _run}), flush=True)
        profile_stream_dedup(spark, sf_dir)
        profile_dwd2dm(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
