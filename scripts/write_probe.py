"""Write-planning cost probe: point-sized upsert commits.

``_key_hit_files`` plans which live files an upsert batch rewrites.
Since the driver-side fast paths landed, a point-sized batch (distinct
join pairs under ``driver_probe_max_keys``) pays ONE capped collect and
then every probe — bucket ids, record-index shards, min/max range,
bloom positions, and the exact key scan itself — runs as driver-side
Python/pyarrow instead of a Spark job each. This probe measures the
end-to-end wall of a 3-key upsert commit against a 64-file table under
each index regime, plus a large-batch leg that must take the gate
fallback (Spark jobs), to show the fallback isn't regressed by the one
extra partial-agg collect.

Run: python scripts/write_probe.py [repeats]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from emr_hudi_example_spark.lake import LakeTable  # noqa: E402
from emr_hudi_example_spark.session import get_spark_session  # noqa: E402


def seed(spark, n_rows: int):
    return (
        spark.range(n_rows)
        .select(
            F.col("id").cast("string").alias("k"),
            (F.col("id") % 7).cast("string").alias("p"),
            F.lit(1).cast("long").alias("ver"),
            F.concat(F.lit("payload-"), F.col("id")).alias("body"),
        )
    )


def probe(spark, label: str, repeats: int, n_rows: int, point: bool, **kw):
    walls = []
    for _ in range(repeats):
        root = tempfile.mkdtemp(prefix="write-probe-")
        try:
            t = LakeTable(
                spark, root, "probe", "t", ["k"], "ver",
                partition_keys=["p"], **kw,
            )
            base = seed(spark, n_rows).repartition(32)
            t.write(base, op="insert", instant="001")
            if point:
                upd = seed(spark, n_rows).filter(
                    F.col("k").isin("7", "7000", "70000")
                )
            else:
                upd = seed(spark, n_rows).filter(F.col("id") % 3 == 0)
            upd = upd.withColumn("ver", F.lit(2).cast("long"))
            t0 = time.perf_counter()
            t.write(upd, op="upsert", instant="002")
            walls.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print(f"| {label} | {min(walls):.2f} s |")


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark_session("write-probe")
    n = 120_000  # ~64+ base files across 7 partitions
    print("| leg | upsert wall (min of runs) |")
    print("|---|---|")
    probe(spark, "point-3keys range-prune only", repeats, n, True)
    probe(spark, "point-3keys bloom", repeats, n, True, bloom_index=True)
    probe(spark, "point-3keys bucket(16)", repeats, n, True,
          bucket_index=16)
    probe(spark, "point-3keys record-index", repeats, n, True,
          record_index=True)
    probe(spark, "large-batch (gate fallback)", repeats, n, False)
    spark.stop()


if __name__ == "__main__":
    main()
