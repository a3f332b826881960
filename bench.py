"""Benchmark runner (driver contract): run the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count-collapsing action so timing covers the
full scan→shuffle→agg plan without driver-side row transfer dominating.

Noise protocol (round-2 verdict #8): every query runs
$SPARK_GRAFT_BENCH_RUNS times (default 3, run-major order so ambient
co-tenant load decorrelates across repeats) and the per-query MIN is
reported — the min is the least-noise estimator of the plan's true cost
on an otherwise-idle machine. Memoized pipeline state is reset between
runs so repeats re-execute the real work, not a cache read.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _warm_lake(spark, sf_dir: str) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from emr_hudi_example_spark.lake import LakeTable

    tmp = tempfile.mkdtemp(prefix="bench-warm-")
    try:
        df = spark.read.parquet(f"{sf_dir}/region.parquet").withColumn(
            "ver", F.lit(1).cast("long")
        )
        t = LakeTable(spark, tmp, "w", "warm", ["r_regionkey"], "ver")
        t.write(df, op="upsert", instant="001")
        t.write(df.withColumn("ver", F.lit(2).cast("long")),
                op="upsert", instant="002")
        t.write(df.limit(2), op="delete", instant="003")
        t.snapshot().count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from emr_hudi_example_spark import all_queries as catalog
    from emr_hudi_example_spark.session import get_spark_session

    spark = get_spark_session(app_name="bench")

    names = sorted(catalog.Q)
    # warm up the JVM / parquet footer cache with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # warm up the lake write path (codegen for the merge/anti-join plan
    # shapes + pyarrow footer reader) on a 5-row table, so per-query
    # timings measure the steady-state plans, not one-time JIT cost
    _warm_lake(spark, sf_dir)

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for _run in range(runs):
        # forget memoized pipeline end-states so every repeat re-runs the
        # actual medallion commits instead of reading a cached tmp table
        from emr_hudi_example_spark import catalog_pipelines as _cp

        _cp._MEDALLION_CACHE.clear()
        for name in names:
            fn = catalog.Q[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            elapsed = round(time.perf_counter() - t0, 4)
            assert n >= 0
            prev = timings.get(name)
            timings[name] = elapsed if prev is None else min(prev, elapsed)
    total = round(sum(timings.values()), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # The driver retains only the LAST 2000 bytes of output (r4 verdict
    # #2: both r3 and r4 lost the front-loaded headline — truncation
    # cuts the FRONT). So: the big per-query dict goes FIRST inside the
    # JSON object, headline scalars go LAST, and a second, final,
    # headline-only JSON line guarantees the retained tail always ends
    # with a small complete parseable record.
    print(
        json.dumps(
            {
                "queries": timings,
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "runs": runs,
                "sf": sf_val,
            }
        )
    )
    # Compact per-family subtotals + the 5 largest rows ride in the
    # FINAL headline line (r14 verdict #3): the driver retains only the
    # last 2000 bytes of stdout, so the full 188-entry dict above never
    # survives — ~15 family keys and 5 top rows (~0.6 KB total) always
    # do, restoring per-query comparison/scaling signal. Additions only:
    # the timing methodology and every existing key are unchanged.
    import re as _re

    families: dict[str, float] = {}
    for name, sec in timings.items():
        # family = first name segment, digits stripped ("a14" -> "a",
        # "j3" -> "j") so the relational rows fold into two keys
        fam = _re.sub(r"\d+$", "", name.split("_", 1)[0])
        families[fam] = families.get(fam, 0.0) + sec
    families = {k: round(v, 2) for k, v in sorted(families.items())}
    top = {
        n: round(s, 2)
        for n, s in sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    }
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "runs": runs,
                "sf": sf_val,
                "n_queries": len(timings),
                "families": families,
                "top": top,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
