"""Full-catalog deep-scale reference point (r13 verdict #5): run the
ENTIRE graded catalog — every registered query, the exact ``bench.py``
protocol, unmodified — against a 10x-scaled copy of the sf0.1 fixtures,
and against the fixtures themselves in the same session-shape, then
print total + the worst per-query ratios.

Per-family 10x/25x/100x legs (``scale_probe.py``) show each FAMILY's
curve; this is the single number that makes "the catalog scales" a
measurement over the whole surface rather than an induction from family
legs. Results are recorded in BASELINE.md.

Input construction (one source of truth with the family probes): the
FACT tables — lineitem, orders, events, documents, embeddings — get
``mult`` key-shifted clones (order/lineitem share the 10M orderkey
shift so their join keys stay consistent; event clones shift user_id
and event_id, keeping per-user timelines fixture-dense while the key
count scales); the DIMENSIONS (region, nation, customer, supplier,
part) are copied verbatim, so dim-join fan-out per fact row is
unchanged and lake-contract rows that seed from ``customer`` stay
fixture-sized — their flat curves are expected and reported as such.

Usage: python scripts/catalog_scale_bench.py [mult]   (default 10)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SF_DIR = "/root/testdata/sf0.1"
WORK = "/tmp/catalog_scale"

_FACT_SHIFT = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_DIMS = ("region", "nation", "customer", "supplier", "part")


def build(mult: int) -> str:
    from pyspark.sql import SparkSession

    from scale_probe import _clone_events, scaled

    out = f"{WORK}/x{mult}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("catalog-scale-build")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for tbl, key in _FACT_SHIFT.items():
        df = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
        scaled(df, key, mult, 10_000_000).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
    _clone_events(spark, mult).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    for tbl in _DIMS:
        spark.read.parquet(f"{SF_DIR}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{tbl}.parquet")
    spark.stop()
    return out


def run_bench(sf_dir: str) -> dict:
    """One ``bench.py`` pass (its own process, exactly the driver's
    invocation shape) — returns the full per-query record."""
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=7200,
        cwd=tempfile.gettempdir(),
    )
    if p.returncode != 0:
        raise RuntimeError(f"bench at {sf_dir} failed:\n{p.stderr[-3000:]}")
    line = next(
        ln for ln in p.stdout.splitlines()
        if ln.startswith("{") and '"queries"' in ln
    )
    return json.loads(line)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scaled_dir = build(mult)
    base = run_bench(SF_DIR)
    deep = run_bench(scaled_dir)
    ratios = {
        q: (round(deep["queries"][q] / base["queries"][q], 2)
            if base["queries"].get(q) else None)
        for q in deep["queries"]
    }
    worst = sorted(
        ((r, q) for q, r in ratios.items() if r is not None), reverse=True
    )[:10]
    print(json.dumps({
        "probe": "catalog_scale_bench",
        "mult": mult,
        "n_queries": len(deep["queries"]),
        "total_1x_sec": base["value"],
        f"total_{mult}x_sec": deep["value"],
        "total_ratio": round(deep["value"] / base["value"], 2),
        "worst_ratios": [
            {"query": q, "ratio": r,
             "sec_1x": base["queries"][q], f"sec_{mult}x": deep["queries"][q]}
            for r, q in worst
        ],
    }, indent=2))


if __name__ == "__main__":
    main()
