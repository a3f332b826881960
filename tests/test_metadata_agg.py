"""Metadata-only aggregates: ``metadata_count`` / ``metadata_min_max``
answer count(*)/MIN/MAX from manifest stats alone — O(file count)
driver arithmetic, zero scan, zero Spark jobs (the Iceberg/Hudi
metadata-table path). Exactness envelope pinned here:

- COW fast path exact through insert + upsert + delete churn,
  partition filters and time travel
- MOR falls back to an exact scan (read-time merge changes
  cardinality and can hide footer extremes in merge losers)
- missing stats force the min/max fallback; empty files don't
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_hudi_example_spark.lake import LakeTable
from emr_hudi_example_spark.lake.table import RECORD_KEY_COL

SF = "/root/testdata/sf0.001"


def cust(spark, ver=1):
    return (
        spark.read.parquet(f"{SF}/customer.parquet")
        .withColumn("ver", F.lit(ver).cast("long"))
    )


def churned_table(spark, tmp, name="ma", **kw):
    t = LakeTable(
        spark, str(tmp), "testdb", name,
        record_keys=["c_custkey"], precombine="ver",
        partition_keys=["c_mktsegment"],
        stats_columns=["c_acctbal"], **kw,
    )
    t.write(cust(spark), op="insert", instant="001")
    t.write(
        cust(spark, ver=2).filter(F.col("c_custkey") % 5 == 0),
        op="upsert", instant="002",
    )
    t.write(
        cust(spark).filter(F.col("c_custkey") % 7 == 0),
        op="delete", instant="003",
    )
    return t


def test_metadata_count_cow_exact(spark, tmp_path):
    t = churned_table(spark, tmp_path)
    n, meta = t.metadata_count()
    assert meta is True
    assert n == t.snapshot().count()
    # partition filter
    n_b, meta = t.metadata_count({"c_mktsegment": "BUILDING"})
    assert meta is True
    assert n_b == t.snapshot({"c_mktsegment": "BUILDING"}).count()
    # time travel: before the delete
    n2, meta = t.metadata_count(as_of="002")
    assert meta is True
    assert n2 == cust(spark).count()
    # as_of predating the table; missing partition
    assert t.metadata_count(as_of="000") == (0, True)
    assert t.metadata_count({"c_mktsegment": "NOPE"}) == (0, True)


def test_metadata_count_mor_falls_back_exact(spark, tmp_path):
    t = churned_table(
        spark, tmp_path, name="mor", table_type="MERGE_ON_READ"
    )
    n, meta = t.metadata_count()
    assert meta is False  # merge + tombstones: metadata can't know
    assert n == t.snapshot().count()
    assert n == cust(spark).filter(F.col("c_custkey") % 7 != 0).count()


def test_metadata_min_max_cow_exact(spark, tmp_path):
    t = churned_table(spark, tmp_path)
    lo, hi, meta = t.metadata_min_max("c_acctbal")
    assert meta is True
    row = t.snapshot().agg(F.min("c_acctbal"), F.max("c_acctbal")).collect()[0]
    assert (lo, hi) == (row[0], row[1])
    # record-key stats route (key_min/key_max, not col_stats)
    klo, khi, meta = t.metadata_min_max(RECORD_KEY_COL)
    assert meta is True
    krow = (
        t.snapshot()
        .agg(F.min(RECORD_KEY_COL), F.max(RECORD_KEY_COL))
        .collect()[0]
    )
    assert (klo, khi) == (krow[0], krow[1])
    # a column with NO harvested stats: exact via fallback
    lo, hi, meta = t.metadata_min_max("c_nationkey")
    assert meta is False
    nrow = (
        t.snapshot().agg(F.min("c_nationkey"), F.max("c_nationkey")).collect()[0]
    )
    assert (lo, hi) == (nrow[0], nrow[1])
    # empty view: no rows, no fallback
    assert t.metadata_min_max(
        "c_acctbal", {"c_mktsegment": "NOPE"}
    ) == (None, None, True)


def test_metadata_min_max_mor_falls_back(spark, tmp_path):
    """MOR: the footer max of a base file may belong to a merge LOSER
    (upserted away) — metadata must not serve it."""
    t = LakeTable(
        spark, str(tmp_path), "testdb", "morx",
        record_keys=["c_custkey"], precombine="ver",
        stats_columns=["c_acctbal"], table_type="MERGE_ON_READ",
    )
    t.write(cust(spark), op="insert", instant="001")
    # rewrite the max-acctbal row with a tiny balance
    top = cust(spark, ver=2).orderBy(F.col("c_acctbal").desc()).limit(1)
    t.write(top.withColumn("c_acctbal", F.lit(0.0)), op="upsert", instant="002")
    lo, hi, meta = t.metadata_min_max("c_acctbal")
    assert meta is False
    row = t.snapshot().agg(F.min("c_acctbal"), F.max("c_acctbal")).collect()[0]
    assert (lo, hi) == (row[0], row[1])
