"""Scale-strategy tests: manual skew salting (result-equivalence) and
bucketed co-located joins (shuffle elimination) — the partitioning
techniques the 100 TB design notes rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_hudi_example_spark.operators.relational import salted_equi_join

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = spark.read.parquet(f"{SF}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    plain = li.join(part, "p_partkey").groupBy("p_brand").count()
    salted = salted_equi_join(li, part, "p_partkey").groupBy("p_brand").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key sort-merge-join with NO
    shuffle exchange — the co-located-join path for repeated big joins."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    for name, df in [("b_li", li), ("b_ord", orders)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(4, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_li").join(spark.table("b_ord"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-locates both sides
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for name in ("b_li", "b_ord"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_zorder_key_matches_python_morton(spark, tmp_path):
    from emr_hudi_example_spark.operators.corpus import zorder_key

    def morton(x, y, bits=16):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    rows = [(x, y) for x in range(0, 40, 7) for y in range(0, 40, 11)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"])).collect()
    }
    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_compact_with_zorder_clusters_both_dims(spark, tmp_path):
    """compact(sort_by=zorder) leaves each output file covering a small
    range of BOTH dimensions."""
    from emr_hudi_example_spark.lake import LakeTable
    from emr_hudi_example_spark.operators.corpus import zorder_key

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).withColumn("v", F.lit(1).cast("long"))
    t = LakeTable(spark, str(tmp_path), "d", "t", ["o_orderkey"], "v")
    t.write(orders.withColumn("z", zorder_key(["o_orderkey", "o_custkey"])),
            op="insert", instant="001")
    t.compact(instant="002", target_files_per_partition=4, sort_by=["z"])
    snap = t.snapshot()
    assert snap.count() == orders.count()
    assert sorted(map(tuple, snap.drop("z", "_commit_time", "_record_key",
                                       "_partition_path").collect())) == \
        sorted(map(tuple, orders.collect()))
