"""CLI entry-point parity: each reference program's equivalent main runs
end-to-end on fixtures (SRC/conf/Config.scala flag surface → pipelines),
plus the real-Kafka reader builder's option surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _base(tmp_path, table, extra=None):
    args = [
        "-e", "dev",
        "-g", str(tmp_path / "lake"),
        "-s", "db",
        "-u", table,
        "--partitionNum", "2",
    ]
    return args + (extra or [])


def test_hive2hudi_then_ods2dwd_then_dwd2dm(spark, tmp_path):
    """The reference's batch medallion driven purely through the three
    CLI mains: bootstrap → incremental enrich → mart delta-merge."""
    from emr_hudi_example_spark.cli import dwd2dm, hive2hudi, ods2dwd
    from emr_hudi_example_spark.lake import LakeTable

    instant = hive2hudi.main(
        _base(tmp_path, "orders_ods",
              ["-z", "o_orderkey", "--hiveTablePath",
               f"{SF}/orders.parquet"]),
        spark=spark,
    )
    assert instant is not None
    ods = LakeTable(spark, str(tmp_path / "lake"), "db", "orders_ods",
                    ["o_orderkey"], "created_ts")
    n = ods.snapshot().count()
    assert n == spark.read.parquet(f"{SF}/orders.parquet").count()

    ods2dwd.main(
        _base(tmp_path, "orders_dwd",
              ["-z", "o_orderkey", "--odsTable", "orders_ods",
               "--dimPath", f"{SF}/customer.parquet",
               "--factKey", "o_custkey", "--dimKey", "c_custkey",
               "--enrich", "c_mktsegment=N/A",
               "--hudiIntervel", "0", "--maxTicks", "1"]),
        spark=spark,
    )
    dwd = LakeTable(spark, str(tmp_path / "lake"), "db", "orders_dwd",
                    ["o_orderkey"], "created_ts")
    snap = dwd.logical()
    assert snap.count() == n
    assert "c_mktsegment" in snap.columns

    dwd2dm.main(
        _base(tmp_path, "orders_dm",
              ["-z", "c_mktsegment", "--dwdTable", "orders_dwd",
               "--groupCols", "c_mktsegment",
               "--valueCol", "o_totalprice", "--sumAlias", "price_sum",
               "--hudiIntervel", "0", "--maxTicks", "1"]),
        spark=spark,
    )
    dm = LakeTable(spark, str(tmp_path / "lake"), "db", "orders_dm",
                   ["c_mktsegment"], "created_ts")
    got = {
        r["c_mktsegment"]: r["price_sum"]
        for r in dm.logical().collect()
    }
    want = {
        r["c_mktsegment"]: r["s"]
        for r in dwd.logical()
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_log2hudi_main(spark, tmp_path):
    from emr_hudi_example_spark.cli import log2hudi

    src = tmp_path / "in"
    src.mkdir()
    (src / "batch0.jsonl").write_text(
        "\n".join(json.dumps({"id": str(i), "name": f"n{i}"})
                  for i in range(20))
    )
    table = log2hudi.main(
        _base(tmp_path, "event_log",
              ["-z", "id", "--hudiCombineField", "id",
               "--jsonMetaSample", '{"id":"1","name":"x"}',
               "--source", "files", "--sourcePath", str(src),
               "--runOnce", "-c", str(tmp_path / "ckpt")]),
        spark=spark,
    )
    snap = table.logical()
    assert snap.count() == 20
    assert {"logday", "hm"} <= set(snap.columns)


def test_msk2hudi_main_schema_on_target(spark, tmp_path):
    from emr_hudi_example_spark.cli import msk2hudi
    from emr_hudi_example_spark.lake import LakeTable

    seed = (
        spark.read.parquet(f"{SF}/nation.parquet")
        .withColumn("created_ts", F.lit(1).cast("long"))
    )
    table = LakeTable(spark, str(tmp_path / "lake"), "db", "nation",
                      ["n_nationkey"], "created_ts")
    table.write(seed, op="upsert", instant="001")
    src = tmp_path / "in"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        json.dumps({"n_nationkey": 0, "n_name": "PATCHED",
                    "n_regionkey": 0})
    )
    msk2hudi.main(
        _base(tmp_path, "nation",
              ["-z", "n_nationkey", "--source", "files",
               "--sourcePath", str(src), "--runOnce",
               "-c", str(tmp_path / "ckpt")]),
        spark=spark,
    )
    snap = table.logical()
    assert snap.count() == seed.count()
    assert snap.filter(F.col("n_nationkey") == 0).collect()[0]["n_name"] \
        == "PATCHED"


def test_kds2hudi_main_dms_envelopes(spark, tmp_path):
    from emr_hudi_example_spark.cli import kds2hudi

    src = tmp_path / "in"
    src.mkdir()
    msgs = [
        json.dumps({
            "data": {"id": i, "userName": f"u{i}", "score": "1.25",
                     "money": "9.50"},
            "metadata": {"operation": 1, "record-type": "data",
                         "table-name": "taxi_order"},
        })
        for i in range(3)
    ]
    # DMS control record: no data block — must be dropped
    msgs.append(json.dumps({"metadata": {"operation": 0,
                                         "record-type": "control"}}))
    (src / "b0.jsonl").write_text("\n".join(msgs))
    table = kds2hudi.main(
        _base(tmp_path, "taxi_order",
              ["-z", "id", "-y", "MOR", "--source", "files",
               "--sourcePath", str(src), "--runOnce",
               "-c", str(tmp_path / "ckpt")]),
        spark=spark,
    )
    snap = table.logical()
    assert snap.count() == 3
    assert {r["userName"] for r in snap.collect()} == {"u0", "u1", "u2"}
    assert dict(snap.dtypes)["money"] == "decimal(9,2)"


def test_hudi2msk_main_export(spark, tmp_path):
    from emr_hudi_example_spark.cli import hive2hudi, hudi2msk

    hive2hudi.main(
        _base(tmp_path, "nation",
              ["-z", "n_nationkey", "--hiveTablePath",
               f"{SF}/nation.parquet"]),
        spark=spark,
    )
    out = tmp_path / "out"
    hudi2msk.main(
        _base(tmp_path, "nation",
              ["-z", "n_nationkey", "--runOnce",
               "--sinkPath", str(out)]),
        spark=spark,
    )
    lines = spark.read.text(str(out))
    assert lines.count() == 25
    row = json.loads(lines.limit(1).collect()[0]["value"])
    assert "n_nationkey" in row and "created_ts" in row


def test_kafka_reader_option_surface(spark):
    """The real-connector builder carries the reference's exact option
    set (SRC/Log2Hudi.scala:29-37) — unit-checked without a broker."""
    from emr_hudi_example_spark.streaming.sources import (
        build_stream_source,
        kafka_reader_options,
    )

    opts = kafka_reader_options(
        "b-1:9092,b-2:9092", "events", consumer_group="cg1",
        start_pos="earliest",
    )
    assert opts == {
        "kafka.bootstrap.servers": "b-1:9092,b-2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "kafka.consumer.commit.groupid": "cg1",
        # r13: the group id ALSO lands on Spark's own option so the
        # group is broker-registered (the commit.groupid key only ever
        # fed the reference's external committer)
        "kafka.group.id": "cg1",
    }
    assert "kafka.consumer.commit.groupid" not in kafka_reader_options(
        "b:9092", "t"
    )
    with pytest.raises(ValueError, match="requires brokers"):
        build_stream_source(spark, "kafka")
    with pytest.raises(ValueError, match="requires path"):
        build_stream_source(spark, "files")
    with pytest.raises(ValueError, match="unknown stream source"):
        build_stream_source(spark, "pulsar")


def test_kafka_source_options_land_on_stream_df(spark):
    """--source kafka drives the REAL format('kafka') reader plan: the
    reference's exact options (SRC/Log2Hudi.scala:29-37) land on the
    reader, the stream repartitions (T6) and the envelope is
    CAST(value AS STRING) (P1). Asserted through a recording reader —
    no broker or connector jar needed for plan-level checks."""
    from pyspark.sql import types as T

    from emr_hudi_example_spark.cli._conf import base_parser, stream_source

    recorded: dict = {"format": None, "options": {}}

    class _Reader:
        def format(self, fmt):
            recorded["format"] = fmt
            return self

        def option(self, k, v):
            recorded["options"][k] = v
            return self

        def load(self):
            # the kafka source's fixed envelope schema
            return spark.createDataFrame(
                [],
                T.StructType([
                    T.StructField("key", T.BinaryType()),
                    T.StructField("value", T.BinaryType()),
                    T.StructField("topic", T.StringType()),
                    T.StructField("partition", T.IntegerType()),
                    T.StructField("offset", T.LongType()),
                    T.StructField("timestamp", T.TimestampType()),
                    T.StructField("timestampType", T.IntegerType()),
                ]),
            )

    class _Spark:
        readStream = _Reader()

    args = base_parser("t", "t").parse_args([
        "-e", "dev", "--source", "kafka",
        "-b", "b-1:9092,b-2:9092", "-t", "events",
        "-p", "cg1", "-o", "earliest", "--partitionNum", "8",
    ])
    df = stream_source(_Spark(), args)
    assert recorded["format"] == "kafka"
    assert recorded["options"] == {
        "kafka.bootstrap.servers": "b-1:9092,b-2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "kafka.consumer.commit.groupid": "cg1",
        "kafka.group.id": "cg1",
    }
    # downstream envelope: (topic, value:string), repartitioned
    assert df.columns == ["topic", "value"]
    assert dict(df.dtypes)["value"] == "string"
    assert "Repartition" in df._jdf.queryExecution().logical().toString()
