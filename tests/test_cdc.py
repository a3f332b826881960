"""Canal CDC parser parity — the reference's own golden samples
(SRC/cdc/CanalParser.scala:39-77) drive both the driver-side and the
DataFrame-side implementations."""

from __future__ import annotations

import json

from emr_hudi_example_spark.cdc.canal import (
    GOLDEN_HEARTBEAT,
    GOLDEN_INSERT,
    canal_to_change,
    parse_canal_df,
)


def test_golden_insert_parses():
    ch = canal_to_change(GOLDEN_INSERT)
    assert ch is not None
    assert ch.database == "test"
    assert ch.table == "test_binglog"
    assert ch.operation_type == "insert"
    assert len(ch.data) == 1
    row = json.loads(ch.data[0])
    assert row == {"id": "4", "name": "test", "new_col": None}


def test_golden_heartbeat_drops():
    # data=null DML → must map to None (the reference's main() check)
    assert canal_to_change(GOLDEN_HEARTBEAT) is None


def test_op_mapping_and_filters():
    base = json.loads(GOLDEN_INSERT)
    for canal_op, lake_op in [
        ("INSERT", "insert"), ("UPDATE", "upsert"), ("DELETE", "delete"),
    ]:
        msg = dict(base, type=canal_op)
        assert canal_to_change(json.dumps(msg)).operation_type == lake_op
    assert canal_to_change(json.dumps(dict(base, type="CREATE"))) is None
    assert canal_to_change(json.dumps(dict(base, isDdl=True))) is None
    assert canal_to_change("") is None
    assert canal_to_change("{not json") is None
    assert canal_to_change(json.dumps(dict(base, table=""))) is None


def test_parse_canal_df_matches_driver_side(spark):
    base = json.loads(GOLDEN_INSERT)
    multi = dict(
        base,
        type="UPDATE",
        data=[{"id": "1", "name": "a"}, {"id": "2", "name": "b"}],
    )
    msgs = [GOLDEN_INSERT, GOLDEN_HEARTBEAT, json.dumps(multi)]
    df = spark.createDataFrame([(m,) for m in msgs], "value STRING")
    out = parse_canal_df(df).collect()
    # heartbeat dropped; insert → 1 row; update envelope → 2 rows
    assert len(out) == 3
    ops = sorted(r["operation_type"] for r in out)
    assert ops == ["insert", "upsert", "upsert"]
    assert all(r["table"] == "test_binglog" for r in out)
    exploded = {json.loads(r["row_json"]).get("id") for r in out}
    assert exploded == {"4", "1", "2"}


def test_debezium_envelope_to_upserts(spark):
    """Debezium dialect: c/u take the after image, d takes the before
    image with the tombstone flag, op-less junk and null-image rows are
    dropped; ts_ms rides along as the precombine."""
    import json as _json

    from pyspark.sql import types as T

    from emr_hudi_example_spark.cdc import (
        debezium_to_upserts,
        parse_debezium,
    )

    row_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    msgs = [
        {"after": {"id": 1, "v": "new"}, "op": "c", "ts_ms": 10},
        {"before": {"id": 2, "v": "old"}, "after": {"id": 2, "v": "upd"},
         "op": "u", "ts_ms": 20},
        {"before": {"id": 3, "v": "gone"}, "op": "d", "ts_ms": 30},
        {"foo": 1},                      # junk: no op
        {"op": "d", "ts_ms": 40},        # d with no before image: dropped
        # junk with a POPULATED after image but an op this flatten has
        # no defined image for — must drop, not silently upsert (r13)
        {"after": {"id": 7, "v": "junk"}, "op": "x", "ts_ms": 50},
    ]
    df = spark.createDataFrame(
        [(_json.dumps(m),) for m in msgs], "value STRING"
    )
    got = {
        r["id"]: (r["v"], r["_cdc_deleted"], r["ts_ms"])
        for r in debezium_to_upserts(parse_debezium(df, row_schema)).collect()
    }
    assert got == {
        1: ("new", False, 10),
        2: ("upd", False, 20),
        3: ("gone", True, 30),
    }


def test_debezium_reserved_names_raise(spark):
    """A row schema carrying ``ts_ms`` (or ``_cdc_deleted``) must raise
    up front (r13 review): the star-expansion would otherwise emit two
    same-named columns and the documented ``precombine='ts_ms'`` dies
    later with AMBIGUOUS_REFERENCE."""
    import json as _json

    import pytest as _pytest
    from pyspark.sql import types as T

    from emr_hudi_example_spark.cdc import (
        debezium_to_upserts,
        parse_debezium,
    )

    row_schema = T.StructType(
        [T.StructField("id", T.LongType()),
         T.StructField("ts_ms", T.LongType())]
    )
    df = spark.createDataFrame(
        [(_json.dumps({"after": {"id": 1, "ts_ms": 5}, "op": "c",
                       "ts_ms": 10}),)],
        "value STRING",
    )
    with _pytest.raises(ValueError, match="reserved"):
        debezium_to_upserts(parse_debezium(df, row_schema))
