"""Unit parity tests for the JSON helpers against the reference's golden
sample (the taxi-order document embedded at SRC/util/JsonSchema.scala:15-18)
and the Meta.scala validity gate."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from emr_hudi_example_spark.functions.json_schema import (
    is_valid_json,
    json_to_struct_type,
    schema_from_sample_json,
)

TAXI_SAMPLE = json.dumps(
    {
        "id": 93583,
        "status": 3,
        "phone": 15879193008,
        "email": "jiehan@yahoo.com",
        "score": "82.35",
        "startLatitude": "43.9439010",
        "money": "58.49",
        "createTS": 1644645838,
        "__source_ts_ms": 1644645841000,
        "__deleted": "false",
        "ratio": 0.5,
    }
)


def test_json_to_struct_type_mapping_table():
    s = json_to_struct_type(TAXI_SAMPLE)
    by_name = {f.name: f.dataType for f in s.fields}
    assert by_name["id"] == T.IntegerType()          # fits 32 bits
    assert by_name["phone"] == T.LongType()          # exceeds 32 bits
    assert by_name["email"] == T.StringType()
    assert by_name["score"] == T.StringType()        # quoted decimal stays str
    assert by_name["createTS"] == T.IntegerType()
    assert by_name["__source_ts_ms"] == T.LongType()
    assert by_name["ratio"] == T.DoubleType()
    # field order preserved (the reference walks the object's key set)
    assert [f.name for f in s.fields] == list(json.loads(TAXI_SAMPLE))


def test_json_to_struct_type_fallback_to_string():
    s = json_to_struct_type(
        '{"b": true, "n": null, "o": {"x": 1}, "a": [1, 2]}'
    )
    assert all(f.dataType == T.StringType() for f in s.fields)


def test_is_valid_json_gate():
    assert is_valid_json(TAXI_SAMPLE)
    assert not is_valid_json("{nope")
    assert not is_valid_json("")


def test_schema_from_sample_matches_spark_inference(spark):
    s = schema_from_sample_json(spark, '{"a": 1, "b": "x", "c": 1.5}')
    by_name = {f.name: f.dataType for f in s.fields}
    assert by_name["a"] == T.LongType()   # spark.read.json infers long
    assert by_name["b"] == T.StringType()
    assert by_name["c"] == T.DoubleType()
