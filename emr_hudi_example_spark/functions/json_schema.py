"""JSON schema inference + extraction utilities.

Ports the reference's driver-side JSON helpers to PySpark:

- ``schema_from_sample_json`` — infer a StructType from ONE sample JSON
  document (SRC/Log2Hudi.scala:50-51: ``spark.read.json(Seq(s).toDS).schema``).
- ``json_to_struct_type`` — the custom JSON→StructType mapper of
  SRC/util/JsonSchema.scala:27-46 (Double/Integer/Long/String → matching
  Spark type, anything else → String).
- ``get_json_value`` — single-key extractor defaulting "None"
  (SRC/util/JsonSchema.scala:48-57) → ``F.get_json_object`` column twin.
- ``is_valid_json`` — the Gson validity gate of SRC/util/Meta.scala:10-20.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def is_valid_json(sample: str) -> bool:
    """Validity check before inference (SRC/util/Meta.scala:10-20 used Gson;
    the stdlib parser is the Python equivalent)."""
    try:
        json.loads(sample)
        return True
    except (ValueError, TypeError):
        return False


def schema_from_sample_json(spark: SparkSession, sample: str) -> T.StructType:
    """Infer a schema from one sample JSON document, exactly as
    SRC/Log2Hudi.scala:50-51 does with a 1-row Dataset."""
    if not is_valid_json(sample):
        raise ValueError("sample is not valid JSON")
    return spark.read.json(spark.sparkContext.parallelize([sample])).schema


def json_to_struct_type(sample: str) -> T.StructType:
    """Custom JSON→StructType mapper (SRC/util/JsonSchema.scala:27-46).

    Type-mapping table reproduced: float → DoubleType, int that fits
    32 bits → IntegerType, bigger int → LongType, str → StringType,
    anything else (bool, null, nested object/array) → StringType —
    matching the reference's ``case _ => StringType`` fallback.
    """
    obj = json.loads(sample)
    if not isinstance(obj, dict):
        raise ValueError("expected a JSON object")
    fields = []
    for name, value in obj.items():
        if isinstance(value, bool):  # bool is an int subclass — check first
            dtype: T.DataType = T.StringType()
        elif isinstance(value, float):
            dtype = T.DoubleType()
        elif isinstance(value, int):
            dtype = T.IntegerType() if -(2**31) <= value < 2**31 else T.LongType()
        elif isinstance(value, str):
            dtype = T.StringType()
        else:
            dtype = T.StringType()
        fields.append(T.StructField(name, dtype, True))
    return T.StructType(fields)


def get_json_value(col: Column | str, key: str) -> Column:
    """Extract one top-level key from a JSON string column, defaulting to
    the literal string "None" when absent — the exact contract of
    SRC/util/JsonSchema.scala:48-57."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.get_json_object(c, f"$.{key}"), F.lit("None"))
