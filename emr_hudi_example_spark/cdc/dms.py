"""AWS DMS / Kinesis CDC envelope — the hand-declared schema of the
reference's KDS2Hudi path (``SRC/KDS2Hudi.scala:36-81``), exercising
decimals, timestamps and 2-level struct nesting. Re-declared as PySpark
``StructType`` (FIXTURES.md §3)."""

from __future__ import annotations

from pyspark.sql import types as T

#: ``data`` block — the taxi-order row (SRC/KDS2Hudi.scala:36-62).
TAXI_DATA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("age", T.IntegerType()),
        T.StructField("phone", T.LongType()),
        T.StructField("email", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("cardDate", T.StringType()),
        T.StructField("creditCardNumber", T.StringType()),
        T.StructField("startAddress", T.StringType()),
        T.StructField("endAddress", T.StringType()),
        T.StructField("carNumber", T.StringType()),
        T.StructField("carType", T.StringType()),
        T.StructField("userName", T.StringType()),
        T.StructField("userID", T.StringType()),
        T.StructField("driverName", T.StringType()),
        T.StructField("driverRegisterDate", T.StringType()),
        T.StructField("score", T.DecimalType(4, 2)),
        # DecimalType(9,7) is VERBATIM reference parity
        # (SRC/KDS2Hudi.scala:54-57) and is part of the fixture
        # contract — note it only represents |coordinate| < 100, so a
        # real-world longitude in the 100..180 band parses to NULL
        # under from_json's overflow-to-null; widen to (10,7) when
        # adapting this schema to a real feed
        T.StructField("startLatitude", T.DecimalType(9, 7)),
        T.StructField("startLongitude", T.DecimalType(9, 7)),
        T.StructField("endLatitude", T.DecimalType(9, 7)),
        T.StructField("endLongitude", T.DecimalType(9, 7)),
        T.StructField("money", T.DecimalType(9, 2)),
        T.StructField("createTS", T.LongType()),
        T.StructField("eventTS", T.LongType()),
    ]
)

#: ``metadata`` block (SRC/KDS2Hudi.scala:63-77).
DMS_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("commit-timestamp", T.TimestampType()),
        T.StructField("operation", T.IntegerType()),
        T.StructField("partition-key-type", T.IntegerType()),
        T.StructField("prev-transaction-id", T.LongType()),
        T.StructField("prev-transaction-record-id", T.StringType()),
        T.StructField("record-type", T.StringType()),
        T.StructField("schema-name", T.StringType()),
        T.StructField("stream-position", T.StringType()),
        T.StructField("table-name", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("transaction-id", T.LongType()),
        T.StructField("transaction-record-id", T.IntegerType()),
    ]
)

#: Full 2-level envelope ``struct<data, metadata>`` (SRC/KDS2Hudi.scala:78-81).
DMS_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", TAXI_DATA_SCHEMA),
        T.StructField("metadata", DMS_METADATA_SCHEMA),
    ]
)
