"""CDC envelope parsing: Canal (MySQL binlog), DMS/Kinesis, Debezium."""

from emr_hudi_example_spark.cdc.canal import (
    CANAL_OP_TO_LAKE_OP,
    ChangeSet,
    canal_to_change,
    parse_canal_df,
)
from emr_hudi_example_spark.cdc.debezium import (
    DEBEZIUM_SOURCE_SCHEMA,
    debezium_envelope_schema,
    debezium_to_upserts,
    parse_debezium,
)
from emr_hudi_example_spark.cdc.dms import DMS_ENVELOPE_SCHEMA, TAXI_DATA_SCHEMA

__all__ = [
    "ChangeSet",
    "canal_to_change",
    "parse_canal_df",
    "CANAL_OP_TO_LAKE_OP",
    "DMS_ENVELOPE_SCHEMA",
    "TAXI_DATA_SCHEMA",
    "DEBEZIUM_SOURCE_SCHEMA",
    "debezium_envelope_schema",
    "debezium_to_upserts",
    "parse_debezium",
]
