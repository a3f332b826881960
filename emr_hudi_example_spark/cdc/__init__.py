"""CDC envelope parsing: Canal (MySQL binlog) and DMS/Kinesis."""

from emr_hudi_example_spark.cdc.canal import (
    CANAL_OP_TO_LAKE_OP,
    ChangeSet,
    canal_to_change,
    parse_canal_df,
)
from emr_hudi_example_spark.cdc.dms import DMS_ENVELOPE_SCHEMA, TAXI_DATA_SCHEMA

__all__ = [
    "ChangeSet",
    "canal_to_change",
    "parse_canal_df",
    "CANAL_OP_TO_LAKE_OP",
    "DMS_ENVELOPE_SCHEMA",
    "TAXI_DATA_SCHEMA",
]
