"""Canal (MySQL binlog) CDC parsing.

Behavioral port of the reference's ``SRC/cdc/CanalParser.scala`` +
``SRC/cdc/model/*.scala`` + ``SRC/cdc/const/*.scala``:

- envelope fields (CanalDataModel, SRC/cdc/model/CanalDataModel.scala:3-17):
  table, type, data (list of row-maps), database, es, id, isDdl,
  mysqlType, old, pkNames, sql, sqlType, ts;
- op mapping INSERT→insert, UPDATE→upsert, DELETE→delete
  (SRC/cdc/CanalParser.scala:11-13);
- filtering: ops outside {INSERT,UPDATE,DELETE}, DDL events, and
  null-data events (heartbeats) are dropped → ``None``
  (SRC/cdc/CanalParser.scala:23-27); parse errors → ``None`` (:29-31);
- output (HudiDataModel, SRC/cdc/model/HudiDataModel.scala:3-8):
  (database, table, operation_type, data = row JSONs).

Two implementations are provided:

- ``canal_to_change`` — driver-side, single message (the reference's
  shape; used for control-flow and unit parity with its golden samples);
- ``parse_canal_df`` — executor-side over a whole DataFrame of envelope
  strings via ``from_json`` + ``explode`` — the 100 TB path: parsing
  scales with the cluster instead of the driver.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# op constants — SRC/cdc/const/CanalOP.scala / HudiOP.scala
CANAL_INSERT, CANAL_UPDATE, CANAL_DELETE = "INSERT", "UPDATE", "DELETE"
LAKE_INSERT, LAKE_UPSERT, LAKE_DELETE = "insert", "upsert", "delete"

CANAL_OP_TO_LAKE_OP = {
    CANAL_INSERT: LAKE_INSERT,
    CANAL_UPDATE: LAKE_UPSERT,
    CANAL_DELETE: LAKE_DELETE,
}
ALLOWED_CANAL_OPS = set(CANAL_OP_TO_LAKE_OP)

#: Spark-side envelope schema (MapType rows — Canal serializes every
#: column value as a string, matching List[Map[String,String]]).
CANAL_ENVELOPE_DDL = (
    "table STRING, type STRING, data ARRAY<MAP<STRING,STRING>>, "
    "database STRING, es LONG, id LONG, isDdl BOOLEAN, "
    "mysqlType MAP<STRING,STRING>, old ARRAY<MAP<STRING,STRING>>, "
    "pkNames ARRAY<STRING>, sql STRING, sqlType MAP<STRING,INT>, ts LONG"
)


@dataclass
class ChangeSet:
    """Normalized change event (HudiDataModel analog)."""

    database: str
    table: str
    operation_type: str
    data: list[str]  # row payloads as JSON strings


def canal_to_change(message: str) -> ChangeSet | None:
    """Parse one Canal JSON envelope; None for heartbeats/DDL/bad input —
    the exact accept/drop contract of SRC/cdc/CanalParser.scala:17-32."""
    try:
        if not message:
            return None
        obj = json.loads(message)
        if not isinstance(obj, dict) or not obj.get("table"):
            return None
        if (
            obj.get("type") not in ALLOWED_CANAL_OPS
            or not isinstance(obj.get("data"), list)
            or obj.get("isDdl")
        ):
            # non-list data (object/string) is a malformed envelope — the
            # executor-side ARRAY<MAP> schema drops it too
            return None
        return ChangeSet(
            database=obj.get("database"),
            table=obj["table"],
            operation_type=CANAL_OP_TO_LAKE_OP[obj["type"]],
            data=[json.dumps(row) for row in obj["data"]],
        )
    except (ValueError, TypeError, KeyError):
        return None


def parse_canal_df(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Executor-side Canal parse of a DataFrame of envelope strings.

    Returns one row per CHANGED ROW (envelopes carry row batches):
    (database, table, operation_type, row_json) — dropping non-DML,
    DDL and null-data envelopes exactly like ``canal_to_change``.
    """
    parsed = df.select(
        F.from_json(F.col(value_col), CANAL_ENVELOPE_DDL).alias("e")
    )
    kept = parsed.filter(
        F.col("e.table").isNotNull()
        & (F.col("e.table") != "")
        & F.col("e.type").isin(*ALLOWED_CANAL_OPS)
        & F.col("e.data").isNotNull()
        & ~F.coalesce(F.col("e.isDdl"), F.lit(False))
    )
    op_map = F.create_map(
        *[
            x
            for k, v in CANAL_OP_TO_LAKE_OP.items()
            for x in (F.lit(k), F.lit(v))
        ]
    )
    return kept.select(
        F.col("e.database").alias("database"),
        F.col("e.table").alias("table"),
        op_map[F.col("e.type")].alias("operation_type"),
        F.explode("e.data").alias("row_map"),
    ).select(
        "database", "table", "operation_type",
        F.to_json("row_map").alias("row_json"),
    )


# Golden samples from the reference's own smoke test
# (SRC/cdc/CanalParser.scala:41-73) — reused verbatim by our tests.
GOLDEN_INSERT = json.dumps(
    {
        "data": [{"id": "4", "name": "test", "new_col": None}],
        "database": "test",
        "es": 1603446001000,
        "id": 200360,
        "isDdl": False,
        "mysqlType": {
            "id": "bigint(20)",
            "name": "varchar(50)",
            "new_col": "varchar(100)",
        },
        "old": None,
        "pkNames": ["id"],
        "sql": "",
        "sqlType": {"id": -5, "name": 12, "new_col": 12},
        "table": "test_binglog",
        "ts": 1603446001498,
        "type": "INSERT",
    }
)

GOLDEN_HEARTBEAT = json.dumps(
    {
        "data": None,
        "database": "mysql",
        "es": 1624790516000,
        "id": 10,
        "isDdl": False,
        "mysqlType": None,
        "old": None,
        "pkNames": None,
        "sql": (
            "INSERT INTO mysql.rds_heartbeat2(id, value) values "
            "(1,1624790516970) ON DUPLICATE KEY UPDATE value = 1624790516970"
        ),
        "sqlType": None,
        "table": "rds_heartbeat2",
        "ts": 1624790570243,
        "type": "INSERT",
    }
)
