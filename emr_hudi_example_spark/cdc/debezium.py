"""Debezium CDC envelope — the third CDC dialect next to Canal
(``cdc/canal.py``) and DMS (``cdc/dms.py``). The reference consumes
DMS/Canal streams (``SRC/KDS2Hudi.scala:36-81``, ``SRC/cdc``); Debezium
is the de-facto open-source envelope for the same MySQL/Postgres binlog
feeds, so a user pointing this engine at a Kafka Connect pipeline gets
the same parse → flatten → upsert path.

Envelope shape (Debezium 1.x+ ``ExtractNewRecordState`` NOT applied —
we consume the full envelope): ``{before, after, source{db, table,
ts_ms, lsn}, op: c|u|d|r, ts_ms}``. ``op=c/u/r`` carry the new row in
``after``; ``op=d`` carries the last row image in ``before`` with
``after`` null; tombstone messages (null value) must be dropped by the
caller's null guard (F1) before the parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: ``source`` block — connector provenance (subset every connector fills).
DEBEZIUM_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("lsn", T.LongType()),
    ]
)


def debezium_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Full envelope ``struct<before, after, source, op, ts_ms>`` for a
    given table row schema (Debezium emits the row schema twice — the
    before/after images)."""
    return T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("source", DEBEZIUM_SOURCE_SCHEMA),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )


def parse_debezium(
    df: DataFrame, row_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """P2 over the Debezium dialect: ``from_json`` against the declared
    envelope schema; rows whose envelope fails to parse or carries an
    absent or UNRECOGNIZED ``op`` (tombstones, foreign junk, ops this
    flatten has no defined image for) are dropped — the same F4
    struct-not-null guard the DMS path applies, tightened to the four
    ops Debezium defines (r13 review: a non-null junk op with a
    populated ``after`` must not silently upsert)."""
    parsed = df.select(
        F.from_json(F.col(value_col), debezium_envelope_schema(row_schema))
        .alias("e")
    )
    return parsed.filter(
        F.col("e.op").isin("c", "u", "d", "r")
    ).select("e.*")


def debezium_to_upserts(parsed: DataFrame) -> DataFrame:
    """Flatten the envelope into the engine's upsert/tombstone row
    stream: ``c/u/r`` emit the ``after`` image with ``_cdc_deleted =
    false``; ``d`` emits the ``before`` image with ``_cdc_deleted =
    true`` — exactly the shape ``LakeTable.write(op="upsert"/"delete")``
    consumes, and the same op mapping the Canal path uses
    (``CANAL_OP_TO_LAKE_OP``, ``cdc/canal.py``). Ordering between
    conflicting ops is the precombine column's job (use ``ts_ms``).

    Scale shape: narrow projection (one CASE over two struct columns),
    pipeline-fused with the stream scan — no shuffle until the lake
    write plans its own.

    ``ts_ms`` and ``_cdc_deleted`` are RESERVED output names (the
    envelope timestamp and the tombstone flag). A row schema carrying
    either raises up front (r13 review) — the star-expansion would
    otherwise emit two same-named columns and every downstream
    reference (including the documented ``precombine='ts_ms'``) would
    die with AMBIGUOUS_REFERENCE at some later, harder-to-place point.
    Rename the source column upstream (Debezium's own
    ``ExtractNewRecordState`` transform has the same reservation)."""
    row_fields = [
        f.name for f in parsed.schema["after"].dataType.fields
    ]
    clash = {"ts_ms", "_cdc_deleted"} & set(row_fields)
    if clash:
        raise ValueError(
            f"debezium_to_upserts: row schema column(s) {sorted(clash)} "
            f"collide with the reserved envelope output names; rename "
            f"them upstream (e.g. in the connector's transforms)"
        )
    img = F.when(F.col("op") == "d", F.col("before")).otherwise(
        F.col("after")
    )
    return (
        parsed.select(
            img.alias("row"),
            (F.col("op") == "d").alias("_cdc_deleted"),
            F.col("ts_ms"),
        )
        .filter(F.col("row").isNotNull())
        .select("row.*", "_cdc_deleted", "ts_ms")
    )
