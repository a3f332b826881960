"""Lake snapshot → JSON export (stream sink).

Port of ``Hudi2MSK`` (``SRC/Hudi2MSK.scala:39-50``): snapshot read →
``to_json(struct(cols...))`` into a single ``value`` column → sink. On a
cluster the sink is ``df.write.format("kafka")`` with the same ``value``
column; the harness substitutes JSON-lines files (no brokers).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_hudi_example_spark.lake import LakeTable
from emr_hudi_example_spark.operators.relational import pack_to_json


def lake_to_json_lines(
    table: LakeTable,
    out_path: str,
    cols: list[str] | None = None,
    coalesce: int | None = None,
) -> None:
    """Export the logical snapshot as JSON lines (one message per row)."""
    df = pack_to_json(table.logical(), cols)
    if coalesce:
        df = df.coalesce(coalesce)
    df.write.mode("overwrite").text(out_path)


def run_lake2stream(
    table: LakeTable,
    out_path: str,
    checkpoint_dir: str,
    cols: list[str] | None = None,
    keep_commit_time: bool = False,
):
    """Streaming export variant: commit-log stream → ``to_json`` message
    per row → JSON-lines sink (on a cluster: ``format("kafka")`` with the
    same ``value`` column). New commits flow to the sink continuously —
    the streaming completion of the reference's one-shot Hudi2MSK.

    MOR delete tombstones are filtered out (they are not live records).
    On a COW table rewrites re-emit carried-over rows; pass
    ``keep_commit_time=True`` so consumers can apply the cursor dedup
    described in ``LakeTable.stream``."""
    from emr_hudi_example_spark.lake.table import (
        COMMIT_TIME_COL,
        DELETED_COL,
        META_COLS,
    )

    src = table.stream()
    if DELETED_COL in src.columns:
        src = src.filter(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        )
    drop = [c for c in META_COLS if not (keep_commit_time and c == COMMIT_TIME_COL)]
    msgs = pack_to_json(
        src.drop(*drop, DELETED_COL),
        cols,
    )
    return (
        msgs.writeStream.format("text")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
