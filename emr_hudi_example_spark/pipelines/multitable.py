"""Multi-table CDC fan-out: one (topic, value) stream → N lake tables.

Port of ``writeMultiTable2HudiFromDF`` (``SRC/package.scala:145-183``):
distinct topics in the batch → per table: key/partition metadata lookup →
topic filter → JSON parse against the TARGET table schema → PK-not-null
filter → upsert with ``created_ts`` precombine. The reference resolves
keys via an Impala JDBC ``SHOW CREATE TABLE`` + DDL-string surgery
(``SRC/package.scala:85-141``); our engine replaces that metadata channel
with an explicit ``TableRegistry`` (the catalog the DDL parse was
reconstructing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from emr_hudi_example_spark.functions.core import created_ts_expr
from emr_hudi_example_spark.lake import LakeTable


@dataclass
class TableSpec:
    """Key metadata the reference parses out of Kudu DDL
    (PRIMARY KEY (...) / RANGE (...) — SRC/package.scala:85-115);
    partition keys are removed from the record key exactly as there.
    ``schema`` (a DDL string, e.g. ``"id LONG, name STRING"``) serves the
    parse schema for tables with no commits yet — the registry stand-in
    for the reference's Impala catalog, which can answer for empty
    tables too."""

    record_keys: list[str]
    partition_keys: list[str] = field(default_factory=list)
    schema: str | None = None
    #: lake table type for this target — the reference's streaming
    #: tables are MERGE_ON_READ (SRC/package.scala:176); COW default
    #: preserved for existing callers
    table_type: str = "COPY_ON_WRITE"

    @property
    def effective_record_keys(self) -> list[str]:
        return [k for k in self.record_keys if k not in self.partition_keys]


class TableRegistry:
    """topic/table name → TableSpec + LakeTable factory."""

    def __init__(self, spark, base_path: str, db: str) -> None:
        self.spark = spark
        self.base_path = base_path
        self.db = db
        self._specs: dict[str, TableSpec] = {}

    def register(self, table: str, spec: TableSpec) -> None:
        self._specs[table] = spec

    def spec(self, table: str) -> TableSpec:
        # friendly failure (r13 review): a stray topic on the fan-out
        # subscription (a table added upstream before registration)
        # must surface as actionable configuration guidance, not a
        # bare KeyError that aborts every table's write in the batch
        if table not in self._specs:
            raise ValueError(
                f"multitable fan-out: no TableSpec registered for "
                f"table {table!r} (registered: "
                f"{sorted(self._specs) or 'none'}); register it with "
                f"TableRegistry.register(TableSpec(...)) or drop its "
                f"topic from the subscription"
            )
        return self._specs[table]

    def lake_table(self, table: str) -> LakeTable:
        spec = self.spec(table)
        return LakeTable(
            self.spark,
            self.base_path,
            self.db,
            table,
            record_keys=spec.effective_record_keys,
            precombine="created_ts",
            partition_keys=spec.partition_keys,
            table_type=spec.table_type,
        )


def topic_to_table(topic: str) -> str:
    """``kudu.call_center`` → ``call_center`` (SRC/package.scala:151)."""
    return topic.split(".")[-1]


def _materialize_for_fanout(df: DataFrame, max_workers: int | None) -> DataFrame:
    """Truncate the shared batch's lineage before a thread-pooled
    fan-out. Two reasons, one mechanism (eager ``localCheckpoint``):

    - THREAD SAFETY: the per-table threads each trigger optimization of
      plans embedding the caller's SHARED expression tree; Catalyst's
      constant folding evaluates expressions driver-side on the shared
      instances, and stateful evaluators (``StructsToJsonEvaluator``'s
      Jackson generator) are not thread-safe — observed as a flaky
      ``JsonGenerationException: Can not start an object`` when two
      tables plan concurrently over a ``to_json``-built batch. A
      checkpointed batch is a LogicalRDD scan: nothing left to fold.
    - COST: the batch is consumed once per (table, op); checkpointing
      parses/reads the source exactly once instead of per consumer —
      the same reason the reference persists its micro-batches (M1).

    Skipped for sequential fan-out (``max_workers in (None, 1)``):
    no concurrent planning, and single-table batches are the common
    case there."""
    if max_workers is not None and max_workers > 1:
        return df.localCheckpoint(eager=True)
    return df


def _parallel_by_table(work: list, fn, max_workers: int | None):
    """Run ``fn`` over independent per-table work items, concurrently
    when ``max_workers`` allows. Tables are independent single-writer
    targets (each write takes its own table lock), so commits to
    DIFFERENT tables may interleave freely while one table's timeline
    stays linear; Spark's scheduler overlaps the per-table jobs, which
    at many tables per batch removes the serial-commit bottleneck of the
    reference's own sequential loop (SRC/package.scala:148). Results
    come back in input order; the first failure propagates."""
    if not max_workers or max_workers <= 1 or len(work) <= 1:
        return [fn(w) for w in work]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(
        max_workers=min(max_workers, len(work))
    ) as pool:
        return list(pool.map(fn, work))


def fanout_batch(
    batch_df: DataFrame,
    registry: TableRegistry,
    created_ts_millis: int | None = None,
    max_workers: int | None = 4,
) -> list[str]:
    """One micro-batch of (topic, value) rows → per-table upserts.
    Returns the list of tables written (M4, SRC/package.scala:145-183).

    Scale note: the per-table loop is over the *handful of distinct
    topics in the batch* (driver-side, matches the reference); each
    table's parse+write is fully distributed, and the independent
    tables commit concurrently on a thread pool (``max_workers``;
    ``None``/1 = the reference's sequential order).
    """
    batch_df = _materialize_for_fanout(batch_df, max_workers)
    topics = [
        r[0] for r in batch_df.select("topic").distinct().collect()
    ]  # A3+M3, SRC/package.scala:148

    def _one(topic: str) -> str:
        table_name = topic_to_table(topic)
        target = registry.lake_table(table_name)
        one = (
            batch_df.filter(F.col("topic") == topic)  # F3 routing
            .select(F.col("value").cast("string").alias("json"))
        )
        schema = _parse_schema(registry, table_name, target)
        rows = (
            one.select(F.from_json("json", schema).alias("data"))
            .select("data.*")
            .withColumn("created_ts", created_ts_expr(created_ts_millis))
        )
        target.write(rows, op="upsert")  # PK filter inside write
        return table_name

    return _parallel_by_table(sorted(topics), _one, max_workers)


def _parse_schema(registry: TableRegistry, table_name: str, target: LakeTable):
    """Schema-on-target (logical schema minus the write-time stamp);
    registry-declared schema for tables with no commits yet."""
    from pyspark.sql import types as T

    if target.exists():
        schema = target.logical().schema
        return T.StructType(
            [f for f in schema.fields if f.name != "created_ts"]
        )
    declared = registry.spec(table_name).schema
    if declared is None:
        raise ValueError(
            f"table {table_name!r} has no commits and no declared schema; "
            "register TableSpec(schema=...) or seed the table first"
        )
    return T.StructType.fromDDL(declared)


def apply_changes_batch(
    parsed: DataFrame,
    registry: TableRegistry,
    created_ts_millis: int | None = None,
    batch_id: int | None = None,
    max_workers: int | None = 4,
) -> list[tuple[str, str]]:
    """Route a parsed Canal change batch (database, table,
    operation_type, row_json — the output of
    ``cdc.canal.parse_canal_df``) into lake tables by operation:
    insert→insert, upsert→upsert, delete→delete (the HudiOP mapping,
    ``SRC/cdc/CanalParser.scala:11-13``). The reference never wires its
    Canal parser into an entry point (SURVEY.md §0); this is that last
    mile on the engine's writer.

    Ops apply per table in insert → upsert → delete order within the
    batch. LIMITATION (documented): a delete-then-reinsert of the SAME
    key within ONE micro-batch resolves to deleted — cross-op ordering
    inside a batch is not defined by the envelope, and the shared
    ``created_ts`` stamp cannot arbitrate it. Producers needing that
    ordering must split such sequences across batches (the reference
    never wires its parser at all, so it has no stronger guarantee).
    Returns (table, op) pairs applied.

    ``batch_id`` (pass the foreachBatch epoch id): arms the engine's
    exactly-once checkpoint for the non-idempotent ``insert`` op — a
    replayed batch after a crash finds ``cdc:{table}`` already at this
    batch_id and skips the double-insert. Upsert/delete replays are
    naturally idempotent and carry no checkpoint, so a replay that was
    interrupted mid-batch still completes its remaining tables.
    """
    parsed = _materialize_for_fanout(parsed, max_workers)
    combos = [
        (r["table"], r["operation_type"])
        for r in parsed.select("table", "operation_type").distinct().collect()
    ]
    op_order = {"insert": 0, "upsert": 1, "delete": 2}
    by_table: dict[str, list[str]] = {}
    for table_name, op in sorted(
        combos, key=lambda c: (c[0], op_order.get(c[1], 9))
    ):
        by_table.setdefault(table_name, []).append(op)

    def _apply_table(table_name: str) -> list[tuple[str, str]]:
        # ops for ONE table stay strictly ordered (insert→upsert→delete)
        # on one thread; only distinct tables run concurrently
        out: list[tuple[str, str]] = []
        target = registry.lake_table(table_name)
        for op in by_table[table_name]:
            schema = _parse_schema(registry, table_name, target)
            # Canal serializes every column value as a STRING
            # (List[Map[String,String]], SRC/cdc/model/CanalDataModel.scala:6)
            # — parse the row as a string map and cast to the target types
            rows = (
                parsed.filter(
                    (F.col("table") == table_name)
                    & (F.col("operation_type") == op)
                )
                .select(
                    F.from_json("row_json", "MAP<STRING,STRING>").alias("m")
                )
                .select(
                    *[
                        F.col("m")[f.name].cast(f.dataType).alias(f.name)
                        for f in schema.fields
                    ]
                )
                .withColumn("created_ts", created_ts_expr(created_ts_millis))
            )
            cp = None
            if op == "insert" and batch_id is not None:
                cp = {"source_id": f"cdc:{table_name}", "batch_id": batch_id}
            committed = target.write(rows, op=op, checkpoint=cp)
            if committed is not None:
                out.append((table_name, op))
        return out

    per_table = _parallel_by_table(
        sorted(by_table), _apply_table, max_workers
    )
    return [pair for group in per_table for pair in group]


def parse_keys_from_ddl(ddl: str) -> TableSpec:
    """Port of ``getPrimaryAndPartitionKey`` (SRC/package.scala:85-115):
    extract ``PRIMARY KEY (...)`` and the Kudu ``PARTITIONED BY ...
    RANGE (...)`` column out of a ``SHOW CREATE TABLE`` DDL string, and
    remove the partition key from the record key exactly as there (the
    reference's single-partition-key limitation — its own ``todo:
    multiple partition key`` — is kept for behavioral parity). The
    registry path (``TableRegistry.register``) is the native engine API;
    this shim exists for callers migrating off the Impala-DDL channel."""
    pk_marker = "PRIMARY KEY ("
    pk_idx = ddl.find(pk_marker)
    primary = ""
    if pk_idx > 0:
        end = ddl.index(")", pk_idx + len(pk_marker))
        primary = ddl[pk_idx + len(pk_marker):end].strip()
    part_marker = "PARTITIONED BY ("
    part_key = ""
    part_at = ddl.find(part_marker)
    if part_at >= 0:
        part_str = ddl[part_at + len(part_marker):]
        r_idx = part_str.find("RANGE (")
        if r_idx > 0:
            end = part_str.index(")", r_idx + len("RANGE ("))
            part_key = part_str[r_idx + len("RANGE ("):end].strip()
    keys = [
        k.strip()
        for k in primary.split(",")
        if k.strip() and k.strip().lower() != part_key.lower()
    ]
    return TableSpec(
        record_keys=keys,
        partition_keys=[part_key] if part_key else [],
    )


def jdbc_show_create_table(
    spark,
    url: str,
    table: str,
    driver: str = "com.cloudera.impala.jdbc41.Driver",
    properties: dict | None = None,
) -> str:
    """Fetch a table's DDL over JDBC — the live half of the S8 channel
    (``SRC/package.scala:118-141`` ``getImpalaDDL``: open a JDBC
    connection, run ``SHOW CREATE TABLE``, read the single-row result).
    Spark-first shape: ``spark.read.jdbc`` with the statement pushed as
    a derived-table query, so the driver JVM — not Python — owns the
    connection, and cluster-side credential plumbing (JCEKS, instance
    profiles) applies unchanged. The result is one row/one column; feed
    it to :func:`parse_keys_from_ddl` and ``TableRegistry.register`` to
    complete the reference's metadata bootstrap:

        ddl = jdbc_show_create_table(spark, url, "db.events")
        registry.register("events", parse_keys_from_ddl(ddl))

    Sandbox note: no Impala/JDBC endpoint exists in the test
    environment, so tests exercise this through a stub reader with the
    same contract (``tests/test_cli.py``); the call path itself is the
    stock DataFrameReader JDBC API.
    """
    props = {"driver": driver, **(properties or {})}
    # SHOW CREATE TABLE can't be wrapped in a subquery; Impala/Hive
    # accept it via the JDBC `query`/dbtable passthrough only on some
    # drivers, so issue it as the dbtable-level statement the reference
    # uses and fall back to a plain passthrough query option.
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", f"SHOW CREATE TABLE {table}")
        .options(**props)
        .load()
    )
    rows = df.collect()  # 1 row × 1 col: metadata-sized, M3-style
    if not rows or len(rows[0]) == 0:
        raise RuntimeError(f"SHOW CREATE TABLE {table} returned no DDL")
    return str(rows[0][0])


def register_from_jdbc(
    registry: TableRegistry,
    url: str,
    tables: list[str],
    fetch=None,
    **jdbc_kwargs,
) -> dict[str, TableSpec]:
    """Bootstrap a :class:`TableRegistry` from live JDBC metadata — the
    reference's startup loop (``SRC/MSK2Hudi.scala`` resolves every
    topic's table DDL before streaming starts). ``fetch`` overrides the
    DDL fetcher (tests inject a stub; production uses
    :func:`jdbc_show_create_table`). Returns the parsed specs by table.
    """
    fetch = fetch or (
        lambda table: jdbc_show_create_table(
            registry.spark, url, table, **jdbc_kwargs
        )
    )
    out: dict[str, TableSpec] = {}
    for table in tables:
        spec = parse_keys_from_ddl(fetch(table))
        registry.register(table, spec)
        out[table] = spec
    return out
