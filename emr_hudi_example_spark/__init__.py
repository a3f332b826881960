"""PySpark-native analytics engine with the capabilities of
xudalei1977/emr-hudi-example (a Spark+Hudi streaming-lakehouse pipeline
suite), rebuilt Spark-first with zero Hudi dependency.

Layout
------
- ``session``    SparkSession factory (port of SRC/util/SparkHelper.scala)
- ``functions``  scalar/column helpers + JSON schema inference
- ``operators``  relational operator surface (SURVEY.md §2.3–2.8) and the
                 LLM-data-pipeline extensions (dedup / similarity / text /
                 multimodal)
- ``lake``       the lakehouse kernel: ``LakeTable`` — keyed upsert /
                 delete / insert over partitioned parquet + a commit
                 timeline with snapshot & incremental reads
- ``cdc``        Canal (MySQL binlog) and DMS/Kinesis CDC envelope parsing
- ``pipelines``  the seven reference entry points re-expressed on the
                 kernel (log2lake, stream2ods, ods2dwd, dwd2dm,
                 lake2stream, bootstrap, multi-table CDC fan-out)
- ``streaming``  Structured-Streaming helpers (file-stream test sources,
                 foreachBatch wiring)

All relational execution is delegated to Spark SQL / Catalyst — exactly as
the reference delegates to Spark — so predicate pushdown, column pruning,
broadcast joins, AQE and whole-stage codegen come for free.
"""

__version__ = "0.1.0"
