"""Runnable entry points — one per reference program, same flag surface.

Reference submit recipes (README.md) map onto these mains:

=================  ===========================================  =====================================
Reference program  Engine command                               Pipeline
=================  ===========================================  =====================================
``Log2Hudi``       ``python -m emr_hudi_example_spark.cli.log2hudi``    ``pipelines.log2lake``
``MSK2Hudi``       ``python -m emr_hudi_example_spark.cli.msk2hudi``    ``pipelines.stream2ods``
``KDS2Hudi``       ``python -m emr_hudi_example_spark.cli.kds2hudi``    ``pipelines.kds2lake``
``Hudi2MSK``       ``python -m emr_hudi_example_spark.cli.hudi2msk``    ``pipelines.lake2stream``
``ODS2DWD``        ``python -m emr_hudi_example_spark.cli.ods2dwd``     ``pipelines.ods2dwd``
``DWD2DM``         ``python -m emr_hudi_example_spark.cli.dwd2dm``      ``pipelines.dwd2dm``
``Hive2Hudi``      ``python -m emr_hudi_example_spark.cli.hive2hudi``   ``pipelines.bootstrap``
=================  ===========================================  =====================================

Flags mirror ``SRC/conf/Config.scala:43-89`` (see ``_conf.base_parser``).
Each module exposes ``main(argv=None, spark=None)`` so tests drive it
in-process with a shared session; ``python -m`` builds its own.
"""
