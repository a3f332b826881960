"""Aggregated query registry: importing this module registers every
catalog entry (relational core, lakehouse semantics, pipelines,
extensions) into the shared Q/ORACLE dicts."""

from __future__ import annotations

import emr_hudi_example_spark.catalog as _catalog  # noqa: F401  (registers)
import emr_hudi_example_spark.catalog_lake as _lake  # noqa: F401
import emr_hudi_example_spark.catalog_ext as _ext  # noqa: F401
import emr_hudi_example_spark.catalog_pipelines as _pipes  # noqa: F401
from emr_hudi_example_spark.catalog import ORACLE, Q

__all__ = ["Q", "ORACLE"]
