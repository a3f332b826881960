"""The seven reference entry points (README.md:5-13) re-expressed on the
engine's lakehouse kernel."""

from emr_hudi_example_spark.pipelines.bootstrap import bootstrap_parquet
from emr_hudi_example_spark.pipelines.dwd2dm import dm_init, dm_increment
from emr_hudi_example_spark.pipelines.kds2lake import dms2lake_batch, run_kds2lake
from emr_hudi_example_spark.pipelines.lake2stream import lake_to_json_lines
from emr_hudi_example_spark.pipelines.log2lake import log2lake_batch, run_log2lake
from emr_hudi_example_spark.pipelines.multitable import TableRegistry, fanout_batch
from emr_hudi_example_spark.pipelines.ods2dwd import dwd_increment, init_cursor
from emr_hudi_example_spark.pipelines.stream2ods import run_stream2ods, stream2ods_batch

__all__ = [
    "bootstrap_parquet",
    "log2lake_batch",
    "run_log2lake",
    "stream2ods_batch",
    "run_stream2ods",
    "dms2lake_batch",
    "run_kds2lake",
    "init_cursor",
    "dwd_increment",
    "dm_init",
    "dm_increment",
    "lake_to_json_lines",
    "TableRegistry",
    "fanout_batch",
]
