"""Every catalog query with an oracle must match DuckDB at sf0.01 —
the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from emr_hudi_example_spark import all_queries as catalog
from tests.conftest import SF_CORRECT
from tests.harness import compare


@pytest.mark.parametrize("name", sorted(catalog.ORACLE))
def test_oracle_match(spark, name):
    compare(spark, name, catalog.Q[name], catalog.ORACLE[name], SF_CORRECT)


def test_all_queries_return_rows(spark):
    for name, fn in catalog.Q.items():
        df = fn(spark, SF_CORRECT)
        assert df.columns, name


def test_no_container_columns_in_graded_output(spark):
    """The driver's pandas canonicalizer cannot hash list/map/struct
    cells (r4's only red row, sim_quantize_int8, was an array<int>
    output). Gate it at the schema level for every oracle-gated query:
    graded outputs must be scalar columns only."""
    from pyspark.sql import types as T

    bad = (T.ArrayType, T.MapType, T.StructType)
    for name in catalog.ORACLE:
        df = catalog.Q[name](spark, SF_CORRECT)
        for field in df.schema.fields:
            assert not isinstance(field.dataType, bad), (
                f"{name}.{field.name} is {field.dataType.simpleString()}: "
                "driver canonicalizer cannot hash container cells — "
                "serialize with concat_ws(',') / array_to_string(',')"
            )


def test_harness_canon_rejects_container_cells():
    """The local gate must be at least as strict as the driver's: a
    list-typed cell raises instead of silently stringifying (which
    masked the r4 driver error)."""
    from tests.harness import _canon

    for v in ([1, 2], (1, 2), {1}, {"a": 1}):
        with pytest.raises(AssertionError, match="container-typed"):
            _canon(v)
    assert _canon("1,2") == "1,2"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
