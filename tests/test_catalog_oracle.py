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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
