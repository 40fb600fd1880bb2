"""Every registered query with an oracle must match DuckDB row-for-row.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json) so
regressions surface locally before a round ends.
"""

from __future__ import annotations

import pytest

from crypto_prediction_etl_spark.plans import registry

from .oracle import compare_query

registry.load_all()
NAMES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in registry.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name
