"""Every queries() entry must hash-match its oracle_sql() — the local
mirror of the driver's t2 correctness gate (run here at sf0.001)."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches, duck_con
from vectorsearch_spark import workload


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(workload.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, con, name):
    oracles = workload.oracle_sql()
    df = workload.queries()[name](spark, sf_dir)
    if name not in oracles:
        # rows-only contract (approximate operators): non-empty + stable schema
        assert df.count() > 0, f"{name}: rows-only query returned no rows"
        return
    assert_matches(df, con, oracles[name], name)
