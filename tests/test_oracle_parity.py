"""Every queries() entry vs its DuckDB oracle at sf0.001 — the local
pre-flight for the driver's CORRECTNESS gate (SURVEY.md §5.5)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_connection

SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from fischer_spark.queries import get_oracles, get_queries

    q = get_queries()
    o = get_oracles()
    return q, o


QUERIES, ORACLES = _registry()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_all_queries_have_entries():
    assert QUERIES, "query registry is empty"
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    errs = compare(QUERIES[name](spark, SF_DIR), duck, ORACLES[name], name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    # non-SQL-expressible ops: weaker rows-only sanity
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
