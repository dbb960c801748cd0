"""Run every oracle-backed query against DuckDB at sf0.001 — a local mirror
of the driver's correctness gate."""

import pytest

from mongo_arrow_spark.battery import ORACLES, QUERIES
from mongo_arrow_spark.compare import compare, duckdb_connect

from conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    return duckdb_connect(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, con, name, tables):
    result = compare(QUERIES[name](spark, SF_DIR), con, ORACLES[name])
    assert result["count_match"], f"{name} rows: {result['rows']}"
    assert result["cols_match"], (
        f"{name} cols: {result['spark_cols']} vs {result['duck_cols']}"
    )
    assert result["values_match"], f"{name}: {result}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name, tables):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs without error, schema resolvable
    assert len(df.schema.fields) > 0


def test_every_oracle_in_driver_grading_window():
    """The driver grades only the first 50 registered queries: every
    oracle-backed entry must sit inside that window (rows-only at the
    tail). Registering a 51st oracle-backed query fails here, not
    silently in the next round's CORRECTNESS file."""
    names = list(QUERIES)
    assert len(ORACLES) <= 50, "too many oracle-backed queries for the window"
    outside = [n for n in ORACLES if n not in set(names[:50])]
    assert not outside, f"oracle-backed queries outside graded window: {outside}"
    assert set(ORACLES) <= set(QUERIES)
