"""Local replica of the driver's DuckDB-oracle gate: every queries() entry
must match its oracle_sql() on row count, column names, and values
(order-insensitive), at sf0.01.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Render a value exactly as the driver's value-hash sees it: no
    rounding, int vs float distinction preserved (DuckDB HUGEINT comes
    through Arrow as float64 and must NOT silently equal Spark's int).
    """
    if v is None:
        return "\0null"
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return str(v)


def _rowset(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    if sql is None:
        assert sdf.count() >= 0  # weaker rows-only check
        return
    cols = sorted(sdf.columns)
    spark_rows = [
        tuple(row[c] for c in cols) for row in sdf.collect()
    ]
    # fetch through Arrow, like the driver: HUGEINT -> float64 (so an
    # uncast sum(BIGINT) oracle mismatches Spark's int, exactly as the
    # driver's hash does), BIGINT-with-nulls stays int64
    tbl = ddb.execute(sql).fetch_arrow_table()
    oracle_cols = list(tbl.column_names)
    assert sorted(oracle_cols) == cols, (
        f"{name}: column mismatch spark={cols} oracle={sorted(oracle_cols)}"
    )
    pyrows = tbl.to_pylist()
    oracle_rows = [tuple(d[c] for c in cols) for d in pyrows]
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    srows, orows = _rowset(spark_rows), _rowset(oracle_rows)
    mismatches = [
        (s, o) for s, o in zip(srows, orows) if s != o
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
