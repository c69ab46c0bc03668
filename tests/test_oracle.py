"""Local pre-submit copy of the driver's DuckDB oracle check (SURVEY §5.4).

Runs every QUERIES entry with an ORACLE twin at sf0.001 (fast; the
driver uses sf0.01) and compares row count, column names, and
order-insensitive values (floats to 1e-9 rel tol).
"""

import math
import os

import duckdb
import pytest

import ocrflow.dataops  # noqa: F401 — registers dataops queries
import ocrflow.multimodal  # noqa: F401 — registers mm_* queries
from ocrflow.queries import ORACLE, QUERIES
from ocrflow.streaming import STREAM_QUERIES

QUERIES = {**QUERIES, **STREAM_QUERIES}  # oracled stream_* keys join the gate

SF_DIR = os.environ.get("OCRFLOW_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{name}.parquet')")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat().replace("+00:00", "")
    return v


def _rows_sorted(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=repr)


def _close(a, b):
    if isinstance(a, float) and isinstance(b, (float, int)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_rows = sdf.collect()
    s_cols = sdf.columns

    rel = duck.execute(ORACLE[name])
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}")
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    # the driver sweep flags empty results as issues — catch them here
    # too (a vacuously-true oracle verifies nothing)
    assert len(s_rows) > 0, f"{name}: empty result at {SF_DIR}"

    s_sorted = _rows_sorted(s_cols, [tuple(r) for r in s_rows])
    d_sorted = _rows_sorted(d_cols, d_rows)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for a, b in zip(sr, dr):
            assert _close(a, b), (
                f"{name}: value mismatch at sorted row {i}: spark={sr} duck={dr}")


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLE)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name
