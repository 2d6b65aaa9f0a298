"""Driver-contract conformance: every queries() entry runs; every ★ entry
matches its DuckDB oracle at sf0.001 (the external driver repeats this at
sf0.01 — tools/check_oracle.py is the shared implementation)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from ecc_spark.ops.tables import TABLES
from tools.check_oracle import value_hash

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable schema


ALL_KEYS = sorted(entrymod.queries())


@pytest.mark.parametrize("key", ALL_KEYS)
def test_query_vs_oracle(spark, ddb, key):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sdf = qs[key](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if key not in oracles:
        return  # rows-only: must not raise
    cur = ddb.execute(oracles[key])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), f"rowcount spark={len(srows)} oracle={len(orows)}"
    assert sorted(scols) == sorted(ocols)
    assert value_hash(srows, scols) == value_hash(orows, ocols)
