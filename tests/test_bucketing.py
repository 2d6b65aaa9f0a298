"""Bucketed co-located join: no Exchange in the join plan, same results."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from ecc_spark.ops.bucketing import bucketed_join, ensure_bucketed

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark):
    li_name, o_name = ensure_bucketed(spark, SF)
    li = spark.table(li_name)
    o = spark.table(o_name)
    j = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey", "o_totalprice")
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces the shuffle

    # the plain (non-bucketed) join DOES shuffle — the comparison point
    li_raw = spark.read.parquet(f"{SF}/lineitem.parquet")
    o_raw = spark.read.parquet(f"{SF}/orders.parquet")
    plain = _plan(
        li_raw.hint("merge").join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey)
    )
    assert "Exchange" in plain


def test_bucketed_join_results_match_plain(spark):
    got = {tuple(r) for r in bucketed_join(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(F.col("o_orderstatus") == "O")
    want = {
        tuple(r)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
        .collect()
    }
    assert got == want
