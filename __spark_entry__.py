"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query on /root/testdata/sf0.001 (smoke check).
queries()     — one entry per implemented operator (SURVEY.md §2 keys).
oracle_sql()  — DuckDB-equivalent SQL per ★ query; ◦ queries omitted
                (rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the phase-1/phase-2 shape in one plan — seed semi-join,
    context-window join, per-entity top-k (SURVEY.md §7.1 step 2)."""
    from ecc_spark.ops.analytics import tpch_q3_topk

    return tpch_q3_topk(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ecc_spark.registry import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from ecc_spark.registry import oracle_sql as _o

    return _o()
