"""Merge all operator modules into the driver-contract registries."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from ecc_spark.ops import analytics, relational

    mods = [relational, analytics]
    for name in (
        "textops", "dedup", "similarity", "multimodal", "pipeline_ops",
        "crawl_ops", "advanced", "bucketing", "corpus_ops",
    ):
        try:
            mod = __import__(f"ecc_spark.ops.{name}", fromlist=[name])
            mods.append(mod)
        except ImportError:
            pass
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for k, v in mod.QUERIES.items():
            assert k not in out, f"duplicate query key {k}"
            out[k] = v
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
