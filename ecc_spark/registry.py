"""Merge all operator modules into the driver-contract registries."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Every module here is part of the driver contract: if one fails to import,
# its oracle queries silently vanish from the FIRST-50 window and the driver
# reports "missing keys" instead of the real traceback.  Fail loudly instead —
# a broken ops module must surface as an ImportError naming the module.
_OP_MODULES = (
    "relational", "analytics", "textops", "dedup", "similarity", "multimodal",
    "pipeline_ops", "crawl_ops", "advanced", "bucketing", "corpus_ops",
    "quality", "bpe", "dsir", "c4", "interleaved", "tfidf",
)


def _modules():
    import importlib

    mods = []
    for name in _OP_MODULES:
        try:
            mods.append(importlib.import_module(f"ecc_spark.ops.{name}"))
        except Exception as exc:
            raise ImportError(
                f"ops module ecc_spark.ops.{name} failed to import; its "
                f"registry queries would silently disappear from the driver "
                f"contract: {exc!r}"
            ) from exc
    return mods


# The external correctness driver only checks the FIRST 50 keys of
# ``queries()`` in registration order.  Every oracle-backed query must land
# inside that window or its hard correctness signal silently disappears
# (round-3 lesson: 9 oracle-backed ops fell past the window).  We therefore
# emit oracle-backed keys first, rows-only keys after, preserving module
# registration order within each group.  tests/test_registry.py pins the
# invariant (oracle-backed count <= 50 and all inside the window).
DRIVER_WINDOW = 50


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for k, v in mod.QUERIES.items():
            assert k not in merged, f"duplicate query key {k}"
            merged[k] = v
    oracles = oracle_sql()
    out = {k: v for k, v in merged.items() if k in oracles}
    out.update({k: v for k, v in merged.items() if k not in oracles})
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
