"""robots.txt gating: disallow-rule anti-join on (host, path-prefix).

The rules table is tiny relative to the frontier (one row per
host×prefix) → broadcast. Prefix match is a theta condition inside the
join; disallowed URLs are dropped at ENQUEUE time so the frontier never
accumulates unfetchable rows (they are not added to the seen set either —
matching the pure-Python reference crawler)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_robots(candidates: DataFrame, robots: DataFrame | None) -> DataFrame:
    """candidates(url, host, ...) minus rows matching a disallow rule.
    Path = everything after scheme://host[:port]."""
    if robots is None:
        return candidates
    rules = robots.filter(~F.col("allow")).select(
        F.col("host").alias("r_host"), F.col("path_prefix")
    )
    path = F.regexp_replace("url", r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", "")
    cand = candidates.withColumn("_path", F.when(path == "", "/").otherwise(path))
    hit = (cand["host"] == rules["r_host"]) & cand["_path"].startswith(
        rules["path_prefix"]
    )
    return cand.join(F.broadcast(rules), hit, "left_anti").drop("_path")
