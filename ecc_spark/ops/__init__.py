"""Driver-contract operators (SURVEY.md §2) + training-data-pipeline ops.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL; absent key ⇒ rows-only check).
``ecc_spark.registry`` merges them for ``__spark_entry__``.
"""
