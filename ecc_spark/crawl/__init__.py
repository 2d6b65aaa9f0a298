"""URL-frontier crawl engine (BASELINE.json north rule).

The reference's crawl state is degenerate (SURVEY.md §1.4): the dump IS
the frontier, the pages-table PK IS the seen set, dump order IS the crawl
order. This package scales each to 10^10-URL shape:

- canonical.py    URL canonicalization (pure column expressions)
- fetchsim.py     deterministic fetch simulator (sandbox stand-in for HTTP)
- checkpoint.py   snapshot tables (parquet + manifest; Iceberg-style commits)
- seen.py         exact anti-join seen set + partitioned bloom accelerator
- politeness.py   per-host budgets via two-phase salted top-k
- frontier.py     the wave loop: expand → gate → schedule → fetch → commit
"""
