"""ecc_spark — a from-scratch PySpark-native analytics engine with the
query and data-processing capabilities of TobiasUhmann/entity-context-crawler.

Not a port: the reference (1.2 kLoC of imperative Python + SQLite, surveyed
in /root/repo/SURVEY.md) defines WHAT is computed — entity-context
extraction over a document corpus, a URL-seen set, crawl ordering — and
this package re-expresses it as declarative PySpark DataFrame plans plus a
small vectorized pandas-UDF surface, designed for 100 TB / 10^10-row scale:

- ``ecc_spark.matches``   — phase-1 (build-matches) pipeline
- ``ecc_spark.contexts``  — phase-2 (build-contexts) pipeline
- ``ecc_spark.crawl``     — URL frontier + scheduler (seen-set, politeness,
                            robots, checkpoint/resume)
- ``ecc_spark.ops``       — relational / dedup / similarity / text-analysis
                            operators exposed through the driver contract
"""

__version__ = "0.1.0"
