"""Line-level corpus hygiene: RefinedWeb/MassiveText line dedup + C4 rules.

Two standard LLM-pretraining cleaning stages the engine did not yet have:

- ``dedup_lines``: corpus-WIDE exact line deduplication (RefinedWeb,
  arXiv:2306.01116 §G.2; MassiveText "repetitious lines", Gopher
  arXiv:2112.11446 A1.1).  A line duplicated anywhere in the corpus keeps
  one canonical occurrence (or none — boilerplate mode) and every other
  copy is cut out of its document in place.  Unlike the per-doc
  repetition signals in ``corpus_ops.repetition_quality`` this one is
  corpus-aware: the duplicate table is a global aggregate.
- ``c4_clean``: the C4 heuristic ruleset (Raffel et al.,
  arXiv:1910.10683 §2.2) — keep only lines ending in terminal
  punctuation with >= 5 words and no "javascript"; drop whole documents
  with < 3 surviving lines, any "lorem ipsum", or a "{".

Scale notes (100-TB lens):

- ``dedup_lines`` never puts line TEXT into a shuffle: lines are
  projected to a 128-bit double-xxhash64 key immediately after the
  row-local posexplode, the global occurrence table is ONE map-side-
  combined hash-agg over those keys (uniform by construction), and the
  drop decisions flow back as (doc_id, line_no) pairs.  The only
  text-carrying exchange is the final doc_id equi-join that delivers
  each document its (usually tiny) drop-list — uniform keys, and AQE
  broadcasts the drop-list side whenever it is small.
- ``c4_clean`` is 100% row-local (split / filter / concat lambdas in
  whole-stage codegen): zero shuffles, composes with any partitioning.

The reference has no line-level stage (its unit is the sentence window,
cmd/build_matches_db.py:300-321); both ops are the brief's
"training-data pipeline" extension over the ``documents`` table.

Driver-contract queries are rows-only ◦ (the 50-slot oracle window is
full); tests/test_c4.py pins both against pure-Python mirrors on the
real sf0.001 corpus plus crafted edge fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecc_spark.ops.tables import load

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

# Second independent 64-bit hash: xxhash64 over a domain-separated input.
# Two lines collide only if BOTH hashes agree (~2^-128) — at 10^12 corpus
# lines the expected number of false merges is ~10^-14, so exact-match
# verification against line text (which would drag text into a shuffle)
# buys nothing.
_H2_PREFIX = "\x01ecc-line\x01"


def dedup_lines(
    docs: DataFrame,
    *,
    keep: str = "first",
    min_dup: int = 2,
) -> DataFrame:
    """Corpus-wide exact line dedup over (doc_id:string, lines:array<string>).

    keep="first": the canonical occurrence — minimum (doc_id, line_no),
    lexicographic on doc_id — of every line duplicated >= min_dup times
    survives; all other copies are removed from their documents.
    keep="none": every copy of a line duplicated >= min_dup times is
    removed (RefinedWeb's treatment of boilerplate/navigation lines).

    Returns one row per input document:
      (doc_id, lines, n_lines, n_dropped, dup_line_fraction,
       dup_char_fraction)
    where ``lines`` is the surviving array (original order), n_lines the
    ORIGINAL line count, and the fractions are duplicate-removed share of
    the original lines/characters (MassiveText's doc-level dup signals,
    here exact byproducts of the same pass).  Deterministic under any
    partitioning.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if min_dup < 2:
        raise ValueError(f"min_dup must be >= 2, got {min_dup}")

    # Row-local explode, then drop text before anything wide: each line
    # becomes (doc_id, line_no, h1, h2, n_chars).
    hashed = docs.select(
        "doc_id", F.posexplode("lines").alias("line_no", "line")
    ).select(
        "doc_id",
        "line_no",
        F.xxhash64("line").alias("h1"),
        F.xxhash64(F.concat(F.lit(_H2_PREFIX), F.col("line"))).alias("h2"),
        F.length("line").alias("n_chars"),
    )

    # ONE global hash-agg: occurrence count + canonical keeper per line
    # key.  Map-side combine collapses per-partition repeats; keys are
    # hashes, so the shuffle is uniform even when one boilerplate line
    # dominates the corpus.
    occ = hashed.groupBy("h1", "h2").agg(
        F.count(F.lit(1)).alias("c"),
        F.min(F.struct("doc_id", "line_no")).alias("keeper"),
    )
    dup_keys = occ.filter(F.col("c") >= min_dup).select("h1", "h2", "keeper")

    drops = hashed.join(dup_keys, ["h1", "h2"])
    if keep == "first":
        drops = drops.filter(
            (F.col("doc_id") != F.col("keeper.doc_id"))
            | (F.col("line_no") != F.col("keeper.line_no"))
        )
    drop_list = drops.groupBy("doc_id").agg(
        F.collect_set("line_no").alias("drop_nos"),
        F.count(F.lit(1)).alias("n_dropped"),
        F.sum("n_chars").alias("dropped_chars"),
    )

    # The one text-carrying exchange: deliver each doc its drop-list.
    # Uniform doc_id keys; AQE broadcasts drop_list when it is small.
    total_chars = F.aggregate(
        "lines", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    # kept indices via array_except (hash-set based, O(n_lines +
    # n_dropped)) rather than a per-line array_contains scan, which
    # would be O(n_lines * n_dropped) on exactly the boilerplate-heavy
    # documents this op targets; array_except preserves the (sorted)
    # order of its left argument, and F.get is O(1) per index
    kept_idx = F.when(
        F.size("lines") > 0,
        F.array_except(
            F.sequence(F.lit(0), F.size("lines") - 1),
            F.coalesce("drop_nos", F.array().cast("array<int>")),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        docs.join(drop_list, "doc_id", "left")
        .select(
            "doc_id",
            F.transform(kept_idx, lambda i: F.get("lines", i)).alias("kept"),
            F.size("lines").alias("n_lines"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            total_chars.alias("total_chars"),
            F.coalesce("dropped_chars", F.lit(0)).alias("dropped_chars"),
        )
        .select(
            "doc_id",
            F.col("kept").alias("lines"),
            "n_lines",
            "n_dropped",
            F.when(F.col("n_lines") > 0, F.col("n_dropped") / F.col("n_lines"))
            .otherwise(F.lit(0.0))
            .alias("dup_line_fraction"),
            F.when(
                F.col("total_chars") > 0,
                F.col("dropped_chars") / F.col("total_chars"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_char_fraction"),
        )
    )


_TERMINAL_RE = r'[.!?"”]\s*$'


def c4_clean(
    docs: DataFrame,
    *,
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """The C4 cleaning ruleset (arXiv:1910.10683 §2.2) over
    (doc_id:string, lines:array<string>).  Entirely row-local:

    line rules — a line survives iff it ends in terminal punctuation
    (. ! ? " ”), has >= min_words_per_line whitespace words, and does not
    contain "javascript" (case-insensitive);
    doc rules — a document survives iff it has >= min_lines surviving
    lines, no "lorem ipsum" (case-insensitive) anywhere, and no "{".

    Returns every input doc with its verdict (filter on ``keep`` to
    materialize the cleaned corpus):
      (doc_id, lines, n_lines_in, n_lines_kept, keep)
    """

    def line_ok(ln: Column) -> Column:
        return (
            ln.rlike(_TERMINAL_RE)
            & (F.size(F.split(F.trim(ln), r"\s+")) >= min_words_per_line)
            & ~F.lower(ln).contains("javascript")
        )

    full = F.concat_ws("\n", "lines")
    kept = F.filter("lines", line_ok)
    return docs.select(
        "doc_id",
        kept.alias("kept"),
        F.size("lines").alias("n_lines_in"),
        full.alias("full"),
    ).select(
        "doc_id",
        F.col("kept").alias("lines"),
        "n_lines_in",
        F.size("kept").alias("n_lines_kept"),
        (
            (F.size("kept") >= min_lines)
            & ~F.lower("full").contains("lorem ipsum")
            & ~F.col("full").contains("{")
        ).alias("keep"),
    )


# -- deterministic line derivation for the driver corpus ----------------
#
# The synthetic ``documents`` table is a single-line word stream (no
# newlines, no punctuation), so the contract queries derive "lines"
# deterministically: consecutive 3-token groups.  At sf0.001 that yields
# ~9k lines with ~1.4k duplicated keys — the dedup is non-vacuous.  The
# derivation is a pure function of the table (mirrored with str.split in
# tests), so results are engine- and partitioning-independent.

_LINES_EXPR = """
CASE WHEN size(__toks) >= 3 THEN
  transform(sequence(0, cast(size(__toks)/3 as int) - 1),
            i -> concat_ws(' ', slice(__toks, i*3 + 1, 3)))
ELSE array() END
"""


def _doc_lines(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.split("text", " ").alias("__toks"),
        )
        .select("doc_id", F.expr(_LINES_EXPR).alias("lines"))
    )


def line_dedup_query(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only ◦: corpus-wide line dedup of the derived 3-token lines.
    Output fingerprint per doc: counts, dup fractions, and a crc32 of the
    surviving text (stable across engines/partitionings)."""
    out = dedup_lines(_doc_lines(spark, sf), keep="first")
    return out.select(
        "doc_id",
        "n_lines",
        "n_dropped",
        F.round("dup_line_fraction", 4).alias("dup_line_fraction"),
        F.round("dup_char_fraction", 4).alias("dup_char_fraction"),
        F.crc32(F.encode(F.concat_ws("\n", "lines"), "utf-8")).alias(
            "kept_crc"
        ),
    )


def c4_clean_query(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only ◦: C4 ruleset over deterministically "dirtied" derived
    lines — the synthetic corpus has no punctuation, so each rule is
    exercised via crc32-keyed mutations (mirrored exactly in tests):
    terminal '.' appended unless crc32(line)%4==0; ' javascript' appended
    when crc32(line)%17==0; a '{' line appended when crc32(doc_id)%23==0;
    a 'lorem ipsum dolor.' line when crc32(doc_id)%29==0."""
    lines = _doc_lines(spark, sf)
    crc = lambda c: F.crc32(F.encode(c, "utf-8"))  # noqa: E731
    dirty = F.transform(
        "lines",
        lambda ln: F.concat(
            ln,
            F.when(crc(ln) % 17 == 0, F.lit(" javascript")).otherwise(
                F.lit("")
            ),
            F.when(crc(ln) % 4 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    dirtied = lines.select(
        "doc_id",
        F.concat(
            dirty,
            F.when(crc(F.col("doc_id")) % 23 == 0, F.array(F.lit("{"))).otherwise(
                F.array().cast("array<string>")
            ),
            F.when(
                crc(F.col("doc_id")) % 29 == 0,
                F.array(F.lit("lorem ipsum dolor.")),
            ).otherwise(F.array().cast("array<string>")),
        ).alias("lines"),
    )
    out = c4_clean(dirtied, min_words_per_line=3)
    return out.select(
        "doc_id",
        "n_lines_in",
        "n_lines_kept",
        "keep",
        F.crc32(F.encode(F.concat_ws("\n", "lines"), "utf-8")).alias(
            "kept_crc"
        ),
    )


QUERIES.update({"line_dedup": line_dedup_query, "c4_clean": c4_clean_query})


# ------------------------------------------------------- Gopher rules

_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    docs: DataFrame,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al.,
    arXiv:2112.11446 Table A1) over (doc_id, lines:array<string>) —
    completing the rule-filter family next to the C4 set (c4_clean) and
    the per-doc repetition signals (corpus_ops.repetition_quality):

    word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; '#' AND '...' symbol-to-word
    ratios EACH <= max_symbol_ratio (the paper applies the threshold per
    symbol, not to their sum); lines starting with a bullet <=
    max_bullet_frac; lines ending with an ellipsis <= max_ellipsis_frac;
    words containing an alphabetic char >= min_alpha_word_frac;
    >= min_stopword_hits distinct stopwords present.

    100% row-local (split/filter/aggregate lambdas in whole-stage
    codegen): zero shuffles, composes with any partitioning.  Returns
    every doc with its signals + per-rule verdict AND overall ``keep``.
    """
    full = F.concat_ws("\n", "lines")
    words = F.filter(F.split(full, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.length(full) - F.length(F.replace(full, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(full) - F.length(F.replace(full, F.lit("..."), F.lit("")))
    ) / 3 + (
        F.length(full) - F.length(F.replace(full, F.lit("…"), F.lit("")))
    )
    n_lines = F.size("lines")
    # explicit whitespace class [ \t\r\n\f\x0B] in the regex itself:
    # F.trim strips only ASCII spaces (a tab-indented bullet would slip
    # through), and Java's \s and Python's \s disagree on NBSP — the
    # literal class keeps engine and test mirror byte-aligned
    n_bullet = F.size(
        F.filter(
            "lines", lambda ln: ln.rlike(r"^[ \t\r\n\f\x0B]*[•\-\*‣▪]")
        )
    )
    n_ell_end = F.size(
        F.filter(
            "lines", lambda ln: ln.rlike(r"(\.\.\.|…)[ \t\r\n\f\x0B]*$")
        )
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in _STOPWORDS]),
        )
    )

    sig = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.when(n_words > 0, sum_len / n_words).otherwise(0.0).alias(
            "mean_word_len"
        ),
        F.when(n_words > 0, n_hash / n_words).otherwise(0.0).alias(
            "hash_ratio"
        ),
        F.when(n_words > 0, n_ellipsis / n_words).otherwise(0.0).alias(
            "ellipsis_ratio"
        ),
        F.when(n_lines > 0, n_bullet / n_lines).otherwise(0.0).alias(
            "bullet_frac"
        ),
        F.when(n_lines > 0, n_ell_end / n_lines).otherwise(0.0).alias(
            "ellipsis_frac"
        ),
        F.when(n_words > 0, n_alpha / n_words).otherwise(0.0).alias(
            "alpha_word_frac"
        ),
        stop_hits.alias("stopword_hits"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("hash_ratio") <= max_symbol_ratio)
        & (F.col("ellipsis_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
    )
    return sig.withColumn("keep", keep)


def gopher_rules_query(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only ◦: the Gopher rule set over the derived 3-token lines,
    crc32-dirtied so every rule fires somewhere (mirrored in tests):
    '...' appended when crc32(line)%13==0, a '• bullet' line appended
    when crc32(doc_id)%7==0, '###' when crc32(doc_id)%31==0, and a
    stopword line when crc32(doc_id)%3!=0 (the synthetic vocabulary
    carries only 'the', so the stopword rule needs seeding to show both
    verdicts)."""
    lines = _doc_lines(spark, sf)
    crc = lambda c: F.crc32(F.encode(c, "utf-8"))  # noqa: E731
    dirty = F.transform(
        "lines",
        lambda ln: F.concat(
            ln,
            F.when(crc(ln) % 13 == 0, F.lit("...")).otherwise(F.lit("")),
        ),
    )
    dirtied = lines.select(
        "doc_id",
        F.concat(
            dirty,
            F.when(
                crc(F.col("doc_id")) % 7 == 0,
                F.array(F.lit("• bullet item")),
            ).otherwise(F.array().cast("array<string>")),
            F.when(
                crc(F.col("doc_id")) % 31 == 0, F.array(F.lit("# # ###"))
            ).otherwise(F.array().cast("array<string>")),
            F.when(
                crc(F.col("doc_id")) % 3 != 0,
                F.array(F.lit("to be of and that")),
            ).otherwise(F.array().cast("array<string>")),
        ).alias("lines"),
    )
    out = gopher_quality(dirtied, min_words=30)
    return out.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 4).alias("mean_word_len"),
        F.round("hash_ratio", 4).alias("hash_ratio"),
        F.round("ellipsis_ratio", 4).alias("ellipsis_ratio"),
        F.round("bullet_frac", 4).alias("bullet_frac"),
        F.round("ellipsis_frac", 4).alias("ellipsis_frac"),
        F.round("alpha_word_frac", 4).alias("alpha_word_frac"),
        "stopword_hits",
        "keep",
    )


QUERIES.update({"gopher_rules": gopher_rules_query})
