"""Repetition / redundancy quality signals and PII scrubbing.

[extension — not in the reference] The reference has no text-quality
operators (it delegates all data-plane computation to source-DB SQL,
see SURVEY.md §2.7); these are LLM-training-pipeline additions in the
style of the Gopher/MassiveText repetition filters: documents whose
token stream is dominated by a few repeated n-grams are low-quality
training data and get filtered before dedup/tokenization.

All pure Catalyst expressions + relational ops — no Python UDFs:

- ``repetition_profile``: per-document redundancy metrics
  (distinct-token ratio, top-bigram concentration).
- ``top_tokens``: corpus-level exact heavy hitters (token frequency
  top-k).
- ``scrub_pii``: regex redaction of emails / phones / IPv4s / digit
  runs with per-row redaction counts.

Scale notes (100 TB mindset):

- ``repetition_profile`` shuffles twice, both keyed by document
  ((doc, bigram) then doc) — volume is linear in corpus tokens, keys
  are near-unique so no skew; the final stats↔top join is doc-keyed
  and AQE picks broadcast vs sort-merge by actual size.
- ``top_tokens`` is explode → partial+final hash aggregate (one
  shuffle keyed by token; map-side combine collapses each partition
  to its vocabulary first) → global top-k via TakeOrderedAndProject
  (per-partition heaps, no full sort).
- ``scrub_pii`` is a narrow stage-local projection: regexes run
  inside whole-stage codegen, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from db2pq_spark.operators.textstats import tokens

#: Engine-neutral regexes (valid in Java regex and DuckDB/RE2 alike —
#: no lookarounds, no \d shorthand divergence risk: spelled [0-9]).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
    "number": r"[0-9]+",
}


def bigrams(toks: Column) -> Column:
    """Adjacent-token bigram array from a token array (empty for
    fewer than two tokens — Spark's ``sequence(1, 0)`` would count
    *down*, so the short case is guarded explicitly)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1)),
    )
    return F.when(F.size(toks) >= 2, grams) \
            .otherwise(F.array().cast("array<string>"))


def repetition_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition metrics: ``n_tokens``,
    ``distinct_token_ratio`` (vocabulary richness), ``n_bigrams`` and
    ``top_bigram_fraction`` (share of the most frequent adjacent
    bigram — the Gopher-style concentration signal; high ⇒ boilerplate
    or looping text). Ratios rounded to 6 places for cross-engine
    hash parity."""
    base = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    stats = base.select(
        F.col(id_col),
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.round(F.size(F.array_distinct("_toks")) / F.size("_toks"), 6)
         .alias("distinct_token_ratio"),
    )
    bg = (
        base.where(F.size("_toks") >= 2)
        .select(F.col(id_col), F.explode(bigrams(F.col("_toks"))).alias("_bg"))
    )
    top = (
        bg.groupBy(id_col, "_bg").agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top_c"),
             F.sum("_c").alias("_n_bigrams"))
    )
    return (
        stats.join(top, id_col, "left")
        .select(
            F.col(id_col), "n_tokens", "distinct_token_ratio",
            F.coalesce("_n_bigrams", F.lit(0)).cast("bigint")
             .alias("n_bigrams"),
            F.round(
                F.when(F.col("_n_bigrams") > 0,
                       F.col("_top_c") / F.col("_n_bigrams"))
                 .otherwise(F.lit(0.0)), 6)
             .alias("top_bigram_fraction"),
        )
    )


def top_tokens(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Corpus-wide exact heavy hitters: the ``k`` most frequent
    whitespace tokens with counts, ties broken by token text so the
    result is total-ordered and engine-portable."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def scrub_pii(df: DataFrame, col: str,
              kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
              token: str = "[REDACTED]") -> DataFrame:
    """Redact PII-shaped substrings in ``col`` in place and append a
    ``<col>_redactions`` count (matches counted on the *original*
    value per kind, before any replacement, so kinds never double- or
    under-count each other's rewrites). Patterns applied in the given
    order."""
    unknown = set(kinds) - PII_PATTERNS.keys()
    if unknown:
        raise ValueError(
            f"unknown PII kinds {sorted(unknown)}; "
            f"available: {sorted(PII_PATTERNS)}")
    counts = None
    scrubbed = F.col(col)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        c = F.regexp_count(F.col(col), F.lit(pat))
        counts = c if counts is None else counts + c
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.withColumns({
        col: scrubbed,
        f"{col}_redactions": F.coalesce(counts.cast("bigint"), F.lit(0)),
    })
