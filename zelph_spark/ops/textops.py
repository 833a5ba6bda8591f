"""Text analysis operators for large-scale training-data pipelines.

All JVM-side columnar expressions (no Python UDFs): tokenization, token
counting, quality scoring, language identification, and document
fingerprinting over the ``documents`` table. Every operator has an exact
ANSI-SQL twin in ``__spark_entry__.oracle_sql`` — the formulas are chosen to
be expressible identically in Spark and DuckDB so the driver's differential
gate covers them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Stopword sets for the n-gram/stopword language-ID heuristic. Tiny by
# design: the heuristic must be reproducible in pure SQL on both engines.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "men5", "zhe4"),
}


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization of lowercase text (split on runs of spaces)."""
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def with_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens(col)).cast("bigint"))


# GPT-2-style pre-tokenizer, simplified to the subset Java regex and RE2
# match identically: letter runs, digit runs, and single non-alphanumeric
# non-space characters. Counts matches, so it approximates BPE token counts
# the way tokenizer-efficiency audits do (a BPE merge table only ever splits
# within these pre-token boundaries).
BPE_PRETOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def with_bpe_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Approximate BPE token count: matches of the pre-tokenizer regex over
    lowercased text, plus chars-per-token (the standard tokenizer-efficiency
    ratio — high values flag binary junk / non-language content). Pure JVM
    regexp_count; the oracle recomputes it with RE2's regexp_extract_all."""
    n = F.regexp_count(F.lower(F.trim(F.col(col))), F.lit(BPE_PRETOKEN_RE))
    chars = F.length(F.lower(F.trim(F.col(col))))
    return df.withColumn("n_bpe_tokens", n.cast("bigint")).withColumn(
        "chars_per_token",
        F.round(chars / F.when(n > 0, n).otherwise(F.lit(None)), 6),
    )


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Occurrence count (not distinct) of ``words`` among tokens."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def with_quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Deterministic quality score in [0,1]:
    0.4·min(1, n_tokens/64) + 0.3·(distinct/total) + 0.3·stopword_ratio.

    The length/uniqueness/stopword mix follows the standard quality-filter
    recipes for web-corpus curation; exact weights are arbitrary but fixed
    (and mirrored in the SQL oracle)."""
    t = tokens(col)
    n = F.size(t).cast("double")
    distinct_ratio = F.size(F.array_distinct(t)) / n
    stop_ratio = _hits(t, STOPWORDS["en"]).cast("double") / n
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(64.0))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * stop_ratio
    )
    return df.withColumn("quality", F.round(score, 6))


def with_langid(df: DataFrame, col: str = "text") -> DataFrame:
    """Stopword-hit language ID: most hits wins; ties broken by language
    code order; zero hits everywhere -> 'und'."""
    t = tokens(col)
    scored = F.array(
        *[
            F.struct(
                _hits(t, STOPWORDS[lang]).alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    # ties: the filter below keeps array order, so the alphabetically-first
    # language with the max hit count wins
    max_hits = F.array_max(F.transform(scored, lambda s: s["hits"]))
    winner = F.filter(scored, lambda s: s["hits"] == max_hits)[0]["lang"]
    return df.withColumn(
        "lang_pred", F.when(max_hits > 0, winner).otherwise(F.lit("und"))
    )


# PII patterns, restricted to the regex subset Java and RE2 interpret
# identically (plain classes, bounded quantifiers, \b). Order matters:
# URLs are masked before emails so "http://a@b.com" doesn't half-match.
PII_PATTERNS = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def with_pii_scrubbed(df: DataFrame, col: str = "text") -> DataFrame:
    """Mask URLs, email addresses and IPv4 literals in ``col`` (the standard
    pre-training redaction pass) and count what was masked. Adds ``scrubbed``
    and ``n_pii``. Pure JVM regexp_replace/regexp_count chain — one
    projection, no shuffle, no Python."""
    low = F.lower(F.col(col))
    n = F.lit(0)
    out = low
    for pat, repl in PII_PATTERNS:
        n = n + F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn("scrubbed", out).withColumn("n_pii", n.cast("bigint"))


def with_fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set — the dedup-key analog of a rolling-hash sketch, exactly
    reproducible in SQL."""
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))
    return df.withColumn("fingerprint", fp)
