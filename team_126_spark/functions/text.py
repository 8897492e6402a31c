"""Text kernels as pure column expressions.

Reference parity:
  - searchable_text lowercase concat (backend/convert_housing_to_json.py:49)
  - services split on newline        (backend/datasets/convert_csv_to_json.py:30-32)
  - regex coordinate extraction      (backend/main.py:490-509)

Plus the training-data-pipeline surface (north star): tokenization, quality
scoring, language-ID heuristic, document fingerprinting, shingling for
MinHash/Jaccard dedup. All deterministic; fingerprints use md5 so the
DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des"],
}


def normalize_ws(text: Column) -> Column:
    """Collapse runs of whitespace, trim, lowercase — canonical doc form."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def normalize_ws_sql(text: str) -> str:
    return f"lower(trim(regexp_replace({text}, '\\s+', ' ', 'g')))"


def tokens(text: Column) -> Column:
    """Whitespace tokens of the normalized text (NULL or empty → empty
    array, so every token-derived signal sees 0 tokens rather than NULL/-1
    — matching the oracles' WHERE norm <> '' + LEFT JOIN COALESCE shape)."""
    t = normalize_ws(text)
    return F.when(t.isNull() | (t == ""), F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def token_count_sql(text: str) -> str:
    n = normalize_ws_sql(text)
    return (
        f"(CASE WHEN {n} IS NULL OR {n} = '' THEN 0"
        f" ELSE len(str_split({n}, ' ')) END)::BIGINT"
    )


def char_count(text: Column) -> Column:
    return F.length(text).cast("bigint")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation (quality signal)."""
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.!?,;:'\"()\[\]-]", ""))
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(n_punct.cast("double") / F.length(text))


def stopword_hits(text: Column, lang: str) -> Column:
    """How many tokens are stopwords of `lang` (language-ID evidence)."""
    toks = tokens(text)
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t))).cast("bigint")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized text.

    md5 is available in both Spark and DuckDB → oracle-checkable; the
    rolling-hash variant for near-dup lives in operators/dedup.py.
    """
    return F.md5(normalize_ws(text))


def fingerprint_sql(text: str) -> str:
    return f"md5({normalize_ws_sql(text)})"


def md5_low60(s: Column) -> Column:
    """Low 60 bits of md5 as a non-negative bigint — the oracle-checkable
    hash family: DuckDB computes the identical value from the same hex
    (15 hex chars keep it under 2^60, safely inside int64 for BOTH
    engines; xxhash64 has no DuckDB twin, md5 does)."""
    return F.conv(F.substring(F.md5(F.encode(s, "UTF-8")), 18, 15), 16, 10).cast("bigint")


def md5_low60_sql(s: str) -> str:
    return f"('0x' || substr(md5({s}), 18, 15))::BIGINT"


def md5_low32(s: Column) -> Column:
    """Low 32 bits of md5 as bigint (rolling-hash base, oracle-checkable)."""
    return F.conv(F.substring(F.md5(F.encode(s, "UTF-8")), 25, 8), 16, 10).cast("bigint")


def md5_low32_sql(s: str) -> str:
    return f"('0x' || substr(md5({s}), 25, 8))::BIGINT"


def token_windows(toks: Column, k: int) -> Column:
    """Ordered k-token sliding-window strings over a token array (length
    n-k+1; [] when n < k). Built as arrays_zip of k shifted slices + one
    concat_ws lambda — the slices run ONCE in codegen. The previous
    `transform(sequence, i -> concat_ws(slice(toks, i+1, k)))` form
    re-sliced the token array per ELEMENT on the interpreted
    higher-order-function path and made window construction the hidden
    bottleneck of every sketch/window consumer: minhash signatures
    measured 6.8× faster at 100k docs (19.9s → 2.9s) from this change
    alone, bit-identical output."""
    n = F.size(toks)
    m = F.greatest(n - (k - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(k)])
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(zipped, lambda x: F.concat_ws(" ", *[x[str(i)] for i in range(k)]))
    )


def word_shingles(text: Column, k: int) -> Column:
    """Distinct k-word shingles as strings ("w1 w2 ... wk") — see
    token_windows for the codegen-native construction."""
    return F.array_distinct(token_windows(tokens(text), k))


def classify_hours(hours: Column) -> Column:
    """Classify an operating-hours string into a typed struct
    (kind, open_time, close_time) — the reference's hours parser
    (backend/tools/check_hours_availability.py:50-86):
      "24/7" / anything containing "24"  → always_open
      anything containing "closed"       → closed
      "H:MM AM - H:MM PM"                → scheduled with split times
    """
    lowered = F.lower(hours)
    parts = F.split(hours, " - ")
    return (
        F.when(
            lowered.contains("24"),
            F.struct(
                F.lit("always_open").alias("kind"),
                F.lit(None).cast("string").alias("open_time"),
                F.lit(None).cast("string").alias("close_time"),
            ),
        )
        .when(
            lowered.contains("closed"),
            F.struct(
                F.lit("closed").alias("kind"),
                F.lit(None).cast("string").alias("open_time"),
                F.lit(None).cast("string").alias("close_time"),
            ),
        )
        .otherwise(
            F.struct(
                F.lit("scheduled").alias("kind"),
                parts.getItem(0).alias("open_time"),
                F.element_at(parts, -1).alias("close_time"),
            )
        )
    )
