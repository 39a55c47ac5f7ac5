"""Text-analysis building blocks for the LLM-data-pipeline operators
(SURVEY.md §2.4): tokenization, word shingles, normalization, fingerprints.

Everything is a JVM-side Column expression (split/filter/transform — no
Python UDFs) with a DuckDB SQL twin kept adjacent so the oracle queries stay
in lock-step with the Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def words(text: Column | str) -> Column:
    """Lower-cased alphanumeric tokens, empties removed. NULL text
    tokenizes as the EMPTY document ([]), not NULL — without the coalesce,
    a NULL array flows into size()/aggregate() differently on the two
    engines (Spark propagates NULL, DuckDB's GREATEST/COALESCE guards
    absorb it mid-expression) and every downstream keep/score predicate
    diverges on NULL-text rows (unicode-landmine sweep finding; the driver
    corpora are NULL-free so driver hashes are unchanged)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), TOKEN_SPLIT_RE),
        lambda x: x != "",
    )


WORDS_SQL = (
    "list_filter(string_split_regex(lower(COALESCE({col}, '')), "
    "'[^a-z0-9]+'), x -> x <> '')"
)


def shingles(word_arr: Column, n: int = 3) -> Column:
    """n-word shingles ('a b c'); documents shorter than n words yield []."""
    size = F.size(word_arr)
    make = F.transform(
        F.sequence(F.lit(1), size - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(word_arr, i + k) for k in range(n)]),
    )
    return F.when(size >= n, make).otherwise(F.array().cast("array<string>"))


SHINGLES_SQL = (
    "CASE WHEN len({words}) >= 3 THEN "
    "list_transform(generate_series(1, len({words})-2), "
    "i -> {words}[i] || ' ' || {words}[i+1] || ' ' || {words}[i+2]) "
    "ELSE [] END"
)


# Explicit ASCII whitespace class instead of \s: Java regex \s includes
# \x0B (vertical tab) while RE2's does not, so a literal \s+ silently
# diverges between the Spark implementation and the DuckDB oracle on
# VT-bearing text (found by the unicode-landmine sweep; the driver corpora
# are VT-free so behavior there is unchanged).
WS_RE = "[ \\t\\n\\f\\r\\x0B]+"


def normalized_text(text: Column | str) -> Column:
    """Whitespace-collapsed, trimmed, lower-cased text (fingerprint input)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), WS_RE, " "))


NORMALIZED_SQL = f"trim(regexp_replace(lower({{col}}), '{WS_RE}', ' ', 'g'))"


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text —
    identical across engines, usable as an exact-dedup / shard key."""
    return F.md5(normalized_text(text))


FINGERPRINT_SQL = f"md5({NORMALIZED_SQL})"

# English-ish stopwords used by the language-ID heuristic and quality score.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def bigrams(word_arr: Column) -> Column:
    """Adjacent word pairs ('a b') zipped in-row — no window, no self-join;
    documents shorter than 2 words yield []."""
    size = F.size(word_arr)
    make = F.transform(
        F.sequence(F.lit(1), size - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(word_arr, i), F.element_at(word_arr, i + 1)
        ),
    )
    return F.when(size >= 2, make).otherwise(F.array().cast("array<string>"))


BIGRAMS_SQL = (
    "CASE WHEN len({words}) >= 2 THEN "
    "list_transform(generate_series(1, len({words}) - 1), "
    "i -> {words}[i] || ' ' || {words}[i+1]) "
    "ELSE [] END"
)
