"""Text-analysis column expressions (all JVM-side built-ins).

Canonical normalization/tokenization shared by the text-quality,
dedup, and fingerprint operators. Every helper here has a documented
DuckDB twin (the `*_SQL` strings) with IDENTICAL semantics so oracle
comparisons are exact — which is also why everything sticks to
lexicographic string ops, integer math, and md5 (bit-identical across
engines) instead of engine-specific hashes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- normalization ------------------------------------------------------
# lower → collapse any non-alphanumeric run to one space → trim.


def norm_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def norm_text_sql(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def tokens_sql(expr: str) -> str:
    return f"string_split({norm_text_sql(expr)}, ' ')"


# --- shingles -----------------------------------------------------------
# 3-token shingles, 1-based indexing in both engines.


def shingles3_from_tokens(toks: Column) -> Column:
    """3-token shingles from an ALREADY-BOUND token-array column.

    Callers must materialize the token array in its own projection
    (`df.select(tokens(...).alias("toks")).select(shingles3_from_tokens
    (col("toks")))`) — `toks` is then a cheap attribute reference.
    Passing `tokens(col)` directly re-inlines the regexp+split at every
    one of the ~6 references here (×3 per shingle inside the lambda),
    which is a >100× per-row blowup Catalyst will not undo
    (CollapseProject keeps expensive multi-referenced aliases in their
    own projection, so the two-step form evaluates the split once).

    Falls back to the whole normalized text (== tokens re-joined) when
    there are fewer than 3 tokens, so every doc has ≥1 shingle."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    return F.when(F.size(toks) >= 3, make).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingles3(col: Column) -> Column:
    """One-shot shingle expression (inlines tokenization — fine for
    single-reference projections; use shingles3_from_tokens + a bound
    token column anywhere the shingle array feeds further array ops)."""
    return shingles3_from_tokens(tokens(col))


def shingles3_from_tokens_sql(tvar: str) -> str:
    """DuckDB twin of `shingles3_from_tokens`; `tvar` names a bound
    token-list column (use a CTE: `WITH toks AS (SELECT ...)`)."""
    return (
        f"CASE WHEN len({tvar}) >= 3 THEN "
        f"list_transform(range(1, len({tvar}) - 1), "
        f"i -> {tvar}[i] || ' ' || {tvar}[i+1] || ' ' || {tvar}[i+2]) "
        f"ELSE [array_to_string({tvar}, ' ')] END"
    )


def shingles3_sql(expr: str) -> str:
    return shingles3_from_tokens_sql(tokens_sql(expr))


# --- quality / language heuristics -------------------------------------

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# Tiny marker lists for the n-gram/marker language-ID heuristic. The
# real discriminator set would be learned; the *operator shape* (score
# per language from token membership, argmax) is what matters at scale.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "la", "los", "y", "es", "una"),
}


def _in_list(x: Column, words: tuple[str, ...]) -> Column:
    return x.isin(*words)


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: _in_list(x, STOPWORDS)))
    return F.when(n > 0, n_stop.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_filter({toks}, x -> x IN ({stoplist}))) AS DOUBLE) "
        f"/ len({toks}) ELSE 0.0 END"
    )


def alpha_ratio(col: Column) -> Column:
    """Fraction of alphabetic characters in the raw text."""
    n = F.length(col)
    n_alpha = F.length(F.regexp_replace(col, "[^A-Za-z]", ""))
    return F.when(n > 0, n_alpha.cast("double") / n).otherwise(F.lit(0.0))


def alpha_ratio_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"CAST(length(regexp_replace({expr}, '[^A-Za-z]', '', 'g')) AS DOUBLE) "
        f"/ length({expr}) ELSE 0.0 END"
    )
