"""The corpus-curation CAPSTONE: every LLM-data-pipeline stage this
engine implements, composed into ONE oracle-checked query — the
end-to-end run a training-data team would actually execute:

    near-dup removal (MinHash-LSH pairs → connected components →
    survivors) → quality gate (heuristic score) → language gate
    (marker-token ID) → deterministic stratified sampling → final
    per-(lang, source) corpus report.

Composition is by JOINING the existing queries' outputs on doc_id —
each stage keeps its own tested semantics, and the DuckDB twin chains
the same stages as CTEs (the recursive-closure block is shared with
`doc_dedup_survivors`). At 100 TB every stage is the already-audited
scale shape: the dedup labels side is candidate-sized (broadcastable
anti-join), the text gates are single-scan projections, the sample is
a pushed hash predicate, and the report is one small aggregation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum, exact_sum_sql
from . import QuerySpec
from .dedup import doc_dedup_survivors_q
from .text import (
    DOC_LANG_ID_SQL,
    DOC_QUALITY_SCORE_SQL,
    DOC_SAMPLE_STRATIFIED_SQL,
    doc_lang_id,
    doc_quality_score,
    doc_sample_stratified,
)

QUALITY_GATE = 0.73  # ~median at sf0.01: keeps the gate non-trivial


def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors ∩ quality ∩ language ∩ sample → per-(lang, source)
    doc counts and exact mean quality. The gates compare doubles that
    both engines compute from identical expressions, so the filter
    boundary is deterministic; the mean routes through the decimal
    accumulator like every other measure."""
    surv = doc_dedup_survivors_q(spark, sf_dir).select(
        "doc_id", "lang", "source"
    )
    quality = doc_quality_score(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    langp = doc_lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    sampled = doc_sample_stratified(spark, sf_dir).select("doc_id")
    kept = (
        surv.join(quality, "doc_id")
        .join(langp, "doc_id")
        .join(sampled, "doc_id")
        .filter(
            (F.col("quality_score") >= QUALITY_GATE)
            & (F.col("lang_pred") != "und")
        )
    )
    return (
        kept.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            exact_sum("quality_score", "sum_quality"),
        )
        .withColumn(
            "avg_quality", F.col("sum_quality") / F.col("n_docs")
        )
        .orderBy("lang", "source")
    )


def _strip_order(sql: str) -> str:
    """Drop a wrapped query's TRAILING ORDER BY so it can embed as a
    CTE. Guarded: the stripped tail must be a bare column-list sort —
    if a wrapped query ever gains an inner window ORDER BY after the
    outer one (or loses its trailing sort), rsplit would silently
    truncate the CTE mid-query, so fail loudly instead."""
    head, sep, tail = sql.rstrip().rpartition("ORDER BY")
    if not sep or not re.fullmatch(r"[\s\w,.]+(DESC|ASC)?[\s\w,.]*", tail):
        raise ValueError(
            f"refusing to strip non-trailing ORDER BY (tail={tail!r})"
        )
    return head


def corpus_curation_report_sql() -> str:
    # reuse the recursive-closure survivors block verbatim (same
    # MinHash threshold as doc_dedup_survivors) and wrap each text
    # stage's full query as a CTE.
    from ..operators.dedup import minhash_lsh_pairs_sql
    from .dedup import MINHASH_THRESHOLD

    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_pairs_sql(MINHASH_THRESHOLD)}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(node, root) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
),
losers AS (
  SELECT node AS doc_id FROM reach GROUP BY node
  HAVING node <> min(root)
),
survivors AS (
  SELECT d.doc_id, d.lang, d.source
  FROM documents d ANTI JOIN losers l USING (doc_id)
),
quality AS ({_strip_order(DOC_QUALITY_SCORE_SQL)}),
langp AS ({_strip_order(DOC_LANG_ID_SQL)}),
sampled AS ({_strip_order(DOC_SAMPLE_STRATIFIED_SQL)}),
kept AS (
  SELECT s.lang, s.source, q.quality_score
  FROM survivors s
  JOIN quality q USING (doc_id)
  JOIN langp p USING (doc_id)
  JOIN sampled m USING (doc_id)
  WHERE q.quality_score >= {QUALITY_GATE} AND p.lang_pred <> 'und'
)
SELECT lang, source,
       count(*) AS n_docs,
       {exact_sum_sql("quality_score", "sum_quality")},
       CAST(CAST(SUM(CAST(quality_score AS DECIMAL(38,6))) AS VARCHAR)
            AS DOUBLE) / count(*) AS avg_quality
FROM kept
GROUP BY lang, source
ORDER BY lang, source
"""


QUERIES: dict[str, QuerySpec] = {
    "corpus_curation_report": QuerySpec(
        corpus_curation_report, corpus_curation_report_sql()
    ),
}
