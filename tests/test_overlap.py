"""Overlap-coefficient (containment) near-dup pairs — semantics the
Jaccard family cannot cover, plus exactness of the smaller-side prefix
filter against a brute-force reference."""

from __future__ import annotations

import itertools
import re

from big_data_analytics_final_project_spark.operators.dedup import (
    jaccard_pairs,
    overlap_coeff_pairs,
)


def _shingles(text: str) -> set[str]:
    toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")
    if len(toks) < 3:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _brute_force(docs: list[tuple[int, str]], t: float):
    out = []
    sets = {i: _shingles(s) for i, s in docs}
    for a, b in itertools.combinations(sorted(sets), 2):
        common = len(sets[a] & sets[b])
        coeff = common / min(len(sets[a]), len(sets[b]))
        if coeff >= t:
            out.append((a, b, common, round(coeff, 9)))
    return sorted(out)


QUOTE = "the quick brown fox jumps over the lazy dog near the old river bank"
DOCS = [
    (1, QUOTE),
    # doc 1 quoted verbatim inside a much larger doc: containment 1.0,
    # Jaccard far below threshold
    (
        2,
        "breaking news today. " + QUOTE + ". reporters said markets rallied "
        "while analysts disagreed about inflation figures and the central "
        "bank held rates steady for another quarter amid uncertainty",
    ),
    (3, "completely unrelated text about spark partitions and shuffles"),
    (4, "spark partitions and shuffles are completely different here text"),
    (5, "the quick brown fox jumps over the lazy dog"),  # prefix of 1
]


def test_containment_found_where_jaccard_misses(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    over = {
        (r.doc_a, r.doc_b): r.overlap_coeff
        for r in overlap_coeff_pairs(df, threshold=0.9).collect()
    }
    jac = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(df, threshold=0.9, use_shingles=True).collect()
    }
    # the embedded quote: full containment, invisible to Jaccard
    assert over[(1, 2)] == 1.0
    assert (1, 2) not in jac
    assert over[(2, 5)] == 1.0  # transitively contained prefix
    assert (3, 4) not in over  # shared words but different 3-shingles


def test_prefix_filter_is_exact(spark):
    """The smaller-side prefix filter must lose NO qualifying pair —
    compare against a brute-force all-pairs reference at thresholds
    spanning loose to strict."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    for t in (0.3, 0.6, 0.9):
        got = sorted(
            (r.doc_a, r.doc_b, r.n_common, round(r.overlap_coeff, 9))
            for r in overlap_coeff_pairs(df, threshold=t).collect()
        )
        assert got == _brute_force(DOCS, t), f"threshold {t}"
