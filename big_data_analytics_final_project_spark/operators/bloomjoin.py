"""Bloom-filter semi-join reduction: the runtime-filter pattern for
joins whose build side is too big to broadcast as a hash set but fits
comfortably as bits.

The 100 TB niche this fills, precisely:

- build side broadcastable (a dimension table)  -> plain broadcast
  hash semi-join; Catalyst already does it; do NOT use this.
- build side huge but the JOIN itself is the goal -> shuffle hash /
  sort-merge join; AQE handles skew; do NOT use this.
- build side is ~10^7..10^9 KEYS (too big to broadcast as a Java hash
  relation at ~50 bytes/key = tens of GB) and the probe side is the
  100 TB fact table, of which only a small fraction survives -> THIS.
  At 10 bits/key a 10^8-key filter is 125 MB — broadcastable — and the
  probe-side filter runs MAP-SIDE, so the shuffle that feeds the exact
  residual join carries |matches| + |false positives| rows instead of
  the whole fact table. With k=5 hashes and 10 bits/key the false
  positive rate is ~0.9%, i.e. the shuffle shrinks by ~99% when 0.1%
  of the fact matches.

Spark 4's own runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects exactly
this rewrite, but only on join shapes the optimizer recognizes, with
its creation threshold heuristics, and never across a persisted
boundary. This operator is the EXPLICIT form for when the build side
is a computed key set mid-pipeline (dedup survivors, sampled doc_ids,
an LSH candidate set) that the planner cannot see through, and it is
EXACT by construction: the bloom is a pure pre-filter (no false
negatives), and a residual ``left_semi`` join removes the false
positives, so the result is row-identical to the un-accelerated
semi-join — which is also what makes the graded-twin oracle a plain
SQL ``WHERE key IN (...)``.

Engine-portable determinism, same discipline as the CMS
(operators/sketches.py `_cms_bucket`): bit positions are md5-derived
(`('0x' || substr(md5('<i>:' || key), 1, 15))::BIGINT % n_bits`), so a
non-Spark engine can reproduce the identical filter bit-for-bit.

Plan shape: one aggregation over the build side's hash positions
(output ≤ n_bits/64 rows), one 1-row broadcast of the word map onto
the probe side (the repo's allowlisted scalar-crossJoin pattern), k
map lookups per probe row — all JVM expressions, zero Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default geometry: 2^20 bits / 5 hashes ≈ 0.9% FPR at ~10 bits/key
#: for a 10^5-key build side; size n_bits ≈ 10 × |build keys| and keep
#: k = 5 for the same rate at any scale.
DEFAULT_N_BITS = 1 << 20
DEFAULT_N_HASHES = 5


def _bit_position(key: Column, i: int, n_bits: int) -> Column:
    """Hash-`i` bit position of `key` in [0, n_bits): md5-derived,
    bit-identical across engines. 15 hex chars = 60 bits, so the
    intermediate fits a signed BIGINT without overflow."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 15), 16, 10
        ).cast("bigint")
        % n_bits
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Build the filter from the build side's keys.

    Returns the OCCUPIED words of the bit array as a relation
    ``(word_idx int, word bigint)`` — at most n_bits/64 rows and
    usually far fewer, so a sparse filter costs what it occupies.
    NULL keys set no bits (NULL never equi-joins, so the probe must
    drop it too — `bloom_prune` does).
    """
    key = F.col(key_col).cast("string")
    positions = (
        keys.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[_bit_position(key, i, n_bits) for i in range(n_hashes)]
                )
            ).alias("_pos")
        )
    )
    return (
        positions.select(
            (F.col("_pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))")
            .alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the build side.

    Guarantee: no false negatives — every fact row whose key is in the
    build side survives. Rows with NULL keys are dropped (semi-join
    semantics). The filter is k map lookups against a broadcast 1-row
    map frame; it runs map-side, BEFORE any shuffle a downstream join
    would introduce — that placement is the entire point.
    """
    words = bloom.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("_bloom_words")
    )
    key = F.col(key_col).cast("string")
    # stage the k positions as named columns once, so each is computed
    # a single time and the mask shift (column-amount shiftleft, SQL
    # form) reads a plain column
    pos_cols = {
        f"_bf_pos_{i}": _bit_position(key, i, n_bits)
        for i in range(n_hashes)
    }
    staged = fact.crossJoin(F.broadcast(words)).withColumns(pos_cols)
    cond = F.col(key_col).isNotNull()
    for i in range(n_hashes):
        word = F.coalesce(
            # try_: ANSI-safe on absent word slots (sparse filter)
            F.try_element_at(
                F.col("_bloom_words"),
                (F.col(f"_bf_pos_{i}") / 64).cast("int"),
            ),
            F.lit(0).cast("bigint"),
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_bf_pos_{i} % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return staged.filter(cond).drop("_bloom_words", *pos_cols)


def bloom_semi_join(
    fact: DataFrame,
    key_col: str,
    build: DataFrame,
    build_key_col: str | None = None,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Exact semi-join with bloom pre-reduction.

    Row-identical to ``fact.join(build, key, "left_semi")`` — the
    bloom admits no false negatives and the residual left_semi join
    removes its false positives — but the shuffle feeding that
    residual join sees |matches| + |false positives| probe rows
    instead of |fact|. Oracle: plain ANSI ``WHERE key IN (SELECT ...)``.
    """
    bkey = build_key_col or key_col
    bloom = bloom_build(
        build.select(F.col(bkey).alias(key_col)), key_col, n_bits, n_hashes
    )
    pruned = bloom_prune(fact, key_col, bloom, n_bits, n_hashes)
    build_keys = build.select(
        F.col(bkey).cast(fact.schema[key_col].dataType).alias(key_col)
    ).distinct()
    return pruned.join(build_keys, key_col, "left_semi")
