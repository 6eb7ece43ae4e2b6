"""Deduplication operator family for document corpora.

Four escalating strategies, each a pure DataFrame composition:

- exact:    content-hash groupBy (one shuffle on the hash).
- jaccard:  exact token-set Jaccard via inverted-index self-join.
- minhash:  MinHash signatures + LSH banding → candidate pairs →
            exact-Jaccard verification. The banding join is the scale
            path: candidates ∝ near-dups, not ∝ N².
- simhash:  60-bit SimHash + pigeonhole chunk-join for Hamming ≤ k.

Portability: every hash is md5 (bit-identical in Spark and DuckDB), and
MinHash takes the *lexicographic min of md5 hex strings* per seed — an
order-free idempotent aggregate, so signatures are partitioning-
independent and the DuckDB oracle reproduces them exactly. No
engine-specific hash (xxhash64, DuckDB hash()) is ever load-bearing.

Scale notes: the inverted-index join's fan-out is bounded by document
frequency; production corpora prune ultra-common terms first (stop the
head of the Zipf curve) — here the exact variant is kept faithful
because the oracle must count every shared token. MinHash/SimHash are
the 100 TB answers: LSH bucket joins shuffle on short band keys and
AQE's skew-join splits hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles3, shingles3_sql, tokens, tokens_sql

# ---------------------------------------------------------------- exact


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id as the
    canonical representative."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("keep_doc_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
"""

# -------------------------------------------------------------- jaccard


def _token_sets(docs: DataFrame, term_expr, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), F.array_distinct(term_expr).alias("terms")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_shingles: bool = False,
) -> DataFrame:
    """Exact set-Jaccard near-dup pairs via inverted-index self-join.

    intersection(a,b) counted by joining the exploded term lists on the
    term; |union| = |A| + |B| − |A∩B|.
    """
    term_expr = shingles3(F.col(text_col)) if use_shingles else tokens(F.col(text_col))
    sets = _token_sets(docs, term_expr, id_col)
    sizes = sets.select("doc_id", F.size("terms").alias("sz"))
    inv = sets.select("doc_id", F.explode("terms").alias("term"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, F.col("a.term") == F.col("b.term"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sza = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    szb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sza, "doc_a")
        .join(szb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def jaccard_pairs_sql(threshold: float = 0.9, use_shingles: bool = False) -> str:
    terms = shingles3_sql("text") if use_shingles else tokens_sql("text")
    return f"""
WITH sets AS (
  SELECT doc_id, list_distinct({terms}) AS terms FROM documents
),
sizes AS (SELECT doc_id, len(terms) AS sz FROM sets),
inv AS (SELECT doc_id, unnest(terms) AS term FROM sets),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM inv a JOIN inv b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= {threshold}
ORDER BY doc_a, doc_b
"""


# -------------------------------------------------------------- minhash

N_SEEDS = 8
N_BANDS = 4  # 2 rows per band


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc MinHash signature: for each seed s, the lexicographic min
    of md5("s:" + shingle). One explode + one groupBy with N_SEEDS min
    aggregates — a single shuffle, map-side combinable."""
    sets = _token_sets(docs, shingles3(F.col(text_col)), id_col)
    exploded = sets.select("doc_id", F.explode("terms").alias("term"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("term")))).alias(f"mh{s}")
        for s in range(N_SEEDS)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    Band b matches when both of its 2 signature rows agree; a pair is a
    candidate if ANY band matches (union of N_BANDS equi-joins,
    deduped). Candidates are then verified with exact shingle-set
    Jaccard, so false positives cost only the verify join.
    """
    sigs = minhash_signatures(docs, text_col, id_col)
    bands = sigs.select(
        "doc_id",
        *[
            F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")).alias(f"band{b}")
            for b in range(N_BANDS)
        ],
    )
    cands = None
    for b in range(N_BANDS):
        left = bands.select(F.col("doc_id").alias("doc_a"), F.col(f"band{b}").alias("bk"))
        right = bands.select(F.col("doc_id").alias("doc_b"), F.col(f"band{b}").alias("bk"))
        c = left.join(right, "bk").where(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b"
        )
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.dropDuplicates()

    verified = jaccard_pairs(
        docs, threshold=0.0, text_col=text_col, id_col=id_col, use_shingles=True
    ).select("doc_a", "doc_b", "jaccard")
    return (
        cands.join(verified, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def minhash_lsh_pairs_sql(threshold: float = 0.8) -> str:
    shingles = shingles3_sql("text")
    mh_cols = ", ".join(
        f"min(md5('{s}:' || term)) AS mh{s}" for s in range(N_SEEDS)
    )
    band_cols = ", ".join(
        f"mh{2 * b} || mh{2 * b + 1} AS band{b}" for b in range(N_BANDS)
    )
    band_joins = "\nUNION\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"FROM bands a JOIN bands b ON a.band{b} = b.band{b} "
        f"AND a.doc_id < b.doc_id"
        for b in range(N_BANDS)
    )
    return f"""
WITH sets AS (
  SELECT doc_id, list_distinct({shingles}) AS terms FROM documents
),
exploded AS (SELECT doc_id, unnest(terms) AS term FROM sets),
sigs AS (SELECT doc_id, {mh_cols} FROM exploded GROUP BY doc_id),
bands AS (SELECT doc_id, {band_cols} FROM sigs),
cands AS ({band_joins}),
sizes AS (SELECT doc_id, len(terms) AS sz FROM sets),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM exploded a JOIN exploded b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT c.doc_a AS doc_a, c.doc_b AS doc_b,
       CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) AS jaccard
FROM cands c
JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= {threshold}
ORDER BY c.doc_a, c.doc_b
"""


# -------------------------------------------------------------- simhash

SIMHASH_BITS = 60  # 15 md5 hex chars → fits a signed 64-bit int
_HEX = "0123456789abcdef"


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash of the shingle set: per bit position, majority
    vote of the shingles' md5 bits (+1/−1), assembled into a BIGINT.

    Implementation: explode (doc, shingle) × bit-position 0..59, read
    bit b out of hex char floor(b/4) of md5(shingle), sum ±1 votes per
    (doc, bit), re-assemble with sum(bit << b). Two shuffles on doc_id;
    both map-side combinable.
    """
    sets = _token_sets(docs, shingles3(F.col(text_col)), id_col)
    exploded = (
        sets.select("doc_id", F.explode("terms").alias("term"))
        .select("doc_id", F.md5("term").alias("h"))
        .select(
            "doc_id",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
        )
    )
    # Bit b lives in hex char floor(b/4), position (3 - b%4) from the
    # low end of that char's 4 bits. expr() form because shiftleft/
    # shiftright need column-valued shift amounts here.
    vote = F.expr(
        f"(shiftright(instr('{_HEX}', substring(h, CAST(floor(b / 4) AS INT) + 1, 1)) - 1,"
        f" CAST(3 - b % 4 AS INT)) % 2) * 2 - 1"
    )
    votes = (
        exploded.withColumn("vote", vote)
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN v > 0 THEN shiftleft(1L, CAST(b AS INT)) ELSE 0L END")).alias(
            "simhash"
        )
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: with 4 chunks of 15 bits, any pair within
    Hamming ≤ 3 agrees on ≥1 whole chunk — so join on chunk equality
    (4 equi-joins, union) and verify the full distance. This is the
    scale path: no N² comparison ever happens.
    """
    sigs = simhash_signatures(docs, text_col, id_col)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        *[
            (F.shiftright(F.col("simhash"), 15 * c) % (1 << 15)).alias(f"c{c}")
            for c in range(4)
        ],
    )
    cands = None
    for c in range(4):
        left = chunks.select(
            F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("sh_a"),
            F.col(f"c{c}").alias("ck"),
        )
        right = chunks.select(
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("sh_b"),
            F.col(f"c{c}").alias("ck"),
        )
        j = left.join(right, "ck").where(F.col("doc_a") < F.col("doc_b")).select(
            "doc_a", "doc_b", "sh_a", "sh_b"
        )
        cands = j if cands is None else cands.unionByName(j)
    return (
        cands.dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    shingles = shingles3_sql("text")
    chunk_cols = ", ".join(
        f"(simhash >> {15 * c}) % {1 << 15} AS c{c}" for c in range(4)
    )
    chunk_joins = "\nUNION\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"a.simhash AS sh_a, b.simhash AS sh_b "
        f"FROM chunks a JOIN chunks b ON a.c{c} = b.c{c} "
        f"AND a.doc_id < b.doc_id"
        for c in range(4)
    )
    return f"""
WITH sets AS (
  SELECT doc_id, list_distinct({shingles}) AS terms FROM documents
),
hashed AS (
  SELECT doc_id, md5(term) AS h
  FROM (SELECT doc_id, unnest(terms) AS term FROM sets)
),
bits AS (
  SELECT doc_id, h, r.b,
         (strpos('{_HEX}', h[(r.b // 4) + 1]) - 1) AS hexval
  FROM hashed, range(0, {SIMHASH_BITS}) r(b)
),
votes AS (
  SELECT doc_id, b,
         SUM(((hexval >> (3 - b % 4)) % 2) * 2 - 1) AS v
  FROM bits GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
  FROM votes GROUP BY doc_id
),
chunks AS (SELECT doc_id, simhash, {chunk_cols} FROM sigs),
cands AS ({chunk_joins})
SELECT DISTINCT doc_a, doc_b,
       bit_count(xor(sh_a, sh_b)) AS hamming
FROM cands
WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""
