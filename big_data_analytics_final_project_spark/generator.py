"""Distributed synthetic data generator — the reference's S1 surface.

Re-expresses the reference's single-process generator
(`data_generator.py`, 432 LoC: users/products/categories/transactions/
sessions with nested structs, arrays, and maps — SURVEY.md §1.2) as
pure column projections over ``spark.range(n)``:

- **No RNG state.** Every "random" value is a pure function of
  ``(tag, row id)`` through md5 — the distributed analog of the
  reference's ``seed=42`` determinism (data_generator.py:25-27).
  Results are bit-identical regardless of partitioning, executor
  count, or retry — a task can die and re-run without a generator
  offset drifting.
- **No shuffles, no driver loops.** ``spark.range`` is an
  embarrassingly parallel source; generating 100 TB is the same plan
  as generating 100 MB with a bigger ``n``. The reference's chunked
  flush machinery (data_generator.py:22,241-248, "8GB mode") is
  unnecessary: partitions bound memory.
- **Cross-engine exact.** The uniform primitive is the first 48 bits
  of md5, which DuckDB reproduces bit-for-bit
  (``('0x' || substr(md5(..),1,12))::BIGINT``), so generated datasets
  — and whole analytics pipelines over them — are oracle-checkable.
  Money is integer cents divided by 100 (never ``round(double)``,
  whose half-even/half-up edge cases differ across engines).

Schemas follow FIXTURES.md (= data_generator.py:133-146, 152-185,
190-205, 252-321, 353-404).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# 1996-01-01T00:00:00 UTC — generation window base (the reference uses
# "now − TIMESPAN_DAYS"; a fixed base keeps output reproducible forever).
BASE_TS = 820454400
DAY = 86400
SPAN_DAYS = 90

PAYMENT_METHODS = [
    "credit_card", "paypal", "apple_pay", "crypto", "bank_transfer", "gift_card",
]
STATUSES = ["completed", "processing", "shipped", "delivered"]
CITIES = ["Springfield", "Rivertown", "Lakeside", "Hillcrest",
          "Maplewood", "Brookfield", "Fairview", "Oakdale"]
STATES = ["CA", "NY", "TX", "WA", "IL", "GA", "CO", "MA"]
COUNTRIES = ["USA", "Canada", "UK", "Germany", "Rwanda"]
DEVICE_TYPES = ["mobile", "desktop", "tablet"]
OSES = ["android", "ios", "windows", "macos"]
BROWSERS = ["chrome", "safari", "firefox", "edge"]
PAGE_TYPES = ["home", "category", "product", "cart", "checkout"]
REFERRERS = ["google", "facebook", "email", "direct", "affiliate"]
WORDS = ["amber", "bold", "cedar", "delta", "ember", "frost", "golden",
         "harbor", "ivory", "jade", "kinetic", "lunar", "mellow", "nova",
         "onyx", "prime"]

_B48 = 1 << 48


# ------------------------------------------------------- prand primitives
# Paired Spark-column / DuckDB-SQL builders. The SQL side exists so any
# pipeline over generated data can still be differentially tested.


def _u48(tag: str, key: Column) -> Column:
    """Uniform 48-bit integer from md5('tag:' || key) — the one source
    of pseudo-randomness (exactly reproducible in DuckDB)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(tag + ":"), key.cast("string"))), 1, 12),
        16, 10,
    ).cast("bigint")


def _u48_sql(tag: str, key: str) -> str:
    return f"(('0x' || substr(md5('{tag}:' || CAST({key} AS VARCHAR)), 1, 12))::BIGINT)"


def _uint(tag: str, key: Column, lo: int, hi: int) -> Column:
    """Uniform integer in [lo, hi] (inclusive)."""
    return (F.lit(lo) + _u48(tag, key) % F.lit(hi - lo + 1)).cast("bigint")


def _uint_sql(tag: str, key: str, lo: int, hi: int) -> str:
    return f"({lo} + {_u48_sql(tag, key)} % {hi - lo + 1})"


def _pick(tag: str, key: Column, choices: list[str]) -> Column:
    idx = (_u48(tag, key) % F.lit(len(choices)) + 1).cast("int")
    return F.element_at(F.array(*[F.lit(c) for c in choices]), idx)


def _pick_sql(tag: str, key: str, choices: list[str]) -> str:
    lst = ", ".join(f"'{c}'" for c in choices)
    return f"([{lst}][CAST(1 + {_u48_sql(tag, key)} % {len(choices)} AS INT)])"


def _iso(sec: Column) -> Column:
    """ISO-8601 second-resolution string — the reference's at-rest
    timestamp representation (data_generator.py:127-130)."""
    return F.date_format(F.timestamp_seconds(sec), "yyyy-MM-dd'T'HH:mm:ss")


def _iso_sql(sec: str) -> str:
    return f"strftime(make_timestamp(({sec}) * 1000000), '%Y-%m-%dT%H:%M:%S')"


def _cents(c: Column) -> Column:
    """Exact 2-decimal double from integer cents."""
    return (c.cast("double") / F.lit(100.0))


# ------------------------------------------------------------- entities


def gen_categories(spark: SparkSession, n: int = 25) -> DataFrame:
    """categories: id, name, subcategories array<struct> —
    data_generator.py:133-146."""
    i = F.col("id")
    n_sub = _uint("nsub", i, 3, 5)
    sub_key = lambda j: i * 8 + j  # noqa: E731 — disjoint per (cat, slot)
    return spark.range(n).select(
        F.format_string("cat_%03d", i).alias("category_id"),
        F.initcap(
            F.concat_ws(" ", _pick("cw1", i, WORDS), _pick("cw2", i, WORDS))
        ).alias("name"),
        F.transform(
            F.sequence(F.lit(0), (n_sub - 1).cast("int")),
            lambda j: F.struct(
                F.format_string("sub_%03d_%d", i, j).alias("subcategory_id"),
                F.initcap(_pick("sw", sub_key(j), WORDS)).alias("name"),
                _cents(_uint("pm", sub_key(j), 10, 40)).alias("profit_margin"),
            ),
        ).alias("subcategories"),
    )


def gen_products(
    spark: SparkSession, n: int = 5000, n_categories: int = 25
) -> DataFrame:
    """products: FK→categories, price_history array sorted asc by date
    (last-value-wins, data_generator.py:152-185)."""
    i = F.col("id")
    base_cents = _uint("bp", i, 500, 50000)
    n_ph = _uint("nph", i, 1, 3)
    ph_key = lambda k: i * 8 + k  # noqa: E731
    price_history = F.transform(
        F.sequence(F.lit(1), n_ph.cast("int")),
        lambda k: F.struct(
            # each revision scales base by 80–120% in integer math
            # (floor(x/100) — identical IEEE semantics in DuckDB, unlike
            # cast(double as bigint) which truncates here and rounds there)
            _cents(
                F.floor(base_cents * _uint("phs", ph_key(k), 80, 120) / F.lit(100))
            ).alias("price"),
            _iso(
                F.lit(BASE_TS) - (n_ph - k + 1) * F.lit(30 * DAY)
            ).alias("date"),
        ),
    )
    return spark.range(n).select(
        F.format_string("prod_%05d", i).alias("product_id"),
        F.initcap(
            F.concat_ws(" ", _pick("pw1", i, WORDS), _pick("pw2", i, WORDS))
        ).alias("name"),
        F.format_string(
            "cat_%03d", _uint("pcat", i, 0, n_categories - 1)
        ).alias("category_id"),
        _cents(base_cents).alias("base_price"),
        _uint("stock", i, 10, 1000).cast("int").alias("current_stock"),
        (_u48("act", i) % 100 < 95).alias("is_active"),
        price_history.alias("price_history"),
        _iso(F.lit(BASE_TS) - n_ph * F.lit(30 * DAY)).alias("creation_date"),
    )


def gen_users(spark: SparkSession, n: int = 10000) -> DataFrame:
    """users: geo struct + registration/last_active ISO strings —
    data_generator.py:190-205."""
    i = F.col("id")
    reg_s = F.lit(BASE_TS) - _uint("reg", i, 90, 270) * F.lit(DAY)
    return spark.range(n).select(
        F.format_string("user_%06d", i).alias("user_id"),
        F.struct(
            _pick("ucity", i, CITIES).alias("city"),
            _pick("ustate", i, STATES).alias("state"),
            _pick("uctry", i, COUNTRIES).alias("country"),
        ).alias("geo_data"),
        _iso(reg_s).alias("registration_date"),
        _iso(reg_s + _uint("last", i, 0, 180) * F.lit(DAY)).alias("last_active"),
    )


# --- transactions: item-level cents are shared between the Spark and SQL
# forms; everything downstream (subtotal/discount/total) is integer math.

_TXN_ITEM_TAGS = ("tip", "tiq", "tiu")  # product, quantity, unit cents


def _item_key(i: Column, j: Column) -> Column:
    return i * 8 + j


def gen_transactions(
    spark: SparkSession,
    n: int = 100000,
    n_users: int = 10000,
    n_products: int = 5000,
) -> DataFrame:
    """transactions: nullable session_id, items array<struct>, integer-
    cents money chain subtotal→discount→total — data_generator.py:
    353-364,393-404 (discount tiers :347-351)."""
    i = F.col("id")
    n_items = _uint("tni", i, 1, 3)
    seq = F.sequence(F.lit(0), (n_items - 1).cast("int"))
    q = lambda j: _uint("tiq", _item_key(i, j), 1, 3)  # noqa: E731
    uc = lambda j: _uint("tiu", _item_key(i, j), 500, 50000)  # noqa: E731
    items = F.transform(
        seq,
        lambda j: F.struct(
            F.format_string(
                "prod_%05d", _uint("tip", _item_key(i, j), 0, n_products - 1)
            ).alias("product_id"),
            q(j).cast("int").alias("quantity"),
            _cents(uc(j)).alias("unit_price"),
            _cents(q(j) * uc(j)).alias("subtotal"),
        ),
    )
    subtotal_cents = F.aggregate(
        seq, F.lit(0).cast("bigint"), lambda acc, j: acc + q(j) * uc(j)
    )
    disc_pct = F.when(_u48("tdp", i) % 10 < 8, F.lit(0)).otherwise(
        (_u48("tdt", i) % 4 + 1) * 5
    )
    discount_cents = F.floor(subtotal_cents * disc_pct / F.lit(100)).cast("bigint")
    return spark.range(n).select(
        F.concat(F.lit("txn_"), F.substring(F.md5(F.concat(F.lit("txn:"), i)), 1, 12)).alias("transaction_id"),
        F.when(
            _u48("tsess", i) % 10 < 3, F.lit(None).cast("string")
        ).otherwise(
            F.concat(F.lit("sess_"), F.substring(F.md5(F.concat(F.lit("sess:"), i)), 1, 10))
        ).alias("session_id"),
        F.format_string("user_%06d", _uint("tuser", i, 0, n_users - 1)).alias("user_id"),
        _iso(F.lit(BASE_TS) + _uint("tts", i, 0, SPAN_DAYS * DAY - 1)).alias("timestamp"),
        items.alias("items"),
        _cents(subtotal_cents).alias("subtotal"),
        _cents(discount_cents).alias("discount"),
        _cents(subtotal_cents - discount_cents).alias("total"),
        _pick("tpay", i, PAYMENT_METHODS).alias("payment_method"),
        _pick("tstat", i, STATUSES).alias("status"),
    )


def gen_sessions(
    spark: SparkSession,
    n: int = 300000,
    n_users: int = 10000,
    n_products: int = 5000,
) -> DataFrame:
    """sessions: page_views array (time-sorted), viewed_products,
    cart_contents map (distinct keys by construction), conversion
    status tied to cart — data_generator.py:252-321."""
    i = F.col("id")
    start_s = F.lit(BASE_TS) + _uint("sts", i, 0, SPAN_DAYS * DAY - 1)
    duration = _uint("sdur", i, 60, 3600)
    n_pv = _uint("snpv", i, 1, 8)
    pv_key = lambda j: i * 16 + j  # noqa: E731
    page_views = F.transform(
        F.sequence(F.lit(0), (n_pv - 1).cast("int")),
        lambda j: F.struct(
            # evenly spaced within the session → sorted by construction,
            # matching the reference's sorted time_slots (data_generator.py:266)
            _iso(start_s + (duration * j / n_pv).cast("bigint")).alias("timestamp"),
            _pick("spt", pv_key(j), PAGE_TYPES).alias("page_type"),
            F.when(
                _u48("spp", pv_key(j)) % 3 < 2,
                F.format_string("prod_%05d", _uint("sppn", pv_key(j), 0, n_products - 1)),
            ).alias("product_id"),
            F.when(
                _u48("spc", pv_key(j)) % 4 < 1,
                F.format_string("cat_%03d", _uint("spcn", pv_key(j), 0, 24)),
            ).alias("category_id"),
            _uint("spd", pv_key(j), 5, 300).cast("int").alias("view_duration"),
        ),
    )
    if n_products < 4:
        raise ValueError("gen_sessions needs n_products >= 4 (carts hold up to 3 distinct products)")
    n_cart = _uint("snc", i, 0, 3)
    cart_base = _uint("scb", i, 0, n_products - 1)
    # consecutive offsets from a uniform base keep map keys distinct for
    # any n_products >= 4 without a dedup pass. slice() not
    # sequence(1, n): Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0], not empty.
    cart_seq = F.slice(F.sequence(F.lit(1), F.lit(3)), 1, n_cart.cast("int"))
    cart_keys = F.transform(
        cart_seq,
        lambda j: F.format_string("prod_%05d", (cart_base + j) % n_products),
    )
    cart_vals = F.transform(
        cart_seq,
        lambda j: F.struct(
            _uint("scq", i * 8 + j, 1, 3).cast("int").alias("quantity"),
            _cents(_uint("scp", i * 8 + j, 500, 50000)).alias("price"),
        ),
    )
    return spark.range(n).select(
        F.concat(F.lit("sess_"), F.substring(F.md5(F.concat(F.lit("gsess:"), i)), 1, 10)).alias("session_id"),
        F.format_string("user_%06d", _uint("suser", i, 0, n_users - 1)).alias("user_id"),
        _iso(start_s).alias("start_time"),
        _iso(start_s + duration).alias("end_time"),
        duration.cast("int").alias("duration_seconds"),
        F.struct(
            _pick("scity", i, CITIES).alias("city"),
            _pick("sstate", i, STATES).alias("state"),
            _pick("sctry", i, COUNTRIES).alias("country"),
            F.format_string(
                "%d.%d.%d.%d",
                _uint("ip1", i, 1, 255), _uint("ip2", i, 0, 255),
                _uint("ip3", i, 0, 255), _uint("ip4", i, 1, 254),
            ).alias("ip_address"),
        ).alias("geo_data"),
        F.struct(
            _pick("sdev", i, DEVICE_TYPES).alias("type"),
            _pick("sos", i, OSES).alias("os"),
            _pick("sbr", i, BROWSERS).alias("browser"),
        ).alias("device_profile"),
        F.array_distinct(
            F.transform(
                F.filter(page_views, lambda p: p["product_id"].isNotNull()),
                lambda p: p["product_id"],
            )
        ).alias("viewed_products"),
        page_views.alias("page_views"),
        F.map_from_arrays(cart_keys, cart_vals).alias("cart_contents"),
        F.when(n_cart == 0, F.lit("browsed"))
        .otherwise(_pick("sconv", i, ["converted", "abandoned"]))
        .alias("conversion_status"),
        _pick("sref", i, REFERRERS).alias("referrer"),
    )


# ------------------------------------------- oracle SQL for the pipeline
# DuckDB reproduction of gen_transactions' item economics: a lateral
# range join stands in for the transform(), every uniform re-derived
# from the same (tag, key).


def _money_fragments_sql(i: str = "t2.i", j: str = "y.j") -> tuple[str, str]:
    """(per-item cents CASE, discount pct) SQL fragments over
    transaction row index `i` and item slot `j` — the ONE source of the
    oracle-side money chain; transactions_items_sql and
    transactions_totals_sql must model identical data."""
    key = f"({i} * 8 + {j})"
    q = _uint_sql("tiq", key, 1, 3)
    uc = _uint_sql("tiu", key, 500, 50000)
    item_case = (
        f"CASE WHEN {j} < {_uint_sql('tni', i, 1, 3)} THEN {q} * {uc} ELSE 0 END"
    )
    disc_pct = (
        f"(CASE WHEN {_u48_sql('tdp', i)} % 10 < 8 THEN 0"
        f" ELSE ({_u48_sql('tdt', i)} % 4 + 1) * 5 END)"
    )
    return item_case, disc_pct


def transactions_items_sql(n: int, n_users: int, n_products: int) -> str:
    i, j = "t.i", "(t.i * 8 + x.j)"
    q = _uint_sql("tiq", j, 1, 3)
    uc = _uint_sql("tiu", j, 500, 50000)
    # DuckDB's range() cannot be laterally parameterized, so the
    # per-transaction item sum is a fixed 3-way cross join with the
    # short-count rows zeroed out.
    item_case, disc_pct = _money_fragments_sql("t2.i", "y.j")
    return f"""
WITH txn AS (
  SELECT i,
         'txn_' || substr(md5('txn:' || CAST(i AS VARCHAR)), 1, 12) AS transaction_id,
         'user_' || lpad(CAST({_uint_sql("tuser", "i", 0, n_users - 1)} AS VARCHAR), 6, '0') AS user_id,
         {_iso_sql(f"{BASE_TS} + {_uint_sql('tts', 'i', 0, SPAN_DAYS * DAY - 1)}")} AS "timestamp",
         {_pick_sql("tpay", "i", PAYMENT_METHODS)} AS payment_method,
         {_pick_sql("tstat", "i", STATUSES)} AS status,
         {_uint_sql("tni", "i", 1, 3)} AS n_items
  FROM range({n}) r(i)
),
money AS (
  SELECT t2.i,
         SUM({item_case}) AS subtotal_cents,
         {disc_pct} AS disc_pct
  FROM range({n}) t2(i) CROSS JOIN range(3) y(j)
  GROUP BY t2.i
)
SELECT t.transaction_id, t.user_id, t."timestamp",
       CAST(x.j AS INT) AS item_idx,
       'prod_' || lpad(CAST({_uint_sql("tip", j, 0, n_products - 1)} AS VARCHAR), 5, '0') AS product_id,
       CAST({q} AS INT) AS quantity,
       {uc} / 100.0 AS unit_price,
       ({q} * {uc}) / 100.0 AS item_subtotal,
       m.subtotal_cents / 100.0 AS subtotal,
       CAST(floor(m.subtotal_cents * m.disc_pct / 100.0) AS BIGINT) / 100.0 AS discount,
       (m.subtotal_cents - CAST(floor(m.subtotal_cents * m.disc_pct / 100.0) AS BIGINT)) / 100.0 AS total,
       t.payment_method, t.status
FROM txn t
JOIN range({3}) x(j) ON x.j < t.n_items
JOIN money m ON m.i = t.i
"""


def transactions_totals_sql(n: int, n_users: int) -> str:
    """Per-transaction (user_id, total) — the money chain only, for
    spend-rollup oracles. Shares _money_fragments_sql with
    transactions_items_sql so both oracles model identical data."""
    item_case, disc_pct = _money_fragments_sql("t2.i", "y.j")
    return f"""
SELECT 'user_' || lpad(CAST({_uint_sql("tuser", "t2.i", 0, n_users - 1)} AS VARCHAR), 6, '0') AS user_id,
       (SUM({item_case})
        - CAST(floor(SUM({item_case}) * {disc_pct} / 100.0) AS BIGINT)
       ) / 100.0 AS total
FROM range({n}) t2(i) CROSS JOIN range(3) y(j)
GROUP BY t2.i
"""


def sessions_engagement_sql(n: int, n_users: int) -> str:
    """Per-session (user_id, duration_s) — the engagement leg of the
    integrated query, re-derived from the same uniforms."""
    return f"""
SELECT 'user_' || lpad(CAST({_uint_sql("suser", "i", 0, n_users - 1)} AS VARCHAR), 6, '0') AS user_id,
       {_uint_sql("sdur", "i", 60, 3600)} AS duration_s
FROM range({n}) r(i)
"""


def products_dim_sql(n: int, n_categories: int) -> str:
    return f"""
SELECT 'prod_' || lpad(CAST(i AS VARCHAR), 5, '0') AS product_id,
       'cat_' || lpad(CAST({_uint_sql("pcat", "i", 0, n_categories - 1)} AS VARCHAR), 3, '0') AS category_id
FROM range({n}) r(i)
"""


# --------------------------------------------------------- bulk landing

# Reference cardinalities (data_generator.py:10-16) at scale=1.0.
REFERENCE_CARDINALITIES = {
    "categories": 25,
    "products": 5000,
    "users": 10000,
    "transactions": 100000,
    "sessions": 300000,
}


def generate_all(
    spark: SparkSession, out_dir: str, scale: float = 1.0
) -> dict[str, int]:
    """Materialize the full data model as parquet zones — the
    generate→load path (reference: data_generator.py then mongoimport/
    HBase bulk load, PDF §7.1.3/§11) as ONE Spark job. Row counts
    scale linearly; categories stay fixed (a dim, like TPC-H nation).

    Returns {table: rows written}."""
    n = {
        t: max(1, int(c * scale)) if t != "categories" else c
        for t, c in REFERENCE_CARDINALITIES.items()
    }
    # carts hold up to 3 distinct products (stride-generated keys);
    # fewer than 4 products would collide map keys
    n["products"] = max(4, n["products"])
    frames = {
        "categories": gen_categories(spark, n["categories"]),
        "products": gen_products(spark, n["products"], n["categories"]),
        "users": gen_users(spark, n["users"]),
        "transactions": gen_transactions(
            spark, n["transactions"], n["users"], n["products"]
        ),
        "sessions": gen_sessions(
            spark, n["sessions"], n["users"], n["products"]
        ),
    }
    for table, df in frames.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
    return n
