"""Property-based differential tests (hypothesis): random inputs vs
independent pure-Python reference implementations.

The oracle suite proves parity on the fixed testdata; these prove the
operators' SEMANTICS on adversarial shapes hypothesis invents —
colliding timestamps, empty groups, single-token docs, all-duplicate
corpora — where window/gap/prefix logic actually breaks.

Example counts are kept small: every example runs real Spark jobs.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_analytics_final_project_spark.operators.asof import asof_join
from big_data_analytics_final_project_spark.operators.dedup import jaccard_pairs
from big_data_analytics_final_project_spark.operators.rangejoin import interval_join
from big_data_analytics_final_project_spark.operators.sessionize import sessionize

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_BASE = datetime(2024, 1, 1)


# --- sessionize ---------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id (few users → collisions)
        st.integers(min_value=0, max_value=20_000),  # offset seconds
    ),
    min_size=1,
    max_size=40,
)


def _sessions_reference(rows, gap_s):
    """Pure-Python gaps-and-islands."""
    out = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for eid, (user, off) in enumerate(rows):
        by_user.setdefault(user, []).append((off, eid))
    for user, evs in by_user.items():
        evs.sort()
        seq = 0
        cur: list[int] = []
        prev = None
        for off, _eid in evs:
            if prev is None or off - prev > gap_s:
                if cur:
                    out[(user, seq)] = cur
                seq += 1
                cur = []
            cur.append(off)
            prev = off
        out[(user, seq)] = cur
    return {
        key: (len(offs), min(offs), max(offs), float(max(offs) - min(offs)))
        for key, offs in out.items()
    }


@given(rows=events_strategy)
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, rows):
    gap_s = 1800
    df = spark.createDataFrame(
        [
            (eid, user, _BASE + timedelta(seconds=off))
            for eid, (user, off) in enumerate(rows)
        ],
        schema=T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    got = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"],
            int((r["session_start"] - _BASE).total_seconds()),
            int((r["session_end"] - _BASE).total_seconds()),
            r["duration_s"],
        )
        for r in sessionize(df, gap_seconds=gap_s, tiebreak_col="event_id").collect()
    }
    assert got == _sessions_reference(rows, gap_s)


# --- as-of join ---------------------------------------------------------

asof_strategy = st.tuples(
    st.lists(  # left: (user, ts_off)
        st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=20
    ),
    st.lists(  # right: (user, ts_off, payload)
        st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(0, 999)),
        min_size=0,
        max_size=20,
    ),
)


@given(data=asof_strategy)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, data):
    left_rows, right_rows = data
    # dedupe right per (user, ts): keep max payload (the operator's precondition)
    right_map: dict[tuple[int, int], int] = {}
    for user, off, payload in right_rows:
        key = (user, off)
        right_map[key] = max(right_map.get(key, -1), payload)

    left = spark.createDataFrame(
        [
            (i, user, _BASE + timedelta(seconds=off))
            for i, (user, off) in enumerate(left_rows)
        ],
        schema="left_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (user, _BASE + timedelta(seconds=off), payload)
            for (user, off), payload in right_map.items()
        ],
        schema="user_id long, ts timestamp, payload long",
    )
    got = {
        r["left_id"]: r["asof_payload"]
        for r in asof_join(
            left, right, on=["user_id"], ts_col="ts", payload_cols=["payload"]
        ).collect()
    }
    want = {}
    for i, (user, off) in enumerate(left_rows):
        best = None
        for (r_user, r_off), payload in right_map.items():
            if r_user == user and r_off <= off:
                if best is None or r_off > best[0]:
                    best = (r_off, payload)
        want[i] = best[1] if best else None
    assert got == want


# --- interval join ------------------------------------------------------

interval_strategy = st.tuples(
    st.lists(  # left: (user, ts_off) — offsets hit bucket boundaries
        st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=15
    ),
    st.lists(  # right: (user, ts_off, payload)
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(0, 99)),
        min_size=0,
        max_size=15,
    ),
    st.sampled_from([(-10, 0, "left"), (-10, 5, "both"), (0, 7, "neither")]),
)


@given(data=interval_strategy)
@settings(**_SETTINGS)
def test_interval_join_matches_bruteforce(spark, data):
    """The bucket binning must neither lose nor duplicate matches —
    including timestamps exactly on bucket boundaries (offsets are
    multiples of 1s; bucket width is lower/upper span)."""
    left_rows, right_rows, (lo, hi, closed) = data
    left = spark.createDataFrame(
        [
            (i, user, _BASE + timedelta(seconds=off))
            for i, (user, off) in enumerate(left_rows)
        ],
        schema="left_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (user, _BASE + timedelta(seconds=off), p)
            for user, off, p in right_rows
        ],
        schema="user_id long, ts timestamp, payload long",
    )
    got = sorted(
        (r["left_id"], r["r_payload"])
        for r in interval_join(
            left, right, on=["user_id"], lower_s=float(lo), upper_s=float(hi),
            closed=closed,
        ).collect()
    )
    lo_ok = (lambda d: d > lo) if closed in ("right", "neither") else (lambda d: d >= lo)
    hi_ok = (lambda d: d < hi) if closed in ("left", "neither") else (lambda d: d <= hi)
    want = sorted(
        (i, p)
        for i, (lu, loff) in enumerate(left_rows)
        for ru, roff, p in right_rows
        if ru == lu and lo_ok(roff - loff) and hi_ok(roff - loff)
    )
    assert got == want


# --- prefix-filtered jaccard == all-pairs jaccard -----------------------

docs_strategy = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40),
    min_size=2,
    max_size=15,
)


@given(texts=docs_strategy)
@settings(**_SETTINGS)
def test_prefix_jaccard_equals_allpairs(spark, texts):
    """The PPJoin prefix bound must lose NO pairs: the filtered plan
    (threshold=0.5) equals the all-pairs plan (threshold=0) post-
    filtered to >= 0.5."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id long, text string"
    )
    fast = jaccard_pairs(docs, threshold=0.5).collect()
    slow = [
        r
        for r in jaccard_pairs(
            docs, threshold=0.0, allow_quadratic=True
        ).collect()
        if r["jaccard"] >= 0.5
    ]
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    assert sorted(map(tuple, fast)) == sorted(map(tuple, sorted(slow, key=key)))


# --- connected components == union-find --------------------------------

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=25,
)


def _components_reference(edges):
    """Pure-Python union-find: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in parent}


@given(edges=edges_strategy)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """The iterative min-label fixpoint must produce exactly the
    union-find labeling (min id per component) on arbitrary graphs —
    self-loops, parallel edges, cycles, chains included."""
    from big_data_analytics_final_project_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(edges, schema="a long, b long")
    got = {
        r["node"]: r["label"]
        for r in connected_components(df, "a", "b").collect()
    }
    assert got == _components_reference(edges)


# --- codec-free media round-trips --------------------------------------

gray_image = st.integers(min_value=1, max_value=24).flatmap(
    lambda w: st.integers(min_value=1, max_value=16).flatmap(
        lambda h: st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=w * h,
            max_size=w * h,
        ).map(lambda vals: (w, h, vals))
    )
)


@given(img=gray_image)
@settings(max_examples=60, deadline=None)
def test_png_encode_decode_roundtrip(img):
    """Pure-function round trip (no Spark): encode_png_gray8 output is
    a spec-correct PNG that decode_png_gray8 reconstructs bit-exactly,
    for arbitrary dimensions and pixel content — the property that
    makes resize_image's re-encode trustworthy."""
    import numpy as np

    from big_data_analytics_final_project_spark.operators.multimodal import (
        decode_png_gray8,
        encode_png_gray8,
    )

    w, h, vals = img
    px = np.array(vals, dtype=np.int64).reshape(h, w)
    w2, h2, out = decode_png_gray8(encode_png_gray8(px))
    assert (w2, h2) == (w, h)
    assert (out == px).all()


@given(img=gray_image, scale=st.sampled_from([(1, 1), (2, 3), (3, 1)]))
@settings(max_examples=30, deadline=None)
def test_png_resize_mapping_is_nearest_neighbor(img, scale):
    """The resize kernel's index math (floor(dst*src/dst_extent)) on
    arbitrary shapes: every output pixel must equal SOME input pixel
    at the computed source index — no interpolation, no off-by-one at
    the edges (the last output row/col must map inside the source)."""
    import numpy as np

    w, h, vals = img
    sx, sy = scale
    tw, th = max(1, w * sx // 2), max(1, h * sy // 2)
    rows = (np.arange(th) * h) // th
    cols = (np.arange(tw) * w) // tw
    assert rows.max() < h and cols.max() < w
    px = np.array(vals, dtype=np.int64).reshape(h, w)
    out = px[np.ix_(rows, cols)]
    assert out.shape == (th, tw)


# --- table profiler -----------------------------------------------------

_profile_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        st.one_of(
            st.none(),
            st.sampled_from([-2.5, -1.0, 0.0, 0.5, 1.0, 2.5, 7.25]),
        ),
        st.one_of(st.none(), st.sampled_from(["", "a", "ab", "b", "zz"])),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_profile_rows)
@settings(**_SETTINGS)
def test_table_profile_matches_pure_python(spark, rows):
    from big_data_analytics_final_project_spark.operators.profile import (
        table_profile,
    )

    df = spark.createDataFrame(rows, "k: bigint, v: double, s: string")
    got = {r["column_name"]: r for r in table_profile(df).collect()}
    cols = list(zip(*rows))
    for name, vals in zip(("k", "v", "s"), cols):
        present = [x for x in vals if x is not None]
        r = got[name]
        assert r["n_rows"] == len(rows)
        assert r["n_nulls"] == len(vals) - len(present)
        assert r["n_distinct"] == len(set(present))
        lo = min(present) if present else None
        hi = max(present) if present else None
        if name == "s":
            assert (r["min_str"], r["max_str"]) == (lo, hi)
            assert r["min_num"] is None and r["min_us"] is None
        else:
            want_lo = float(lo) if lo is not None else None
            want_hi = float(hi) if hi is not None else None
            assert (r["min_num"], r["max_num"]) == (want_lo, want_hi)
            assert r["min_str"] is None and r["min_us"] is None


# --- k-anonymity report -------------------------------------------------

_kanon_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # age-ish QI (few values)
        st.sampled_from(["a", "b", None]),  # zip-ish QI incl. NULL group
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_kanon_rows, k=st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_k_anonymity_matches_python_reference(spark, rows, k):
    """Every report field vs a pure-Python Counter over the QI tuples;
    NULL groups with itself (SQL groupBy semantics — Python None keys
    reproduce that exactly)."""
    from collections import Counter

    from big_data_analytics_final_project_spark.operators.profile import (
        k_anonymity_report,
    )

    df = spark.createDataFrame(
        [(a, z, i) for i, (a, z) in enumerate(rows)],
        "age: int, zip: string, uid: int",
    )
    r = k_anonymity_report(df, ["age", "zip"], k=k).collect()[0]
    groups = Counter((a, z) for a, z in rows)
    assert r["n_rows"] == len(rows)
    assert r["n_groups"] == len(groups)
    assert r["n_groups_below_k"] == sum(1 for n in groups.values() if n < k)
    assert r["n_rows_at_risk"] == sum(n for n in groups.values() if n < k)
    assert r["min_group_size"] == min(groups.values())
    assert r["is_k_anonymous"] == (min(groups.values()) >= k)


# --- profile diff -------------------------------------------------------

_diff_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),  # k
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-10, max_value=10)),  # v
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # s
    ),
    min_size=1,
    max_size=25,
)


@given(ref_rows=_diff_rows, cur_rows=_diff_rows)
@settings(**_SETTINGS)
def test_profile_diff_matches_python_reference(spark, ref_rows, cur_rows):
    """profile_diff's exact-integer flag logic vs a pure-Python replay:
    ref profiles (k, v), cur profiles (v, s) — so k/s pin the
    one-sided schema_drift path every example, and v runs the
    null-ppm / cross-multiplied-distinct / range logic on adversarial
    NULL patterns (including all-NULL sides, where range must stay
    quiet via the SQL three-valued OR)."""
    from big_data_analytics_final_project_spark.operators.profile import (
        profile_diff,
        table_profile,
    )

    schema = "k: bigint, v: double, s: string"
    ref_df = spark.createDataFrame(ref_rows, schema)
    cur_df = spark.createDataFrame(cur_rows, schema)
    got = {
        r["column_name"]: r
        for r in profile_diff(
            table_profile(ref_df, ["k", "v"]),
            table_profile(cur_df, ["v", "s"]),
        ).collect()
    }
    assert set(got) == {"k", "v", "s"}
    assert got["k"]["schema_drift"] and not got["k"]["in_cur"]
    assert got["s"]["schema_drift"] and not got["s"]["in_ref"]
    for one_sided in ("k", "s"):
        r = got[one_sided]
        assert not (r["null_drift"] or r["distinct_drift"] or r["range_drift"])

    rv = [t[1] for t in ref_rows]
    cv = [t[1] for t in cur_rows]
    r_present = [x for x in rv if x is not None]
    c_present = [x for x in cv if x is not None]
    v = got["v"]
    assert not v["schema_drift"]
    ppm_r = (len(rv) - len(r_present)) * 1_000_000 // len(rv)
    ppm_c = (len(cv) - len(c_present)) * 1_000_000 // len(cv)
    assert (v["null_ppm_ref"], v["null_ppm_cur"]) == (ppm_r, ppm_c)
    assert v["null_drift"] == (abs(ppm_c - ppm_r) > 10_000)
    rd, cd = len(set(r_present)), len(set(c_present))
    assert (v["n_distinct_ref"], v["n_distinct_cur"]) == (rd, cd)
    assert v["distinct_drift"] == (
        cd * len(rv) > 2 * rd * len(cv) or rd * len(cv) > 2 * cd * len(rv)
    )
    if r_present and c_present:
        want_range = (min(c_present) < min(r_present)) or (
            max(c_present) > max(r_present)
        )
    else:
        want_range = False  # NULL min/max -> three-valued OR -> coalesce False
    assert v["range_drift"] == want_range


_profile_ts_rows = st.lists(
    st.one_of(
        st.none(),
        st.integers(min_value=-86_400, max_value=86_400),  # offset seconds
    ),
    min_size=1,
    max_size=30,
)


@given(offsets=_profile_ts_rows)
@settings(**_SETTINGS)
def test_table_profile_time_slot_exact_micros(spark, offsets):
    """The time-kind column's min/max must land in the _us slot as
    EXACT integer epoch microseconds of the true min/max (the
    cross-engine contract the oracle's epoch_us() compares against),
    with the num/str slots NULL and NULLs counted but excluded from
    distinct."""
    from big_data_analytics_final_project_spark.operators.profile import (
        table_profile,
    )

    rows = [
        (i, _BASE + timedelta(seconds=off) if off is not None else None)
        for i, off in enumerate(offsets)
    ]
    df = spark.createDataFrame(rows, "i: bigint, t: timestamp")
    r = {x["column_name"]: x for x in table_profile(df, ["t"]).collect()}["t"]
    present = [off for off in offsets if off is not None]
    assert r["n_rows"] == len(offsets)
    assert r["n_nulls"] == len(offsets) - len(present)
    assert r["n_distinct"] == len(set(present))
    if present:
        from datetime import timezone

        # session TZ is pinned UTC; anchor the expectation there too
        # instead of the system TZ .timestamp() would use
        base_us = int(_BASE.replace(tzinfo=timezone.utc).timestamp()) * 1_000_000
        assert r["min_us"] == base_us + min(present) * 1_000_000
        assert r["max_us"] == base_us + max(present) * 1_000_000
    else:
        assert r["min_us"] is None and r["max_us"] is None
    assert r["min_num"] is None and r["min_str"] is None
