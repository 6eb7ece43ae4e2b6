#!/usr/bin/env python
"""Grading-window completeness gate.

The driver grades only the FIRST 50 entries of `grading_order()` each
round, so any query whose implementation or oracle changed since the
last driver grading MUST sit inside that window — otherwise the round
ships changed-but-unverified code (round 4's three late-landing
queries; nearly round 3 too).

Mechanics: `scripts/grading_manifest.json` holds a fingerprint per
query, frozen at the END of each round — i.e. the state the driver
last graded. Format 2 (round 13, per the r12 ADVICE): each entry is
{"own", "deep"} where `own` hashes the query function's source + its
oracle SQL and `deep` additionally folds in the sources of every
NON-QUERY package module in the query's transitive import closure
(operators/, functions/, sources/, streaming/, generator) — so a
semantic change to a shared operator forces every dependent graded
query back into the window, the blind spot round 12 shipped through
(dedup's positional filter changed with no re-grade of
dedup_jaccard_pairs). The queries/ package itself is excluded from
the closure: a query's own semantics are its fn source + oracle SQL
(already in `own`), and folding sibling-query edits or
GRADING_PRIORITY rotations into every fingerprint would force the
whole registry each round. A format-1 manifest (flat name->own hash)
is compared on `own` only; the deep gate arms at the first format-2
freeze.

    python scripts/grading_manifest.py            # check (preflight step)
    python scripts/grading_manifest.py --suggest  # print the next round's
                                                  # greedy window, paste-ready
    python scripts/grading_manifest.py --freeze   # refresh at end of round,
                                                  # AFTER the window rotation,
                                                  # as part of the final commit

Check fails if any new-or-changed query (vs the frozen manifest) is
absent from the first 50 of `grading_order()`.

It ALSO enforces the rotation policy (round-5 verdict #7): every
query whose latest GREEN driver row (over all CORRECTNESS_r*.json at
the repo root) is older than currentRound−2 must sit inside the
window this round — currentRound being max(recorded round)+1, the
round currently being prepared. Without this, locally-green entries
silently age out of driver verification (a sixth of the registry's
rows were two rounds old entering round 6).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import importlib
import importlib.util
import inspect
import json
import os
import re
import sys
from functools import lru_cache

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_analytics_final_project_spark.queries import (
    ROTATION_EXEMPT,
    all_queries,
    grading_order,
)

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "grading_manifest.json")
WINDOW = 50

_PKG = "big_data_analytics_final_project_spark"
_QUERIES_PKG = f"{_PKG}.queries"

# `from .x import a, b` / `from ..operators.y import (a,\n b)` — both
# top-level and function-local; a parenthesized name list may span
# lines, an unparenthesized one stops at end-of-line (so one import
# statement never swallows the next).
_FROM_IMPORT_RE = re.compile(
    r"^\s*from\s+(\.*)([\w.]*)\s+import\s+(?:\(([^)]*)\)|([^\n]*))", re.M
)
_ABS_IMPORT_RE = re.compile(rf"^\s*import\s+({re.escape(_PKG)}[\w.]*)", re.M)


@lru_cache(maxsize=None)
def _is_module(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


def _internal_imports(src: str, package: str) -> frozenset[str]:
    """Package-internal module names imported by `src`, resolved
    against `package` for relative forms. `from X import a` also
    probes `X.a` (the `from ..operators import dedup` shape)."""
    out: set[str] = set()
    for m in _FROM_IMPORT_RE.finditer(src):
        dots, mod = m.group(1), m.group(2)
        names = m.group(3) if m.group(3) is not None else m.group(4) or ""
        if dots:
            parts = package.split(".")
            up = len(dots) - 1
            if up >= len(parts):
                continue
            base = ".".join(parts[: len(parts) - up])
            target = f"{base}.{mod}" if mod else base
        else:
            target = mod
        if not target.startswith(_PKG):
            continue
        cands = {target}
        for n in re.split(r"[,\s]+", names):
            n = n.strip()
            if n and n.isidentifier():
                cands.add(f"{target}.{n}")
        out.update(c for c in cands if _is_module(c))
    out.update(
        m.group(1) for m in _ABS_IMPORT_RE.finditer(src) if _is_module(m.group(1))
    )
    return frozenset(out)


@lru_cache(maxsize=None)
def _module_src(mod: str) -> str:
    try:
        return inspect.getsource(importlib.import_module(mod))
    except Exception:  # noqa: BLE001 — unreadable module contributes nothing
        return ""


@lru_cache(maxsize=None)
def _module_closure(start: str) -> frozenset[str]:
    """Transitive package-internal import closure of `start`,
    excluding the queries package (see the module docstring)."""
    seen: set[str] = set()
    todo = [start]
    while todo:
        mod = todo.pop()
        if (
            mod in seen
            or not mod.startswith(_PKG)
            or mod == _QUERIES_PKG
            or mod.startswith(_QUERIES_PKG + ".")
        ):
            continue
        seen.add(mod)
        src = _module_src(mod)
        if not src:
            continue
        try:
            pkg = importlib.import_module(mod).__package__ or mod
        except Exception:  # noqa: BLE001
            continue
        todo.extend(_internal_imports(src, pkg))
    return frozenset(seen)


def _name_to_module(src: str, package: str) -> dict[str, str]:
    """Module-level from-import NAME -> package-internal module it
    binds (``from ..operators.dedup import jaccard_pairs`` maps
    ``jaccard_pairs`` -> operators.dedup; ``from ..operators import
    dedup`` maps ``dedup`` -> operators.dedup). Lets the per-query
    dep scan include only the modules whose names the query's source
    actually uses, instead of every import its module makes."""
    out: dict[str, str] = {}
    for m in _FROM_IMPORT_RE.finditer(src):
        dots, mod = m.group(1), m.group(2)
        names = m.group(3) if m.group(3) is not None else m.group(4) or ""
        if dots:
            parts = package.split(".")
            up = len(dots) - 1
            if up >= len(parts):
                continue
            base = ".".join(parts[: len(parts) - up])
            target = f"{base}.{mod}" if mod else base
        else:
            target = mod
        if not target.startswith(_PKG):
            continue
        for n in re.split(r"[,\s]+", names):
            n = n.strip()
            if not n or not n.isidentifier() or n == "as":
                continue
            if _is_module(f"{target}.{n}"):
                out[n] = f"{target}.{n}"
            elif _is_module(target):
                out[n] = target
    return out


@lru_cache(maxsize=None)
def _module_helpers(modname: str) -> tuple[tuple[str, str], ...]:
    """(name, source) of every function defined at module level in
    `modname` — so a query fn that calls a same-module helper inherits
    the helper's import deps too."""
    try:
        mod = importlib.import_module(modname)
    except Exception:  # noqa: BLE001
        return ()
    out = []
    for n, obj in vars(mod).items():
        if inspect.isfunction(obj) and getattr(obj, "__module__", "") == modname:
            try:
                out.append((n, inspect.getsource(obj)))
            except (OSError, TypeError):
                continue
    return tuple(out)


def _query_dep_modules(fn) -> list[str]:
    """Sorted non-query package modules the query depends on: the
    transitive closure of (a) function-local imports in the fn body
    (and in any same-module helper the fn references, recursively),
    and (b) module-level from-imports whose bound NAME appears in one
    of those sources. Residual gap, accepted: a module-level constant
    computed FROM an import (e.g. an SQL fragment) doesn't carry the
    import's dep — those fragments are baked into the oracle string,
    which the `own` hash already covers."""
    modname = getattr(fn, "__module__", "") or ""
    if not modname.startswith(_PKG):
        return []
    try:
        mod = importlib.import_module(modname)
        pkg = mod.__package__ or modname
        fsrc = inspect.getsource(fn)
    except Exception:  # noqa: BLE001
        return []
    name_map = _name_to_module(_module_src(modname), pkg)
    helpers = dict(_module_helpers(modname))
    srcs = [fsrc]
    seen_helpers = {getattr(fn, "__name__", "")}
    frontier = [fsrc]
    while frontier:
        s = frontier.pop()
        for hname, hsrc in helpers.items():
            if hname not in seen_helpers and re.search(
                rf"\b{re.escape(hname)}\b", s
            ):
                seen_helpers.add(hname)
                srcs.append(hsrc)
                frontier.append(hsrc)
    starts: set[str] = set()
    for s in srcs:
        starts |= _internal_imports(s, pkg)
        for nm, target in name_map.items():
            if re.search(rf"\b{re.escape(nm)}\b", s):
                starts.add(target)
    deps: set[str] = set()
    for s in starts:
        deps |= _module_closure(s)
    return sorted(deps)


def fingerprints() -> dict[str, dict[str, str]]:
    out: dict[str, dict[str, str]] = {}
    for name, spec in all_queries().items():
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            src = repr(spec.fn)
        h = hashlib.sha256()
        h.update(src.encode())
        h.update(b"\x00")
        h.update((spec.sql or "").encode())
        own = h.hexdigest()
        deep_h = hashlib.sha256(own.encode())
        for dep in _query_dep_modules(spec.fn):
            deep_h.update(b"\x00")
            deep_h.update(dep.encode())
            deep_h.update(b"\x00")
            deep_h.update(_module_src(dep).encode())
        out[name] = {"own": own, "deep": deep_h.hexdigest()}
    return out


def changed_names(frozen: dict, current: dict[str, dict[str, str]]) -> list[str]:
    """Names whose fingerprint differs from the frozen manifest,
    format-aware: a format-1 manifest compares `own` only."""
    if frozen.get("_format") == 2:
        fq = frozen.get("queries", {})
        return sorted(n for n, fp in current.items() if fq.get(n) != fp)
    return sorted(n for n, fp in current.items() if frozen.get(n) != fp["own"])


def latest_green_rounds() -> tuple[dict[str, int], int]:
    """(latest green driver round per query, round being prepared)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    max_round = 0
    for path in _glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round + 1


def suggest_window(
    current: dict[str, dict[str, str]],
    latest: dict[str, int],
    prep_round: int,
    new_budget: int,
) -> tuple[list[str], list[str], int]:
    """The greedy rotation's concrete window for `prep_round`:
    (forced, backfill, slots_left_for_new). Forced = non-exempt
    queries whose latest green predates prep_round-2 OR that are
    new/changed vs the frozen manifest (they MUST be graded);
    backfill = oldest-green non-exempt queries filling what the
    forced set and the reserved new-registration budget leave."""
    frozen = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as f:
            frozen = json.load(f)
    changed = set(changed_names(frozen, current))
    rotating = [n for n in current if n not in ROTATION_EXEMPT]
    forced = sorted(
        n
        for n in current
        if (n not in ROTATION_EXEMPT and latest.get(n, 0) < prep_round - 2)
        or n in changed
    )
    room = max(0, WINDOW - len(forced) - new_budget)
    backfill = sorted(
        (n for n in rotating if n not in forced),
        key=lambda n: (latest.get(n, 0), n),
    )[:room]
    return forced, backfill, WINDOW - len(forced) - len(backfill)


def main() -> int:
    current = fingerprints()
    if "--suggest" in sys.argv:
        latest, prep_round = latest_green_rounds()
        forced, backfill, free = suggest_window(
            current, latest, prep_round, new_budget=1
        )
        if len(forced) > WINDOW:
            # debt overflow: print a stalest-first window plus the
            # deferred remainder (next round's scheduled debt)
            ranked = sorted(forced, key=lambda n: (latest.get(n, 0), n))
            print(
                f"# suggested GRADING_PRIORITY for round {prep_round} "
                f"(DEBT OVERFLOW: {len(forced)} forced > {WINDOW} "
                "slots; window takes the stalest, no new-registration "
                "slots):"
            )
            print("# -- forced, stalest first --")
            for n in ranked[:WINDOW]:
                print(f'    "{n}",  # latest green r{latest.get(n, 0)}')
            print(
                f"# -- deferred to round {prep_round + 1} "
                f"({len(ranked) - WINDOW} entries, scheduled debt) --"
            )
            for n in ranked[WINDOW:]:
                print(f'#   "{n}",  # latest green r{latest.get(n, 0)}')
            return 0
        print(
            f"# suggested GRADING_PRIORITY for round {prep_round} "
            f"({len(forced)} forced + {len(backfill)} backfill, "
            f"{free} slot(s) left for new registrations):"
        )
        print("# -- forced (stale or new/changed) --")
        for n in forced:
            print(f'    "{n}",')
        print("# -- oldest-green backfill --")
        for n in backfill:
            print(f'    "{n}",')
        return 0
    if "--freeze" in sys.argv:
        with open(MANIFEST, "w") as f:
            json.dump(
                {"_format": 2, "queries": current},
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
        print(f"froze {len(current)} fingerprints (format 2) -> {MANIFEST}")
        return 0

    if not os.path.exists(MANIFEST):
        print(f"FAIL: {MANIFEST} missing — run with --freeze once")
        return 1
    with open(MANIFEST) as f:
        frozen = json.load(f)
    changed = changed_names(frozen, current)
    if frozen.get("_format") != 2:
        print(
            "note: frozen manifest is format 1 — comparing own-source "
            "hashes only; the transitive (deep) gate arms at this "
            "round's --freeze"
        )
    window = list(grading_order())[:WINDOW]
    outside = [n for n in changed if n not in window]
    print(
        f"{len(changed)} queries new/changed since last freeze; "
        f"window holds {sum(1 for n in changed if n in window)} of them"
    )
    rc = 0
    if outside:
        print(
            "FAIL: new/changed queries OUTSIDE the driver's "
            f"{WINDOW}-entry grading window (rotate GRADING_PRIORITY):"
        )
        for n in outside:
            print(f"  - {n}")
        rc = 1
    else:
        print("OK: every new/changed query is inside the grading window")

    latest, prep_round = latest_green_rounds()
    # Pure differential twins (queries/__init__.py ROTATION_EXEMPT) are
    # never FORCED by staleness — their verbatim-shared oracle plus the
    # per-round pytest differential proof carries them. The fingerprint
    # gate above still applies to them unconditionally.
    rotating = [n for n in current if n not in ROTATION_EXEMPT]
    due = sorted(n for n in rotating if latest.get(n, 0) < prep_round - 2)
    stale = [n for n in due if n not in window]
    print(
        f"rotation: preparing round {prep_round}; {len(due)} queries' latest "
        f"green row predates r{prep_round - 2}; window holds "
        f"{len(due) - len(stale)} of them"
    )
    forced_all = set(due) | set(changed)
    if not stale:
        print("OK: every stale query is inside the grading window")
    elif len(forced_all) <= WINDOW:
        print(
            f"FAIL: stale queries (latest green < r{prep_round - 2}) "
            f"OUTSIDE the window — they would age out unverified:"
        )
        for n in stale:
            print(f"  - {n} (latest green r{latest.get(n, 0)})")
        rc = 1
    else:
        # DEBT OVERFLOW (round-10 verdict #2): more forced entries
        # than one window holds — e.g. after a missed rotation. All
        # of them cannot fit, so the requirement becomes: every slot
        # is spent on forced entries, stalest first; the remainder is
        # scheduled debt for the next round's window, not a gate
        # failure (the horizon section below proves it clears).
        wasted = [n for n in window if n not in forced_all]
        in_window_due = [n for n in window if n in set(due)]
        freshest_in = max(
            (latest.get(n, 0) for n in in_window_due), default=0
        )
        skipped_staler = [
            n for n in stale if latest.get(n, 0) < freshest_in
        ]
        if wasted:
            print(
                f"FAIL: debt overflow ({len(forced_all)} forced > "
                f"{WINDOW} slots) but the window spends slots on "
                "non-forced entries:"
            )
            for n in wasted:
                print(f"  - {n} (latest green r{latest.get(n, 0)})")
            rc = 1
        elif skipped_staler:
            print(
                "FAIL: debt-overflow window is not stalest-first — "
                "these wait outside while fresher forced entries "
                "hold slots:"
            )
            for n in skipped_staler:
                print(f"  - {n} (latest green r{latest.get(n, 0)})")
            rc = 1
        else:
            print(
                f"recovery: {len(due)} stale entries exceed the "
                f"{WINDOW}-slot window; this window retires the "
                f"{len(in_window_due)} stalest; {len(stale)} are "
                "scheduled debt for the next rotation"
            )

    # Schedule-feasibility simulation (round-6 verdict #2): with 3-round
    # cadence, this round's rotation must not paint the NEXT round into
    # a corner. Assume every window entry goes green this round, then
    # count round N+1's forced set (entries whose latest green would be
    # 2+ rounds old) plus a NEW_BUDGET allowance for next round's
    # new/changed queries; it must fit the window.
    #
    # NEW_BUDGET history: 5 through r15 (the r12 era registered five
    # queries in one round). Entering r16 the rotating set reached 143
    # of the 150 = 3x50 steady-state ceiling, and the registration
    # policy has been 1/round since r12 (queries/__init__.py capacity
    # note) — a 5-slot allowance now fails every round on arithmetic
    # alone (46 forced entering r17 is the cadence working as designed,
    # not a scheduling hole). The allowance therefore matches the
    # policy: 1 new registration. Fingerprint-forced EDITS get no
    # reserved slack by design — operator-module edits must be
    # scheduled WITH the window whose forced set already contains
    # their dependents (the r15/r16 dedup-drain practice); query-local
    # edits force only themselves and fit the same way.
    NEW_BUDGET = 1
    simulated = dict(latest)
    for n in window:
        simulated[n] = max(simulated.get(n, 0), prep_round)
    next_forced = sorted(
        n for n in rotating if simulated.get(n, 0) < prep_round - 1
    )
    headroom = WINDOW - len(next_forced) - NEW_BUDGET
    print(
        f"simulate: if r{prep_round}'s window goes green, "
        f"r{prep_round + 1} forces {len(next_forced)} entries; "
        f"+{NEW_BUDGET} new-query budget leaves headroom {headroom}"
    )
    if len(next_forced) + NEW_BUDGET > WINDOW:
        print(
            f"FAIL: r{prep_round + 1}'s forced set ({len(next_forced)}) "
            f"+ new-query budget ({NEW_BUDGET}) exceeds the "
            f"{WINDOW}-slot window — backfill more of it THIS round:"
        )
        for n in next_forced:
            print(f"  - {n} (latest green r{simulated.get(n, 0)})")
        rc = 1
    else:
        print("OK: next round's schedule is satisfiable")

    # Multi-round horizon (round-8; debt/capacity split round-11 per
    # the round-10 verdict #2): the one-round simulation above can
    # still paint round N+2 into a corner. Two distinct questions:
    #
    # 1. CAPACITY (structural): replaying the greedy policy from a
    #    hypothetical fully-caught-up state, what is the largest
    #    new-registration rate the registry sustains? If even 0 fails
    #    here, the registry has genuinely outgrown the cadence —
    #    split or retire queries. This is independent of any
    #    transient debt.
    # 2. DEBT (transient): from the LIVE green state, does the same
    #    rate hold? If not (e.g. after a missed rotation), replay a
    #    recovery at rate 0 that carries the overflow, and report how
    #    many rounds until the forced set fits a window again. A debt
    #    that clears is a schedule, not a failure.
    # The project's full remaining schedule (r20 is the final round):
    # replaying PAST the last real round would demand capacity for
    # rounds that will never run (the fixed 8 set at r13 began failing
    # the moment the rotating set crossed 150 - 8 even though every
    # real remaining round fits). Floor 1, not 3 (r16 advice): a floor
    # above the true remainder resurrects exactly the phantom-round
    # over-demand this clamp exists to remove (prep_round 19 would
    # replay r21; 20 would replay r21-r22).
    HORIZON = max(1, 21 - prep_round)
    fresh_state = {n: prep_round - 1 for n in rotating}
    capacity_rate = None
    for new_rate in range(NEW_BUDGET, -1, -1):
        ok, detail = horizon_feasible(
            fresh_state, set(current), prep_round, HORIZON, new_rate,
            exempt=ROTATION_EXEMPT,
        )
        if ok:
            capacity_rate = new_rate
            print(
                f"capacity: steady-state sustains {new_rate} new "
                f"queries/round over {HORIZON} rounds "
                f"({len(rotating)} rotating / {WINDOW}-slot window)"
            )
            break
    if capacity_rate is None:
        print(
            "FAIL: structurally infeasible — even 0 new queries per "
            "round breaks the cadence from a fully-caught-up state; "
            "the registry has outgrown the 3-round rotation; split "
            "or retire queries"
        )
        rc = 1
        return rc

    live_rate = None
    for new_rate in range(capacity_rate, -1, -1):
        ok, detail = horizon_feasible(
            latest, set(current), prep_round, HORIZON, new_rate,
            exempt=ROTATION_EXEMPT,
        )
        if ok:
            live_rate = new_rate
            live_detail = detail
            break
    if live_rate == capacity_rate:
        print(
            f"horizon: registering {live_rate} new queries per round "
            f"stays feasible through r{prep_round + HORIZON - 1} "
            f"(per-round forced: {live_detail})"
        )
    elif live_rate is not None:
        print(
            f"recovery: live state sustains only {live_rate} new "
            f"queries/round until the debt clears (steady-state "
            f"capacity {capacity_rate}/round; per-round forced: "
            f"{live_detail})"
        )
    else:
        n_debt = len(due)
        cleared, counts = recovery_plan(
            latest, set(current), prep_round, HORIZON, 0,
            exempt=ROTATION_EXEMPT,
        )
        if cleared is None:
            print(
                f"FAIL: one-time debt of {n_debt} stale entries does "
                f"NOT clear within {HORIZON} rounds even at 0 new "
                f"registrations/round (per-round forced: {counts})"
            )
            rc = 1
        else:
            print(
                f"recovery: one-time debt of {n_debt} stale entries "
                f"clears in {cleared + 1} round(s) at 0 new "
                f"registrations/round (per-round forced: {counts}); "
                f"steady-state capacity {capacity_rate}/round "
                "resumes after"
            )
    return rc


def horizon_feasible(
    latest: dict[str, int],
    registry: set[str],
    prep_round: int,
    horizon: int,
    new_per_round: int,
    exempt: frozenset[str] = frozenset(),
) -> tuple[bool, list[int]]:
    """Replay `horizon` rounds of the greedy rotation at a fixed
    new-registration rate: each round (INCLUDING `prep_round` — the
    round-8 verdict's fix: simulating the literal, not-yet-rotated
    GRADING_PRIORITY made the gate red at the start of every round)
    takes its forced set + `new_per_round` synthetic registrations,
    then backfills remaining slots oldest-green first. `exempt` names
    (ROTATION_EXEMPT differential twins) are never forced and never
    consume backfill. Returns (feasible, per-round forced counts);
    infeasible == some round's forced+new exceeds the window, i.e. the
    registry genuinely cannot fit the cadence no matter how it is
    rotated."""
    green = dict(latest)
    reg = {q for q in registry if q not in exempt}
    forced_counts: list[int] = []
    synth = 0
    for t in range(prep_round, prep_round + horizon):
        forced = sorted(q for q in reg if green.get(q, 0) < t - 2)
        fresh = []
        for _ in range(new_per_round):
            synth += 1
            q = f"_synth_{synth}"
            reg.add(q)
            fresh.append(q)
        if len(forced) + len(fresh) > WINDOW:
            forced_counts.append(len(forced))
            return False, forced_counts
        rest = sorted(
            (q for q in reg if q not in forced and q not in fresh),
            key=lambda q: (green.get(q, 0), q),
        )
        window = forced + fresh + rest[: WINDOW - len(forced) - len(fresh)]
        forced_counts.append(len(forced))
        for q in window:
            green[q] = t
    return True, forced_counts


def recovery_plan(
    latest: dict[str, int],
    registry: set[str],
    prep_round: int,
    horizon: int,
    new_per_round: int,
    exempt: frozenset[str] = frozenset(),
) -> tuple[int | None, list[int]]:
    """Replay the greedy rotation from the LIVE green state, CARRYING
    overflow (unlike `horizon_feasible`, which declares infeasibility
    the moment a forced set exceeds the window): when forced > slots,
    the stalest entries take every slot and the remainder waits a
    round. Returns (rounds_to_clear, per_round_forced):
    rounds_to_clear is the 0-based index of the first replayed round
    from which EVERY remaining round's forced set fits the window
    alongside the new-registration budget — i.e. a one-time debt's
    recovery length — or None if the tail never fits within `horizon`
    (structural, not transient; an oversized registry can fit early
    rounds and only overflow once the cadence wraps, so a first-fit
    definition would misreport it as recoverable)."""
    green = dict(latest)
    reg = {q for q in registry if q not in exempt}
    counts: list[int] = []
    synth = 0
    for t in range(prep_round, prep_round + horizon):
        forced = sorted(
            (q for q in reg if green.get(q, 0) < t - 2),
            key=lambda q: (green.get(q, 0), q),
        )
        counts.append(len(forced))
        fresh = []
        for _ in range(new_per_round):
            synth += 1
            q = f"_synth_{synth}"
            reg.add(q)
            fresh.append(q)
        take = forced[: max(0, WINDOW - len(fresh))]
        taken = set(take) | set(fresh)
        rest = sorted(
            (q for q in reg if q not in taken),
            key=lambda q: (green.get(q, 0), q),
        )
        window = take + fresh + rest[: WINDOW - len(take) - len(fresh)]
        for q in window:
            green[q] = t
    cleared: int | None = None
    for i in range(len(counts) - 1, -1, -1):
        if counts[i] + new_per_round > WINDOW:
            break
        cleared = i
    return cleared, counts


if __name__ == "__main__":
    raise SystemExit(main())
