#!/usr/bin/env python
"""Grading-window completeness gate.

The driver grades only the FIRST 50 entries of `grading_order()` each
round, so any query whose implementation or oracle changed since the
last driver grading MUST sit inside that window — otherwise the round
ships changed-but-unverified code (round 4's three late-landing
queries; nearly round 3 too).

Mechanics: `scripts/grading_manifest.json` holds a fingerprint per
query (sha256 of the query function's source + its oracle SQL), frozen
at the END of each round — i.e. the state the driver last graded.

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
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_analytics_final_project_spark.queries import (
    ROTATION_EXEMPT,
    all_queries,
    grading_order,
)

MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "grading_manifest.json")
WINDOW = 50


def fingerprints() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, spec in all_queries().items():
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            src = repr(spec.fn)
        h = hashlib.sha256()
        h.update(src.encode())
        h.update(b"\x00")
        h.update((spec.sql or "").encode())
        out[name] = h.hexdigest()
    return out


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
    current: dict[str, str],
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
    rotating = [n for n in current if n not in ROTATION_EXEMPT]
    forced = sorted(
        n
        for n in current
        if (n not in ROTATION_EXEMPT and latest.get(n, 0) < prep_round - 2)
        or frozen.get(n) != current[n]
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
            json.dump(current, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"froze {len(current)} fingerprints -> {MANIFEST}")
        return 0

    if not os.path.exists(MANIFEST):
        print(f"FAIL: {MANIFEST} missing — run with --freeze once")
        return 1
    with open(MANIFEST) as f:
        frozen = json.load(f)
    changed = sorted(
        n for n, fp in current.items() if frozen.get(n) != fp
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
    stale = sorted(
        n
        for n in rotating
        if latest.get(n, 0) < prep_round - 2 and n not in window
    )
    n_due = sum(1 for n in rotating if latest.get(n, 0) < prep_round - 2)
    print(
        f"rotation: preparing round {prep_round}; {n_due} queries' latest "
        f"green row predates r{prep_round - 2}; window holds "
        f"{n_due - len(stale)} of them"
    )
    if stale:
        print(
            f"FAIL: stale queries (latest green < r{prep_round - 2}) "
            f"OUTSIDE the window — they would age out unverified:"
        )
        for n in stale:
            print(f"  - {n} (latest green r{latest.get(n, 0)})")
        rc = 1
    else:
        print("OK: every stale query is inside the grading window")

    # Schedule-feasibility simulation (round-6 verdict #2): with 3-round
    # cadence, this round's rotation must not paint the NEXT round into
    # a corner. Assume every window entry goes green this round, then
    # count round N+1's forced set (entries whose latest green would be
    # 2+ rounds old) plus a NEW_BUDGET allowance for next round's
    # new/changed queries; it must fit the window.
    NEW_BUDGET = 5
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

    # Multi-round horizon (round-8): the one-round simulation above
    # can still paint round N+2 into a corner (the COVERAGE.md
    # capacity note). Replay the greedy policy — each round takes its
    # forced set + `new` registrations, then backfills the remaining
    # slots with the OLDEST-green entries — for several rounds, at
    # each candidate new-registration rate, and report the largest
    # rate that stays feasible across the horizon.
    HORIZON = 6
    for new_rate in range(NEW_BUDGET, -1, -1):
        ok, detail = horizon_feasible(
            latest, set(current), prep_round, HORIZON, new_rate,
            exempt=ROTATION_EXEMPT,
        )
        if ok:
            print(
                f"horizon: registering {new_rate} new queries per round "
                f"stays feasible through r{prep_round + HORIZON - 1} "
                f"(per-round forced: {detail})"
            )
            break
        if new_rate == NEW_BUDGET:
            print(
                f"horizon: {new_rate}/round INFEASIBLE within "
                f"{HORIZON} rounds ({detail}) — largest sustainable "
                f"rate reported below"
            )
    else:
        print(
            "FAIL: even 0 new queries per round breaks the cadence "
            f"within {HORIZON} rounds ({detail}) — the registry has "
            "outgrown the 3-round rotation; split or retire queries"
        )
        rc = 1
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


if __name__ == "__main__":
    raise SystemExit(main())
