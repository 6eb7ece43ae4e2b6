"""The grading-rotation horizon simulator (scripts/grading_manifest.py
`horizon_feasible`): replayed-policy feasibility on synthetic states
where the answer is computable by hand, plus the live-repo invariant
that SOME rate is feasible (the gate's FAIL branch stays unreachable
while the registry fits the cadence)."""

from __future__ import annotations

import importlib.util
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "grading_manifest",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "grading_manifest.py",
    ),
)
_MOD = importlib.util.module_from_spec(_SPEC)
sys.modules.setdefault("grading_manifest", _MOD)
_SPEC.loader.exec_module(_MOD)

horizon_feasible = _MOD.horizon_feasible
recovery_plan = _MOD.recovery_plan
WINDOW = _MOD.WINDOW


def _state(n_queries: int, green_round: int):
    reg = {f"q{i}" for i in range(n_queries)}
    return {q: green_round for q in reg}, reg


def test_small_registry_any_rate_feasible():
    """60 queries, all green last round: forced sets stay ~20/round,
    so even the max 5/round rate survives a long horizon."""
    latest, reg = _state(60, green_round=7)
    ok, forced = horizon_feasible(latest, reg, 8, 8, 5)
    assert ok, forced
    assert all(f + 5 <= WINDOW for f in forced)


def test_oversized_registry_infeasible_at_zero():
    """155 queries on a 3-round cadence need >51 slots/round on
    average — even 0 new/round must eventually fail."""
    latest, reg = _state(155, green_round=7)
    ok, _ = horizon_feasible(latest, reg, 8, 9, 0)
    assert not ok


def test_forced_counts_replay_the_cadence():
    """150 queries exactly saturate 3x50: the greedy replay must run
    each round at exactly 50 forced-or-backfilled slots with zero
    room, and report feasibility at rate 0 only."""
    latest, reg = _state(150, green_round=7)
    ok0, _ = horizon_feasible(latest, reg, 8, 9, 0)
    ok1, _ = horizon_feasible(latest, reg, 8, 9, 1)
    assert ok0 and not ok1


def test_exempt_twins_never_forced():
    """155 queries is infeasible — unless 10 of them are
    ROTATION_EXEMPT differential twins, which shrinks the rotating set
    to 145 and restores feasibility at rate 0."""
    latest, reg = _state(155, green_round=7)
    exempt = frozenset(f"q{i}" for i in range(10))
    ok, _ = horizon_feasible(latest, reg, 8, 9, 0, exempt=exempt)
    assert ok


def test_greedy_prep_round_ignores_stale_literal_window():
    """The round-8 verdict's false alarm: 142 queries, 42 of them two
    rounds stale (the driver just advanced the prep round, the literal
    GRADING_PRIORITY not yet rotated). The greedy replay must report
    feasible — rotated properly, the cadence fits — rather than
    failing on the stale literal window as the old simulation did."""
    latest = {f"q{i}": (6 if i < 42 else 7 if i < 92 else 8) for i in range(142)}
    reg = set(latest)
    ok, forced = horizon_feasible(latest, reg, 9, 6, 0)
    assert ok, forced
    assert forced[0] == 42  # the stale cohort is forced in the prep round


def test_live_repo_has_a_feasible_rate():
    """The live registry must be schedulable (round-10 verdict #2's
    debt/capacity split): (a) STRUCTURALLY — from a fully-caught-up
    state the cadence must sustain at least 0 new queries/round (a
    FAIL here means the registry outgrew the 3-round rotation: split
    or retire); and (b) TRANSIENTLY — if the live green history
    carries debt (e.g. a missed rotation), the carry-overflow
    recovery replay must clear it within the horizon. Either a clean
    live state or a bounded recovery keeps this green."""
    latest, prep = _MOD.latest_green_rounds()
    current = set(_MOD.fingerprints())
    exempt = _MOD.ROTATION_EXEMPT
    fresh = {n: prep - 1 for n in current if n not in exempt}
    ok_cap, cap_detail = horizon_feasible(
        fresh, current, prep, 6, 0, exempt=exempt
    )
    assert ok_cap, f"structural capacity exceeded: {cap_detail}"
    ok_live, _ = horizon_feasible(latest, current, prep, 6, 0, exempt=exempt)
    if not ok_live:
        cleared, counts = recovery_plan(
            latest, current, prep, 6, 0, exempt=exempt
        )
        assert cleared is not None, f"debt never clears: {counts}"


def test_recovery_plan_clears_missed_rotation_debt():
    """The round-10 incident in miniature: 138 rotating queries where
    89 entered the prep round 2+ rounds stale (rotation skipped for a
    round). `horizon_feasible` rightly reports the immediate state
    infeasible (89 forced > 50 slots), but the carry-overflow
    recovery replay must show the debt clearing: round 1 retires the
    50 stalest, round 2 sweeps the remaining 39 + the newly-2-rounds-
    old names, and from round 3 the steady cadence resumes."""
    latest = {
        f"q{i}": (8 if i < 89 else 10 if i < 138 else 99)
        for i in range(138)
    }
    reg = set(latest)
    ok, _ = horizon_feasible(latest, reg, 11, 6, 0)
    assert not ok  # the instantaneous gate cannot hold 89 in 50
    cleared, counts = recovery_plan(latest, reg, 11, 6, 0)
    assert counts[0] == 89
    assert cleared == 1  # round 2 of the replay fits the window again
    assert counts[1] <= WINDOW
    assert all(c <= WINDOW for c in counts[1:])


def test_recovery_plan_reports_structural_infeasibility():
    """An oversized registry (155 rotating on a 3-round cadence needs
    >51 slots/round) must NOT masquerade as recoverable debt: the
    carry-overflow replay never reaches a round whose forced set fits
    the window, so rounds_to_clear is None — main()'s split-or-retire
    FAIL branch, not its recovery branch."""
    latest = {f"q{i}": 7 for i in range(155)}
    reg = set(latest)
    cleared, counts = recovery_plan(latest, reg, 8, 9, 0)
    assert cleared is None, counts


def test_recovery_plan_clean_state_clears_immediately():
    """With no debt at all, the recovery replay reports clearing at
    round 0 and its forced counts match `horizon_feasible`'s."""
    latest = {f"q{i}": 7 for i in range(120)}
    reg = set(latest)
    cleared, counts = recovery_plan(latest, reg, 8, 6, 0)
    assert cleared == 0
    ok, forced = horizon_feasible(latest, reg, 8, 6, 0)
    assert ok and forced == counts


def test_suggest_window_invariants():
    """--suggest's window must contain every forced entry, never
    exceed the 50 slots, never name an exempt query in backfill, and
    leave the declared room for new registrations."""
    latest, prep = _MOD.latest_green_rounds()
    current = _MOD.fingerprints()
    forced, backfill, free = _MOD.suggest_window(
        current, latest, prep, new_budget=1
    )
    assert len(forced) + len(backfill) + free == WINDOW
    # the reserved new-registration slot survives whenever the forced
    # set leaves any room at all (a 50-forced round is a horizon-test
    # problem, not a suggest problem)
    if len(forced) < WINDOW:
        assert free >= 1
    assert not (set(forced) & set(backfill))
    exempt = _MOD.ROTATION_EXEMPT
    stale = {
        n
        for n in current
        if n not in exempt and latest.get(n, 0) < prep - 2
    }
    assert stale <= set(forced)
    assert not (set(backfill) & exempt)


def test_changed_names_is_format_aware():
    """The format-1 -> format-2 manifest migration (r13): a frozen
    flat map compares `own` hashes only; a format-2 manifest compares
    the full {own, deep} pair — so arming the transitive gate cannot
    spuriously force the whole registry in the migration round."""
    current = {
        "a": {"own": "o1", "deep": "d1"},
        "b": {"own": "o2", "deep": "d2"},
    }
    # format 1: only b's own hash differs
    frozen1 = {"a": "o1", "b": "STALE"}
    assert _MOD.changed_names(frozen1, current) == ["b"]
    # format 2: a's deep differs (operator edit), own identical
    frozen2 = {
        "_format": 2,
        "queries": {
            "a": {"own": "o1", "deep": "OLD"},
            "b": {"own": "o2", "deep": "d2"},
        },
    }
    assert _MOD.changed_names(frozen2, current) == ["a"]
    # unknown query (new registration) is changed under both formats
    assert _MOD.changed_names({}, current) == ["a", "b"]


def test_query_dep_modules_sees_operator_closure():
    """The r12 blind spot, pinned closed: a graded query's deep
    fingerprint must cover the operator module it calls AND that
    module's own package-internal imports (dedup_jaccard_pairs ->
    operators.dedup; corpus_bpe_merges -> operators.bpe ->
    operators.checkpoints), while staying OUT of the queries package
    (sibling edits and window rotations must not rotate unrelated
    fingerprints)."""
    from big_data_analytics_final_project_spark.queries import all_queries

    aq = all_queries()
    pkg = "big_data_analytics_final_project_spark"
    deps_jac = _MOD._query_dep_modules(aq["dedup_jaccard_pairs"].fn)
    assert f"{pkg}.operators.dedup" in deps_jac
    deps_bpe = _MOD._query_dep_modules(aq["corpus_bpe_merges"].fn)
    assert f"{pkg}.operators.bpe" in deps_bpe
    assert f"{pkg}.operators.checkpoints" in deps_bpe  # transitive
    for deps in (deps_jac, deps_bpe):
        assert not any(d.startswith(f"{pkg}.queries") for d in deps)
    # constant-input exemption soundness: gen_* must cover generator
    deps_gen = _MOD._query_dep_modules(aq["gen_transactions_flat"].fn)
    assert f"{pkg}.generator" in deps_gen


def test_deep_fingerprint_tracks_operator_source():
    """An operator-module source change must flip every dependent
    query's deep fingerprint and no unrelated one (simulated by
    poisoning the module-source cache rather than editing the file)."""
    fps_before = _MOD.fingerprints()
    pkg = "big_data_analytics_final_project_spark"
    target = f"{pkg}.operators.dedup"
    # poison the lru_cache for one module's source
    orig = _MOD._module_src
    _MOD._module_src.cache_clear()

    def patched(mod):
        src = orig.__wrapped__(mod)
        return src + "\n# edited" if mod == target else src

    import functools
    _MOD._module_src = functools.lru_cache(maxsize=None)(patched)
    try:
        fps_after = _MOD.fingerprints()
    finally:
        _MOD._module_src = orig
        _MOD._module_src.cache_clear()
    flipped = {
        n
        for n in fps_before
        if fps_before[n]["deep"] != fps_after[n]["deep"]
    }
    same_own = all(
        fps_before[n]["own"] == fps_after[n]["own"] for n in fps_before
    )
    assert same_own  # own hashes never see operator sources
    assert "dedup_jaccard_pairs" in flipped
    assert "dedup_exact" in flipped
    assert "pricing_summary" not in flipped
    assert "gen_transactions_flat" not in flipped
