"""The shuffle trend gate's prior-artifact selection
(scripts/scan_audit.py) — the r15 ADVICE hole: an ad-hoc run (no
--json, or a non-canonical output name) used to compare against the
artifact the SAME round had already committed, flagging its own
expected shuffle moves as regressions. The fix derives the in-progress
round from max(CORRECTNESS round)+1 and excludes same-round artifacts;
these pins hold that selection against the repo's committed state."""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scan_audit import _current_prep_round, _prior_shuffles  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rounds(pattern: str, sf_dir: str | None = None) -> list[int]:
    """Recorded round numbers, optionally restricted to artifacts
    whose sf_dir field equals `sf_dir` — the selection under test is
    same-scale-only, so the expectation must be too (r16 advice: an
    unfiltered expectation breaks the moment any round records a scan
    audit at a different scale)."""
    import json

    out = []
    for p in glob.glob(os.path.join(REPO, pattern)):
        m = re.search(r"r(\d+)\.json$", p)
        if not m:
            continue
        if sf_dir is not None:
            try:
                with open(p) as fh:
                    if json.load(fh).get("sf_dir") != sf_dir:
                        continue
            except (OSError, ValueError):
                continue
        out.append(int(m.group(1)))
    return sorted(out)


def test_prep_round_is_one_past_last_graded():
    graded = _rounds("CORRECTNESS_r*.json")
    assert graded, "repo has graded rounds"
    assert _current_prep_round() == max(graded) + 1


def test_prior_never_selects_the_in_progress_round():
    """The default (fallback) exclusion: the chosen prior artifact's
    round must predate the round being prepared, even when that
    round's own SCANS_r{N}.json is already committed."""
    prep = _current_prep_round()
    fname, shuffles = _prior_shuffles(SF, prep)
    assert fname is not None
    m = re.search(r"SCANS_r(\d+)\.json$", fname)
    assert int(m.group(1)) < prep
    assert shuffles and all(isinstance(v, int) for v in shuffles.values())


def test_exclude_round_steps_back_through_history():
    """Excluding round N must select the newest same-sf artifact
    strictly older than N — expectation restricted to sf0.001
    artifacts, matching the selection's own same-scale rule."""
    scans = _rounds("SCANS_r*.json", sf_dir=SF)
    assert len(scans) >= 2
    newest, second = scans[-1], scans[-2]
    fname, _ = _prior_shuffles(SF, newest + 1)
    assert fname == f"SCANS_r{newest}.json"
    fname, _ = _prior_shuffles(SF, newest)
    assert fname == f"SCANS_r{second}.json"


def test_mismatched_sf_returns_no_prior():
    """Cross-scale AQE choices differ; a different sf_dir must never
    be treated as a comparable prior."""
    fname, shuffles = _prior_shuffles("/root/testdata/sf0.1", None)
    assert fname is None and shuffles == {}
