"""End-to-end observability runner (scripts/run_monitors.py): the
profile/drift/anomaly/PSI/skew/privacy artifacts must all land from
one invocation — run in a subprocess so the runner builds its own
session exactly as a user would (the pattern of test_reports.py)."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

from .conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_monitors_produces_all_artifacts():
    out_dir = tempfile.mkdtemp(prefix="monitors_test_")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_monitors.py"),
            "--sf-dir",
            SF_SMOKE,
            "--out-dir",
            out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for csv_report in (
        "profile_events",
        "profile_documents",
        "profile_drift",
        "hourly_anomalies",
        "segment_psi",
        "join_key_skew",
        "rolling_quantiles",
        "join_advisor",
    ):
        files = os.listdir(os.path.join(out_dir, csv_report))
        assert any(f.endswith(".csv") for f in files), (csv_report, files)
    with open(os.path.join(out_dir, "monitor_summary.txt")) as f:
        summary = f.read()
    for key in (
        "profile_drift_columns",
        "anomalous_hours",
        "drifted_segments",
        "k_anonymity",
        "p95_value_range",
        "join_recommendations",
    ):
        assert key in summary, (key, summary)
    with open(os.path.join(out_dir, "k_anonymity.txt")) as f:
        assert "verdict=" in f.read()
