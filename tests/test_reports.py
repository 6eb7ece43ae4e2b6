"""End-to-end report runner (scripts/run_reports.py): the reference's
EP-1/EP-3 CSV + summary artifacts and the EP-2/EP-4 chart artifacts
must all land from one invocation — run in a subprocess so the runner
builds its own session exactly as a user would."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import xml.etree.ElementTree as ET

from .conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_reports_produces_all_artifacts():
    out_dir = tempfile.mkdtemp(prefix="reports_test_")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_reports.py"),
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
        "revenue_by_group",
        "top_spenders",
        "product_pairs",
        "user_engagement",
        "engagement_vs_spend",
    ):
        files = os.listdir(os.path.join(out_dir, csv_report))
        assert any(f.endswith(".csv") for f in files), (csv_report, files)
    with open(os.path.join(out_dir, "integrated_summary.txt")) as f:
        summary = f.read()
    assert "corr_total_spent_vs_sessions_count" in summary
    for svg in (
        "01_revenue_by_group_top10.svg",
        "02_top_spenders_top10.svg",
        "03_also_bought_pairs_top10.svg",
        "04_engagement_vs_spend.svg",
    ):
        root = ET.parse(os.path.join(out_dir, svg)).getroot()
        assert root.tag.endswith("svg")
        marks = [
            e for e in root.iter() if e.get("class") in ("bar", "point")
        ]
        assert marks, svg  # every chart draws at least one mark
