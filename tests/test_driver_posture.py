"""Every registered query must run on a PLAIN SparkSession.

The grading driver passes its own default session into
`queries()[name](spark, sf_dir)` — any dependence on the engine's
session.py configuration is invisible to pytest (whose fixture uses
`get_session`) but fatal to the driver. This test re-creates the
driver's posture in a SUBPROCESS: a fresh default session cannot be
built in-process because `SparkSession.builder.getOrCreate()` would
reuse the test JVM's already-configured SparkContext.

Round-1 regression: `spark.sql.legacy.parquet.nanosAsLong` lived only
in session.py, so all 18 events-reading queries errored under the
driver while the whole local suite stayed green.
"""

from __future__ import annotations

import os
import subprocess
import sys

from .conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_queries_run_on_plain_session():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "driver_posture_smoke.py"),
            SF_SMOKE,
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    tail = proc.stdout[-4000:] + "\n" + proc.stderr[-2000:]
    assert proc.returncode == 0, f"plain-session smoke failed:\n{tail}"
    assert "0 failures" in proc.stdout
