"""Run the engine's main surfaces on a bare PySpark session in a fresh JVM.

This is the class-closing regression for the round-3 driver outage: the
whole suite otherwise shares ``session.py``'s tuned conf, so a bug that only
bites a default session (exactly what the external driver runs) is invisible
in-repo.  See ``tests/vanilla_session_job.py`` for what runs.
"""

from __future__ import annotations

import os
import subprocess
import sys

JOB = os.path.join(os.path.dirname(__file__), "vanilla_session_job.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_vanilla_session_end_to_end(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # make sure the repo's own tuning can't leak in via env either
    for k in ("SPARK_GRAFT_MASTER", "SPARK_GRAFT_CPUS", "SPARK_GRAFT_MPB"):
        env.pop(k, None)
    proc = subprocess.run(
        [sys.executable, JOB, str(tmp_path)],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"vanilla-session job failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    assert "VANILLA-OK" in proc.stdout
