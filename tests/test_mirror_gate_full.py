"""Env-gated full mirror gate at the driver's SF (ADVICE r3 #5).

tests/test_queries_oracle.py already checks EVERY catalog entry (including
queries rotated past the driver's 50-entry window) against its oracle at
sf0.001 on every pytest run. This test additionally runs the type-strict
gate at sf0.01 — the driver's own scale — when GRAFT_FULL_GATE=1 is set
(kept out of the default suite: it adds minutes). The pre-ship checklist in
CLAUDE.md runs it via scripts/mirror_gate.py.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(not os.environ.get("GRAFT_FULL_GATE"),
                    reason="set GRAFT_FULL_GATE=1 to run the sf0.01 gate")
def test_mirror_gate_sf001():
    proc = subprocess.run(
        [sys.executable, "scripts/mirror_gate.py", "/root/testdata/sf0.01"],
        capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
