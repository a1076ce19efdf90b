"""Whole-stage-codegen health gate (r9 verdict item #5).

The janino 64 KB method-limit failure is logged once at ERROR and then
the entire stage silently runs interpreted — that cost ~25% extraction
throughput for six rounds (r3-r9) before a stderr grep caught it.  This
gate runs the flagship smoke (the historically-affected plan: the fused
extraction output stage with the credibility/phishing projection) in a
subprocess with captured stderr and fails loud on any codegen-failure
signature.  bench.py carries the same sentinel in-process and publishes
``codegen_errors`` in every bench artifact.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SIGNATURES = ("ERROR CodeGenerator", "grows beyond 64 KB",
              "Whole-stage codegen disabled")


def test_flagship_stage_compiles():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__spark_entry__.py")],
        capture_output=True, text=True, timeout=600, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    bad = [ln for ln in proc.stderr.splitlines()
           if any(sig in ln for sig in SIGNATURES)]
    assert not bad, (
        "janino codegen failure in the flagship plan — the stage is "
        "running interpreted:\n" + "\n".join(bad[:5]))
