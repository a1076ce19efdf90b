"""Mechanical disposition sweep (round-6 directive).

Three rounds in a row, a portable reference module fell through the
hand-maintained COVERAGE.md lists (selective-evidence in round 4;
application-tracker, image-caption, domain-memory, safe-browsing,
domain-verify in round 5; domain-intel in round 6).  This test makes
the completeness check executable: every ``src/core/*.ts``,
``src/ee/*.ts`` and ``src/ee/extractors/*.ts`` module in the
reference tree must be named, by literal filename, somewhere in
COVERAGE.md — either as ported (with its Python home) or N/A with a
reason.  A reference module added or renamed without a disposition
fails here instead of surfacing in the next judge pass.
"""

from __future__ import annotations

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("WEBPEEL_REFERENCE", "/root/reference")
COVERAGE = os.path.join(REPO, "COVERAGE.md")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src", "core")),
    reason="reference tree not available",
)


def _modules():
    pats = ("src/core/*.ts", "src/ee/*.ts", "src/ee/extractors/*.ts",
            # round-6 widening: the misfiling class moved outward
            # (core → ee → server middleware / mcp), so the sweep now
            # covers every tree that has yielded a portable module
            "src/*.ts", "src/server/*.ts", "src/server/middleware/*.ts",
            "src/server/routes/**/*.ts",  # recursive: covers routes/*.ts too
            "src/mcp/*.ts", "src/mcp/handlers/*.ts", "src/cli/*.ts",
            "src/cli/commands/*.ts", "src/worker/*.ts",
            "src/integrations/*.ts")
    out = []
    for p in pats:
        out.extend(sorted(glob.glob(os.path.join(REFERENCE, p),
                                    recursive=True)))
    return out


def test_every_reference_module_is_dispositioned():
    with open(COVERAGE, encoding="utf-8") as f:
        cov = f.read()
    missing = [
        os.path.relpath(m, REFERENCE)
        for m in _modules()
        if os.path.basename(m) not in cov
    ]
    assert not missing, (
        f"{len(missing)} reference module(s) have no disposition in "
        f"COVERAGE.md (add each as ported-with-home or N/A-with-reason): "
        f"{missing}"
    )


def test_sweep_actually_sees_the_tree():
    """Guard the guard: the sweep must see the ~110 core/ee modules
    plus ~50 extractors — a glob typo that matches nothing would make
    the completeness test vacuously green."""
    mods = _modules()
    assert len(mods) >= 200, f"only {len(mods)} modules globbed"
    names = {os.path.basename(m) for m in mods}
    # spot anchors across the globbed directories
    assert {"pipeline.ts", "domain-intel.ts", "wikipedia.ts",
            "url-validator.ts", "smart-router.ts"} <= names


def test_ported_homes_exist():
    """Every `pure/...py` / `operators/...py` / `plans/...py` path
    named in the round-6 disposition tables must exist — a stale table
    that points at deleted files is as misleading as a missing row."""
    import re

    with open(COVERAGE, encoding="utf-8") as f:
        cov = f.read()
    sec = cov.split("## Complete module disposition", 1)
    assert len(sec) == 2, "disposition section missing from COVERAGE.md"
    homes = re.findall(
        r"`((?:pure|operators|plans|streaming|sources)/[\w/]+\.py)`", sec[1])
    assert homes, "no module homes parsed from the disposition tables"
    missing = [h for h in set(homes)
               if not os.path.exists(
                   os.path.join(REPO, "webpeel_spark", h))]
    assert not missing, f"disposition tables point at missing files: {missing}"
