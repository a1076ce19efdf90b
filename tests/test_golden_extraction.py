"""Byte-identity golden test — the pytest oracle suite of the north rule.

Every fixture url's extracted content must hash identically to the
frozen golden record (`tests/golden/extraction_v1.json`).  A mismatch
means extraction behaviour changed; regenerate deliberately with
`python tests/golden_tools.py regen` and review the diff.
"""

import json
import os

import pytest

from tests.golden_tools import GOLDEN_PATH, compute_records


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN_PATH):
        pytest.fail("golden file missing — run: python tests/golden_tools.py regen")
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def current():
    return compute_records()


def test_same_urls(golden, current):
    assert set(golden) == set(current)


def test_byte_identity_per_url(golden, current):
    mismatches = [
        (url, golden[url], current[url])
        for url in golden
        if golden[url] != current[url]
    ]
    if mismatches:
        url, g, c = mismatches[0]
        pytest.fail(
            f"{len(mismatches)}/{len(golden)} url(s) diverge from golden; "
            f"first: {url}\n golden : {g}\n current: {c}"
        )


def test_no_error_rows(current):
    errors = {u: r for u, r in current.items() if r["status"] != "ok"}
    assert not errors, f"error rows: {list(errors)[:3]}"


def test_branch_coverage(current):
    branches = {r["branch"] for r in current.values()}
    assert {"html", "pdf", "xml", "json"} <= branches


def test_method_coverage(current):
    methods = {r["method"].split(":")[0] for r in current.values()}
    assert {"domain", "jsonld", "detected", "generic", "pdf"} <= methods
