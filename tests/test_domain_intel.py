"""domain-intel.ts port: fold + recommendation parity pinned against
Node's actual output of the reference logic (12-case fixture generated
by running the transcribed reference under Node with Date.now()
parameterized per record — tests/golden/domain_intel_node.json), plus
the order-dependence / TTL-restart semantics and the Spark table
build."""

from __future__ import annotations

import json
import math
import os

import pytest

from webpeel_spark.pure.domain_intel import (
    MIN_SAMPLES,
    TTL_MS,
    domain_key,
    fold_intel,
    recommend,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "domain_intel_node.json")
with open(FIXTURE) as f:
    NODE_CASES = json.load(f)


def _fold_case(case):
    recs = [{"method": r["method"], "latency_ms": r["latency_ms"],
             "ts": r["ts"]} for r in case["records"]]
    return fold_intel(case["key"], recs)


class TestNodeParity:
    @pytest.mark.parametrize("case", NODE_CASES,
                             ids=[c["name"] for c in NODE_CASES])
    def test_fold_matches_node(self, case):
        if not case["key"]:
            assert domain_key(case["url"]) == ""
            return
        entry = _fold_case(case)
        intel, counts = case["intel"], case["counts"]
        if intel is None:
            assert entry is None
            return
        assert entry["needs_browser"] == intel["needsBrowser"]
        assert entry["needs_stealth"] == intel["needsStealth"]
        # EMA doubles must be BIT-identical: same operand order, same
        # IEEE ops as the reference (Node) fold
        assert entry["avg_latency_ms"] == intel["avgLatencyMs"], case["name"]
        assert entry["last_seen"] == intel["lastSeen"]
        assert entry["sample_count"] == intel["sampleCount"]
        for m in ("simple", "browser", "stealth"):
            assert entry[f"{m}_count"] == counts[m]

    @pytest.mark.parametrize("case", NODE_CASES,
                             ids=[c["name"] for c in NODE_CASES])
    def test_recommendation_matches_node(self, case):
        entry = _fold_case(case) if case["key"] else None
        assert recommend(entry) == case["mode"]
        if entry is not None:
            assert recommend(
                entry, now=entry["last_seen"] + TTL_MS + 1
            ) == case["mode_after_ttl"]

    def test_hostname_matches_node_url(self):
        # key column of the fixture IS `new URL(url).hostname` output
        for case in NODE_CASES:
            assert domain_key(case["url"]) == case["key"], case["url"]


class TestFoldSemantics:
    def test_order_dependence(self):
        """The EMA weighs later samples more — reversing the log must
        change avg_latency_ms (this is why the operator sorts by ts
        before folding instead of using an order-free aggregate)."""
        recs = [{"method": "simple", "latency_ms": v, "ts": 1000 + i}
                for i, v in enumerate([100.0, 200.0, 400.0])]
        fwd = fold_intel("d", recs)
        rev = fold_intel("d", list(reversed(
            [{**r, "ts": 1000 + (2 - i)} for i, r in enumerate(recs)])))
        assert fwd["avg_latency_ms"] == 211.0
        assert rev["avg_latency_ms"] == 268.0

    def test_ttl_gap_restarts_profile(self):
        recs = [
            {"method": "browser", "latency_ms": 400.0, "ts": 0},
            {"method": "browser", "latency_ms": 500.0, "ts": 1000},
            # gap > TTL_MS: prune() would have evicted the entry
            {"method": "stealth", "latency_ms": 800.0, "ts": TTL_MS + 1001},
            {"method": "stealth", "latency_ms": 900.0, "ts": TTL_MS + 2000},
        ]
        e = fold_intel("d", recs)
        assert e["sample_count"] == 2          # restarted
        assert e["browser_count"] == 0         # counts die with entry
        assert e["stealth_count"] == 2
        assert e["needs_stealth"]
        # exactly-TTL gap does NOT restart (strict > in prune)
        recs2 = recs[:2] + [{"method": "stealth", "latency_ms": 800.0,
                             "ts": 1000 + TTL_MS}]
        assert fold_intel("d", recs2)["sample_count"] == 3

    def test_latency_sanitize(self):
        """Non-finite / non-positive latency falls back to the running
        average (0 for the first sample) — domain-intel.ts:118-121."""
        e = fold_intel("d", [
            {"method": "simple", "latency_ms": 0.0, "ts": 0},
            {"method": "simple", "latency_ms": 250.0, "ts": 1},
            {"method": "simple", "latency_ms": -5.0, "ts": 2},
        ])
        assert e["avg_latency_ms"] == 250.0  # 0→0, 250 fills, -5→ema(250,250)
        e2 = fold_intel("d", [
            {"method": "simple", "latency_ms": float("nan"), "ts": 0},
            {"method": "simple", "latency_ms": 120.0, "ts": 1},
            {"method": "simple", "latency_ms": float("inf"), "ts": 2},
        ])
        assert e2["avg_latency_ms"] == 120.0
        assert math.isfinite(e2["avg_latency_ms"])

    def test_recommendation_rules(self):
        def mk(n_simple, n_browser, n_stealth):
            recs, t = [], 0
            for m, k in (("simple", n_simple), ("browser", n_browser),
                         ("stealth", n_stealth)):
                for _ in range(k):
                    recs.append({"method": m, "latency_ms": 100.0, "ts": t})
                    t += 1
            return fold_intel("d", recs)

        assert recommend(mk(0, 0, 3)) == "stealth"
        assert recommend(mk(0, 2, 1)) == "browser"   # mixed browser+stealth
        assert recommend(mk(1, 2, 0)) is None        # simple ever worked
        assert recommend(mk(0, 0, MIN_SAMPLES - 1)) is None
        assert recommend(None) is None


class TestSparkOperator:
    @pytest.fixture(scope="class")
    def spark(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.session import get_spark

        s = get_spark(cores=4)
        s.sparkContext.setLogLevel("ERROR")
        return s

    def test_table_build_matches_node_fixture(self, spark):
        """One row per fixture domain; every profile column equals the
        Node reference output bit-for-bit (EMA doubles included)."""
        from webpeel_spark.operators.domain_intel import (
            build_domain_intel,
            recommend_modes,
        )

        # one case per distinct domain key (first wins) so the pinned
        # single-domain folds stay comparable
        seen, dedup = set(), []
        for c in NODE_CASES:
            if c["key"] and c["intel"] and c["key"] not in seen:
                seen.add(c["key"])
                dedup.append(c)
        rows = [(c["url"], r["method"],
                 float(r["latency_ms"]) if r["latency_ms"] is not None
                 else float("nan"), r["ts"])
                for c in dedup for r in c["records"]]
        df = spark.createDataFrame(
            rows, "url string, method string, latency_ms double, ts long")
        profiles = {r["domain"]: r
                    for r in build_domain_intel(df).collect()}
        assert set(profiles) == {c["key"] for c in dedup}
        for c in dedup:
            p, intel, counts = profiles[c["key"]], c["intel"], c["counts"]
            assert p["needs_browser"] == intel["needsBrowser"], c["name"]
            assert p["needs_stealth"] == intel["needsStealth"]
            assert p["avg_latency_ms"] == intel["avgLatencyMs"], c["name"]
            assert p["sample_count"] == intel["sampleCount"]
            assert (p["simple_count"], p["browser_count"],
                    p["stealth_count"]) == (counts["simple"],
                                            counts["browser"],
                                            counts["stealth"])
        modes = {r["domain"]: r["mode"]
                 for r in recommend_modes(build_domain_intel(df)).collect()}
        for c in dedup:
            assert modes[c["key"]] == c["mode"], c["name"]

    def test_bad_urls_dropped(self, spark):
        from webpeel_spark.operators.domain_intel import build_domain_intel

        df = spark.createDataFrame(
            [("not a url", "simple", 100.0, 0),
             ("https://ok.com/x", "simple", 100.0, 0)],
            "url string, method string, latency_ms double, ts long")
        out = build_domain_intel(df).collect()
        assert [r["domain"] for r in out] == ["ok.com"]

    def test_ttl_cut_in_recommend_modes(self, spark):
        from webpeel_spark.operators.domain_intel import (
            build_domain_intel,
            recommend_modes,
        )

        df = spark.createDataFrame(
            [("https://s.com/x", "stealth", 100.0, i) for i in range(3)],
            "url string, method string, latency_ms double, ts long")
        prof = build_domain_intel(df)
        assert recommend_modes(prof).collect()[0]["mode"] == "stealth"
        assert recommend_modes(
            prof, now_ms=2 + TTL_MS + 1).collect()[0]["mode"] is None


def test_domain_key_node_fuzz_300():
    """300 seeded-random URLs (special + opaque schemes, unicode,
    IPv4 spellings, IPv6, credentials, ports) vs Node's actual
    new URL().hostname.toLowerCase() — 0 mismatches at pin time.
    Caught: special schemes IPv4-canonicalize (ws://0x7f000001 →
    127.0.0.1) and reject invalid shapes (999.1.2.3 → throw), while
    opaque schemes percent-encode unicode from its ORIGINAL case
    instead of IDNA-encoding."""
    fuzz = os.path.join(os.path.dirname(__file__), "golden",
                        "domain_key_fuzz_node.json")
    with open(fuzz) as f:
        cases = json.load(f)
    assert len(cases) == 300
    mismatches = [(u, want, domain_key(u))
                  for u, want in cases if domain_key(u) != want]
    assert not mismatches, mismatches[:10]


def test_domain_key_node_fuzz2_500():
    """Extended 500-case fuzz (review-finding classes: file:-scheme
    host rules, percent-encoded hosts, no-slash special forms, number-
    shaped labels, UTS-46 unicode, invalid punycode) vs Node —
    0 mismatches at pin time."""
    fuzz = os.path.join(os.path.dirname(__file__), "golden",
                        "domain_key_fuzz2_node.json")
    with open(fuzz) as f:
        cases = json.load(f)
    assert len(cases) == 500
    mismatches = [(u, want, domain_key(u))
                  for u, want in cases if domain_key(u) != want]
    assert not mismatches, mismatches[:10]
