"""Property-based tests (hypothesis) over round-3 pure cores —
invariants that hold for ALL inputs, complementing the case-ported
suites."""

from __future__ import annotations

import re

from hypothesis import example, given, settings
from hypothesis import strategies as st

from webpeel_spark.pure.cross_verify import build_consensus, normalize_url
from webpeel_spark.pure.semantic_diff import diff_json, diff_text
from webpeel_spark.pure.source_scoring import (
    deduplicate_by_domain,
    extract_registered_domain,
)
from webpeel_spark.pure.transcript_export import (
    format_readable_timestamp,
    format_srt_timestamp,
)
from webpeel_spark.pure.watch import compute_fingerprint, compute_line_diff

lines_text = st.text(
    alphabet=st.characters(blacklist_characters="\r",
                           blacklist_categories=("Cs",)),
    max_size=200)


class TestLineDiffProperties:
    @given(lines_text, lines_text)
    @settings(max_examples=200, deadline=None)
    def test_added_removed_disjoint_and_consistent(self, old, new):
        d = compute_line_diff(old, new)
        old_set = {l for l in old.split("\n") if l.strip()}
        new_set = {l for l in new.split("\n") if l.strip()}
        assert set(d.added) == new_set - old_set
        assert set(d.removed) == old_set - new_set
        assert d.changed == bool(d.added or d.removed)
        assert 0 <= d.change_percent <= 100

    @given(lines_text)
    @settings(max_examples=50, deadline=None)
    def test_self_diff_empty(self, text):
        d = compute_line_diff(text, text)
        assert not d.changed and d.change_percent == 0
        assert d.summary == "No changes detected."


class TestFingerprintProperties:
    @given(st.text(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_whitespace_insensitive(self, text):
        doubled = re.sub(r"\s", lambda m: m.group(0) * 2, text)
        assert compute_fingerprint(text) == \
            compute_fingerprint("  " + doubled + "\n")


class TestDiffTextProperties:
    @given(lines_text, lines_text)
    @settings(max_examples=100, deadline=None)
    def test_stats_net_change_matches_line_counts(self, old, new):
        changes, stats = diff_text(old, new)
        # LCS edit: added - removed == len(new) - len(old)
        assert (stats.lines_added - stats.lines_removed
                == len(new.split("\n")) - len(old.split("\n")))
        if old == new:
            assert changes == [] and stats == (0, 0)


json_values = st.recursive(
    st.one_of(st.none(), st.booleans(),
              st.integers(min_value=-1000, max_value=1000),
              st.text(max_size=20)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8).filter(lambda k: "." not in k),
                        children, max_size=4)),
    max_leaves=10)


class TestDiffJsonProperties:
    @given(json_values)
    @settings(max_examples=100, deadline=None)
    def test_self_diff_empty(self, value):
        assert diff_json(value, value) == []

    @given(st.dictionaries(st.text(min_size=1, max_size=8)
                           .filter(lambda k: "." not in k),
                           st.integers(), max_size=5),
           st.dictionaries(st.text(min_size=1, max_size=8)
                           .filter(lambda k: "." not in k),
                           st.integers(), max_size=5))
    @settings(max_examples=100, deadline=None)
    def test_flat_dict_change_classification(self, before, after):
        changes = diff_json(before, after)
        by_type = {"added": set(), "removed": set(), "modified": set()}
        for c in changes:
            by_type[c.type].add(c.field)
        assert by_type["added"] == set(after) - set(before)
        assert by_type["removed"] == set(before) - set(after)
        assert by_type["modified"] == {
            k for k in set(before) & set(after) if before[k] != after[k]}


class TestDedupByDomainProperties:
    @given(st.lists(st.tuples(
        st.sampled_from(["a.com", "b.org", "sub.c.net", "d.io"]),
        st.floats(min_value=0, max_value=1, allow_nan=False)),
        max_size=20), st.integers(min_value=1, max_value=3))
    @settings(max_examples=100, deadline=None)
    def test_cap_and_order(self, pairs, max_per):
        sources = [{"url": f"https://{host}/p{i}", "finalScore": score}
                   for i, (host, score) in enumerate(pairs)]
        out = deduplicate_by_domain(sources, max_per)
        counts = {}
        for s in out:
            d = extract_registered_domain(s["url"])
            counts[d] = counts.get(d, 0) + 1
        assert all(v <= max_per for v in counts.values())
        scores = [s["finalScore"] for s in out]
        assert scores == sorted(scores, reverse=True)
        # kept items are the top-scored per domain
        for s in out:
            assert s in sources


class TestTimestampProperties:
    @given(st.floats(min_value=0, max_value=359999, allow_nan=False))
    @settings(max_examples=200, deadline=None)
    def test_srt_roundtrip(self, seconds):
        ts = format_srt_timestamp(seconds)
        m = re.fullmatch(r"(\d{2,}):(\d{2}):(\d{2}),(\d{3})", ts)
        assert m
        back = (int(m.group(1)) * 3600 + int(m.group(2)) * 60
                + int(m.group(3)) + int(m.group(4)) / 1000)
        assert abs(back - seconds) <= 0.0005 + 1e-9

    @given(st.floats(min_value=0, max_value=359999, allow_nan=False))
    @settings(max_examples=100, deadline=None)
    def test_readable_parses_back(self, seconds):
        ts = format_readable_timestamp(seconds)
        parts = [int(p) for p in ts.split(":")]
        back = 0
        for p in parts:
            back = back * 60 + p
        assert back == int(seconds)


class TestConsensusProperties:
    @given(st.lists(st.lists(
        st.sampled_from([f"https://site{i}.example/p" for i in range(6)]),
        max_size=6, unique=True), min_size=1, max_size=4))
    @settings(max_examples=100, deadline=None)
    def test_agreement_bounds_and_sorting(self, engine_lists):
        sources = [
            {"engine": f"e{i}", "topResults": [
                {"url": u, "title": u} for u in urls]}
            for i, urls in enumerate(engine_lists)]
        r = build_consensus(sources)
        n_active = sum(1 for l in engine_lists if l)
        assert r["totalSources"] == n_active
        for c in r["consensus"]:
            assert 0 < c["agreementScore"] <= 1
            assert len(c["appearsIn"]) <= max(n_active, 1)
        scores = [(-c["agreementScore"], c["averagePosition"])
                  for c in r["consensus"]]
        assert scores == sorted(scores)
        assert 0 <= r["confidence"] <= 1

    @given(st.text(max_size=60))
    @example("/")
    @example("p//")
    @settings(max_examples=100, deadline=None)
    def test_normalize_strips_exactly_one_trailing_slash(self, path):
        # Reference semantics (cross-verify.ts:117): hostname minus
        # www + pathname with ONE trailing slash stripped — a "//"
        # path yields "example.com/", not "example.com".  (The old
        # invariant `not n.endswith("/")` was stronger than the
        # reference and failed on the pinned examples above.)
        cleaned = re.sub(r"[?#\s]", "", path)
        url = "https://www.example.com/" + cleaned
        n = normalize_url(url)
        raw_path = "/" + cleaned
        expected = "example.com" + (
            raw_path[:-1] if raw_path.endswith("/") else raw_path)
        assert n == expected
        # idempotent: the scheme-less output passes through unchanged
        assert normalize_url(n) == n
