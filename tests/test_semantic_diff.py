"""Semantic diff (diff.ts pure core) — JSON field diffs, LCS section
diffs, summaries, and the snapshot operator.

The reference ships no dedicated vitest suite for diff.ts's pure core
(its flows are exercised through live /diff fetches); these pin the
port branch-for-branch including the JS quirks (JSON.stringify order
sensitivity, the ``line ~N`` fallback label, the 5,000-line cap).
"""

from __future__ import annotations

import pytest

from webpeel_spark.pure.semantic_diff import (
    build_summary,
    count_total_fields,
    diff_json,
    diff_text,
    semantic_diff,
)


class TestDiffJson:
    def test_modified_field(self):
        changes = diff_json({"price": "$99"}, {"price": "$149"})
        assert len(changes) == 1
        c = changes[0]
        assert c.type == "modified" and c.field == "price"
        assert c.before == "$99" and c.after == "$149"

    def test_added_and_removed(self):
        changes = diff_json({"a": 1, "b": 2}, {"a": 1, "c": 3})
        by_field = {c.field: c for c in changes}
        assert by_field["b"].type == "removed" and by_field["b"].before == "2"
        assert by_field["c"].type == "added" and by_field["c"].after == "3"

    def test_nested_recursion_dot_paths(self):
        changes = diff_json({"plan": {"tier": "free", "seats": 1}},
                            {"plan": {"tier": "pro", "seats": 1}})
        assert len(changes) == 1
        assert changes[0].field == "plan.tier"

    def test_non_object_values_atomic(self):
        changes = diff_json([1, 2], [1, 3])
        assert changes[0].field == "(root)"
        assert changes[0].before == "[1,2]" and changes[0].after == "[1,3]"

    def test_key_order_matters_like_js(self):
        # JSON.stringify({a:1,b:2}) != JSON.stringify({b:2,a:1}) at the
        # nested-value level → reported as modified
        changes = diff_json({"o": {"a": 1, "b": 2}}, {"o": {"b": 2, "a": 1}})
        assert changes == [] or all(c.type == "modified" for c in changes)
        # values equal per-key → recursion finds no leaf change
        assert changes == []

    def test_fields_allowlist(self):
        before = {"a": 1, "b": {"x": 1}, "c": 3}
        after = {"a": 2, "b": {"x": 2}, "c": 4}
        changes = diff_json(before, after, fields=["b.x"])
        assert [c.field for c in changes] == ["b.x"]

    def test_identical(self):
        assert diff_json({"a": {"b": 1}}, {"a": {"b": 1}}) == []


class TestDiffText:
    def test_added_section_under_heading(self):
        before = "# Pricing\nBasic $10\n"
        after = "# Pricing\nBasic $10\nPro $20\n"
        changes, stats = diff_text(before, after)
        assert len(changes) == 1
        assert changes[0].type == "added"
        assert changes[0].path == "# Pricing"
        assert changes[0].after == "Pro $20"
        assert stats.lines_added == 1 and stats.lines_removed == 0

    def test_modified_run_groups_add_and_del(self):
        changes, stats = diff_text("# H\nold line\nsame",
                                   "# H\nnew line\nsame")
        assert len(changes) == 1
        assert changes[0].type == "modified"
        assert changes[0].before == "old line"
        assert changes[0].after == "new line"
        assert stats == (1, 1)

    def test_line_fallback_label_without_heading(self):
        changes, _ = diff_text("aaa\nbbb", "aaa\nccc")
        assert changes[0].path.startswith("line ~")

    def test_identical(self):
        changes, stats = diff_text("x\ny", "x\ny")
        assert changes == [] and stats == (0, 0)

    def test_line_cap(self):
        before = "\n".join(f"l{i}" for i in range(6000))
        after = before + "\nextra"
        changes, stats = diff_text(before, after)
        # both sides capped to 5000 lines → no diff seen
        assert stats.lines_added == 0 and changes == []


class TestSummary:
    def test_no_changes(self):
        assert build_summary([], "json") == "No changes detected."

    def test_json_summary_counts_unchanged(self):
        changes = diff_json({"a": 1, "b": 2}, {"a": 9, "b": 2})
        total = count_total_fields({"a": 1, "b": 2}, {"a": 9, "b": 2})
        assert build_summary(changes, "json", total) == \
            "1 field changed, 1 unchanged."

    def test_text_summary(self):
        changes, stats = diff_text("# H\na", "# H\na\nb\nc")
        assert build_summary(changes, "text", text_stats=stats) == \
            "1 section changed, 2 lines added."


class TestSemanticDiffDispatch:
    def test_json_mode(self):
        d = semantic_diff('{"price": 10}', '{"price": 12}')
        assert d["mode"] == "json" and d["changed"]
        assert d["changes"][0].field == "price"

    def test_text_mode(self):
        d = semantic_diff("# T\nhello", "# T\nworld")
        assert d["mode"] == "text" and d["changed"]
        assert d["lines_added"] == 1 and d["lines_removed"] == 1

    def test_unchanged(self):
        d = semantic_diff("same", "same")
        assert not d["changed"] and d["summary"] == "No changes detected."


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    return get_spark(app_name="test-semantic-diff")


def test_semantic_diff_snapshots_operator(spark):
    from webpeel_spark.operators.extract import semantic_diff_snapshots

    old = spark.createDataFrame(
        [("u1", "f1", "# H\nalpha\nbeta"),
         ("u2", "f2", '{"a":1,"b":{"c":2}}'),
         ("u3", "f3", "stable")],
        "url string, fingerprint string, content string")
    new = spark.createDataFrame(
        [("u1", "f1x", "# H\nalpha\ngamma"),
         ("u2", "f2x", '{"a":1,"b":{"c":3}}'),
         ("u3", "f3", "stable")],
        "url string, fingerprint string, content string")
    rows = {r["url"]: r for r in semantic_diff_snapshots(old, new).collect()}
    assert rows["u1"]["changed"] and rows["u1"]["mode"] == "text"
    assert rows["u1"]["lines_added"] == 1 and rows["u1"]["lines_removed"] == 1
    assert rows["u2"]["mode"] == "json" and rows["u2"]["n_changes"] == 1
    assert "field changed" in rows["u2"]["summary"]
    assert not rows["u3"]["changed"]
    assert rows["u3"]["summary"] == "No changes detected."
