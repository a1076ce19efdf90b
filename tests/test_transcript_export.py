"""transcript-export.ts formatters — pure port + Catalyst-twin parity.

(The reference DOES have a dedicated vitest suite —
src/tests/transcript-export.test.ts, found in round 6 after this
file's docstring claimed otherwise; it is ported case-for-case in
test_transcript_export_ref.py.  This file keeps the Catalyst-twin
parity checks and extra edge pins.)
"""

from __future__ import annotations

import pytest

from webpeel_spark.pure.transcript_export import (
    format_readable_timestamp,
    format_srt_timestamp,
    to_json,
    to_markdown_doc,
    to_srt,
    to_txt,
)

SEGS = [
    {"text": "We're no strangers to love", "start": 1.0, "duration": 3.5},
    {"text": "You know the rules and so do I", "start": 4.5,
     "duration": 3.5},
]


class TestTimestamps:
    def test_srt_docstring_example(self):
        assert format_srt_timestamp(3661.5) == "01:01:01,500"

    def test_srt_zero_and_negative(self):
        assert format_srt_timestamp(0) == "00:00:00,000"
        assert format_srt_timestamp(-5) == "00:00:00,000"

    def test_srt_ms_rounding(self):
        # 1.2345*1000 is 1234.5000000000002 in IEEE; Math.round is
        # half-up → 1235 (Node-verified; a banker's-rounding port
        # pinned 1234 here until round 6)
        assert format_srt_timestamp(1.2345) == "00:00:01,235"
        assert format_srt_timestamp(1.9996) == "00:00:02,000"

    def test_readable_docstring_example(self):
        assert format_readable_timestamp(125.3) == "2:05"

    def test_readable_hour_form(self):
        assert format_readable_timestamp(3661) == "1:01:01"
        assert format_readable_timestamp(59) == "0:59"


class TestFormats:
    def test_srt_structure(self):
        assert to_srt(SEGS) == (
            "1\n00:00:01,000 --> 00:00:04,500\n"
            "We're no strangers to love\n\n"
            "2\n00:00:04,500 --> 00:00:08,000\n"
            "You know the rules and so do I")

    def test_srt_empty(self):
        assert to_srt([]) == ""

    def test_txt(self):
        assert to_txt(SEGS) == ("We're no strangers to love\n"
                                "You know the rules and so do I")

    def test_markdown_full(self):
        md = to_markdown_doc("Never Gonna", "Rick", SEGS)
        assert md == ("# Never Gonna\n\n**Channel:** Rick\n\n"
                      "## Transcript\n\n"
                      "**[0:01]** We're no strangers to love\n"
                      "**[0:04]** You know the rules and so do I")

    def test_markdown_defaults(self):
        md = to_markdown_doc("", "", [])
        assert md == "# Transcript\n\n## Transcript\n"

    def test_json_pretty(self):
        assert to_json({"a": 1}) == '{\n  "a": 1\n}'


@pytest.fixture(scope="module")
def spark():
    from webpeel_spark.session import get_spark

    return get_spark(app_name="test-transcripts")


def test_catalyst_twin_matches_pure(spark):
    from webpeel_spark.operators.transcripts import transcript_exports

    rows = [("v1", "Never Gonna", "Rick", i, s["start"], s["duration"],
             s["text"]) for i, s in enumerate(SEGS)]
    rows.append(("v2", "", "", 0, 3661.5, 2.0, "Hour mark"))
    df = spark.createDataFrame(
        rows, "video_id string, title string, channel string, "
              "seg_index int, start double, duration double, text string")
    got = {r["video_id"]: r for r in transcript_exports(df).collect()}

    assert got["v1"]["srt"] == to_srt(SEGS)
    assert got["v1"]["txt"] == to_txt(SEGS)
    assert got["v1"]["markdown"] == to_markdown_doc("Never Gonna", "Rick",
                                                    SEGS)
    v2_segs = [{"text": "Hour mark", "start": 3661.5, "duration": 2.0}]
    assert got["v2"]["srt"] == to_srt(v2_segs)
    assert got["v2"]["markdown"] == to_markdown_doc("", "", v2_segs)
