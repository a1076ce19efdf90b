"""Reference suite src/tests/transcript-export.test.ts ported
case-for-case (44 cases: formatSRTTimestamp / toSRT / toTXT /
toMarkdownDoc / toJSON).  The earlier test_transcript_export.py
docstring claimed no dedicated reference suite existed — it does, and
this file mirrors it block-for-block."""

from __future__ import annotations

import json
import re

from webpeel_spark.pure.transcript_export import (
    format_srt_timestamp,
    to_json,
    to_markdown_doc,
    to_srt,
    to_txt,
)

SAMPLE_SEGMENTS = [
    {"text": "We're no strangers to love", "start": 1.0, "duration": 3.5},
    {"text": "You know the rules and so do I", "start": 4.5,
     "duration": 3.5},
    {"text": "A full commitment is what I'm thinking of", "start": 8.0,
     "duration": 4.0},
]
UNICODE_SEGMENTS = [
    {"text": "안녕하세요 여러분", "start": 0.0, "duration": 2.0},
    {"text": "日本語のテスト", "start": 2.0, "duration": 3.0},
    {"text": "Ärger über Möhrenkuchen", "start": 5.0, "duration": 2.5},
]
LONG_SEGMENT = {
    "text": "This is a very long line of text that contains many words "
            "and should still be handled correctly without being "
            "truncated or modified in any way by the export functions.",
    "start": 100.0, "duration": 10.0,
}


class TestFormatSRTTimestamp:
    # transcript-export.test.ts:44-76
    def test_zero(self):
        assert format_srt_timestamp(0) == "00:00:00,000"

    def test_subsecond(self):
        assert format_srt_timestamp(0.5) == "00:00:00,500"
        assert format_srt_timestamp(1.001) == "00:00:01,001"

    def test_minutes(self):
        assert format_srt_timestamp(90) == "00:01:30,000"
        assert format_srt_timestamp(61.25) == "00:01:01,250"

    def test_hours(self):
        assert format_srt_timestamp(3661.5) == "01:01:01,500"
        assert format_srt_timestamp(7322.123) == "02:02:02,123"

    def test_padding(self):
        assert format_srt_timestamp(3600) == "01:00:00,000"

    def test_large_values(self):
        assert re.fullmatch(r"\d{2}:\d{2}:\d{2},\d{3}",
                            format_srt_timestamp(36001))

    def test_negative_clamps_to_zero(self):
        assert format_srt_timestamp(-5) == "00:00:00,000"


class TestToSRT:
    # transcript-export.test.ts:82-156
    def test_empty(self):
        assert to_srt([]) == ""

    def test_numbered_from_one(self):
        lines = to_srt(SAMPLE_SEGMENTS).split("\n")
        assert lines[0] == "1"
        assert lines.index("2") > 0

    def test_timestamp_arrow_format(self):
        out = to_srt(SAMPLE_SEGMENTS)
        assert "00:00:01,000 --> 00:00:04,500" in out
        assert "00:00:04,500 --> 00:00:08,000" in out

    def test_text_after_timestamp(self):
        out = to_srt(SAMPLE_SEGMENTS)
        assert "We're no strangers to love" in out
        assert "You know the rules and so do I" in out

    def test_blank_line_separator(self):
        assert "\n\n" in to_srt(SAMPLE_SEGMENTS)

    def test_sequential_numbers(self):
        nums = [int(l) for l in to_srt(SAMPLE_SEGMENTS).split("\n")
                if re.fullmatch(r"\d+", l.strip())]
        assert nums == [1, 2, 3]

    def test_single_segment(self):
        out = to_srt([{"text": "Hello world", "start": 5.0,
                       "duration": 2.0}])
        assert out == "1\n00:00:05,000 --> 00:00:07,000\nHello world"

    def test_end_is_start_plus_duration(self):
        out = to_srt([{"text": "Test", "start": 10.5, "duration": 4.5}])
        assert "00:00:10,500 --> 00:00:15,000" in out

    def test_unicode(self):
        out = to_srt(UNICODE_SEGMENTS)
        assert "안녕하세요 여러분" in out
        assert "日本語のテスト" in out
        assert "Ärger über Möhrenkuchen" in out

    def test_long_text_not_truncated(self):
        assert LONG_SEGMENT["text"] in to_srt([LONG_SEGMENT])

    def test_zero_duration(self):
        out = to_srt([{"text": "Instant", "start": 3.0, "duration": 0}])
        assert "00:00:03,000 --> 00:00:03,000" in out

    def test_hour_range(self):
        out = to_srt([{"text": "Late", "start": 3665.0, "duration": 2.0}])
        assert "01:01:05,000 --> 01:01:07,000" in out


class TestToTXT:
    # transcript-export.test.ts:162-196
    def test_empty(self):
        assert to_txt([]) == ""

    def test_one_line_per_segment(self):
        lines = to_txt(SAMPLE_SEGMENTS).split("\n")
        assert lines == ["We're no strangers to love",
                        "You know the rules and so do I",
                        "A full commitment is what I'm thinking of"]

    def test_no_timestamps(self):
        assert not re.search(r"\d+:\d{2}", to_txt(SAMPLE_SEGMENTS))

    def test_unicode(self):
        out = to_txt(UNICODE_SEGMENTS)
        assert "안녕하세요 여러분" in out
        assert "日本語のテスト" in out

    def test_long_text_unmodified(self):
        assert to_txt([LONG_SEGMENT]) == LONG_SEGMENT["text"]

    def test_single_segment(self):
        assert to_txt([{"text": "Hello", "start": 0, "duration": 1}]) == \
            "Hello"


class TestToMarkdownDoc:
    # transcript-export.test.ts:202-260
    def test_title_h1(self):
        assert "# My Video" in to_markdown_doc("My Video", "My Channel",
                                               SAMPLE_SEGMENTS)

    def test_channel_bold(self):
        assert "**Channel:** Awesome Channel" in to_markdown_doc(
            "Title", "Awesome Channel", SAMPLE_SEGMENTS)

    def test_transcript_heading(self):
        assert "## Transcript" in to_markdown_doc("Title", "Channel",
                                                  SAMPLE_SEGMENTS)

    def test_timestamped_bold_brackets(self):
        out = to_markdown_doc("Title", "Channel", SAMPLE_SEGMENTS)
        assert "**[0:01]**" in out
        assert "We're no strangers to love" in out

    def test_m_ss_subhour(self):
        assert "**[2:05]**" in to_markdown_doc(
            "T", "C", [{"text": "Test", "start": 125, "duration": 1}])

    def test_h_mm_ss_hourplus(self):
        assert "**[1:01:05]**" in to_markdown_doc(
            "T", "C", [{"text": "Late", "start": 3665, "duration": 1}])

    def test_empty_segments(self):
        out = to_markdown_doc("Title", "Channel", [])
        assert "# Title" in out
        assert "**Channel:** Channel" in out
        assert "## Transcript" in out
        assert not re.search(r"\*\*\[\d", out)

    def test_missing_title_fallback(self):
        assert "# Transcript" in to_markdown_doc("", "Channel",
                                                 SAMPLE_SEGMENTS)

    def test_missing_channel_omitted(self):
        assert "**Channel:**" not in to_markdown_doc("Title", "",
                                                     SAMPLE_SEGMENTS)

    def test_unicode(self):
        out = to_markdown_doc("日本語動画", "테스트 채널", UNICODE_SEGMENTS)
        assert "# 日本語動画" in out
        assert "**Channel:** 테스트 채널" in out
        assert "안녕하세요 여러분" in out


class TestToJSON:
    # transcript-export.test.ts:266-318
    MOCK = {
        "videoId": "dQw4w9WgXcQ",
        "title": "Never Gonna Give You Up",
        "channel": "Rick Astley",
        "duration": "3:33",
        "language": "en",
        "segments": SAMPLE_SEGMENTS,
        "fullText": "We're no strangers to love...",
        "availableLanguages": ["en"],
        "wordCount": 25,
    }

    def test_valid_json(self):
        json.loads(to_json(self.MOCK))

    def test_pretty_printed_two_space(self):
        assert '\n  "' in to_json(self.MOCK)

    def test_preserves_fields(self):
        parsed = json.loads(to_json(self.MOCK))
        assert parsed["videoId"] == "dQw4w9WgXcQ"
        assert parsed["title"] == "Never Gonna Give You Up"
        assert parsed["channel"] == "Rick Astley"
        assert len(parsed["segments"]) == 3
        assert parsed["wordCount"] == 25

    def test_preserves_segment_shape(self):
        parsed = json.loads(to_json(self.MOCK))
        assert parsed["segments"][0] == SAMPLE_SEGMENTS[0]

    def test_empty_segments(self):
        parsed = json.loads(to_json({**self.MOCK, "segments": []}))
        assert parsed["segments"] == []

    def test_unicode(self):
        parsed = json.loads(to_json({**self.MOCK, "title": "日本語タイトル",
                                     "segments": UNICODE_SEGMENTS}))
        assert parsed["title"] == "日本語タイトル"
        assert parsed["segments"][0]["text"] == "안녕하세요 여러분"
