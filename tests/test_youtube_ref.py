"""youtube.ts pure-parser port — the reference suite's pure blocks
(src/tests/youtube.test.ts: parseYouTubeUrl / extractPlayerResponse /
extractVideoInfo / parseCaptionXml / decodeHtmlEntities /
formatDuration — 36 cases) ported case-for-case.  The
getYouTubeTranscript block is N/A (network fetch, mocked in the
reference); track selection and JSON3 parsing get direct pins
instead."""

from __future__ import annotations

import json

import pytest

from webpeel_spark.pure.youtube import (
    decode_html_entities,
    extract_caption_tracks,
    extract_player_response,
    extract_video_info,
    format_duration,
    parse_caption_xml,
    parse_chapters_from_description,
    parse_json3_events,
    parse_youtube_url,
    select_best_track,
)

SAMPLE_PLAYER_RESPONSE = {
    "videoDetails": {
        "videoId": "dQw4w9WgXcQ",
        "title": "Test Video Title",
        "author": "Test Channel",
        "lengthSeconds": "754",
        "viewCount": "1000000",
        "shortDescription": "A great test video description.",
        "thumbnail": {"thumbnails": [
            {"url": "https://img.youtube.com/vi/dQw4w9WgXcQ/default.jpg",
             "width": 120, "height": 90},
            {"url": "https://img.youtube.com/vi/dQw4w9WgXcQ/"
                    "maxresdefault.jpg", "width": 1280, "height": 720},
        ]},
    },
    "microformat": {"playerMicroformatRenderer": {
        "publishDate": "2024-01-15", "uploadDate": "2024-01-15",
        "viewCount": "1000000", "lengthSeconds": "754",
        "ownerChannelName": "Test Channel",
        "title": {"simpleText": "Test Video Title"},
        "description": {"simpleText": "A great test video description."},
        "thumbnail": {"thumbnails": [
            {"url": "https://img.youtube.com/vi/dQw4w9WgXcQ/"
                    "maxresdefault.jpg"}]},
    }},
    "captions": {"playerCaptionsTracklistRenderer": {"captionTracks": [
        {"baseUrl": "https://www.youtube.com/api/timedtext?v=dQw4w9WgXcQ"
                    "&lang=en",
         "languageCode": "en", "name": {"simpleText": "English"},
         "kind": "", "vssId": ".en"},
        {"baseUrl": "https://www.youtube.com/api/timedtext?v=dQw4w9WgXcQ"
                    "&lang=es",
         "languageCode": "es", "name": {"simpleText": "Spanish"},
         "kind": "", "vssId": ".es"},
        {"baseUrl": "https://www.youtube.com/api/timedtext?v=dQw4w9WgXcQ"
                    "&lang=en&kind=asr",
         "languageCode": "en",
         "name": {"simpleText": "English (auto-generated)"},
         "kind": "asr", "vssId": "a.en"},
    ]}},
}

SAMPLE_HTML = (
    "<html><head><title>Test Video Title - YouTube</title>\n"
    '<meta property="og:title" content="Test Video Title">\n'
    '<meta property="og:description" content="A great test video '
    'description.">\n'
    "</head><body><script>var ytInitialPlayerResponse = "
    + json.dumps(SAMPLE_PLAYER_RESPONSE)
    + ";</script></body></html>")

SAMPLE_CAPTION_XML = """<?xml version="1.0" encoding="utf-8" ?>
<transcript>
<text start="0.5" dur="2.1">Hello &amp; welcome</text>
<text start="2.8" dur="3.2">This is a test video</text>
<text start="6.2" dur="2.0">It&#39;s got great content</text>
<text start="8.5" dur="4.0">With &lt;special&gt; characters &amp; more</text>
<text start="12.7" dur="1.5">Thanks for watching!</text>
</transcript>"""


class TestParseYouTubeUrl:
    # youtube.test.ts:105-153
    @pytest.mark.parametrize("url,vid", [
        ("https://www.youtube.com/watch?v=dQw4w9WgXcQ", "dQw4w9WgXcQ"),
        ("https://youtu.be/dQw4w9WgXcQ", "dQw4w9WgXcQ"),
        ("https://www.youtube.com/embed/dQw4w9WgXcQ", "dQw4w9WgXcQ"),
        ("https://m.youtube.com/watch?v=dQw4w9WgXcQ", "dQw4w9WgXcQ"),
        ("https://www.youtube.com/watch?v=dQw4w9WgXcQ&t=120&list=PLxxx",
         "dQw4w9WgXcQ"),
        ("https://www.youtube.com/shorts/dQw4w9WgXcQ", "dQw4w9WgXcQ"),
        ("https://youtu.be/dQw4w9WgXcQ?t=30", "dQw4w9WgXcQ"),
        ("https://vimeo.com/12345", None),
        ("https://www.youtube.com/watch?v=short", None),
        ("https://www.youtube.com/watch", None),
        ("", None),
        ("not-a-url", None),
    ])
    def test_cases(self, url, vid):
        assert parse_youtube_url(url) == vid


class TestExtractPlayerResponse:
    # youtube.test.ts:159-181
    def test_extracts_from_html(self):
        r = extract_player_response(SAMPLE_HTML)
        assert r is not None
        assert r["videoDetails"]["videoId"] == "dQw4w9WgXcQ"
        assert r["videoDetails"]["title"] == "Test Video Title"

    def test_none_without_marker(self):
        assert extract_player_response(
            "<html><body>No data here</body></html>") is None

    def test_caption_tracks(self):
        r = extract_player_response(SAMPLE_HTML)
        tracks = r["captions"]["playerCaptionsTracklistRenderer"][
            "captionTracks"]
        assert len(tracks) == 3
        assert tracks[0]["languageCode"] == "en"


class TestExtractVideoInfo:
    # youtube.test.ts:184-211
    def test_all_fields(self):
        info = extract_video_info(SAMPLE_HTML)
        assert info["videoId"] == "dQw4w9WgXcQ"
        assert info["title"] == "Test Video Title"
        assert info["channel"] == "Test Channel"
        assert info["duration"] == "12:34"  # 754 seconds
        assert info["viewCount"] == "1000000"
        assert info["description"] == "A great test video description."
        assert info["publishDate"] == "2024-01-15"

    def test_thumbnail(self):
        info = extract_video_info(SAMPLE_HTML)
        assert "youtube.com" in info["thumbnail"]
        assert "dQw4w9WgXcQ" in info["thumbnail"]

    def test_empty_html(self):
        info = extract_video_info("<html><body></body></html>")
        assert info["videoId"] == ""
        assert info["title"] == ""
        assert info["channel"] == ""


class TestParseCaptionXml:
    # youtube.test.ts:214-246
    def test_all_segments(self):
        assert len(parse_caption_xml(SAMPLE_CAPTION_XML)) == 5

    def test_start_and_duration(self):
        segs = parse_caption_xml(SAMPLE_CAPTION_XML)
        assert segs[0]["start"] == 0.5 and segs[0]["duration"] == 2.1
        assert segs[1]["start"] == 2.8 and segs[1]["duration"] == 3.2

    def test_entity_decoding(self):
        segs = parse_caption_xml(SAMPLE_CAPTION_XML)
        assert segs[0]["text"] == "Hello & welcome"
        assert segs[2]["text"] == "It's got great content"
        assert segs[3]["text"] == "With <special> characters & more"

    def test_empty_xml(self):
        assert parse_caption_xml("<transcript></transcript>") == []

    def test_non_xml(self):
        assert parse_caption_xml("not xml at all") == []


class TestDecodeHtmlEntities:
    # youtube.test.ts:250-279
    def test_amp(self):
        assert decode_html_entities("Tom &amp; Jerry") == "Tom & Jerry"

    def test_lt_gt(self):
        assert decode_html_entities("&lt;tag&gt;") == "<tag>"

    def test_quot(self):
        assert decode_html_entities("say &quot;hi&quot;") == 'say "hi"'

    def test_apostrophes(self):
        assert decode_html_entities("it&#39;s") == "it's"
        assert decode_html_entities("it&apos;s") == "it's"

    def test_numeric(self):
        assert decode_html_entities("&#72;&#105;") == "Hi"

    def test_strips_tags(self):
        assert decode_html_entities(
            '<font color="red">styled</font>') == "styled"

    def test_empty(self):
        assert decode_html_entities("") == ""


class TestFormatDuration:
    # youtube.test.ts:286-311
    @pytest.mark.parametrize("seconds,expected", [
        (754, "12:34"), (65, "1:05"), (59, "0:59"),
        (3 * 3600 + 25 * 60 + 7, "3:25:07"), (0, "0:00"),
        (float("nan"), "0:00"),
    ])
    def test_cases(self, seconds, expected):
        assert format_duration(seconds) == expected


class TestTrackSelectionAndJson3:
    """getYouTubeTranscript's track-preference rules pinned directly
    (the fetch wrapper around them is N/A)."""

    def test_manual_preferred_over_auto(self):
        tracks = extract_caption_tracks(SAMPLE_PLAYER_RESPONSE)
        assert len(tracks) == 3
        best = select_best_track(tracks, "en")
        assert not best["isAutoGenerated"]
        assert best["languageCode"] == "en"

    def test_fallback_to_any_manual(self):
        tracks = extract_caption_tracks(SAMPLE_PLAYER_RESPONSE)
        best = select_best_track(tracks, "fr")
        assert not best["isAutoGenerated"]  # any manual beats auto

    def test_auto_detected_by_kind_and_vssid(self):
        tracks = extract_caption_tracks(SAMPLE_PLAYER_RESPONSE)
        assert tracks[2]["isAutoGenerated"]
        assert tracks[2]["languageCode"] == "en"

    def test_json3_events(self):
        segs = parse_json3_events({"events": [
            {"tStartMs": 500, "dDurationMs": 2100,
             "segs": [{"utf8": "Hello "}, {"utf8": "world"}]},
            {"tStartMs": 3000, "dDurationMs": 1000, "segs": [{"u": "old"}]},
            {"tStartMs": 9999},  # no segs — dropped
            {"segs": [{"utf8": "\n"}]},  # whitespace only — dropped
        ]})
        assert segs == [
            {"text": "Hello world", "start": 0.5, "duration": 2.1},
            {"text": "old", "start": 3.0, "duration": 1.0},
        ]

    def test_chapters(self):
        desc = "Intro text\n0:00 Intro\n2:34 Main topic\n5:12 Conclusion"
        ch = parse_chapters_from_description(desc)
        assert [c["time"] for c in ch] == ["0:00", "2:34", "5:12"]
        assert parse_chapters_from_description("0:00 Only one") == []


class TestSparkOperator:
    @pytest.fixture(scope="class")
    def spark(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.session import get_spark

        s = get_spark(cores=4)
        s.sparkContext.setLogLevel("ERROR")
        return s

    def test_parse_youtube_pages(self, spark):
        from webpeel_spark.operators.transcripts import parse_youtube_pages

        df = spark.createDataFrame(
            [("https://www.youtube.com/watch?v=dQw4w9WgXcQ",
              SAMPLE_HTML.encode("utf-8")),
             ("https://youtu.be/dQw4w9WgXcQ", SAMPLE_HTML.encode("utf-8")),
             ("https://example.com/not-youtube", b"<html></html>"),
             ("https://www.youtube.com/watch?v=AAAAAAAAAAA",
              b"<html><body>no player response</body></html>")],
            "url string, html binary")
        got = parse_youtube_pages(df).collect()
        assert len(got) == 2  # non-youtube + unparseable rows dropped
        r = got[0]
        assert r["video_id"] == "dQw4w9WgXcQ"
        assert r["title"] == "Test Video Title"
        assert r["duration"] == "12:34"
        assert r["n_caption_tracks"] == 3
        assert r["caption_langs"] == ["en", "es", "en"]


class TestWhatwgUrlQuirks:
    """Round-6 review cases: new URL() forms the first regex-based
    port dropped, all Node-verified."""

    @pytest.mark.parametrize("url", [
        "https:youtube.com/watch?v=dQw4w9WgXcQ",      # no-slash special
        "https://www.youtube.com\\watch?v=dQw4w9WgXcQ",  # backslash sep
        "https://www.youtube.com/wat\tch?v=dQw4w9WgXcQ",  # embedded tab
        "https://www.m.youtube.com/watch?v=dQw4w9WgXcQ",  # www.m. prefix
        "https://www.youtube.com/watch?v=dQw4w9%57gXcQ",  # %-encoded v
        "HTTPS://WWW.YOUTUBE.COM/watch?v=dQw4w9WgXcQ",    # case
    ])
    def test_node_verified_forms(self, url):
        assert parse_youtube_url(url) == "dQw4w9WgXcQ"

    def test_length_seconds_parseint_prefix(self):
        pr = {"videoDetails": {"videoId": "dQw4w9WgXcQ",
                               "lengthSeconds": "754.5"}}
        html = ("<html><body><script>var ytInitialPlayerResponse = "
                + json.dumps(pr) + ";</script></body></html>")
        assert extract_video_info(html)["duration"] == "12:34"
