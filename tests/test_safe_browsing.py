"""safe-browsing.ts / threat-feeds.ts port: local-blocklist parity
pinned against Node's actual output of the reference function
(31-case fixture table, 0 mismatches at generation time), feed
decision logic, and the corpus safety-gate operator."""

from __future__ import annotations

import pytest

from webpeel_spark.pure.safe_browsing import (
    check_local_blocklist,
    evaluate_threat_feeds,
    is_ip_address,
    is_private_ip,
)

# (url, safe, threats) — verbatim Node outputs of the reference logic
NODE_CASES = [
    ("data:text/html,<script>x</script>", False, ["DATA_URI"]),
    ("  DATA:text/plain,x", False, ["DATA_URI"]),
    ("not a url", False, ["INVALID_URL"]),
    ("http://", False, ["INVALID_URL"]),
    ("https://example.com/page", True, []),
    ("http://google.com@evil.com/login", False,
     ["URL_CREDENTIALS_TRICK"]),
    ("https://user:pw@site.com/x", False, ["URL_CREDENTIALS_TRICK"]),
    # punycode label is also the SLD, whose 3 hyphens trip check 6 too
    ("http://xn--gogle-dye.com/login", False,
     ["PUNYCODE_HOMOGRAPH", "EXCESSIVE_HYPHENS"]),
    ("http://site.xn--p1ai/ok", True, []),  # IDN TLD allowed
    # WHATWG IDNA-encodes unicode hosts → homograph check fires
    ("http://пример.com/x", False, ["PUNYCODE_HOMOGRAPH"]),
    ("http://8.8.8.8/path", False, ["SUSPICIOUS_IP"]),
    ("http://127.0.0.1:8080/dev", True, []),
    ("http://10.1.2.3/x", True, []),
    ("http://192.168.1.5/x", True, []),
    ("http://172.20.1.1/x", True, []),
    ("http://169.254.9.9/x", True, []),
    ("http://[::1]/x", True, []),
    ("http://[2001:db8::1]/x", False, ["SUSPICIOUS_IP"]),
    # reference quirk: the IPv6 regex matches colon-free pure-hex
    # hostnames too — reproduced deliberately
    ("http://deadbeef/x", False, ["SUSPICIOUS_IP"]),
    ("http://amazon-login.tk/signin", False, ["PHISHING"]),
    ("http://www.paypal-secure.xyz/auth", False, ["PHISHING"]),
    ("http://mystore.top/shop", True, []),
    ("http://amaz0n-login-verify-account.com/x", False,
     ["EXCESSIVE_HYPHENS"]),
    ("http://a-b-c-d.example.com/x", True, []),  # hyphens in sub, not sld
    ("http://login.amazon.secure.verify.example.click/x", False,
     ["PHISHING", "EXCESSIVE_SUBDOMAINS"]),
    ("http://a.b.c.d.e.f.com/x", False, ["EXCESSIVE_SUBDOMAINS"]),
    ("http://sub.amazon.evil.win/x", False, ["PHISHING"]),
    ("https://www.google.com/search", True, []),
    ("mailto:user@example.com", True, []),       # non-special scheme,
    ("javascript:alert(1)", True, []),           # empty host → safe
    ("http://upsdelivery.xyz/track", False, ["PHISHING"]),  # 'ups' ⊂
]


class TestLocalBlocklist:
    @pytest.mark.parametrize("url,safe,threats", NODE_CASES)
    def test_node_parity(self, url, safe, threats):
        r = check_local_blocklist(url)
        assert (r["safe"], r["threats"]) == (safe, threats)
        assert r["source"] == "local-blocklist"

    def test_ip_helpers(self):
        assert is_ip_address("1.2.3.4") and is_ip_address("::1")
        assert not is_ip_address("example.com")
        assert is_private_ip("192.168.0.1") and is_private_ip("::1")
        assert not is_private_ip("8.8.8.8")


class TestThreatFeeds:
    def test_openphish_set_hit(self):
        r = evaluate_threat_feeds("HTTP://Evil.example/Phish",
                                  openphish=frozenset(
                                      ["http://evil.example/phish"]))
        assert not r["safe"]
        assert r["threats"] == ["OPENPHISH_PHISHING"]
        assert r["source"] == "openphish"

    def test_urlhaus_listed_with_details(self):
        r = evaluate_threat_feeds(
            "http://bad.example/x",
            urlhaus={"query_status": "listed", "threat":
                     "malware_download", "tags": ["emotet", "doc"]})
        assert r["threats"] == ["URLHAUS_MALWARE"]
        assert r["details"] == "URLhaus: malware_download, tags: emotet, doc"
        r2 = evaluate_threat_feeds(
            "http://bad.example/x",
            urlhaus={"query_status": "listed", "tags": []})
        assert r2["details"] == "URLhaus: malware, tags: none"

    def test_phishtank_only_when_unflagged(self):
        pt = {"results": {"in_database": True, "verified": "yes",
                          "valid": "yes"}}
        r = evaluate_threat_feeds("http://p.example/x", phishtank=pt)
        assert r["threats"] == ["PHISHTANK_PHISHING"]
        # already flagged by urlhaus → phishtank skipped (ts:92)
        r2 = evaluate_threat_feeds(
            "http://p.example/x",
            urlhaus={"query_status": "listed"}, phishtank=pt)
        assert r2["threats"] == ["URLHAUS_MALWARE"]
        # unverified entries don't flag
        r3 = evaluate_threat_feeds(
            "http://p.example/x",
            phishtank={"results": {"in_database": True,
                                   "verified": "no", "valid": "yes"}})
        assert r3["safe"]

    def test_clean(self):
        r = evaluate_threat_feeds("https://good.example/")
        assert r == {"safe": True, "threats": [], "source": "none",
                     "details": None}


class TestSparkOperator:
    @pytest.fixture(scope="class")
    def spark(self):
        pytest.importorskip("pyspark")
        from webpeel_spark.session import get_spark

        s = get_spark(cores=4)
        s.sparkContext.setLogLevel("ERROR")
        return s

    def test_local_gate_matches_pure(self, spark):
        from webpeel_spark.operators.safety import url_safety

        urls = [u for u, _, _ in NODE_CASES]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r["url"]: (r["safe"], list(r["threats"]))
               for r in url_safety(df).collect()}
        for u, safe, threats in NODE_CASES:
            assert got[u] == (safe, threats), u

    def test_feed_overlay_broadcast(self, spark):
        from webpeel_spark.operators.safety import url_safety

        df = spark.createDataFrame(
            [("https://clean.example/a",),
             ("https://listed.example/mal",)], "url string")
        feeds = spark.createDataFrame(
            [("https://LISTED.example/mal", "URLHAUS_MALWARE",
              "urlhaus")], "url string, threat string, source string")
        out = {r["url"]: r for r in url_safety(df, feeds=feeds).collect()}
        hit = out["https://listed.example/mal"]
        assert not hit["safe"]
        assert "URLHAUS_MALWARE" in hit["threats"]
        assert hit["threat_source"] == "urlhaus"
        assert out["https://clean.example/a"]["safe"]
        plan = url_safety(df, feeds=feeds)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan
