"""domain-verify.ts scoring cores — CA/CDN/nameserver labelling,
SPF/DMARC classification, and the 0-100 bonus score with its exact
signal/warning messages."""

from __future__ import annotations

from webpeel_spark.pure.domain_verify import (
    classify_dns_txt,
    compute_score,
    detect_server,
    label_nameservers,
    normalise_ca_issuer,
)


class TestLabels:
    def test_ca_issuer(self):
        assert normalise_ca_issuer("ISRG Root X1") == "Let's Encrypt"
        assert normalise_ca_issuer("Amazon RSA 2048 M02") \
            == "Amazon Trust Services"
        # order matters: 'Google Trust Services' before bare 'Google'
        assert normalise_ca_issuer("Google Trust Services LLC") \
            == "Google Trust Services"
        assert normalise_ca_issuer("Obscure CA Inc") == "Obscure CA Inc"
        assert normalise_ca_issuer("") == "Unknown CA"

    def test_server_detection(self):
        assert detect_server("cloudflare") == "Cloudflare"
        assert detect_server("awselb/2.0") == "AWS"
        assert detect_server("nginx/1.25.3") == "nginx"
        assert detect_server("gws") == "Google"
        assert detect_server("  weird-thing  ") == "weird-thing"
        assert detect_server("") == "unknown"

    def test_nameserver_labels_dedupe_first_seen(self):
        assert label_nameservers([
            "tara.ns.cloudflare.com", "rob.ns.cloudflare.com",
            "ns-123.awsdns-45.org", "ns1.custom.example",
        ]) == ["Cloudflare", "AWS", "ns1.custom.example"]

    def test_spf_dmarc(self):
        assert classify_dns_txt(["v=spf1 include:x.com ~all"],
                                ["v=DMARC1; p=reject"]) == (True, True)
        assert classify_dns_txt(["verification=abc"], []) \
            == (False, False)


class TestScore:
    FULL_TLS = {"valid": True, "issuer": "DigiCert",
                "days_remaining": 120, "ev": True}
    FULL_DNS = {"has_mx": True, "has_dmarc": True, "has_spf": True,
                "nameservers": ["Cloudflare", "custom.example"]}

    def test_max_score_components(self):
        r = compute_score(self.FULL_TLS,
                          {"hsts": True, "csp": True,
                           "server": "Cloudflare"}, self.FULL_DNS)
        # 15+5+10 (tls) + 10+5+10 (headers) + 10+10+5 (dns) = 80
        assert r["score"] == 80
        assert "Trusted CA (DigiCert)" in r["signals"]
        assert "Extended Validation (EV) certificate" in r["signals"]
        assert "Hosted on Cloudflare nameservers" in r["signals"]
        assert r["warnings"] == []

    def test_all_missing(self):
        r = compute_score(None, {"hsts": False, "csp": False,
                                 "server": "unknown"}, None)
        assert r["score"] == 0
        assert "TLS check unavailable or failed" in r["warnings"]
        assert "No HSTS header" in r["warnings"]
        assert "DNS check failed" in r["warnings"]

    def test_invalid_and_expiring_tls(self):
        r = compute_score({"valid": False, "issuer": "X",
                           "days_remaining": 3, "ev": False},
                          {"hsts": False, "csp": False, "server": ""},
                          None)
        assert "Invalid or expired TLS certificate" in r["warnings"]
        assert "TLS certificate expires soon (3 days)" in r["warnings"]
        assert r["score"] == 0

    def test_untrusted_ca_no_bonus(self):
        r = compute_score({"valid": True, "issuer": "Let's Encrypt",
                           "days_remaining": 60, "ev": False},
                          {"hsts": False, "csp": False, "server": ""},
                          None)
        # Let's Encrypt is valid (+15) but not in the trusted-CA bonus
        # list (reference semantics)
        assert r["score"] == 15

    def test_no_mx_warning(self):
        r = compute_score(None, {"hsts": False, "csp": False,
                                 "server": ""},
                          {"has_mx": False, "has_dmarc": False,
                           "has_spf": False, "nameservers": []})
        assert "No MX records — may not be a real organisation" \
            in r["warnings"]
