"""Business-intel analyzers (business-intel.ts:31-231 pure core).

The reference exercises these only through live `getBusinessIntel`
fetches (no dedicated vitest suite); these pin every analyzer branch,
including the JS quirks (one-social-per-platform with share/intent
filtering, free→$0 fallback, numberOfEmployees range en-dash,
first-JSON-LD-wins precedence, OG fallbacks).
"""

from __future__ import annotations

from webpeel_spark.pure.business_intel import (
    business_intel,
    detect_industry,
    detect_tech_stack,
    extract_pricing,
    extract_schema_org_data,
    extract_social_media,
)


class TestExtractPricing:
    def test_plan_with_nearby_price(self):
        content = "Our plans\nPro plan\nEverything included\n$49/month\n"
        assert extract_pricing(content) == [{"plan": "Pro", "price": "$49"}]

    def test_free_plan_fallback(self):
        assert ({"plan": "Free", "price": "$0"}
                in extract_pricing("Free tier for hobbyists\nno card"))

    def test_dedupes_by_plan_price_key(self):
        content = "Pro\n$49\nPro\n$49\n"
        assert len(extract_pricing(content)) == 1

    def test_price_with_commas_and_cents(self):
        content = "Enterprise\ncontact us\n$1,999.00 per year"
        assert extract_pricing(content) == [
            {"plan": "Enterprise", "price": "$1,999.00"}]

    def test_cap_at_8(self):
        lines = []
        for i, name in enumerate(["free", "starter", "basic", "pro",
                                  "business", "premium", "growth", "scale",
                                  "team", "individual"]):
            lines += [f"{name} option", f"${i + 1}0", "", "", "", ""]
        assert len(extract_pricing("\n".join(lines))) == 8

    def test_no_plans(self):
        assert extract_pricing("just some text about nothing") == []


class TestDetectTechStack:
    def test_script_patterns(self):
        html = ('<script src="/assets/react.min.js"></script>'
                '<script>window.__NEXT_DATA__ = {}</script>'
                '<link href="https://cdn.shopify.com/x.css">')
        assert detect_tech_stack(html) == ["Next.js", "React", "Shopify"]

    def test_header_patterns(self):
        stack = detect_tech_stack("", {"Server": "cloudflare",
                                       "x-amz-request-id": "abc"})
        assert stack == ["AWS", "Cloudflare"]

    def test_header_patterns_ignore_content(self):
        # 'vercel' in content alone must not trigger the header rule
        assert detect_tech_stack("we deploy on vercel", {}) == []

    def test_sorted_output(self):
        html = '<script src="wp-content/x.js"></script> gtag("config")'
        assert detect_tech_stack(html) == ["Google Analytics", "WordPress"]


class TestExtractSocialMedia:
    def test_one_per_platform_and_https_prefix(self):
        content = ('Follow twitter.com/acme and twitter.com/other; '
                   'code at https://github.com/acme-co')
        found = extract_social_media(content)
        platforms = {f["platform"]: f["url"] for f in found}
        assert platforms["Twitter/X"] == "https://twitter.com/acme"
        assert platforms["GitHub"] == "https://github.com/acme-co"

    def test_skips_share_and_intent_links(self):
        content = ("twitter.com/intent/tweet?x=1 "
                   "facebook.com/sharer/share?u=2 ")
        platforms = [f["platform"] for f in extract_social_media(content)]
        assert "Twitter/X" not in platforms
        # facebook.com/sharer itself has no 'share' in the FIRST path
        # segment match 'facebook.com/sharer' — contains 'share' → skipped
        assert "Facebook" not in platforms

    def test_discord_and_tiktok(self):
        found = extract_social_media(
            "join discord.gg/abc123 and tiktok.com/@dancer")
        platforms = {f["platform"] for f in found}
        assert {"Discord", "TikTok"} <= platforms


class TestDetectIndustry:
    def test_saas(self):
        text = "a cloud platform with a developer api and saas software"
        assert detect_industry(text) == "SaaS / Software"

    def test_healthcare(self):
        text = "our clinic connects each patient with a doctor"
        assert detect_industry(text) == "Healthcare"

    def test_none_when_no_keywords(self):
        assert detect_industry("zzz qqq xxx") is None

    def test_tie_keeps_declaration_order(self):
        # one keyword each from SaaS ('cloud') and Travel ('hotel') —
        # SaaS is declared first
        assert detect_industry("cloud hotel") == "SaaS / Software"


class TestSchemaOrg:
    def test_organization_fields(self):
        html = ('<script type="application/ld+json">'
                '{"@type":"Organization","name":"Acme Corp",'
                '"description":"We make anvils","foundingDate":"1947",'
                '"numberOfEmployees":{"minValue":100,"maxValue":500},'
                '"aggregateRating":{"ratingValue":"4.5","reviewCount":"321"}}'
                "</script>")
        r = extract_schema_org_data(html)
        assert r["name"] == "Acme Corp"
        assert r["description"] == "We make anvils"
        assert r["founded"] == "1947"
        assert r["employees"] == "100–500"
        assert r["reviews"] == [
            {"source": "Schema.org", "rating": 4.5, "count": 321}]

    def test_scalar_employees(self):
        html = ('<script type="application/ld+json">'
                '{"name":"X","numberOfEmployees":42}</script>')
        assert extract_schema_org_data(html)["employees"] == "42"

    def test_og_fallbacks(self):
        html = ('<meta property="og:title" content="Fallback Name"/>'
                '<meta name="description" content="Fallback desc"/>')
        r = extract_schema_org_data(html)
        assert r["name"] == "Fallback Name"
        assert r["description"] == "Fallback desc"

    def test_first_jsonld_wins(self):
        html = ('<script type="application/ld+json">{"name":"First"}</script>'
                '<script type="application/ld+json">{"name":"Second"}</script>')
        assert extract_schema_org_data(html)["name"] == "First"

    def test_malformed_jsonld_skipped(self):
        html = ('<script type="application/ld+json">{broken</script>'
                '<script type="application/ld+json">{"name":"Ok"}</script>')
        assert extract_schema_org_data(html)["name"] == "Ok"


def test_business_intel_composite():
    html = ('<script type="application/ld+json">{"name":"Acme"}</script>'
            '<script src="react-dom.js"></script>'
            'Visit github.com/acme\n'
            'Pro plan\n$29/mo\n'
            'a cloud platform with a developer api')
    intel = business_intel(html)
    assert intel["name"] == "Acme"
    assert "React" in intel["tech_stack"]
    assert intel["social_media"][0]["platform"] == "GitHub"
    assert intel["pricing"] == [{"plan": "Pro", "price": "$29"}]
    assert intel["industry"] == "SaaS / Software"
