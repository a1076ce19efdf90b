"""transit-verdict.ts port — reference suite (19 cases)
case-for-case."""

from __future__ import annotations

from webpeel_spark.pure.transit_verdict import build_transit_verdict


def make_source(content, domain, **overrides):
    src = {"url": f"https://{domain}/route", "title": "Route page",
           "snippet": "", "content": content, "domain": domain,
           "isTransitSource": True}
    src.update(overrides)
    return src


BASE_PQ = {"origin": "new york", "destination": "boston",
           "departDate": "april 2", "returnDate": "april 5",
           "isRoundTrip": True, "mode": "bus"}


def build(sources, **pq_overrides):
    return build_transit_verdict({
        "query": "bus new york to boston",
        "transitSources": sources,
        "parsedQuery": {**BASE_PQ, **pq_overrides}})


def test_null_without_sources():
    assert build([]) is None


def test_null_without_prices():
    assert build([make_source(
        "Take the bus from New York to Boston. Book your trip today!",
        "wanderu.com")]) is None


def test_cheapest_booking_price_with_provider():
    r = build([make_source(
        "FlixBus from $19.00 | Greyhound from $25.00 | OurBus from $23.00",
        "wanderu.com")], isRoundTrip=False)
    assert r is not None
    assert r["vertical"] == "transit"
    assert r["bestOption"]["provider"] == "FlixBus"
    assert r["bestOption"]["price"] == 19.0
    assert r["bestOption"]["currency"] == "USD"
    assert "$19.00" in r["headline"]
    assert "FlixBus" in r["headline"]
    assert "New York → Boston" in r["headline"]
    assert len(r["alternatives"]) >= 1
    if len(r["alternatives"]) >= 2:
        assert r["alternatives"][0]["price"] <= r["alternatives"][1]["price"]


def test_prefers_booking_sites():
    r = build([
        make_source("Prices start at $15.00 for bus tickets",
                    "randomsite.com"),
        make_source("FlixBus from $19.00 | Greyhound from $25.00",
                    "wanderu.com"),
    ], isRoundTrip=False)
    assert r["bestOption"]["provider"] == "FlixBus"
    assert r["bestOption"]["price"] == 19.0
    assert r["bestOption"]["notes"] == "Booking site"


def test_fallback_to_cheapest_overall():
    r = build([make_source("Bus tickets start at $22.50 for this route",
                           "travelguide.com")], isRoundTrip=False)
    assert r["bestOption"]["price"] == 22.50
    assert ("No booking site prices found — prices extracted from "
            "search snippets only.") in r["caveats"]


def test_round_trip_totals():
    r = build([
        make_source("FlixBus from $19.00 | Greyhound from $25.00",
                    "wanderu.com",
                    title="New York to Boston bus tickets"),
        make_source("FlixBus from $21.00 | Greyhound from $27.00",
                    "wanderu.com",
                    title="Boston to New York bus tickets",
                    url="https://wanderu.com/boston-to-new-york"),
    ])
    assert r["totals"]["oneWayLowest"] == 19.0
    assert r["totals"]["returnLowest"] == 21.0
    assert r["totals"]["roundTripLowest"] == 40.0
    assert r["totals"]["currency"] == "USD"


def test_round_trip_caveat_without_return_leg():
    r = build([make_source("FlixBus from $19.00", "wanderu.com")])
    assert r["totals"]["oneWayLowest"] == 19.0
    assert "returnLowest" not in r["totals"]
    assert "roundTripLowest" not in r["totals"]
    assert ("Could not find separate return leg pricing. Round-trip "
            "total unavailable.") in r["caveats"]


def test_query_passthrough():
    r = build([make_source("FlixBus from $19.00", "wanderu.com")])
    assert r["query"] == {
        "origin": "new york", "destination": "boston",
        "departDate": "april 2", "returnDate": "april 5",
        "isRoundTrip": True, "mode": "bus"}


def test_high_confidence():
    r = build([
        make_source("FlixBus from $19.00", "flixbus.com"),
        make_source("Greyhound from $25.00 | OurBus from $23.00",
                    "greyhound.com"),
    ], isRoundTrip=False)
    assert r["confidence"] == "HIGH"


def test_medium_confidence():
    r = build([make_source("FlixBus from $19.00", "wanderu.com")],
              isRoundTrip=False)
    assert r["confidence"] == "MEDIUM"


def test_low_confidence():
    r = build([make_source("Tickets around $30", "blogpost.com")],
              isRoundTrip=False)
    assert r["confidence"] == "LOW"


def test_noise_prices_filtered():
    r = build([make_source("FlixBus from $19.00 | Total revenue $5000000",
                           "wanderu.com")], isRoundTrip=False)
    assert r["bestOption"]["price"] == 19.0
    prices = [r["bestOption"]["price"]] + \
        [a["price"] for a in r["alternatives"]]
    assert all(p < 1000 for p in prices)


def test_dedup_same_provider_price():
    r = build([
        make_source("FlixBus from $19.00", "wanderu.com"),
        make_source("FlixBus from $19.00", "busbud.com"),
    ], isRoundTrip=False)
    providers = [r["bestOption"]["provider"]] + \
        [a["provider"] for a in r["alternatives"]]
    assert providers.count("FlixBus") == 1


def test_price_on_provider_pattern():
    r = build([make_source(
        "Starting at $19.99 on FlixBus for the New York to Boston route",
        "rome2rio.com")], isRoundTrip=False)
    assert r["bestOption"]["provider"] == "FlixBus"
    assert r["bestOption"]["price"] == 19.99


def test_general_caveat_always_present():
    r = build([make_source("FlixBus from $19.00", "wanderu.com")],
              isRoundTrip=False)
    assert ("Prices may vary by date and availability. Book directly "
            "for confirmed pricing.") in r["caveats"]


def test_no_date_caveat():
    r = build([make_source("FlixBus from $19.00", "wanderu.com")],
              departDate="", isRoundTrip=False)
    assert ("No specific date detected — prices shown are "
            "general/representative.") in r["caveats"]


def test_alternatives_capped_at_5():
    r = build([make_source(
        "FlixBus from $19.00 | Greyhound from $25.00 | OurBus from "
        "$23.00 | Megabus from $15.00 | BoltBus from $21.00 | Trailways "
        "from $30.00 | Vamoose from $35.00 | CoachRun from $17.00",
        "wanderu.com")], isRoundTrip=False)
    assert len(r["alternatives"]) <= 5


def test_route_capitalized():
    r = build([make_source("FlixBus from $19.00", "wanderu.com")],
              isRoundTrip=False)
    assert r["bestOption"]["route"] == "New York → Boston"


def test_contract_shape():
    r = build([make_source("FlixBus from $19.00 | Greyhound from $25.00",
                           "wanderu.com")], isRoundTrip=False)
    for field in ("vertical", "headline", "confidence", "bestOption",
                  "alternatives", "caveats"):
        assert field in r
    for field in ("provider", "price", "currency", "url"):
        assert field in r["bestOption"]
        for alt in r["alternatives"]:
            assert field in alt
    assert isinstance(r["caveats"], list)
    assert r["confidence"] in ("HIGH", "MEDIUM", "LOW")
