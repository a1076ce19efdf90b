"""zillow / redfin / etsy / facebook / sportsbetting / substackroot /
google-flights / kayak-cars extractor tests — URL-pattern and
text-stage fixtures with behavioral assertions (reference:
src/ee/extractors/*.ts)."""

from webpeel_spark.pure.extractors import (
    extract_domain_data, get_domain_extractor,
)
from webpeel_spark.pure.extractors.etsy import etsy_extractor
from webpeel_spark.pure.extractors.facebook import (
    facebook_marketplace_extractor,
)
from webpeel_spark.pure.extractors.google_flights import (
    google_flights_extractor,
)
from webpeel_spark.pure.extractors.kayak_cars import (
    kayak_car_rental_extractor,
)
from webpeel_spark.pure.extractors.redfin import redfin_extractor
from webpeel_spark.pure.extractors.sportsbetting import (
    sports_betting_extractor,
)
from webpeel_spark.pure.extractors.substackroot import (
    substack_root_extractor,
)
from webpeel_spark.pure.extractors.zillow import (
    format_redfin_listings, zillow_extractor,
)


# ── registry dispatch (index.ts:118-134 order) ──────────────────────────

def test_registry_dispatch_new_hosts():
    assert get_domain_extractor("https://www.zillow.com/new-york-ny/") \
        is zillow_extractor
    assert get_domain_extractor("https://www.redfin.com/NY/New-York") \
        is redfin_extractor
    assert get_domain_extractor("https://www.etsy.com/search?q=x") \
        is etsy_extractor
    assert get_domain_extractor(
        "https://www.facebook.com/marketplace/nyc/search?query=x") \
        is facebook_marketplace_extractor
    assert get_domain_extractor("https://sportsbook.draftkings.com/nba") \
        is sports_betting_extractor
    assert get_domain_extractor("https://www.fanduel.com/sportsbook") \
        is sports_betting_extractor
    assert get_domain_extractor("https://substack.com/") \
        is substack_root_extractor
    # www.substack.com is shadowed by the .substack.com newsletter entry
    assert get_domain_extractor("https://www.substack.com/") \
        is not substack_root_extractor
    assert get_domain_extractor(
        "https://www.google.com/travel/flights?q=x") \
        is google_flights_extractor
    assert get_domain_extractor("https://www.google.com/search?q=x") \
        is not google_flights_extractor
    assert get_domain_extractor(
        "https://www.kayak.com/cars/Miami/2024-04-01/2024-04-03") \
        is kayak_car_rental_extractor
    assert get_domain_extractor("https://www.kayak.com/flights/x") \
        is not kayak_car_rental_extractor
    # the pdf URL rule outranks hosts registered after it (index.ts)
    from webpeel_spark.pure.extractors.pdfurl import pdf_url_extractor
    assert get_domain_extractor("https://www.zillow.com/brochure.pdf") \
        is pdf_url_extractor


# ── zillow ───────────────────────────────────────────────────────────────

def test_zillow_city_state_redirect():
    r = zillow_extractor(
        "", "https://www.zillow.com/new-york-ny/?price_max=750000")
    assert r.type == "redirect-to-redfin"
    assert r.structured["city"] == "New York"
    assert r.structured["state"] == "NY"
    assert r.structured["priceMax"] == 750000
    assert r.structured["redirectUrl"] == "https://www.redfin.com/NY/New-York"
    assert "# 🏠 Real Estate — New York, NY" in r.clean_content
    assert "**Max Price:** $750,000" in r.clean_content
    # unset min price line is filter(Boolean)-dropped
    assert "Min Price" not in r.clean_content


def test_zillow_homedetails():
    r = zillow_extractor(
        "", "https://www.zillow.com/homedetails/"
            "123-Main-St-New-York-NY-10001/4567890_zpid/")
    assert r.type == "redirect-to-redfin"
    assert r.structured["address"] == "123 Main St New York NY 10001"
    assert r.structured["zpid"] == "4567890"
    assert "# 🏠 Property — 123 Main St New York NY 10001" in r.clean_content
    assert ("https://www.redfin.com/search#query="
            "123%20Main%20St%20New%20York%20NY%2010001") in r.clean_content


def test_zillow_fallback_blocked():
    r = zillow_extractor("", "https://www.zillow.com/")
    assert r.type == "blocked"
    assert r.structured["blocked"] is True
    assert "# 🏠 Zillow — Real Estate Search" in r.clean_content


def test_format_redfin_listings_fixture_payload():
    homes = [{
        "streetLine": {"value": "42 Oak Ave"},
        "city": "Austin", "state": "TX", "zip": "78701",
        "price": {"value": 550000}, "beds": 3, "baths": 2,
        "sqFt": {"value": 1850}, "mlsStatus": "Active",
        "dom": {"value": 12}, "url": "/TX/Austin/42-Oak-Ave/home/99",
        "listingRemarks": "Charming bungalow near downtown.",
        "sashes": [{"sashTypeName": "Hot Home"}],
    }]
    median = {"price": 600000, "sqFt": 2000, "pricePerSqFt": 300,
              "beds": 3, "dom": 15}
    r = format_redfin_listings(homes, "Austin, TX",
                               "https://www.redfin.com/TX/Austin", median)
    assert r.type == "real-estate-search"
    assert "### 42 Oak Ave" in r.clean_content
    assert "**Price:** $550,000  ·  3bd · 2ba · 1,850 sqft" in r.clean_content
    assert "**12 days on market**" in r.clean_content
    assert "*Hot Home*" in r.clean_content
    assert "- **Median Price:** $600,000" in r.clean_content
    assert r.structured["listings"][0]["url"] == \
        "https://www.redfin.com/TX/Austin/42-Oak-Ave/home/99"


# ── redfin ───────────────────────────────────────────────────────────────

def test_redfin_state_city_fallback():
    r = redfin_extractor("", "https://www.redfin.com/NY/New-York")
    assert r.type == "real-estate-search"
    assert r.structured == {"city": "New York", "state": "NY"}
    assert "# 🏠 Redfin — New York, NY" in r.clean_content
    assert 'webpeel "https://www.redfin.com/city/{id}/NY/New-York"' \
        in r.clean_content


def test_redfin_city_id_falls_through_to_homepage():
    # no-network: /city/{id}/... never returns listings, and no later
    # pattern matches, so the homepage guide is emitted (redfin.ts flow)
    r = redfin_extractor("", "https://www.redfin.com/city/30749/NY/New-York")
    assert r.type == "homepage"
    assert "# 🏠 Redfin — Real Estate Listings" in r.clean_content


def test_redfin_homepage():
    r = redfin_extractor("", "https://www.redfin.com/")
    assert r.type == "homepage"


# ── etsy ─────────────────────────────────────────────────────────────────

def test_etsy_search_query_param():
    r = etsy_extractor("", "https://www.etsy.com/search?q=handmade+jewelry")
    assert r.type == "blocked"
    assert r.structured["query"] == "handmade jewelry"
    assert '# 🎨 Etsy — "handmade jewelry"' in r.clean_content
    assert ("https://www.google.com/search?q=site:etsy.com+"
            "handmade%20jewelry") in r.clean_content
    assert "eBay" in r.clean_content and "Craigslist" in r.clean_content


def test_etsy_search_path_and_shop():
    r = etsy_extractor("", "https://www.etsy.com/search/handmade-jewelry")
    assert r.structured["query"] == "handmade jewelry"
    r2 = etsy_extractor("", "https://www.etsy.com/shop/CraftyCorner")
    assert r2.structured["shopName"] == "CraftyCorner"
    assert "# 🎨 Etsy — Shop: CraftyCorner" in r2.clean_content
    # shop pages have no marketplace-alternatives block
    assert "Similar items" not in r2.clean_content


def test_etsy_no_query_no_shop_returns_none():
    assert etsy_extractor("", "https://www.etsy.com/") is None


# ── facebook marketplace ─────────────────────────────────────────────────

def test_facebook_marketplace_search():
    r = facebook_marketplace_extractor(
        "", "https://www.facebook.com/marketplace/nyc/search?"
            "query=road+bike&minPrice=100&maxPrice=500")
    assert r.type == "blocked"
    assert r.structured["query"] == "road bike"
    assert r.structured["location"] == "nyc"
    assert "**Price range:** $100 – $500" in r.clean_content
    assert "craigslist.org/search/sss?query=road%20bike&max_price=500" \
        in r.clean_content


def test_facebook_marketplace_browse_no_query():
    r = facebook_marketplace_extractor(
        "", "https://www.facebook.com/marketplace/category/vehicles")
    assert "**Search:** Browse all" in r.clean_content
    assert r.structured["location"] == ""
    # no query -> no alternative-search bullet links
    assert "- `webpeel" not in r.clean_content


def test_facebook_non_marketplace_returns_none():
    assert facebook_marketplace_extractor(
        "", "https://www.facebook.com/somepage") is None


# ── sports betting ───────────────────────────────────────────────────────

def test_sportsbetting_brands():
    r = sports_betting_extractor(
        "", "https://sportsbook.draftkings.com/leagues/basketball/nba")
    assert r.structured["site"] == "DraftKings Sportsbook"
    assert r.domain == "draftkings.com"
    assert "# ⚠️ DraftKings Sportsbook" in r.clean_content
    r2 = sports_betting_extractor("", "https://www.fanduel.com/sportsbook")
    assert r2.structured["site"] == "FanDuel Sportsbook"
    assert r2.domain == "fanduel.com"


# ── substack root ────────────────────────────────────────────────────────

def test_substack_root_guide():
    r = substack_root_extractor("", "https://substack.com/")
    assert r.type == "homepage"
    assert r.domain == "substack.com"
    assert "# 📰 Substack" in r.clean_content
    assert "substack.com/explore" in r.clean_content


# ── google flights (text-stage parse) ────────────────────────────────────

FLIGHTS_TEXT = "\n".join([
    "Some header chrome",
    "-   7:15 PM",
    "7:15 PM on Sat, Apr 4",
    "– 10:29 PM",
    "United",
    "3 hr 14 min",
    "EWR",
    "MCO",
    "Nonstop",
    "1 carry-on bag not included",
    "$188",
    "-   9:30 AM",
    "9:30 AM on Sat, Apr 4",
    "– 12:40 PM",
    "Spirit",
    "3 hr 10 min",
    "EWR",
    "MCO",
    "Nonstop",
    "$95",
    "footer",
])


def test_google_flights_parses_listings():
    url = ("https://www.google.com/travel/flights?q=Flights%20from%20EWR"
           "%20to%20MCO%20one%20way")
    r = google_flights_extractor(FLIGHTS_TEXT, url)
    assert r.type == "flights"
    flights = r.structured["flights"]
    assert len(flights) == 2
    # sorted by price: Spirit first
    assert flights[0]["airline"] == "Spirit" and flights[0]["price"] == 95
    assert flights[1]["airline"] == "United" and flights[1]["price"] == 188
    assert flights[1]["bags"] == "Carry-on NOT included (extra fee)"
    assert flights[0]["fromAirport"] == "EWR"
    assert flights[0]["toAirport"] == "MCO"
    assert r.structured["route"] == "EWR to MCO"
    assert "## 1. Spirit — $95" in r.clean_content
    assert "[Book on Spirit](https://www.spirit.com)" in r.clean_content


def test_google_flights_dedupes_and_requires_fields():
    # duplicate flight collapses; listing without a price is dropped
    text = FLIGHTS_TEXT + "\n" + "\n".join([
        "-   9:30 AM", "9:30 AM on Sat, Apr 4", "– 12:40 PM", "Spirit",
        "3 hr 10 min", "EWR", "MCO", "Nonstop", "$95",
        "-   11:00 AM", "– 2:00 PM", "Delta",
    ])
    r = google_flights_extractor(
        text, "https://www.google.com/travel/flights?q=x")
    assert len(r.structured["flights"]) == 2


def test_google_flights_no_listings_returns_none():
    assert google_flights_extractor(
        "nothing here", "https://www.google.com/travel/flights?q=x") is None
    assert google_flights_extractor(
        FLIGHTS_TEXT, "https://www.google.com/maps") is None


# ── kayak cars (text-stage parse) ────────────────────────────────────────

KAYAK_TEXT = "\n".join([
    "146 results",
    "Toyota Corolla",
    "or similar Intermediate",
    "Pick-up city: Punta Gorda",
    "2.1 mi from city center",
    "8.4",
    "Best offer from Hertz",
    "Free cancellation",
    "$104",
    "Total",
    "Ford Mustang Convertible",
    "or similar Full size Convertible",
    "Pick-up airport: PGD",
    "9.2",
    "Budget",
    "No free cancellation",
    "$310",
    "Total",
])


def test_kayak_cars_parses_listings():
    url = "https://www.kayak.com/cars/Punta-Gorda,FL-c34451/2024-04-01/2024-04-03"
    r = kayak_car_rental_extractor(KAYAK_TEXT, url)
    assert r.type == "car-rental"
    cars = r.structured["cars"]
    assert len(cars) == 2
    assert cars[0]["name"] == "Toyota Corolla"
    assert cars[0]["company"] == "Hertz"
    assert cars[0]["totalPrice"] == 104
    assert cars[0]["perDayPrice"] == 52           # $104 over 2 days
    assert cars[0]["rating"] == 8.4
    assert cars[0]["distanceFromCenter"] == "2.1 mi from city center"
    assert cars[1]["carClass"] == "Full-size Convertible"  # normalized
    assert r.structured["numDays"] == 2
    assert r.structured["totalFound"] == 146
    assert r.structured["location"] == "Punta Gorda, FL"
    assert ("# 🚗 Car Rentals — Punta Gorda, FL · Apr 1–3 (2 days)"
            in r.clean_content)
    assert "[Book on Hertz](https://www.hertz.com)" in r.clean_content


def test_kayak_cars_prefers_known_company_on_dupe():
    text = "\n".join([
        "Kia Rio", "or similar Economy", "$80", "Total",
        "Kia Rio", "or similar Economy", "Avis", "$80", "Total",
    ])
    r = kayak_car_rental_extractor(
        text, "https://www.kayak.com/cars/Miami/2024-05-01/2024-05-02")
    cars = r.structured["cars"]
    assert len(cars) == 1 and cars[0]["company"] == "Avis"


def test_kayak_cars_no_listings_returns_none():
    assert kayak_car_rental_extractor(
        "no cars", "https://www.kayak.com/cars/Miami/2024-05-01/2024-05-02") \
        is None


# ── pipeline integration (>20-char gate, dispatch through extract) ──────

def test_extract_domain_data_routes_new_hosts():
    r = extract_domain_data("", "https://www.zillow.com/seattle-wa/")
    assert r is not None and r.domain == "zillow.com"
    r2 = extract_domain_data(
        "", "https://www.etsy.com/search?q=ceramic+mug")
    assert r2 is not None and r2.domain == "etsy.com"
