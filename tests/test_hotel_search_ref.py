"""hotel-search.ts pure-helper port — the reference suite's pure
blocks (45 cases: parseDate / addDays / toKayakSlug / buildSourceUrls
/ parsePrice / parseRating / deduplicateHotels / sortHotels) ported
case-for-case.  The searchHotels orchestration block is N/A (live
multi-site fetch, mocked in the reference)."""

from __future__ import annotations

import datetime

import pytest

from webpeel_spark.pure.hotel_search import (
    add_days,
    build_source_urls,
    deduplicate_hotels,
    normalise_to_hotel_result,
    parse_date,
    parse_price,
    parse_rating,
    sort_hotels,
    to_kayak_slug,
)

BASE = datetime.date(2026, 2, 18)  # Wednesday


class TestParseDate:
    def test_iso_passthrough(self):
        assert parse_date("2026-02-20", BASE) == "2026-02-20"

    def test_today(self):
        assert parse_date("today", BASE) == "2026-02-18"

    def test_tomorrow(self):
        assert parse_date("tomorrow", BASE) == "2026-02-19"

    def test_next_friday_from_wednesday(self):
        assert parse_date("next friday", BASE) == "2026-02-20"

    def test_next_monday_from_wednesday(self):
        assert parse_date("next monday", BASE) == "2026-02-23"

    def test_next_sunday_from_wednesday(self):
        assert parse_date("next sunday", BASE) == "2026-02-22"

    def test_next_same_weekday_is_plus_7(self):
        assert parse_date("next wednesday", BASE) == "2026-02-25"

    def test_unrecognised_raises(self):
        with pytest.raises(ValueError, match="Unrecognized date format"):
            parse_date("not-a-date", BASE)

    def test_case_insensitive(self):
        assert parse_date("Tomorrow", BASE) == "2026-02-19"
        assert parse_date("TOMORROW", BASE) == "2026-02-19"
        assert parse_date("Next Friday", BASE) == "2026-02-20"


class TestAddDays:
    def test_one_day(self):
        assert add_days("2026-02-18", 1) == "2026-02-19"

    def test_month_boundary(self):
        assert add_days("2026-01-31", 1) == "2026-02-01"

    def test_year_boundary(self):
        assert add_days("2025-12-31", 1) == "2026-01-01"

    def test_seven_days(self):
        assert add_days("2026-02-18", 7) == "2026-02-25"


class TestKayakSlug:
    def test_single_part(self):
        assert to_kayak_slug("Manhattan") == "Manhattan"

    def test_spaces_to_hyphens(self):
        assert to_kayak_slug("Long Island City") == "Long-Island-City"

    def test_comma_parts(self):
        assert to_kayak_slug("Manhattan, New York") == "Manhattan,New-York"

    def test_multiword_city_state(self):
        assert to_kayak_slug("Long Island City, New York") == \
            "Long-Island-City,New-York"


class TestBuildSourceUrls:
    CHECKIN, CHECKOUT = "2026-02-20", "2026-02-21"

    def _urls(self, dest="Manhattan"):
        return {u["name"]: u["url"]
                for u in build_source_urls(dest, self.CHECKIN,
                                           self.CHECKOUT)}

    def test_all_sources_present(self):
        urls = self._urls()
        assert {"kayak", "booking", "google", "expedia"} <= set(urls)

    def test_kayak_url(self):
        assert self._urls()["kayak"] == (
            "https://www.kayak.com/hotels/Manhattan/2026-02-20/"
            "2026-02-21?sort=price_a")

    def test_booking_url(self):
        u = self._urls()["booking"]
        assert "booking.com/searchresults.html" in u
        assert "checkin=2026-02-20" in u
        assert "checkout=2026-02-21" in u
        assert "order=price" in u

    def test_google_url(self):
        u = self._urls()["google"]
        assert "google.com/travel/hotels/" in u and "Manhattan" in u

    def test_booking_encodes_spaces(self):
        assert "New%20York%20City" in self._urls("New York City")["booking"]

    def test_google_plus_spaces(self):
        assert "New+York+City" in self._urls("New York City")["google"]

    def test_expedia_url(self):
        u = self._urls()["expedia"]
        assert "expedia.com/Hotel-Search" in u
        assert "startDate=2026-02-20" in u
        assert "endDate=2026-02-21" in u
        assert "sort=PRICE_LOW_TO_HIGH" in u

    def test_expedia_encodes_spaces(self):
        assert "New%20York%20City" in self._urls("New York City")["expedia"]


class TestParsePrice:
    @pytest.mark.parametrize("raw,expected", [
        ("$119", 119), ("$1,299", 1299), ("£85", 85), ("€95", 95),
        ("US$200", 200), ("150", 150), ("", None),
        ("Call for rates", None), ("From $89/night", 89),
    ])
    def test_cases(self, raw, expected):
        assert parse_price(raw) == expected


class TestParseRating:
    @pytest.mark.parametrize("raw,expected", [
        ("Scored 8.4", 8.4), ("4.2/5", 4.2),
        ("4.2/5 (1.4K reviews)", 4.2), ("8.3", 8.3),
        ("Very Good 8.6", 8.6), ("9.0/10", 9.0),
        ("", None), ("No rating yet", None),
    ])
    def test_cases(self, raw, expected):
        assert parse_rating(raw) == expected


def make_hotel(**kw):
    base = {"name": "Test Hotel", "price": None, "priceDisplay": "",
            "rating": None, "ratingDisplay": "", "source": "kayak",
            "link": "", "location": None, "image": None}
    base.update(kw)
    return base


class TestDeduplicate:
    def test_unique_untouched(self):
        assert len(deduplicate_hotels([make_hotel(name="Hotel A"),
                                       make_hotel(name="Hotel B")])) == 2

    def test_keeps_richer_entry(self):
        got = deduplicate_hotels([
            make_hotel(name="Grand Hotel", source="kayak"),
            make_hotel(name="Grand Hotel", price=150, rating=8.5,
                       source="booking")])
        assert len(got) == 1
        assert got[0]["source"] == "booking" and got[0]["price"] == 150

    def test_lower_price_on_tie(self):
        got = deduplicate_hotels([
            make_hotel(name="Grand Hotel", price=200, rating=8.5),
            make_hotel(name="Grand Hotel", price=150, rating=8.0)])
        assert len(got) == 1 and got[0]["price"] == 150

    def test_case_insensitive(self):
        assert len(deduplicate_hotels([
            make_hotel(name="grand hotel", price=100),
            make_hotel(name="Grand Hotel", price=90)])) == 1

    def test_whitespace_normalised(self):
        assert len(deduplicate_hotels([
            make_hotel(name="Hotel  A"), make_hotel(name="Hotel A")])) == 1


class TestSort:
    HOTELS = [
        make_hotel(name="Cheap No Rating", price=50),
        make_hotel(name="Expensive High Rating", price=200, rating=9.5),
        make_hotel(name="Mid Price Mid Rating", price=120, rating=7.0),
        make_hotel(name="No Price Good Rating", rating=8.5),
    ]

    def test_price_ascending_nulls_last(self):
        names = [h["name"] for h in sort_hotels(self.HOTELS, "price")]
        assert names == ["Cheap No Rating", "Mid Price Mid Rating",
                         "Expensive High Rating", "No Price Good Rating"]

    def test_rating_descending_nulls_last(self):
        names = [h["name"] for h in sort_hotels(self.HOTELS, "rating")]
        assert names == ["Expensive High Rating", "No Price Good Rating",
                         "Mid Price Mid Rating", "Cheap No Rating"]

    def test_value_descending_nulls_last(self):
        names = [h["name"] for h in sort_hotels(self.HOTELS, "value")]
        assert names[:2] == ["Mid Price Mid Rating",
                             "Expensive High Rating"]
        assert set(names[2:]) == {"Cheap No Rating",
                                  "No Price Good Rating"}

    def test_does_not_mutate(self):
        first = self.HOTELS[0]["name"]
        sort_hotels(self.HOTELS, "price")
        assert self.HOTELS[0]["name"] == first


class TestNormalise:
    def test_maps_listing_item(self):
        r = normalise_to_hotel_result(
            {"title": " Grand Hotel ", "price": "$119",
             "rating": "Scored 8.4", "link": "https://x/1",
             "description": " Midtown ", "image": "https://x/i.jpg"},
            "kayak")
        assert r["name"] == "Grand Hotel"
        assert r["price"] == 119 and r["priceDisplay"] == "$119"
        assert r["rating"] == 8.4
        assert r["source"] == "kayak" and r["location"] == "Midtown"

    def test_none_without_title(self):
        assert normalise_to_hotel_result({"price": "$5"}, "kayak") is None
