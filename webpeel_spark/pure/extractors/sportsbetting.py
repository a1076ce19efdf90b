"""Sports-betting sites extractor (ee/extractors/sportsbetting.ts:1-39
port): helpful redirect message.  Pure function of the URL."""

from __future__ import annotations

from urllib.parse import urlsplit


def sports_betting_extractor(html: str, url: str):
    from . import DomainExtractResult

    brand_name = "Sports Betting Site"
    domain = "sportsbook"
    try:
        hostname = (urlsplit(url).hostname or "")
        # JS String.replace swaps only the FIRST occurrence
        hostname = hostname.replace("www.", "", 1).replace("sportsbook.", "", 1)
        domain = hostname
        if "draftkings" in hostname:
            brand_name = "DraftKings Sportsbook"
        elif "fanduel" in hostname:
            brand_name = "FanDuel Sportsbook"
        elif "betmgm" in hostname:
            brand_name = "BetMGM Sportsbook"
    except ValueError:
        pass

    clean_content = f"""# ⚠️ {brand_name}

{brand_name} requires authentication and geo-verification. WebPeel cannot scrape live odds directly.

**For live sports odds, use these alternatives:**
- `webpeel "https://espn.com/nba/scoreboard"` — Live scores and schedules
- `webpeel "https://polymarket.com"` — Prediction market prices
- The Odds API (theOddsApi.com) — Aggregated odds from all sportsbooks (requires API key)

**For team schedules and standings:**
- `webpeel "https://espn.com/nba/standings"` — NBA standings
- `webpeel "https://espn.com/nfl/scoreboard"` — NFL scores
- `webpeel "https://espn.com/mlb/scoreboard"` — MLB scores"""

    return DomainExtractResult(
        domain=domain,
        type="blocked",
        structured={"site": brand_name,
                    "reason": "authentication and geo-verification required"},
        clean_content=clean_content,
    )
