"""IMDB extractor (ee/extractors/imdb.ts port): Movie/TVSeries/TVEpisode
JSON-LD with HTML fallbacks for rating/cast/plot/keywords.  Selectors
the reference uses that our engine doesn't parse (:contains,
:nth-child) fall through to the JSON-LD fields, which IMDB always
ships — the same data path the reference ends up on."""

from __future__ import annotations

import json
import re
from typing import List

from ...dom import parse_html, select, select_first


def _try_json(raw: str):
    try:
        return json.loads(raw)
    except Exception:
        return None


def imdb_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        root = parse_html(html)

        json_ld = None
        for el in select(root, 'script[type="application/ld+json"]'):
            if json_ld is not None:
                break
            parsed = _try_json(el.text() or "")
            if isinstance(parsed, dict) and parsed.get("@type") in (
                    "Movie", "TVSeries", "TVEpisode"):
                json_ld = parsed
        jl = json_ld or {}

        def meta(attr, name):
            el = select_first(root, f'meta[{attr}="{name}"]')
            return (el.get("content") or "") if el is not None else ""

        def sel_text(selector):
            el = select_first(root, selector)
            return el.text().strip() if el is not None else ""

        title = (jl.get("name")
                 or re.sub(r" - IMDb$", "", meta("property", "og:title"))
                 or sel_text('h1[data-testid="hero__pageTitle"] span') or "")
        if not title:
            return None

        description = (jl.get("description") or meta("property", "og:description")
                       or sel_text('p[data-testid="plot"]') or "")
        year = ((jl.get("datePublished") or "")[:4]
                or sel_text('a[href*="releaseinfo"]') or "")
        agg = jl.get("aggregateRating") or {}
        rating_value = (agg.get("ratingValue")
                        or sel_text('[data-testid="hero-rating-bar__aggregate-rating__score"] span')
                        or "")
        rating_count = agg.get("ratingCount") or ""
        content_type = jl.get("@type") or "Movie"

        genres: List[str] = []
        g = jl.get("genre")
        if g:
            genres = g if isinstance(g, list) else [g]
        if not genres:
            for el in select(root, '[data-testid="genres"] a, a[href*="/search/title?genres"]'):
                t = el.text().strip()
                if t and t not in genres:
                    genres.append(t)

        d = jl.get("director")
        if d:
            if isinstance(d, list):
                director = ", ".join(
                    x.get("name", "") if isinstance(x, dict) else str(x) for x in d)
            else:
                director = d.get("name") if isinstance(d, dict) else str(d)
        else:
            director = sel_text('a[href*="/name/"][class*="ipc-metadata-list-item__list-content-item"]')

        cast_pairs = []
        for el in select(root, '[data-testid="title-cast-item"]'):
            actor_el = select_first(el, 'a[href*="/name/nm"]')
            char_el = select_first(el, '[data-testid="title-cast-item__character"]')
            actor = actor_el.text().strip() if actor_el is not None else ""
            character = ""
            if char_el is not None:
                character = re.sub(r"\s+", " ", char_el.text().strip())
                character = re.sub(r"^\.\.\.$", "", character)
            if actor and len(actor) > 1:
                cast_pairs.append((actor, character))

        cast_from_html: List[str] = []
        if not cast_pairs:
            for el in select(root, ".cast_list td.itemprop a"):
                name = el.text().strip()
                if name and len(name) > 1 and name not in cast_from_html:
                    cast_from_html.append(name)
        a = jl.get("actor")
        cast_from_ld = ([(x.get("name") if isinstance(x, dict) else str(x))
                         for x in (a if isinstance(a, list) else [a])]
                        if a else [])
        if cast_pairs:
            cast = [f"{actor} as {ch}" if ch else actor
                    for actor, ch in cast_pairs[:10]]
        else:
            cast = list(dict.fromkeys(cast_from_ld + cast_from_html))[:10]

        runtime = ""
        if jl.get("duration"):
            m = re.match(r"PT(?:(\d+)H)?(?:(\d+)M)?", str(jl["duration"]))
            if m:
                runtime = " ".join(p for p in (
                    f"{m.group(1)}h" if m.group(1) else "",
                    f"{m.group(2)}m" if m.group(2) else "") if p)
            else:
                runtime = str(jl["duration"])

        full_plot = sel_text(
            '[data-testid="storyline-plot-summary"] span, '
            '[data-testid="plot-xl"] span, span[data-testid="plot-l"], '
            "#titleStoryLine p, .plot_summary .summary_text") or description

        writers: List[str] = []
        if jl.get("creator"):
            creators = jl["creator"] if isinstance(jl["creator"], list) else [jl["creator"]]
            for c in creators:
                name = c.get("name") if isinstance(c, dict) else (c if isinstance(c, str) else "")
                if name and name not in writers:
                    writers.append(name)

        keywords: List[str] = []
        for el in select(root, '[data-testid="storyline-plot-keywords"] a, '
                               '.see-more.inline.canwrap span a, a[href*="keyword"]'):
            kw = el.text().strip()
            if kw and len(kw) < 30 and kw not in keywords:
                keywords.append(kw)
        if not keywords and jl.get("keywords"):
            kws = (jl["keywords"].split(",") if isinstance(jl["keywords"], str)
                   else jl["keywords"] if isinstance(jl["keywords"], list) else [])
            keywords = [k.strip() for k in kws if k and k.strip()]

        awards = ""
        acc = select_first(root, '[data-testid="awards-accolades"]')
        if acc is not None:
            awards = re.sub(r"\s+", " ", acc.text().strip())
        if not awards and jl.get("award"):
            awards = jl["award"] if isinstance(jl["award"], str) else ""

        content_rating = jl.get("contentRating") or ""
        date_published = jl.get("datePublished") or ""

        structured = {"title": title, "year": year, "contentType": content_type,
                      "description": full_plot, "ratingValue": rating_value,
                      "ratingCount": rating_count, "genres": genres,
                      "director": director, "writers": writers, "cast": cast,
                      "runtime": runtime, "keywords": keywords,
                      "contentRating": content_rating,
                      "datePublished": date_published,
                      "awardsSummary": awards, "url": url}

        try:
            votes = f"{int(rating_count):,}"
        except (TypeError, ValueError):
            votes = str(rating_count)
        rating_line = (f"⭐ {rating_value}/10"
                       + (f" ({votes} votes)" if rating_count else "")
                       if rating_value else "")
        meta_parts = " | ".join(p for p in (
            rating_line, ", ".join(genres) if genres else "",
            f"**Runtime:** {runtime}" if runtime else "",
            f"**Year:** {year}" if year else "") if p)
        detail_parts = "\n".join(p for p in (
            f"**Director:** {director}" if director else "",
            f"**Writers:** {', '.join(writers[:5])}" if writers else "",
            f"**Cast:** {', '.join(cast)}" if cast else "",
            f"**Rated:** {content_rating}" if content_rating else "",
            f"**Released:** {date_published}" if date_published else "",
            f"**Awards:** {awards}" if awards else "") if p)
        keywords_line = (f"\n**Keywords:** {', '.join(keywords[:10])}"
                         if keywords else "")

        clean = (f"# 🎬 {title}\n\n{meta_parts}\n\n{detail_parts}"
                 f"{keywords_line}\n\n## Plot\n\n{full_plot}")
        return DomainExtractResult(
            "imdb.com", "tv_show" if content_type == "TVSeries" else "movie",
            structured, clean)
    except Exception:
        return None
