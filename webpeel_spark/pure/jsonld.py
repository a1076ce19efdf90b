"""JSON-LD structured-data extraction → markdown.

Pure-Python reimplementation of /root/reference/src/core/json-ld.ts:
script harvesting with ``@graph`` flattening (:84-104), the type switch
(:107-162) and converters for Recipe (:169), Product (:299), Article /
NewsArticle / BlogPosting / TechArticle (:367), FAQPage (:405), HowTo
(:436), Event (:495), LocalBusiness / Restaurant / Store (:530) and
Review (:595).  The ISO-8601 duration pretty-printer (:53-69) and
schema.org availability camel-split (:72-78) are preserved exactly —
they define output bytes.
"""

from __future__ import annotations

import json
import re
from typing import Any, List, NamedTuple, Optional

from ..dom import parse_html, select


class JsonLdResult(NamedTuple):
    found: bool
    type: str
    content: str
    title: str
    data: Any


from .jstext import js_trim

_TAG_RE = re.compile(r"<[^>]*>")


def strip_html(text: Any) -> str:
    if not text or not isinstance(text, str):
        return ""
    return js_trim(
        _TAG_RE.sub("", text)
        .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", '"').replace("&#39;", "'").replace("&nbsp;", " ")
    )


def _str(val: Any) -> str:
    if not val:
        return ""
    if isinstance(val, str):
        return strip_html(val)
    if isinstance(val, dict):
        if val.get("@value"):
            # json-ld.ts:34 wraps @value in String() explicitly
            return strip_html(_js_string(val["@value"]))
        if val.get("name"):
            # :35 passes val.name to stripHtml RAW — its typeof guard
            # returns '' for non-strings (no Python repr leak)
            n = val["name"]
            return strip_html(n) if isinstance(n, str) else ""
        if val.get("text"):
            t = val["text"]
            return strip_html(t) if isinstance(t, str) else ""
    return strip_html(_js_string(val))


def _js_string(val: Any) -> str:
    """JS ``String(val)`` for JSON-decoded values: arrays join on ','
    (null elements → ''), objects are '[object Object]' — never a
    Python repr."""
    if val is None:
        return "null"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float) and val.is_integer():
        return str(int(val))
    if isinstance(val, list):
        return ",".join("" if v is None else _js_string(v) for v in val)
    if isinstance(val, dict):
        return "[object Object]"
    return str(val)


def _js_array_join(arr: list, sep: str) -> str:
    """JS ``Array.prototype.join``: String() per element, null → ''."""
    return sep.join("" if v is None else _js_string(v) for v in arr)


_PARSEFLOAT_RE = re.compile(
    r"\s*([+-]?(?:Infinity|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?))")


def _js_parse_float(s: str) -> Optional[float]:
    """JS ``parseFloat``: longest numeric prefix, else NaN (None) —
    '99 USD' → 99.0, '1,299' → 1.0, 'abc' → None."""
    m = _PARSEFLOAT_RE.match(s)
    return float(m.group(1)) if m else None


def author_name(author: Any) -> str:
    if not author:
        return ""
    if isinstance(author, str):
        return strip_html(author)
    if isinstance(author, list):
        return ", ".join(
            n for n in (_str(a.get("name") if isinstance(a, dict) else a) or ""
                        for a in author) if n
        )
    if isinstance(author, dict):
        return _str(author.get("name") or author)
    return _str(author)


_DURATION_RE = re.compile(r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$")


def parse_iso8601_duration(duration: str) -> str:
    """PT1H30M → '1 hr 30 min' (json-ld.ts:53-69)."""
    if not duration or not isinstance(duration, str):
        return ""
    m = _DURATION_RE.match(duration)
    if not m:
        return duration
    days = int(m.group(1) or 0)
    hours = int(m.group(2) or 0)
    minutes = int(m.group(3) or 0)
    seconds = int(m.group(4) or 0)
    parts: List[str] = []
    if days:
        parts.append(f"{days} day{'s' if days > 1 else ''}")
    if hours:
        parts.append(f"{hours} hr")
    if minutes:
        parts.append(f"{minutes} min")
    if seconds and not days and not hours and not minutes:
        parts.append(f"{seconds} sec")
    return " ".join(parts) or duration


def parse_availability(availability: str) -> str:
    """schema.org/InStock → 'In Stock' (json-ld.ts:72-78)."""
    if not availability:
        return ""
    last = re.split(r"[/#]", availability)[-1] or availability
    return re.sub(r"([A-Z])", r" \1", last).strip()


def extract_jsonld(html: str) -> Optional[JsonLdResult]:
    return extract_jsonld_dom(parse_html(html))


def extract_jsonld_dom(root) -> Optional[JsonLdResult]:
    """DOM form of extract_jsonld (reuses an existing parse)."""
    return extract_jsonld_scripts(
        select(root, 'script[type="application/ld+json"]'))


def collect_anchors_and_ld(root):
    """One DOM walk collecting ``a[href]`` anchors and
    ``script[type="application/ld+json"]`` nodes — predicate-identical
    to the two selector calls it replaces on the extraction hot path
    (href presence resp. exact type match; tags/attr names are already
    lowercased by the parser)."""
    anchors, ld_scripts = [], []
    # elements_list: populates the tree's memoized walk, which the
    # selector engine and junk sweep reuse until the first mutation
    for el in root.elements_list():
        t = el.tag
        if t == "a":
            if "href" in el.attrs:
                anchors.append(el)
        elif t == "script" and el.attrs.get("type") == "application/ld+json":
            ld_scripts.append(el)
    return anchors, ld_scripts


def extract_jsonld_scripts(script_nodes) -> Optional[JsonLdResult]:
    """Core of extract_jsonld over pre-collected ld+json script nodes
    (lets the pipeline collect them during its one shared DOM walk)."""
    scripts: List[Any] = []
    for el in script_nodes:
        raw = el.text()
        if not raw:
            continue
        try:
            parsed = json.loads(raw)
        except Exception:
            continue
        if isinstance(parsed, dict) and parsed.get("@graph"):
            scripts.extend(parsed["@graph"])
        elif isinstance(parsed, list):
            scripts.extend(parsed)
        else:
            scripts.append(parsed)

    if not scripts:
        return None

    for item in scripts:
        if not isinstance(item, dict):
            continue
        type_ = item.get("@type")
        if not type_:
            continue
        type_str = type_[0] if isinstance(type_, list) else type_
        if not isinstance(type_str, str):
            # switch(typeStr) on an object matches no case and falls
            # through to the next item (dict.get would raise unhashable)
            continue
        converter = _CONVERTERS.get(type_str)
        if converter is not None:
            r = converter(item)
            if r is not None:
                return r
    return None


# ── converters ────────────────────────────────────────────────────────────

def _collect_steps(raw: Any) -> List[str]:
    steps: List[str] = []
    if not raw:
        return steps
    lst = raw if isinstance(raw, list) else [raw]
    for inst in lst:
        if isinstance(inst, str):
            t = strip_html(inst)
            if t:
                steps.append(t)
        elif isinstance(inst, dict) and inst.get("@type") == "HowToStep":
            t = _str(inst.get("text") or inst.get("name"))
            if t:
                steps.append(t)
        elif isinstance(inst, dict) and inst.get("@type") == "HowToSection":
            nested = inst.get("itemListElement")
            for s in (nested if isinstance(nested, list) else []):
                t = _str(s.get("text") or s.get("name")) if isinstance(s, dict) else ""
                if t:
                    steps.append(t)
    return steps


def convert_recipe(item: dict) -> Optional[JsonLdResult]:
    name = _str(item.get("name"))
    ing_raw = item.get("recipeIngredient")
    ingredients = (
        [s for s in (_str(i) for i in ing_raw) if s] if isinstance(ing_raw, list) else []
    )
    if not name or not ingredients:
        return None

    instructions = _collect_steps(item.get("recipeInstructions"))
    description = _str(item.get("description"))
    prep_time = parse_iso8601_duration(item["prepTime"]) if item.get("prepTime") else ""
    cook_time = parse_iso8601_duration(item["cookTime"]) if item.get("cookTime") else ""
    total_time = parse_iso8601_duration(item["totalTime"]) if item.get("totalTime") else ""
    recipe_yield = _str(item.get("recipeYield"))

    nutrition = item.get("nutrition") or {}
    calories = _str(nutrition.get("calories")) if isinstance(nutrition, dict) else ""
    fat = _str(nutrition.get("fatContent")) if isinstance(nutrition, dict) else ""
    protein = _str(nutrition.get("proteinContent")) if isinstance(nutrition, dict) else ""
    carbs = _str(nutrition.get("carbohydrateContent")) if isinstance(nutrition, dict) else ""

    rating = item.get("aggregateRating")
    rating_value = _str(rating.get("ratingValue")) if isinstance(rating, dict) else ""
    rating_count = (
        _str(rating.get("ratingCount") or rating.get("reviewCount"))
        if isinstance(rating, dict) else ""
    )
    author = author_name(item.get("author"))

    lines: List[str] = [f"# {name}", ""]
    if description:
        lines.extend([description, ""])

    time_parts: List[str] = []
    if prep_time:
        time_parts.append(f"**Prep Time:** {prep_time}")
    if cook_time:
        time_parts.append(f"**Cook Time:** {cook_time}")
    if total_time:
        time_parts.append(f"**Total:** {total_time}")
    if time_parts:
        lines.append(" | ".join(time_parts))

    yield_parts: List[str] = []
    if recipe_yield:
        yield_parts.append(f"**Servings:** {recipe_yield}")
    if calories:
        yield_parts.append(f"**Calories:** {calories}")
    if yield_parts:
        lines.append(" | ".join(yield_parts))
    if time_parts or yield_parts:
        lines.append("")

    lines.append("## Ingredients")
    lines.extend(f"- {ing}" for ing in ingredients)
    lines.append("")

    if instructions:
        lines.append("## Instructions")
        lines.extend(f"{i + 1}. {inst}" for i, inst in enumerate(instructions))
        lines.append("")

    nutrition_parts: List[str] = []
    if calories:
        nutrition_parts.append(f"Calories: {calories}")
    if fat:
        nutrition_parts.append(f"Fat: {fat}")
    if protein:
        nutrition_parts.append(f"Protein: {protein}")
    if carbs:
        nutrition_parts.append(f"Carbs: {carbs}")
    if nutrition_parts:
        lines.extend(["## Nutrition", " | ".join(nutrition_parts), ""])

    footer_parts: List[str] = []
    if author:
        footer_parts.append(f"Source: {author}")
    if rating_value:
        footer_parts.append(
            f"Rating: {rating_value}/5 ({rating_count} reviews)" if rating_count
            else f"Rating: {rating_value}/5"
        )
    if footer_parts:
        lines.append(f"*{' | '.join(footer_parts)}*")

    return JsonLdResult(True, "Recipe", "\n".join(lines).strip(), name, item)


def convert_product(item: dict) -> Optional[JsonLdResult]:
    name = _str(item.get("name"))
    if not name:
        return None
    description = _str(item.get("description"))
    brand_raw = item.get("brand")
    brand = _str(brand_raw.get("name") or brand_raw) if isinstance(brand_raw, dict) else _str(brand_raw)
    sku = _str(item.get("sku") or item.get("mpn"))

    price = currency = availability = ""
    if item.get("offers"):
        offers = item["offers"] if isinstance(item["offers"], list) else [item["offers"]]
        lowest_price = float("inf")
        lowest = offers[0]
        for offer in offers:
            if not isinstance(offer, dict):
                continue
            # parseFloat, not float(): '99 USD' → 99, '1,299' → 1
            # (json-ld.ts:316) — float() rejected both, skipping offers
            # the reference selects
            p = _js_parse_float(_str(offer.get("price")))
            if p is None:
                continue
            if p < lowest_price:
                lowest_price = p
                lowest = offer
        if isinstance(lowest, dict):
            price = _str(lowest.get("price"))
            currency = _str(lowest.get("priceCurrency"))
            availability = (
                parse_availability(_str(lowest.get("availability")))
                if lowest.get("availability") else ""
            )

    rating = item.get("aggregateRating")
    rating_value = _str(rating.get("ratingValue")) if isinstance(rating, dict) else ""
    rating_count = (
        _str(rating.get("reviewCount") or rating.get("ratingCount"))
        if isinstance(rating, dict) else ""
    )

    lines: List[str] = [f"# {name}", ""]
    if description:
        lines.extend([description, ""])
    if price:
        lines.append(f"**Price:** {price}{' ' + currency if currency else ''}")
    if availability:
        lines.append(f"**Availability:** {availability}")
    if brand:
        lines.append(f"**Brand:** {brand}")
    if rating_value:
        r = f"{rating_value}/5 ({rating_count} reviews)" if rating_count else f"{rating_value}/5"
        lines.append(f"**Rating:** {r}")
    if sku:
        lines.append(f"**SKU:** {sku}")

    return JsonLdResult(True, "Product", "\n".join(lines).strip(), name, item)


def convert_article(item: dict) -> Optional[JsonLdResult]:
    headline = _str(item.get("headline") or item.get("name"))
    if not headline:
        return None
    article_body = _str(item.get("articleBody"))
    if not article_body:
        return None
    author = author_name(item.get("author"))
    date_published = _str(item.get("datePublished"))
    date_modified = _str(item.get("dateModified"))
    type_ = item.get("@type")
    type_str = type_[0] if isinstance(type_, list) else (type_ or "Article")

    lines: List[str] = [f"# {headline}", ""]
    meta_parts: List[str] = []
    if author:
        meta_parts.append(f"By {author}")
    if date_published:
        meta_parts.append(f"Published: {date_published}")
    if date_modified:
        meta_parts.append(f"Modified: {date_modified}")
    if meta_parts:
        lines.extend([f"*{' | '.join(meta_parts)}*", ""])
    lines.append(article_body)

    return JsonLdResult(True, type_str, "\n".join(lines).strip(), headline, item)


def convert_faq(item: dict) -> Optional[JsonLdResult]:
    main_entity = item.get("mainEntity")
    if not isinstance(main_entity, list) or not main_entity:
        return None
    lines: List[str] = ["# Frequently Asked Questions", ""]
    for q in main_entity:
        if not isinstance(q, dict):
            continue
        question = _str(q.get("name"))
        answer = _str(q["acceptedAnswer"].get("text")) if isinstance(q.get("acceptedAnswer"), dict) else ""
        if not question:
            continue
        lines.append(f"## {question}")
        if answer:
            lines.append(answer)
        lines.append("")
    content = "\n".join(lines).strip()
    if len(content) < 50:
        return None
    return JsonLdResult(True, "FAQPage", content, "Frequently Asked Questions", item)


def convert_howto(item: dict) -> Optional[JsonLdResult]:
    name = _str(item.get("name"))
    if not name:
        return None
    description = _str(item.get("description"))
    steps = _collect_steps(item.get("step") or item.get("itemListElement") or [])
    if not steps:
        return None
    total_time = parse_iso8601_duration(item["totalTime"]) if item.get("totalTime") else ""
    cost_raw = item.get("estimatedCost")
    estimated_cost = (
        _str(cost_raw.get("value") or cost_raw) if isinstance(cost_raw, dict)
        else _str(cost_raw) if cost_raw else ""
    )

    lines: List[str] = [f"# {name}", ""]
    if description:
        lines.extend([description, ""])
    if total_time:
        lines.append(f"**Total Time:** {total_time}")
    if estimated_cost:
        lines.append(f"**Estimated Cost:** {estimated_cost}")
    if total_time or estimated_cost:
        lines.append("")
    lines.append("## Steps")
    lines.extend(f"{i + 1}. {s}" for i, s in enumerate(steps))

    return JsonLdResult(True, "HowTo", "\n".join(lines).strip(), name, item)


def convert_event(item: dict) -> Optional[JsonLdResult]:
    name = _str(item.get("name"))
    if not name:
        return None
    description = _str(item.get("description"))
    start_date = _str(item.get("startDate"))
    end_date = _str(item.get("endDate"))
    loc_raw = item.get("location")
    location = (
        _str(loc_raw.get("name") or loc_raw.get("address") or loc_raw)
        if isinstance(loc_raw, dict) else _str(loc_raw) if loc_raw else ""
    )
    org_raw = item.get("organizer")
    organizer = (
        _str(org_raw.get("name") or org_raw) if isinstance(org_raw, dict)
        else _str(org_raw) if org_raw else ""
    )
    url = _str(item.get("url"))

    lines: List[str] = [f"# {name}", ""]
    if description:
        lines.extend([description, ""])
    if start_date:
        lines.append(f"**Date:** {start_date}{' – ' + end_date if end_date else ''}")
    if location:
        lines.append(f"**Location:** {location}")
    if organizer:
        lines.append(f"**Organizer:** {organizer}")
    if url:
        lines.append(f"**URL:** {url}")

    return JsonLdResult(True, "Event", "\n".join(lines).strip(), name, item)


def convert_local_business(item: dict) -> Optional[JsonLdResult]:
    name = _str(item.get("name"))
    if not name:
        return None
    description = _str(item.get("description"))
    type_ = item.get("@type")
    type_str = type_[0] if isinstance(type_, list) else (type_ or "LocalBusiness")

    addr = item.get("address")
    address = ""
    if addr:
        if isinstance(addr, str):
            address = addr
        elif isinstance(addr, dict):
            parts = [addr.get(k) for k in ("streetAddress", "addressLocality",
                                           "addressRegion", "postalCode", "addressCountry")]
            address = ", ".join(str(p) for p in parts if p)

    phone = _str(item.get("telephone"))
    url = _str(item.get("url"))
    price_range = _str(item.get("priceRange"))
    sc = item.get("servesCuisine")
    # Array.join stringifies non-string members ('[object Object]')
    # instead of raising (json-ld.ts:552)
    serves_cuisine = (_js_array_join(sc, ", ") if isinstance(sc, list)
                      else (_str(sc) if sc else ""))

    rating = item.get("aggregateRating")
    rating_value = _str(rating.get("ratingValue")) if isinstance(rating, dict) else ""
    rating_count = (
        _str(rating.get("reviewCount") or rating.get("ratingCount"))
        if isinstance(rating, dict) else ""
    )
    hours = item.get("openingHours")
    hours_str = (_js_array_join(hours, ", ") if isinstance(hours, list)
                 else (_str(hours) if hours else ""))

    lines: List[str] = [f"# {name}", ""]
    if description:
        lines.extend([description, ""])
    if address:
        lines.append(f"**Address:** {address}")
    if phone:
        lines.append(f"**Phone:** {phone}")
    if url:
        lines.append(f"**Website:** {url}")
    if price_range:
        lines.append(f"**Price Range:** {price_range}")
    if serves_cuisine:
        lines.append(f"**Cuisine:** {serves_cuisine}")
    if hours_str:
        lines.append(f"**Hours:** {hours_str}")
    if rating_value:
        r = f"{rating_value}/5 ({rating_count} reviews)" if rating_count else f"{rating_value}/5"
        lines.append(f"**Rating:** {r}")

    return JsonLdResult(True, type_str, "\n".join(lines).strip(), name, item)


def convert_review(item: dict) -> Optional[JsonLdResult]:
    ir = item.get("itemReviewed")
    item_reviewed = (
        _str(ir.get("name") or ir) if isinstance(ir, dict) else _str(ir) if ir else ""
    )
    author = author_name(item.get("author"))
    review_body = _str(item.get("reviewBody"))
    if not review_body:
        return None
    rr = item.get("reviewRating")
    rating_value = _str(rr.get("ratingValue")) if isinstance(rr, dict) else ""
    best_rating = _str(rr.get("bestRating") or "5") if isinstance(rr, dict) else "5"
    date_published = _str(item.get("datePublished"))

    title = (
        f"Review: {item_reviewed}" if item_reviewed
        else (f"Review by {author}" if author else "Review")
    )
    lines: List[str] = [f"# {title}", ""]
    meta_parts: List[str] = []
    if author:
        meta_parts.append(f"By {author}")
    if rating_value:
        meta_parts.append(f"Rating: {rating_value}/{best_rating}")
    if date_published:
        meta_parts.append(date_published)
    if meta_parts:
        lines.extend([f"*{' | '.join(meta_parts)}*", ""])
    lines.append(review_body)

    return JsonLdResult(True, "Review", "\n".join(lines).strip(), title, item)


_CONVERTERS = {
    "Recipe": convert_recipe,
    "Product": convert_product,
    "Article": convert_article,
    "NewsArticle": convert_article,
    "BlogPosting": convert_article,
    "TechArticle": convert_article,
    "FAQPage": convert_faq,
    "HowTo": convert_howto,
    "Event": convert_event,
    "LocalBusiness": convert_local_business,
    "Restaurant": convert_local_business,
    "Store": convert_local_business,
    "Review": convert_review,
}
