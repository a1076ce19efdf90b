"""Google SERP parser (google-serp-parser.ts:104-410).

Extracts structured blocks from stored Google search HTML: organic
results, knowledge panel, People-Also-Ask, featured snippet, related
searches, shopping, news, image pack, videos, local pack, and result
stats.  The reference runs this on live search responses; here it is a
per-page parser over a crawled corpus (the input table holds the page
bytes), exercised by the serp_parse operator.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from ..dom import matches, parse_html, select, select_first

_TOTAL_RE = re.compile(r"About ([\d,]+) results", re.I)
_TIME_RE = re.compile(r"\(([\d.]+) seconds?\)", re.I)


def _text(el) -> str:
    return el.text().strip() if el is not None else ""


def _first_text(el, selector: str) -> str:
    return _text(select_first(el, selector))


def _closest(el, selector: str) -> bool:
    """cheerio .closest(sel).length — el itself or any ancestor."""
    if matches(el, selector):
        return True
    return any(matches(a, selector) for a in el.ancestors())


def _parse_float(s: str) -> Optional[float]:
    m = re.match(r"\s*([\d.]+)", s)
    try:
        return float(m.group(1)) if m else None
    except ValueError:
        return None


def _parse_count(s: str) -> Optional[int]:
    digits = re.sub(r"[^0-9]", "", s)
    return int(digits) if digits else None


def parse_google_serp(html: str) -> Dict[str, Any]:
    root = parse_html(html)
    result: Dict[str, Any] = {"organic_results": []}

    # ── 1. organic results ──────────────────────────────────────────
    position = 1
    seen_urls = set()
    for el in select(root, "#search .g, #rso .g"):
        if _closest(el, "[data-text-ad]"):
            continue
        if _closest(el, ".related-question-pair"):
            continue
        if _closest(el, "[data-initq]"):
            continue
        if select_first(el, "[data-text-ad]") is not None:
            continue
        link_el = select_first(el, 'a[href^="http"]')
        title = _first_text(el, "h3")
        url = (link_el.get("href") or "") if link_el is not None else ""
        if not title or not url:
            continue
        if "google.com/search" in url or "/aclk" in url:
            continue
        if url in seen_urls:
            continue
        seen_urls.add(url)

        snippet = (_first_text(el, ".VwiC3b")
                   or _first_text(el, "span.aCOpRe")
                   or _first_text(el, "[data-sncf]")
                   or _first_text(el, '[style*="-webkit-line-clamp"]'))

        sitelinks = []
        for s_el in select(el, ".fl a, .sld a, [data-sitelink] a"):
            s_title = _text(s_el)
            s_url = s_el.get("href") or ""
            if s_title and s_url.startswith("http"):
                sitelinks.append({"title": s_title, "url": s_url})

        date_text = _first_text(el, ".LEwnzc span, .f")
        item: Dict[str, Any] = {"position": position, "title": title,
                                "url": url, "snippet": snippet}
        position += 1
        if sitelinks:
            item["sitelinks"] = sitelinks
        if date_text:
            item["date"] = date_text
        result["organic_results"].append(item)

    # ── 2. knowledge panel ──────────────────────────────────────────
    kp = select_first(root, ".kp-wholepage, .knowledge-panel, .osrp-blk")
    if kp is not None:
        kp_title = _first_text(kp, '[data-attrid="title"], h2')
        if kp_title:
            kp_type = _first_text(kp, '[data-attrid="subtitle"], .wwUB2c')
            kp_desc = _first_text(
                kp, '[data-attrid="description"] span, .kno-rdesc span')
            kp_source = select_first(
                kp, '.kno-rdesc a, [data-attrid="description"] a')
            kp_image_el = select_first(kp, "g-img img, .kno-ftr img")
            attrs: Dict[str, str] = {}
            for attr_el in select(kp, "[data-attrid]"):
                # cheerio .text() on a match set concatenates with no
                # separator (google-serp-parser.ts:173-174)
                key = re.sub(r":$", "", "".join(
                    _text(e) for e in select(attr_el, ".w8qArf, .Z1hOCe")
                ).strip())
                val = "".join(
                    _text(e) for e in select(attr_el, ".LrzXr, .kno-fv")
                ).strip()
                if key and val and key != kp_title:
                    attrs[key] = val
            panel: Dict[str, Any] = {"title": kp_title}
            if kp_type:
                panel["type"] = kp_type
            if kp_desc:
                panel["description"] = kp_desc
            if kp_source is not None and _text(kp_source):
                panel["source"] = _text(kp_source)
            if kp_source is not None and kp_source.get("href"):
                panel["source_url"] = kp_source.get("href")
            if attrs:
                panel["attributes"] = attrs
            if kp_image_el is not None and kp_image_el.get("src"):
                panel["image_url"] = kp_image_el.get("src")
            result["knowledge_panel"] = panel

    # ── 3. people also ask ──────────────────────────────────────────
    paa_items = []
    seen_questions = set()
    for el in select(root, '.related-question-pair, [data-sgrd="true"]'):
        q_el = select_first(el, "[data-q]")
        question = ""
        if q_el is not None:
            data_q = q_el.get("data-q") or ""
            question = data_q.strip() if data_q != "true" else ""
            question = question or _text(q_el)
        question = (question or _first_text(el, ".CSkcDe")
                    or _first_text(el, '[jsname="Cpkphb"] span'))
        if not question or len(question) < 5 or question in seen_questions:
            continue
        seen_questions.add(question)
        snippet = _first_text(el, ".wDYxhc, .LGOjhe")
        source_el = select_first(el, 'a[href^="http"]')
        item = {"question": question}
        if snippet:
            item["snippet"] = snippet[:500]
        if source_el is not None and _text(source_el):
            item["source"] = _text(source_el)
        if source_el is not None and source_el.get("href"):
            item["source_url"] = source_el.get("href")
        paa_items.append(item)
    if paa_items:
        result["people_also_ask"] = paa_items

    # ── 4. featured snippet ─────────────────────────────────────────
    f_snippet = select_first(
        root, '.xpdopen .hgKElc, .c2xzTb, .IZ6rdc, '
              '[data-attrid="wa:/description"] .LGOjhe')
    if f_snippet is not None:
        f_text = _text(f_snippet)
        if f_text and len(f_text) > 20:
            # closest('.g, .xpdopen, [data-hveid]') yields an EMPTY set
            # when no ancestor-or-self matches — find() on it finds
            # nothing, so source/sourceUrl are '' (:225-235); falling
            # back to the snippet element itself took a source the
            # reference never emits
            container = next(
                (a for a in [f_snippet, *f_snippet.ancestors()]
                 if matches(a, ".g") or matches(a, ".xpdopen")
                 or matches(a, "[data-hveid]")), None)
            f_source_el = (select_first(container, 'a[href^="http"]')
                           if container is not None else None)
            has_list = select_first(f_snippet, "ol, ul") is not None
            has_table = select_first(f_snippet, "table") is not None
            source = ""
            if f_source_el is not None:
                source = _first_text(f_source_el, "h3, cite")
            if not source and container is not None:
                source = _first_text(container, "cite")
            result["featured_snippet"] = {
                "text": f_text[:1000],
                "source": source,
                "source_url": (f_source_el.get("href") or ""
                               ) if f_source_el is not None else "",
                "type": ("list" if has_list
                         else "table" if has_table else "paragraph"),
            }

    # ── 5. related searches ─────────────────────────────────────────
    related = []
    seen_related = set()
    for el in select(root, ".k8XOCe, .s75CSd, .EIaa9b, .brs_col a, "
                           "[data-initq]"):
        text = _text(el)
        if text and 2 < len(text) < 100 and text not in seen_related:
            seen_related.add(text)
            related.append(text)
    if related:
        result["related_searches"] = related

    # ── 6. shopping results ─────────────────────────────────────────
    shopping = []
    seen_shop_titles = set()
    for el in select(root, ".sh-dgr__content, .mnr-c .pla-unit, "
                           "[data-docid]"):
        title = _first_text(el, ".tAxDx, .pymv4e, h3")
        if not title or title in seen_shop_titles:
            continue
        seen_shop_titles.add(title)
        item = {"title": title}
        price = _first_text(el, ".a8Pemb, .e10twf, .HRLxBb")
        store = _first_text(el, ".aULzUe, .LbUacb, .dD8iuc")
        url_el = select_first(el, "a[href]")
        img_el = select_first(el, "img")
        rating = _parse_float(_first_text(el, ".Rsc7Yb, .NHJBb"))
        count = _parse_count(_first_text(el, ".GpVvtc, .MRqCbe"))
        if price:
            item["price"] = price
        if store:
            item["source"] = store
        if url_el is not None and url_el.get("href"):
            item["url"] = url_el.get("href")
        if img_el is not None and img_el.get("src"):
            item["image_url"] = img_el.get("src")
        if rating:
            item["rating"] = rating
        if count:
            item["review_count"] = count
        shopping.append(item)
    if shopping:
        result["shopping_results"] = shopping

    # ── 7. news results ─────────────────────────────────────────────
    news = []
    seen_news_urls = set()
    for el in select(root, '.WlydOe, .JJZKK, .SoaBEf, '
                           '[jscontroller="d0DtYd"]'):
        title = _first_text(el, '[role="heading"], .mCBkyc, .nDgy9d')
        link_el = select_first(el, 'a[href^="http"]')
        url = (link_el.get("href") or "") if link_el is not None else ""
        if not title or not url or url in seen_news_urls:
            continue
        seen_news_urls.add(url)
        item = {"title": title, "url": url,
                "source": _first_text(el, ".NUnG9d, .CEMjEf, .XTjFC")}
        date = _first_text(el, ".OSrXXb, .f")
        snippet = _first_text(el, ".GI74Re, .lEBKkf")
        img_el = select_first(el, "img")
        if date:
            item["date"] = date
        if snippet:
            item["snippet"] = snippet
        if img_el is not None and img_el.get("src"):
            item["image_url"] = img_el.get("src")
        news.append(item)
    if news:
        result["news_results"] = news

    # ── 8. image pack ───────────────────────────────────────────────
    images = []
    seen_image_urls = set()
    for el in select(root, ".isv-r a[href], .iKjWAf a[href]"):
        url = el.get("href") or ""
        img_el = select_first(el, "img")
        image_url = ""
        if img_el is not None:
            image_url = img_el.get("src") or img_el.get("data-src") or ""
        if not url or not image_url or url in seen_image_urls:
            continue
        seen_image_urls.add(url)
        item = {"url": url, "image_url": image_url}
        title = (img_el.get("alt") if img_el is not None else None) \
            or el.get("aria-label")
        if title:
            item["title"] = title
        images.append(item)
    if images:
        result["image_pack"] = images

    # ── 9. video results ────────────────────────────────────────────
    videos = []
    seen_video_urls = set()
    for el in select(root, "[data-surl], .dXiKIc, .RzdJxc, .ct3b9e"):
        title = _first_text(el, "h3") or _first_text(el, ".fc9yUc")
        if not title:
            labeled = select_first(el, "[aria-label]")
            title = (labeled.get("aria-label") or "") \
                if labeled is not None else ""
        link_el = select_first(el, 'a[href^="http"]')
        url = ((link_el.get("href") or "") if link_el is not None else "") \
            or (el.get("data-surl") or "")
        if not title or not url or url in seen_video_urls:
            continue
        seen_video_urls.add(url)
        item = {"title": title, "url": url}
        platform = None
        if "youtube.com" in url or "youtu.be" in url:
            platform = "YouTube"
        elif "vimeo.com" in url:
            platform = "Vimeo"
        elif "dailymotion.com" in url:
            platform = "Dailymotion"
        elif "tiktok.com" in url:
            platform = "TikTok"
        duration = _first_text(el, ".J1mWY, .FGpTBd, .vjB1Cc")
        date = _first_text(el, ".LEwnzc, .f")
        thumb_el = select_first(el, "img")
        if platform:
            item["platform"] = platform
        if duration:
            item["duration"] = duration
        if date:
            item["date"] = date
        if thumb_el is not None and thumb_el.get("src"):
            item["thumbnail_url"] = thumb_el.get("src")
        videos.append(item)
    if videos:
        result["video_results"] = videos

    # ── 10. local pack ──────────────────────────────────────────────
    local_pack = []
    seen_local_names = set()
    for el in select(root, ".VkpGBb, [data-local-attribute], "
                           ".rllt__details"):
        name = (_first_text(el, ".OSrXXb, .dbg0pd")
                or _first_text(el, '[role="heading"]'))
        if not name or name in seen_local_names:
            continue
        seen_local_names.add(name)
        rating = _parse_float(_first_text(el, ".MW4etd, .yi40Hd"))
        count = _parse_count(_first_text(el, ".UY7F9, .RDApEe"))
        item: Dict[str, Any] = {
            "name": name,
            "address": _first_text(el, ".lMbq3e, .sXtWJb") or None,
            "type": _first_text(el, ".YhemCb, .Q2vNVc") or None,
            "phone": _first_text(el, '.fhNHSe, [data-dtype="d3ph"]') or None,
        }
        # `parseFloat(...) || undefined`: falsy ZERO drops the key too
        # (google-serp-parser.ts:385-386)
        if rating:
            item["rating"] = rating
        if count:
            item["review_count"] = count
        local_pack.append(item)
    if local_pack:
        result["local_pack"] = local_pack

    # ── 11. stats ───────────────────────────────────────────────────
    stats = _first_text(root, "#result-stats")
    if stats:
        total = _TOTAL_RE.search(stats)
        took = _TIME_RE.search(stats)
        if total:
            result["total_results"] = total.group(1)
        if took:
            result["search_time"] = took.group(1)

    return result
