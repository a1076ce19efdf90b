"""Deterministic synthetic Common-Crawl-style pages corpus.

Generates the north-rule input table (BASELINE.json input_hint):
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
— seeded, no external data.  Template classes follow FIXTURES.md §1 and
exercise the reference's behaviour-defining paths: noise classes
(readability.ts:70-134, markdown.ts:10-55), candidate-scoring fallback,
link-density pages, tables (layout/complex/wikitable), JSON-LD payloads
(json-ld.ts:84-630), domain pages (amazon/medium/wikipedia), chrome-heavy
>20KB pruner pages, edge cases, and PDF payloads (magic ``%PDF-``).

Host distribution is Zipf-skewed so a handful of hosts dominate —
exactly the skew the salting/AQE machinery must handle at 100 TB.
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta, timezone
from typing import Dict, List, Tuple

from ..pure.pdfextract import make_pdf

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_WORDS = (
    "data spark engine content page article extract pipeline partition shuffle "
    "cluster executor batch arrow vector column parquet iceberg table scan "
    "filter join group window stream state checkpoint lineage metric quality "
    "token markdown heading paragraph sentence corpus document fingerprint "
    "dedup shingle minhash cosine embed neighbor index bucket salt skew host"
).split()

GENERIC_HOSTS = [
    "blog.example.com", "news.example.org", "docs.example.net",
    "tech.sample.io", "journal.testsite.com", "updates.demo.dev",
    "research.paperhub.org", "wiki.openpages.net", "forum.chatter.io",
    "press.mediaco.com",
]

DOMAIN_HOSTS = ["www.amazon.com", "medium.com", "en.wikipedia.org"]

# host weights: Zipf-ish — first hosts dominate (skew driver).
# Hoisted: _host_for runs once per generated row, and rebuilding the
# list + 13 weights per call is pure waste at 768k-row soak sizes.
_HOSTS = DOMAIN_HOSTS + GENERIC_HOSTS
# P(host_i) ∝ 1/(i+1): heavy head
_HOST_WEIGHTS = [1.0 / (i + 1) for i in range(len(_HOSTS))]


def _host_for(rng: random.Random) -> str:
    return rng.choices(_HOSTS, weights=_HOST_WEIGHTS, k=1)[0]


def _sentence(rng: random.Random, n: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random, sentences: int = 4) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 16)) for _ in range(sentences))


def _nav(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/section-{i}">Section {i}</a> ' for i in range(rng.randint(4, 8))
    )
    return f'<nav class="main-nav">{links}</nav>'


def _noise_blocks(rng: random.Random) -> str:
    return (
        '<div class="cookie-banner">We use cookies to improve your experience.</div>'
        '<div class="share-buttons"><button>Share</button><button>Tweet</button></div>'
        '<div class="newsletter-signup">Sign up for our newsletter!</div>'
        '<footer><a href="/about">About</a> <a href="/privacy">Privacy</a></footer>'
    )


def _article_page(rng: random.Random, url: str, lang: str = "en") -> str:
    title = _sentence(rng, 5)[:-1]
    author = rng.choice(["Jane Doe", "John Smith", "Ana García", "Wei Chen"])
    day = rng.randint(1, 28)
    paragraphs = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(3, 7)))
    return f"""<!DOCTYPE html><html lang="{lang}"><head><title>{title}</title>
<meta property="og:title" content="{title}">
<meta property="og:description" content="{_sentence(rng, 10)}">
<meta name="author" content="{author}">
<meta property="article:published_time" content="2024-02-{day:02d}T08:30:00Z">
<meta property="og:site_name" content="Example Site">
</head><body>
{_nav(rng)}
<article><h1>{title}</h1><div class="byline">By {author}</div>
{paragraphs}
<h2>{_sentence(rng, 4)[:-1]}</h2>
{"".join(f"<p>{_paragraph(rng)}</p>" for _ in range(2))}
</article>
{_noise_blocks(rng)}
</body></html>"""


def _no_article_page(rng: random.Random, url: str) -> str:
    title = _sentence(rng, 4)[:-1]
    paragraphs = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(4, 8)))
    sidebar_links = "".join(f'<li><a href="/l{i}">Link {i}</a></li>' for i in range(10))
    return f"""<html lang="en"><head><title>{title}</title></head><body>
{_nav(rng)}
<div class="wrapper"><div class="main-content"><h1>{title}</h1>{paragraphs}</div>
<div class="sidebar"><ul>{sidebar_links}</ul></div></div>
<footer>© Example</footer></body></html>"""


def _link_density_page(rng: random.Random, url: str) -> str:
    title = _sentence(rng, 4)[:-1]
    nav_links = "".join(f'<a href="/n{i}">Nav item number {i}</a>' for i in range(30))
    paragraphs = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(4))
    return f"""<html lang="en"><head><title>{title}</title></head><body>
<nav>{nav_links}</nav>
<article><h1>{title}</h1>{paragraphs}</article>
</body></html>"""


def _images_code_page(rng: random.Random, url: str) -> str:
    title = _sentence(rng, 4)[:-1]
    return f"""<html lang="en"><head><title>{title}</title></head><body>
<article><h1>{title}</h1>
<p>{_paragraph(rng)}</p>
<img src="/img/with-alt.png" alt="A descriptive caption">
<img src="/img/no-alt.png">
<pre><code class="language-python">def extract(page):
    return clean(page)</code></pre>
<p>{_paragraph(rng)}</p>
</article></body></html>"""


def _tables_page(rng: random.Random, url: str) -> str:
    title = "Comparison " + _sentence(rng, 3)[:-1]
    simple_rows = "".join(
        f"<tr><td>row {i}</td><td>{rng.randint(1, 99)}</td><td>{rng.choice(_WORDS)}</td></tr>"
        for i in range(4)
    )
    complex_rows = "".join(
        f'<tr><td colspan="2">span {i}</td><td>{rng.randint(1, 9)}</td></tr>' for i in range(5)
    )
    wiki_rows = "".join(
        f"<tr><td>entry {i}</td><td>{rng.randint(1900, 2024)}</td></tr>" for i in range(6)
    )
    return f"""<html lang="en"><head><title>{title}</title></head><body>
<article><h1>{title}</h1><p>{_paragraph(rng)}</p>
<table><thead><tr><th>Name</th><th>Count</th><th>Tag</th></tr></thead><tbody>{simple_rows}</tbody></table>
<p>{_paragraph(rng)}</p>
<table><tr><th>A</th><th>B</th><th>C</th></tr>{complex_rows}</table>
<table class="wikitable"><tr><th>Item</th><th>Year</th></tr>{wiki_rows}</table>
<table border="1"><tr><td><a href="/x">layout link</a></td></tr></table>
</article></body></html>"""


def _jsonld_page(rng: random.Random, url: str) -> str:
    kind = rng.choice(["Recipe", "Product", "FAQPage", "HowTo", "Event"])
    if kind == "Recipe":
        payload = {
            "@type": "Recipe", "name": f"Recipe {rng.choice(_WORDS)}",
            "description": _sentence(rng, 10),
            "recipeIngredient": [f"{rng.randint(1,4)} cup {rng.choice(_WORDS)}" for _ in range(4)],
            "recipeInstructions": [
                {"@type": "HowToStep", "text": _sentence(rng, 8)} for _ in range(3)
            ],
            "prepTime": "PT20M", "cookTime": "PT1H30M",
            "aggregateRating": {"ratingValue": 4.5, "ratingCount": rng.randint(5, 500)},
            "author": {"name": "Chef Example"},
        }
    elif kind == "Product":
        payload = {
            "@type": "Product", "name": f"Product {rng.choice(_WORDS)}",
            "description": _sentence(rng, 12),
            "brand": {"name": "ExampleBrand"}, "sku": f"SKU{rng.randint(1000,9999)}",
            "offers": {"price": f"{rng.randint(5,500)}.99", "priceCurrency": "USD",
                       "availability": "https://schema.org/InStock"},
            "aggregateRating": {"ratingValue": 4.2, "reviewCount": rng.randint(3, 900)},
        }
    elif kind == "FAQPage":
        payload = {
            "@type": "FAQPage",
            "mainEntity": [
                {"@type": "Question", "name": _sentence(rng, 6)[:-1] + "?",
                 "acceptedAnswer": {"@type": "Answer", "text": _paragraph(rng, 2)}}
                for _ in range(4)
            ],
        }
    elif kind == "HowTo":
        payload = {
            "@type": "HowTo", "name": f"How to {rng.choice(_WORDS)}",
            "description": _sentence(rng, 9), "totalTime": "PT45M",
            "step": [{"@type": "HowToStep", "text": _sentence(rng, 7)} for _ in range(5)],
        }
    else:
        payload = {
            "@type": "Event", "name": f"Event {rng.choice(_WORDS)}",
            "description": _sentence(rng, 9),
            "startDate": "2024-06-01T19:00:00Z",
            "location": {"name": "Example Hall"},
            "organizer": {"name": "Example Org"},
        }
    body_p = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(2))
    page_title = payload.get("name", "Frequently Asked Questions")
    return f"""<html lang="en"><head><title>{page_title}</title>
<script type="application/ld+json">{json.dumps(payload)}</script>
</head><body>{_nav(rng)}<main><h1>{page_title}</h1>{body_p}</main></body></html>"""


def _amazon_page(rng: random.Random, url: str) -> str:
    name = f"Gadget {rng.choice(_WORDS).capitalize()} {rng.randint(100,999)}"
    payload = {
        "@type": "Product", "name": name, "description": _sentence(rng, 14),
        "aggregateRating": {"ratingValue": round(rng.uniform(3.5, 5.0), 1),
                            "reviewCount": rng.randint(10, 5000)},
        "offers": {"price": f"{rng.randint(10, 300)}.99",
                   "availability": "https://schema.org/InStock"},
    }
    bullets = "".join(
        f'<li><span class="a-list-item">{_sentence(rng, 6)}</span></li>' for _ in range(4)
    )
    return f"""<html lang="en"><head><title>{name}</title>
<script type="application/ld+json">{json.dumps(payload)}</script>
</head><body><span id="productTitle">{name}</span>
<div class="a-price"><span class="a-offscreen">${payload['offers']['price']}</span></div>
<div id="feature-bullets"><ul>{bullets}</ul></div>
</body></html>"""


def _medium_page(rng: random.Random, url: str) -> str:
    title = _sentence(rng, 6)[:-1]
    payload = {
        "@type": "Article", "headline": title,
        "author": {"name": "Sam Writer"}, "datePublished": "2024-03-10T12:00:00Z",
        "description": _sentence(rng, 10),
    }
    paras = "".join(f"<p>{_paragraph(rng)}</p>" for _ in range(5))
    return f"""<html lang="en"><head><title>{title}</title>
<script type="application/ld+json">{json.dumps(payload)}</script>
</head><body><article><h1>{title}</h1>
<span data-testid="storyReadTime">4 min read</span>
{paras}<blockquote>{_sentence(rng, 9)}</blockquote></article></body></html>"""


def _wikipedia_page(rng: random.Random, url: str) -> str:
    title = f"Topic {rng.choice(_WORDS).capitalize()}"
    rows = "".join(
        f"<tr><td>entry {i}</td><td>{rng.randint(1800, 2024)}</td><td>{rng.choice(_WORDS)}</td></tr>"
        for i in range(8)
    )
    paras = "".join(f"<p>{_paragraph(rng)} [1][edit]</p>" for _ in range(4))
    return f"""<html lang="en"><head><title>{title} - Wikipedia</title></head><body>
<h1>{title}</h1><div class="mw-parser-output">{paras}
<table class="wikitable"><caption>Historical data</caption>
<tr><th>Item</th><th>Year</th><th>Tag</th></tr>{rows}</table></div></body></html>"""


def _chrome_heavy_page(rng: random.Random, url: str) -> str:
    title = _sentence(rng, 5)[:-1]
    chrome = "".join(
        f'<div class="related-posts"><a href="/r{i}">{_sentence(rng, 5)}</a></div>'
        f'<div class="ad-banner">{_sentence(rng, 12)}</div>'
        for i in range(20)
    )
    paras = "".join(f"<p>{_paragraph(rng, 6)}</p>" for _ in range(15))
    filler = "".join(
        f'<div class="widget sidebar"><ul>'
        + "".join(f'<li><a href="/w{j}">{_sentence(rng, 4)}</a></li>' for j in range(8))
        + "</ul></div>"
        for _ in range(10)
    )
    return f"""<html lang="en"><head><title>{title}</title></head><body>
{_nav(rng)}{chrome}
<article class="post-content"><h1>{title}</h1>{paras}</article>
{filler}{_noise_blocks(rng)}</body></html>"""


def _edge_page(rng: random.Random, url: str) -> Tuple[str, str]:
    kind = rng.choice(["empty", "hidden", "nometa", "concat-title", "authwall"])
    if kind == "empty":
        return "<html><head><title>Empty</title></head><body></body></html>", "html"
    if kind == "hidden":
        return (
            '<html><head><title>Hidden</title></head><body>'
            '<div style="display:none">invisible text here</div>'
            '<p aria-hidden="true">also hidden</p></body></html>', "html")
    if kind == "nometa":
        return f"<html><body><p>{_paragraph(rng)}</p></body></html>", "html"
    if kind == "concat-title":
        return (
            "<html><head><title>The Example Site JournalUnderstanding Shuffle Partitions"
            f"</title></head><body><article><h1>Understanding Shuffle Partitions</h1>"
            f"<p>{_paragraph(rng)}</p><p>{_paragraph(rng)}</p></article></body></html>", "html")
    return (
        '<html><head><title>Sign in required</title></head><body>'
        '<div class="login-wall"><h2>Sign in to continue</h2>'
        '<form><input type="password"></form></div></body></html>', "html")


def _rss_page(rng: random.Random, url: str) -> str:
    items = "".join(
        f"<item><title>{_sentence(rng, 5)[:-1]}</title>"
        f"<link>https://feed.example.com/item-{i}</link>"
        f"<description>{_sentence(rng, 12)}</description></item>"
        for i in range(5)
    )
    return (f'<?xml version="1.0"?><rss version="2.0"><channel>'
            f"<title>Example Feed</title>{items}</channel></rss>")


def _json_page(rng: random.Random, url: str) -> str:
    return json.dumps({
        "status": "ok",
        "results": [{"id": i, "name": rng.choice(_WORDS),
                     "link": f"https://api.example.com/r/{i}"} for i in range(5)],
    })


TEMPLATES = [
    ("article", 0.30), ("no-article", 0.10), ("link-density", 0.06),
    ("images-code", 0.06), ("tables", 0.08), ("jsonld", 0.10),
    ("amazon", 0.06), ("medium", 0.06), ("wikipedia", 0.06),
    ("chrome-heavy", 0.05), ("edge", 0.03), ("rss", 0.02),
    ("json", 0.01), ("pdf", 0.01),
]


def _listing_page(rng: random.Random, n_items: int) -> str:
    items = "".join(
        f'<li class="product-card">'
        f'<img src="/img/p{i}.jpg" alt="product {i}">'
        f'<h3 class="product-title"><a href="/item/{i}">'
        f'{_sentence(rng, 5)[:-1]}</a></h3>'
        f'<span class="price">${rng.randint(5, 500)}.{rng.randint(0, 99):02d}</span>'
        f'<span class="rating" aria-label="{rng.randint(30, 50) / 10} out of 5 stars"></span>'
        f'<p class="desc">{_sentence(rng, 10)}</p></li>'
        for i in range(n_items)
    )
    return (f'<html lang="en"><head><title>Shop results</title></head><body>'
            f'{_nav(rng)}<h1>Results</h1><ul class="results-grid">{items}</ul>'
            f"{_noise_blocks(rng)}</body></html>")


def _pricing_page(rng: random.Random, n_plans: int) -> str:
    tiers = ["Free", "Starter", "Pro", "Team", "Business", "Enterprise"]
    plans = "".join(
        f'<div class="pricing-card"><h2 class="plan-name">{tiers[i]}</h2>'
        f'<div class="price">${rng.choice([0, 9, 29, 49, 99, 299])}'
        f"<span>/mo</span></div><ul>"
        + "".join(f"<li>{_sentence(rng, 4)[:-1]}</li>" for _ in range(3))
        + f'</ul><a href="/signup/{tiers[i].lower()}" class="cta">'
          f'{rng.choice(["Get started", "Start free trial", "Subscribe"])}'
          f"</a></div>"
        for i in range(n_plans)
    )
    return (f'<html lang="en"><head><title>Pricing</title></head><body>'
            f"{_nav(rng)}<h1>Simple pricing</h1>{plans}"
            f"{_noise_blocks(rng)}</body></html>")


def _contact_page(rng: random.Random, j: int) -> str:
    return (f'<html lang="en"><head><title>Contact</title></head><body>'
            f"{_nav(rng)}<h1>Get in touch</h1>"
            f'<p>Email us at <a href="mailto:team{j}@example.com">'
            f"team{j}@example.com</a></p>"
            f"<p>Phone: +1-555-{rng.randint(100, 999)}-"
            f"{rng.randint(1000, 9999)}</p>"
            f"<address>{rng.randint(1, 999)} Main Street, Springfield, IL "
            f"{rng.randint(10000, 99999)}</address>"
            f'<a href="https://twitter.com/example{j}">Twitter</a>'
            f'<a href="https://github.com/example{j}">GitHub</a>'
            f"{_noise_blocks(rng)}</body></html>")


def _api_docs_page(rng: random.Random) -> str:
    resources = rng.sample(["users", "orders", "items", "events", "teams"],
                           3)
    sections = "".join(
        f"<h2>{verb.title()} {res}</h2>"
        f"<pre><code>{method} /v1/{res}{suffix}</code></pre>"
        f"<p>{_sentence(rng, 8)}</p>"
        for res in resources
        for verb, method, suffix in (("list", "GET", ""),
                                     ("create", "POST", ""),
                                     ("delete", "DELETE", "/{id}"))
    )
    return (f'<html lang="en"><head><title>API Reference</title></head>'
            f"<body><h1>REST API Reference</h1>"
            f"<p>Base URL: https://api.example.dev</p>{sections}"
            f"</body></html>")


def _spa_shell_page(rng: random.Random) -> str:
    scripts = "".join(f'<script src="/static/chunk-{k}.js"></script>'
                      for k in range(rng.randint(6, 10)))
    mount = rng.choice(['<div id="root"></div>', '<div id="app"></div>',
                        '<div id="__next"></div>'])
    return (f"<!DOCTYPE html><html><head><title>App</title>{scripts}</head>"
            f"<body>{mount}<noscript>You need to enable JavaScript to run "
            f"this app.</noscript></body></html>")


def generate_rows(n: int, seed: int = 42,
                  docx_fraction: float = 0.0,
                  listing_fraction: float = 0.0,
                  auto_fraction: float = 0.0) -> List[Dict]:
    """Generate n deterministic corpus rows (list of dicts, input_hint shape).

    ``docx_fraction`` > 0 APPENDS int(n*fraction) .docx payload rows
    with an independent rng — appended, not interleaved, so the first
    n rows stay byte-identical to docx_fraction=0 (the golden fixtures
    pin them).
    """
    rng = random.Random(seed)
    names = [t for t, _ in TEMPLATES]
    weights = [w for _, w in TEMPLATES]
    rows: List[Dict] = []
    for i in range(n):
        template = rng.choices(names, weights=weights, k=1)[0]
        lang = "en"
        if template == "amazon":
            host = "www.amazon.com"
            url = f"https://{host}/dp/B{rng.randint(10**8, 10**9 - 1)}X"
            html = _amazon_page(rng, url)
        elif template == "medium":
            host = "medium.com"
            url = f"https://{host}/@writer/post-{i}"
            html = _medium_page(rng, url)
        elif template == "wikipedia":
            host = "en.wikipedia.org"
            url = f"https://{host}/wiki/Topic_{i}"
            html = _wikipedia_page(rng, url)
        else:
            host = _host_for(rng)
            if host in DOMAIN_HOSTS:
                host = rng.choice(GENERIC_HOSTS)
            ext = {"rss": ".xml", "json": ".json", "pdf": ".pdf"}.get(template, "")
            url = f"https://{host}/{template}/page-{i}{ext}"
            if template == "article":
                lang = rng.choices(["en", "es", "de", "fr"], weights=[7, 1, 1, 1], k=1)[0]
                html = _article_page(rng, url, lang)
            elif template == "no-article":
                html = _no_article_page(rng, url)
            elif template == "link-density":
                html = _link_density_page(rng, url)
            elif template == "images-code":
                html = _images_code_page(rng, url)
            elif template == "tables":
                html = _tables_page(rng, url)
            elif template == "jsonld":
                html = _jsonld_page(rng, url)
            elif template == "chrome-heavy":
                html = _chrome_heavy_page(rng, url)
            elif template == "edge":
                html, _k = _edge_page(rng, url)
            elif template == "rss":
                html = _rss_page(rng, url)
            elif template == "json":
                html = _json_page(rng, url)
            else:  # pdf
                html = None

        if template == "pdf":
            pages = [[_sentence(rng, 8) for _ in range(rng.randint(3, 8))]
                     for _ in range(rng.randint(1, 3))]
            payload = make_pdf(pages, title=f"Report {i}", author="Fixture Writer")
            text = ""
        else:
            payload = html.encode("utf-8")
            text = ""

        rows.append({
            "url": url,
            "warc_ts": _EPOCH + timedelta(seconds=i * 17),
            "html": payload,
            "text": text,
            "lang": lang if template == "article" else "",
        })

    n_docx = int(n * docx_fraction)
    if n_docx:
        from ..pure.docx import make_docx

        drng = random.Random(seed + 7919)
        for j in range(n_docx):
            payload = make_docx(
                f"Quarterly Report {j}",
                [_paragraph(drng) for _ in range(drng.randint(2, 5))],
                bullets=[_sentence(drng, 6) for _ in range(3)],
                table_rows=[["Metric", "Value"]]
                + [[drng.choice(_WORDS), str(drng.randint(1, 999))]
                   for _ in range(3)],
            )
            rows.append({
                "url": f"https://files.example.net/docs/report-{j}.docx",
                "warc_ts": _EPOCH + timedelta(seconds=(n + j) * 17),
                "html": payload,
                "text": "",
                "lang": "",
            })

    n_listing = int(n * listing_fraction)
    if n_listing:
        lrng = random.Random(seed + 104729)
        for j in range(n_listing):
            html = _listing_page(lrng, lrng.randint(5, 12))
            rows.append({
                "url": f"https://shop.example.io/search?page={j}",
                "warc_ts": _EPOCH + timedelta(seconds=(n + n_docx + j) * 17),
                "html": html.encode("utf-8"),
                "text": "",
                "lang": "",
            })

    # auto_fraction > 0 APPENDS structured-page rows (pricing / contact /
    # api-docs / SPA shells) for the auto-extract operator — appended
    # after docx+listing with an independent rng, same append-only
    # contract as the other fractions (golden fixtures pin the first n)
    n_auto = int(n * auto_fraction)
    if n_auto:
        arng = random.Random(seed + 1299709)
        for j in range(n_auto):
            kind = ("pricing", "contact", "apidocs", "spa")[j % 4]
            if kind == "pricing":
                url = f"https://saas{j}.example.org/pricing"
                html = _pricing_page(arng, arng.randint(2, 4))
            elif kind == "contact":
                url = f"https://co{j}.example.org/contact"
                html = _contact_page(arng, j)
            elif kind == "apidocs":
                url = f"https://docs{j}.example.dev/api/reference"
                html = _api_docs_page(arng)
            else:
                url = f"https://app{j}.example.io/"
                html = _spa_shell_page(arng)
            rows.append({
                "url": url,
                "warc_ts": _EPOCH + timedelta(
                    seconds=(n + n_docx + n_listing + j) * 17),
                "html": html.encode("utf-8"),
                "text": "",
                "lang": "",
            })
    return rows


def write_corpus_parquet(path: str, n: int, seed: int = 42,
                         row_group_size: int = 256, files: int = 1,
                         docx_fraction: float = 0.0) -> None:
    """Write the corpus as a parquet file via pyarrow (driver-side).

    Small row groups (256 rows ≈ 2-5 MB of html blobs) matter: Spark's
    parquet scan parallelizes at row-group granularity, so one giant
    row group would serialize the scan stage no matter how many cores
    are available (exactly the Amdahl bottleneck a 100 TB Common-Crawl
    table avoids by having many files/row-groups).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = generate_rows(n, seed, docx_fraction=docx_fraction)

    def _table(chunk):
        return pa.table({
            "url": pa.array([r["url"] for r in chunk], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in chunk],
                                pa.timestamp("us", tz="UTC")),
            "html": pa.array([r["html"] for r in chunk], pa.binary()),
            "text": pa.array([r["text"] for r in chunk], pa.string()),
            "lang": pa.array([r["lang"] for r in chunk], pa.string()),
        })

    if files <= 1:
        pq.write_table(_table(rows), path, row_group_size=row_group_size)
        return
    # directory of part files — a real Common-Crawl-style table is many
    # files; a single file caps scan parallelism at its row-group count
    # (observed: a serial scan stage that breaks strong scaling)
    os.makedirs(path, exist_ok=True)
    # chunk by the ACTUAL row count: docx_fraction APPENDS rows beyond
    # n, and sizing chunks off n silently dropped most of them (the
    # round-6 review found bench caches carrying 0-0.3% docx instead
    # of the requested 2%)
    per = (len(rows) + files - 1) // files
    for i in range(files):
        chunk = rows[i * per:(i + 1) * per]
        if not chunk:
            break
        pq.write_table(_table(chunk),
                       os.path.join(path, f"part-{i:04d}.parquet"),
                       row_group_size=row_group_size)
