"""Reference-suite port: quick-answer.test.ts 'comprehensive benchmark'
block — 8 content domains (Wikipedia, pricing page, tech docs, news,
e-commerce, medical, historical, recipe) plus the irregular-verb
integration cases."""

import re

from webpeel_spark.pure.quick_answer import quick_answer

from tests.test_quick_answer_ref import PYTHON_WIKI as WIKI_PYTHON


def _all(r):
    return (r["answer"] + " "
            + " ".join(p["text"] + " " + p["context"]
                       for p in r["passages"]))


def _texts(r):
    return r["answer"] + " " + " ".join(p["text"] for p in r["passages"])


def _m(pattern, s):
    return re.search(pattern, s, re.I) is not None


# ── domain 1: Wikipedia (covered in depth in test_quick_answer_ref;
# the benchmark repeats them — keep the two wording variants) ────────────

def test_wiki_bench_who():
    assert _m(r"Guido van Rossum",
              _all(quick_answer("Who created Python?", WIKI_PYTHON)))


def test_wiki_bench_limitations():
    assert _m(r"slow|GIL|memory|limit",
              _texts(quick_answer("What are the limitations of Python?",
                                  WIKI_PYTHON)))


# ── domain 2: product/pricing page ───────────────────────────────────────

PRICING_PAGE = """Acme Cloud Platform provides infrastructure for modern applications.
Our Standard plan starts at $49 per month and includes 100GB storage, 5 team members, and basic analytics. The Professional plan costs $149 per month with 1TB storage, unlimited team members, advanced analytics, and priority support. Enterprise pricing is custom - contact our sales team.
The platform was founded in 2019 by Maria Chen and David Park in San Francisco. They previously worked at Google Cloud and wanted to create a simpler alternative for small businesses.
Key features include automatic scaling, built-in CI/CD pipelines, one-click deployments, and real-time monitoring. The platform supports Node.js, Python, Go, and Rust natively.
Compared to AWS, Acme is significantly easier to set up but has fewer services. The main trade-off is simplicity versus flexibility. Most customers report being production-ready within 30 minutes instead of days.
Security features include SOC 2 compliance, end-to-end encryption, automatic backups every 6 hours, and role-based access control. Two-factor authentication is required for all accounts."""


def test_pricing_professional_cost():
    assert _m(r"149", _texts(quick_answer(
        "How much does the Professional plan cost?", PRICING_PAGE)))


def test_pricing_founders():
    assert _m(r"Maria Chen|David Park",
              _texts(quick_answer("Who founded Acme?", PRICING_PAGE)))


def test_pricing_location_coreference():
    assert _m(r"San Francisco",
              _all(quick_answer("Where is Acme based?", PRICING_PAGE)))


def test_pricing_languages():
    assert _m(r"Node|Python|Go|Rust", _texts(quick_answer(
        "What languages does it support?", PRICING_PAGE)))


def test_pricing_vs_aws():
    assert _m(r"simpl|fewer|trade.off|flexib", _texts(quick_answer(
        "Is it more flexible than AWS?", PRICING_PAGE)))


def test_pricing_backups():
    assert _m(r"6 hours|every", _texts(quick_answer(
        "How often are backups made?", PRICING_PAGE)))


def test_pricing_benefits_synonym():
    assert _m(r"scal|simpl|deploy|monitor|easy|feature", _texts(quick_answer(
        "What are the benefits of Acme?", PRICING_PAGE)))


# ── domain 3: technical documentation ────────────────────────────────────

TECH_DOCS = """# Getting Started with WebPeel
WebPeel is a web scraping library for Node.js that converts any URL to clean markdown.
## Installation
Install the package using npm:
- Run npm install webpeel in your terminal
- Import the peel function from the package
- Call peel with a URL to fetch and convert the page
## Configuration
The library can be configured with several options. The timeout defaults to 30 seconds but can be adjusted. Set the budget parameter to limit output tokens. Enable the render option for JavaScript-heavy sites.
## How It Works
WebPeel works by first fetching the raw HTML using an HTTP client. It then parses the DOM and applies content pruning to remove navigation, ads, and other noise. Finally, it converts the cleaned HTML to markdown format. The entire process typically takes 200-500ms for simple pages and 1-2 seconds for JavaScript-rendered pages.
## Troubleshooting
If you encounter CORS errors, ensure you are running the library server-side, not in a browser. For timeout issues, increase the timeout value. If content appears empty, try enabling the render option to handle JavaScript-rendered pages."""


def test_docs_install():
    assert _m(r"npm install|install",
              _texts(quick_answer("How do I install WebPeel?", TECH_DOCS)))


def test_docs_how_it_works():
    assert _m(r"fetch|HTML|pars|markdown|prun",
              _texts(quick_answer("How does WebPeel work?", TECH_DOCS)))


def test_docs_default_timeout():
    assert _m(r"30 seconds",
              _texts(quick_answer("What is the default timeout?",
                                  TECH_DOCS)))


def test_docs_cors():
    assert _m(r"server.side|browser",
              _texts(quick_answer("How to fix CORS errors?", TECH_DOCS)))


# ── domain 4: news article ───────────────────────────────────────────────

NEWS_ARTICLE = """SpaceX Successfully Launches Starship on Historic Test Flight
SpaceX launched its Starship rocket from Boca Chica, Texas on March 14, 2025, marking the most successful test flight to date. The massive rocket reached orbital velocity for the first time before splashing down in the Indian Ocean.
CEO Elon Musk called it a milestone for the company and for humanity's goal of becoming a multi-planetary species. NASA Administrator Bill Nelson congratulated the SpaceX team and noted the implications for the Artemis program.
The launch had been delayed three times due to weather conditions and a valve issue discovered during pre-flight checks. Engineers worked through the night to resolve the problem before the early morning launch window.
The Starship system consists of two stages: the Super Heavy booster and the Starship upper stage. Together they stand 120 meters tall, making it the largest rocket ever built. The booster successfully returned to the launch pad using its innovative chopstick catch mechanism.
Future plans include a crewed orbital flight in late 2025 and a cargo mission to Mars in the 2026 launch window."""


def test_news_launch_date():
    assert _m(r"March 14|2025",
              _texts(quick_answer("When did Starship launch?",
                                  NEWS_ARTICLE)))


def test_news_launch_site():
    assert _m(r"Boca Chica|Texas",
              _all(quick_answer("Where did Starship launch from?",
                                NEWS_ARTICLE)))


def test_news_delay_reason():
    assert _m(r"weather|valve",
              _texts(quick_answer("Why was the launch delayed?",
                                  NEWS_ARTICLE)))


def test_news_height():
    assert _m(r"120 meters",
              _texts(quick_answer("How tall is Starship?", NEWS_ARTICLE)))


def test_news_future_plans():
    assert _m(r"crewed|Mars|2026|orbital",
              _texts(quick_answer("What are the future plans for Starship?",
                                  NEWS_ARTICLE)))


# ── domain 5: e-commerce product page ────────────────────────────────────

PRODUCT_PAGE = """Sony WH-1000XM5 Wireless Noise-Cancelling Headphones
The Sony WH-1000XM5 headphones feature industry-leading noise cancellation with two processors controlling 8 microphones. The headphones are designed by Sony's audio engineering team in Tokyo.
Price: $349.99. Available in black, silver, and midnight blue colors.
Battery life lasts up to 30 hours with noise cancellation enabled. A quick 3-minute charge provides 3 hours of playback. The headphones support Bluetooth 5.2 and LDAC codec for high-resolution audio.
Key improvements over the XM4 include a lighter weight at 250 grams, improved call quality with beamforming microphones, and a new folding mechanism. The sound quality is exceptional with 30mm drivers custom-designed for clarity.
The headphones work with the Sony Headphones Connect app for iOS and Android. Users can customize EQ settings, adjust noise cancellation levels, and enable Speak-to-Chat which automatically pauses music when you start talking."""


def test_product_price():
    assert _m(r"349\.99",
              _texts(quick_answer("How much do the Sony headphones cost?",
                                  PRODUCT_PAGE)))


def test_product_battery():
    assert _m(r"30 hours",
              _texts(quick_answer("How long does the battery last?",
                                  PRODUCT_PAGE)))


def test_product_colors():
    assert _m(r"black|silver|midnight blue", _texts(quick_answer(
        "What colors are the headphones available in?", PRODUCT_PAGE)))


def test_product_noise_cancellation():
    assert _m(r"noise cancel",
              _texts(quick_answer("Does it have noise cancellation?",
                                  PRODUCT_PAGE)))


def test_product_xm4_improvements():
    assert _m(r"lighter|weight|call quality|folding",
              _texts(quick_answer("What improved over the XM4?",
                                  PRODUCT_PAGE)))


# ── domain 6: medical/health ─────────────────────────────────────────────

HEALTH_ARTICLE = """Diabetes is a chronic metabolic condition characterized by elevated blood sugar levels. There are two main types: Type 1 diabetes, where the immune system attacks insulin-producing cells, and Type 2 diabetes, where the body becomes resistant to insulin.
Common symptoms include increased thirst, frequent urination, unexplained weight loss, fatigue, and blurred vision. Many people with Type 2 diabetes experience no symptoms initially and are diagnosed through routine blood tests.
Treatment varies by type. Type 1 diabetes requires daily insulin injections or an insulin pump. Type 2 diabetes is initially managed through lifestyle changes including diet modification and regular exercise. Medications such as metformin may be prescribed if lifestyle changes are insufficient. In some cases, insulin therapy becomes necessary.
The disease was first described by ancient Egyptian physicians around 1500 BCE. The term "diabetes" comes from the Greek word meaning "siphon," referring to the excessive urination. Frederick Banting and Charles Best discovered insulin in 1921 at the University of Toronto, revolutionizing treatment.
Complications of poorly managed diabetes include heart disease, kidney damage, nerve damage (neuropathy), eye damage (retinopathy), and increased risk of infections. Regular monitoring of blood sugar levels and HbA1c tests every 3-6 months are recommended."""


def test_health_symptoms():
    assert _m(r"thirst|urination|weight loss|fatigue|blurred",
              _all(quick_answer("What are the symptoms of diabetes?",
                                HEALTH_ARTICLE)))


def test_health_type2_treatment():
    assert _m(r"lifestyle|diet|exercise|metformin",
              _texts(quick_answer("How is Type 2 diabetes treated?",
                                  HEALTH_ARTICLE)))


def test_health_insulin_discovery():
    assert _m(r"Banting|Best",
              _all(quick_answer("Who discovered insulin?", HEALTH_ARTICLE)))


def test_health_complications():
    assert _m(r"heart|kidney|nerve|eye|neuropathy|retinopathy",
              _texts(quick_answer("What are the complications of diabetes?",
                                  HEALTH_ARTICLE)))


# ── domain 7: historical article ─────────────────────────────────────────

HISTORY_ARTICLE = """The Berlin Wall was a concrete barrier that divided Berlin from 1961 to 1989. It was constructed by the German Democratic Republic (East Germany) to prevent its citizens from fleeing to West Berlin and West Germany.
Construction began on August 13, 1961, when East German soldiers and workers laid barbed wire and began building the wall overnight. The decision was made by East German leader Walter Ulbricht with Soviet approval. Over the years, the wall was reinforced and expanded into a complex system with guard towers, anti-vehicle trenches, and a "death strip."
At least 140 people were killed trying to cross the wall, though some estimates place the number higher. Despite the danger, around 5,000 people successfully escaped over, under, or through the wall using tunnels, hot air balloons, and even a zipline.
The wall fell on November 9, 1989, after weeks of civil unrest and protests across East Germany. A government spokesman, Günter Schabowski, mistakenly announced that border restrictions were lifted "immediately," leading thousands of East Berliners to flood the checkpoints. Guards, overwhelmed and without orders to use force, opened the gates.
German reunification was formally completed on October 3, 1990. Today, fragments of the wall remain as memorials, and the East Side Gallery features over 100 murals painted on a remaining section."""


def test_history_built_when():
    assert _m(r"1961|August 13",
              _texts(quick_answer("When was the Berlin Wall built?",
                                  HISTORY_ARTICLE)))


def test_history_built_why():
    assert _m(r"prevent|fleeing|escap",
              _texts(quick_answer("Why was the Berlin Wall built?",
                                  HISTORY_ARTICLE)))


def test_history_deaths():
    assert _m(r"140|killed", _texts(quick_answer(
        "How many people died trying to cross the Berlin Wall?",
        HISTORY_ARTICLE)))


def test_history_fell_when():
    assert _m(r"November 9|1989",
              _texts(quick_answer("When did the Berlin Wall fall?",
                                  HISTORY_ARTICLE)))


def test_history_irregular_spoke():
    assert _m(r"Schabowski|Günter",
              _all(quick_answer("Who spoke about opening the border?",
                                HISTORY_ARTICLE)))


# ── domain 8: cooking recipe ─────────────────────────────────────────────

RECIPE_CONTENT = """Classic Chocolate Chip Cookies
These cookies are crispy on the outside and chewy in the center. The recipe makes about 48 cookies and takes approximately 45 minutes total.
Ingredients:
- 2 1/4 cups all-purpose flour
- 1 teaspoon baking soda
- 1 teaspoon salt
- 1 cup butter, softened
- 3/4 cup granulated sugar
- 3/4 cup packed brown sugar
- 2 large eggs
- 2 teaspoons vanilla extract
- 2 cups chocolate chips
Instructions: Preheat the oven to 375 degrees Fahrenheit. Mix flour, baking soda, and salt in a bowl. In a separate bowl, cream the butter and sugars until fluffy. Beat in eggs and vanilla. Gradually blend in the flour mixture. Stir in chocolate chips. Drop rounded tablespoons of dough onto ungreased baking sheets. Bake for 9 to 11 minutes or until golden brown. Cool on baking sheets for 2 minutes before transferring to wire racks.
Storage: Store cookies in an airtight container at room temperature for up to one week. The dough can be refrigerated for up to 3 days or frozen for up to 3 months."""


def test_recipe_bake_time():
    assert _m(r"9 to 11 minutes|375",
              _texts(quick_answer("How long do you bake the cookies?",
                                  RECIPE_CONTENT)))


def test_recipe_yield():
    assert _m(r"48", _texts(quick_answer(
        "How many cookies does this recipe make?", RECIPE_CONTENT)))


def test_recipe_storage():
    assert _m(r"airtight|room temperature|week",
              _texts(quick_answer("How should I store the cookies?",
                                  RECIPE_CONTENT)))


def test_recipe_temperature():
    assert _m(r"375", _texts(quick_answer(
        "What temperature should the oven be?", RECIPE_CONTENT)))


# ── irregular-verb integration ───────────────────────────────────────────

def test_irregular_wrote_matches_written():
    content = ("The WebPeel library provides fast web scraping.\n"
               "The core engine was written by Jake Liu in TypeScript.\n"
               "It supports multiple output formats.\n"
               "The documentation is comprehensive.")
    assert _m(r"Jake Liu", _all(quick_answer("Who wrote the code?", content)))


def test_irregular_spoke_matches_spoken():
    content = ("The annual tech conference was held in June.\n"
               "The keynote was spoken by Dr. Sarah Martinez about AI "
               "safety.\nOver 5000 attendees participated.\n"
               "The event featured 200 presentations.")
    assert _m(r"Sarah Martinez",
              _all(quick_answer("Who spoke at the conference?", content)))


def test_irregular_taught():
    content = ("Introduction to Machine Learning is a popular course.\n"
               "The class is taught by Professor Michael Chang at Stanford "
               "University.\nIt covers neural networks, decision trees, and "
               "reinforcement learning.\n"
               "Enrollment is open to graduate students.")
    assert _m(r"Michael Chang",
              _all(quick_answer("Who taught the class?", content)))
