"""Reference-suite port: src/tests/quick-answer.test.ts (the
deterministic core: basic QA, confidence, edge cases, sentence
splitting, question-type boosting, passage structure, infobox direct
extraction, confidence honesty, citation-noise filtering, how/yes-no
questions) against pure/quick_answer.quick_answer."""

from webpeel_spark.pure.quick_answer import quick_answer

PRICING_CONTENT = """WebPeel offers three plans.
The Free plan includes 500 requests per week at no cost.
The Pro plan costs $29 per month and includes 10,000 API calls, priority support, and advanced analytics.
The Enterprise plan offers unlimited requests with custom pricing.
All plans include a 14-day free trial.
Contact sales@webpeel.dev for enterprise inquiries."""


def _combined(result):
    return (result["answer"] + " "
            + " ".join(p["text"] for p in result["passages"]))


# ── basic pricing questions ──────────────────────────────────────────────

def test_result_shape():
    r = quick_answer("What is the pricing?", PRICING_CONTENT)
    assert r["question"] == "What is the pricing?"
    assert r["method"] == "bm25"
    assert isinstance(r["answer"], str)
    assert isinstance(r["confidence"], float)
    assert isinstance(r["passages"], list)
    assert isinstance(r["source"], str)


def test_pricing_question_mentions_plan():
    c = _combined(quick_answer("What is the pricing?", PRICING_CONTENT)).lower()
    assert any(s in c for s in ("29", "pro", "plan", "pric"))


def test_free_requests_returns_500():
    assert "500" in _combined(
        quick_answer("How many free requests?", PRICING_CONTENT))


def test_enterprise_question():
    c = _combined(quick_answer("What is the enterprise plan?",
                               PRICING_CONTENT)).lower()
    assert "enterprise" in c


def test_contact_email_question():
    c = _combined(quick_answer("What is the contact email?",
                               PRICING_CONTENT)).lower()
    assert ("sales@webpeel.dev" in c or "contact" in c or "email" in c)


# ── confidence ───────────────────────────────────────────────────────────

def test_confidence_in_unit_interval():
    r = quick_answer("What is the pricing?", PRICING_CONTENT)
    assert 0 <= r["confidence"] <= 1


def test_unanswerable_low_confidence():
    r = quick_answer("What is the weather like in Antarctica during summer?",
                     PRICING_CONTENT)
    assert r["confidence"] < 0.5


def test_relevant_beats_unrelated_confidence():
    rel = quick_answer("How much does the Pro plan cost?", PRICING_CONTENT)
    unrel = quick_answer("What is the capital of France?", PRICING_CONTENT)
    assert rel["confidence"] >= unrel["confidence"]


# ── edge cases ───────────────────────────────────────────────────────────

def test_empty_content():
    r = quick_answer("What is the pricing?", "")
    assert r["answer"] == "" and r["confidence"] == 0 and r["passages"] == []


def test_whitespace_only_content():
    r = quick_answer("What is the pricing?", "   \n\n\t  ")
    assert r["answer"] == "" and r["confidence"] == 0


def test_empty_question():
    r = quick_answer("", PRICING_CONTENT)
    assert r["answer"] == "" and r["confidence"] == 0


def test_single_relevant_sentence():
    r = quick_answer("What is the Pro plan price?",
                     "The Pro plan costs $29 per month.")
    assert r["answer"] and "29" in r["answer"]


def test_source_url_preserved():
    r = quick_answer("What is the pricing?", PRICING_CONTENT,
                     url="https://example.com/pricing")
    assert r["source"] == "https://example.com/pricing"


def test_source_empty_by_default():
    assert quick_answer("What is the pricing?", PRICING_CONTENT)["source"] == ""


def test_method_always_bm25():
    assert quick_answer("test", "test content here")["method"] == "bm25"


def test_max_passages_respected():
    r = quick_answer("What are the plans?", PRICING_CONTENT, max_passages=1)
    assert len(r["passages"]) <= 1


def test_max_chars_limits_answer():
    long_content = " ".join(
        ["The pricing plan costs $29 per month."] * 100)
    r = quick_answer("What is the price?", long_content, max_chars=50)
    assert len(r["answer"]) <= 55  # slight buffer for ellipsis


# ── sentence splitting ───────────────────────────────────────────────────

def test_no_split_on_urls():
    content = ("Visit https://example.com/pricing for more info. "
               "The Pro plan costs $29 per month.")
    assert "29" in _combined(quick_answer("What is the price?", content))


def test_no_split_on_abbreviations():
    content = ("Dr. Smith founded the company. The Pro plan costs $29 per "
               "month. Contact us for details.")
    assert "29" in _combined(quick_answer("How much does Pro cost?", content))


def test_no_split_on_decimals():
    content = ("The average is 3.14 units. The Pro plan costs $29.99 per "
               "month. Free tier available.")
    c = _combined(quick_answer("What is the Pro plan cost?", content))
    assert "29.99" in c or "Pro" in c


def test_no_terminal_punctuation():
    content = ("The Pro plan costs $29 per month\nThe Enterprise plan is "
               "custom\nFree tier available")
    r = quick_answer("What is the Pro price?", content)
    assert isinstance(r["answer"], str)


def test_filters_short_junk_sentences():
    content = ("A. B. The Pro plan costs $29 per month. C. D. "
               "The Free plan is included.")
    r = quick_answer("What is the Pro price?", content)
    assert all(len(p["text"]) >= 10 for p in r["passages"])


# ── question-type boosting ───────────────────────────────────────────────

def test_how_many_boosts_numbers():
    content = ("We have a large team.\nThe company was founded in 2010.\n"
               "We process 5 million requests per day.\n"
               "Our offices are worldwide.")
    c = _combined(quick_answer("How many requests do you process?", content))
    assert "million" in c or "5" in c


def test_when_boosts_dates():
    content = ("The company went public recently.\n"
               "WebPeel was launched in January 2023.\n"
               "We have a great team.\nOur users love the product.")
    c = _combined(quick_answer("When was WebPeel launched?", content)).lower()
    assert "2023" in c or "january" in c or "launched" in c


def test_what_is_boosts_definitions():
    content = ("BM25 is a ranking function used in information retrieval.\n"
               "It was developed in the 1970s.\n"
               "Many search engines use it today.")
    c = _combined(quick_answer("What is BM25?", content)).lower()
    assert "ranking" in c or "information retrieval" in c


def test_why_boosts_causal():
    content = ("The service went down last week.\n"
               "The outage occurred because of a database migration "
               "failure.\nIt was restored within 2 hours.\n"
               "We are improving our monitoring.")
    c = _combined(quick_answer("Why did the service go down?", content)).lower()
    assert "because" in c or "database" in c or "migration" in c


# ── passages structure ───────────────────────────────────────────────────

def test_passage_fields():
    r = quick_answer("What is the pricing?", PRICING_CONTENT)
    for p in r["passages"]:
        assert isinstance(p["text"], str)
        assert isinstance(p["score"], float)
        assert isinstance(p["context"], str)
        assert p["score"] >= 0


def test_passages_ordered_by_score():
    r = quick_answer("What is the pricing?", PRICING_CONTENT, max_passages=3)
    scores = [p["score"] for p in r["passages"]]
    assert scores == sorted(scores, reverse=True)


def test_context_includes_surroundings():
    r = quick_answer("How much does Pro cost?", PRICING_CONTENT,
                     max_passages=2)
    for p in r["passages"]:
        assert len(p["context"]) >= len(p["text"])


def test_default_max_passages_3():
    content = " ".join(
        f"Sentence number {i + 1} about pricing plans." for i in range(20))
    r = quick_answer("What are the pricing plans?", content)
    assert len(r["passages"]) <= 3


# ── infobox direct extraction ────────────────────────────────────────────

WIKIPEDIA_TYPESCRIPT_INFOBOX = (
    "-   **TypeScript:** Paradigm · Multi-paradigm: functional, generic, "
    "imperative\n"
    "-   **TypeScript:** Designed by · Microsoft,Anders Hejlsberg,"
    "Luke Hoban\n"
    "-   **TypeScript:** Developer · Microsoft\n"
    "-   **TypeScript:** First appeared · 1 October 2012; 13 years "
    "ago\n"
    "**TypeScript** is a high-level programming language that adds static "
    "typing to JavaScript.\n"
    "It is developed by Microsoft as free and open-source software.")

WIKIPEDIA_NODEJS_INFOBOX = (
    "-   **Node.js:** Original author · Ryan Dahl\n"
    "-   **Node.js:** Developers · OpenJS Foundation\n"
    "-   **Node.js:** Initial release · May 27, 2009; 16 years ago "
    "(2009-05-27)\n"
    "-   **Node.js:** Stable release · 22.0.0\n"
    "Node.js is a cross-platform, open-source JavaScript runtime "
    "environment.")


def test_infobox_creation_date():
    r = quick_answer("When was Node.js created?", WIKIPEDIA_NODEJS_INFOBOX)
    assert r["confidence"] >= 0.85
    assert "2009" in r["answer"]


def test_infobox_direct_confidence():
    r = quick_answer("Who created TypeScript?", WIKIPEDIA_TYPESCRIPT_INFOBOX)
    assert r["confidence"] >= 0.88


def test_what_company_as_who():
    content = ("-   **React:** Original author · Jordan Walke\n"
               "-   **React:** Developers · Meta and community\n"
               "-   **React:** Type · JavaScript library\n"
               "React is a free and open-source front-end JavaScript "
               "library.")
    r = quick_answer("What company developed React?", content)
    combined = (r["answer"] + " "
                + " ".join(p["context"] for p in r["passages"])).lower()
    assert any(s in combined for s in ("walke", "meta", "developers",
                                       "author"))


# ── confidence honesty ───────────────────────────────────────────────────

def test_bm25_confidence_below_one():
    content = ("The Pro plan costs $29 per month. Enterprise is custom "
               "pricing.\nFree tier includes 500 requests per week. "
               "Contact us at sales@example.com.")
    r = quick_answer("What is the enterprise price?", content)
    assert 0 < r["confidence"] < 1.0


def test_infobox_confidence_092():
    r = quick_answer("Who created TypeScript?", WIKIPEDIA_TYPESCRIPT_INFOBOX)
    assert r["confidence"] == 0.92


def test_definition_pattern_confidence():
    content = ("TypeScript is a programming language.\n"
               "TypeScript was designed by Anders Hejlsberg at Microsoft "
               "in 2012.\nIt adds static typing to JavaScript.")
    r = quick_answer("Who designed TypeScript?", content)
    assert r["confidence"] >= 0.85
    assert ("hejlsberg" in r["answer"].lower()
            or "microsoft" in r["answer"].lower())


# ── citation-noise filtering ─────────────────────────────────────────────

def test_no_citation_metadata_as_answer():
    content = """
# Large Language Models
Large language models have several known limitations including hallucination, bias, and high computational costs.
## Limitations
The main limitations of LLMs include:
- Hallucination: generating plausible but incorrect information
- Bias: reflecting biases present in training data
- Cost: requiring significant computational resources
- Context window: limited input length
## References
[1] Smith, J. (2024). "Understanding LLMs". arXiv:2401.12345
[2] CS1_maint: multiple_names: authors_list Category:Articles with short description
[309] Retrieved 2024-01-15. Archived from the original on 2024-01-10.
    """
    r = quick_answer("What are the main limitations of LLMs?", content)
    assert "CS1_maint" not in r["answer"]
    assert "arXiv" not in r["answer"]
    assert "limitation" in r["answer"]
    assert r["confidence"] > 0.5


def test_reference_numbers_stripped():
    content = ("Python[1] is a programming language[2] created by Guido "
               "van Rossum[3] in 1991.[4]")
    r = quick_answer("Who created Python?", content)
    assert "Guido van Rossum" in r["answer"]
    assert "[1]" not in r["answer"]


def test_heavy_citation_noise():
    content = """
Artificial intelligence is intelligence demonstrated by machines.
John McCarthy coined the term "artificial intelligence" in 1956.
## References
^ a b c Congressional Research Service (2019). Artificial Intelligence and National Security (PDF).
^ Wong, Matteo (19 May 2023), "ChatGPT Is Already Obsolete", The Atlantic
^ Yudkowsky, E (2008), "Artificial Intelligence as a Positive and Negative Factor"
## External links
https://en.wikipedia.org/wiki/AI
https://ai.google/
    """
    r = quick_answer("Who coined the term artificial intelligence?", content)
    assert "John McCarthy" in r["answer"]
    assert r["confidence"] > 0.5


# ── how (process) questions ──────────────────────────────────────────────

def test_how_does_boosts_explanations():
    content = ("BM25 was invented in 1994.\n"
               "BM25 works by scoring documents using term frequency and "
               "inverse document frequency.\n"
               "Many search engines use BM25.\n"
               "The algorithm is fast and efficient.")
    c = _combined(quick_answer("How does BM25 work?", content)).lower()
    assert any(s in c for s in ("scoring", "term frequency", "works by"))


def test_how_to_boosts_instructions():
    content = ("Node.js is a JavaScript runtime.\n"
               "To install Node.js, download the installer from nodejs.org "
               "and run it.\nNode.js was created by Ryan Dahl.\n"
               "It supports many platforms.")
    c = _combined(quick_answer("How to install Node.js?", content)).lower()
    assert "install" in c or "download" in c


def test_how_does_not_how_many():
    content = ("There are 500 servers running.\n"
               "The system works by distributing requests across multiple "
               "nodes using consistent hashing.\n"
               "We process 1 million requests per day.\n"
               "The architecture was designed in 2020.")
    c = _combined(quick_answer("How does the system work?", content)).lower()
    assert any(s in c for s in ("works by", "distributing", "hashing"))


# ── yes/no questions ─────────────────────────────────────────────────────

def test_does_question_finds_capability():
    content = ("Python is a programming language created by Guido van "
               "Rossum.\nPython supports multithreading through the "
               "threading module, but the GIL limits true parallelism.\n"
               "Python was first released in 1991.\n"
               "It has a large ecosystem of packages.")
    c = _combined(quick_answer("Does Python support multithreading?",
                               content)).lower()
    assert "threading" in c


# ── robustness improvements ──────────────────────────────────────────────

def test_passage_scores_capped_at_one():
    content = " ".join(
        f"Sentence {i}: The pricing plan includes {i * 100} requests per "
        f"month at ${i * 10}." for i in range(20))
    r = quick_answer("What is the pricing?", content)
    assert all(p["score"] <= 1 for p in r["passages"])


def test_list_format_answers():
    content = """# Features
Key features of the product:
- Fast web scraping with intelligent caching
- Automatic JavaScript rendering for SPAs
- Built-in rate limiting and retry logic
- Clean markdown output with metadata
The product is available on npm."""
    c = _combined(quick_answer("What are the key features?", content)).lower()
    assert any(s in c for s in ("scraping", "rendering", "markdown",
                                "caching"))


def test_long_sentences_not_dropped():
    long_sentence = ("The BM25 algorithm "
                     + "computes relevance scores by analyzing term "
                       "frequency, inverse document frequency, and document "
                       "length normalization parameters, " * 4
                     + "which makes it highly effective for information "
                       "retrieval tasks.")
    assert len(long_sentence) > 500
    content = (f"Short intro sentence here. {long_sentence} "
               f"Another short sentence follows.")
    r = quick_answer("How does BM25 compute relevance?", content)
    assert len(r["answer"]) > 100


def test_ui_chrome_does_not_block_answer():
    content = ("Sign in to your account to continue.\n"
               "Skip to main content. Navigation menu.\n"
               "The Pro plan costs $29 per month with unlimited API access.")
    c = _combined(quick_answer("What is the pricing?", content)).lower()
    assert "29" in c or "pro" in c or "plan" in c


# ── stemming improves recall ─────────────────────────────────────────────

def test_limitations_matches_limited():
    content = ("The system has several constraints.\n"
               "The processing capacity is limited to 1000 requests per "
               "second.\nIt supports multiple languages.\n"
               "The API is well-documented.")
    c = _combined(quick_answer("What are the limitations?", content)).lower()
    assert any(s in c for s in ("limited", "constraints", "capacity"))


def test_running_matches_runs():
    content = ("The project was started in 2020.\n"
               "Sarah Chen runs the engineering team and oversees all "
               "development.\nThe codebase uses TypeScript.\n"
               "Deployments happen weekly.")
    c = _combined(quick_answer("Who is running the project?",
                               content)).lower()
    assert any(s in c for s in ("sarah", "chen", "runs", "engineering"))


def test_configure_matches_configured():
    content = ("The API requires authentication.\n"
               "Authentication can be configured by setting the API_KEY "
               "environment variable.\nWe use JWT tokens for session "
               "management.\nRate limiting is enabled by default.")
    c = _combined(quick_answer("How to configure authentication?",
                               content)).lower()
    assert any(s in c for s in ("configured", "api_key", "authentication"))


# ── synonym expansion ────────────────────────────────────────────────────

def test_cost_matches_pricing():
    content = ("WebPeel offers three pricing tiers.\n"
               "The basic tier is free for up to 500 requests per week.\n"
               "Advanced features require a subscription.\n"
               "Enterprise clients get custom terms.")
    c = _combined(quick_answer("What does it cost?", content)).lower()
    assert any(s in c for s in ("pricing", "subscription", "free", "tier"))


def test_set_up_matches_installing():
    content = ("The project requires Node.js 18+.\n"
               "Install the package by running npm install webpeel in your "
               "terminal.\nThe documentation is available online.\n"
               "TypeScript definitions are included.")
    c = _combined(quick_answer("How to set up the project?", content)).lower()
    assert any(s in c for s in ("install", "npm", "package"))


def test_advantages_matches_benefits():
    content = ("WebPeel has several benefits over traditional scrapers.\n"
               "The main benefit is automatic JavaScript rendering.\n"
               "It also provides clean markdown output.\n"
               "Error handling is built in.")
    c = _combined(quick_answer("What are the advantages?", content)).lower()
    assert "benefit" in c


# ── multi-sentence answers ───────────────────────────────────────────────

def test_answer_spanning_two_sentences():
    content = ("The company has many products.\n"
               "The API was launched in January 2024. It initially "
               "supported only basic fetching but quickly expanded to "
               "include rendering and search.\n"
               "Customer satisfaction is high.\nThe team works remotely.")
    r = quick_answer("When was the API launched and what did it support?",
                     content)
    combined = (r["answer"] + " "
                + " ".join(p["context"] for p in r["passages"])).lower()
    assert "january 2024" in combined
    assert any(s in combined for s in ("fetching", "rendering", "search"))


# ── answer extraction ────────────────────────────────────────────────────

def test_who_extracts_person_name():
    content = ("Python is a high-level programming language.\n"
               "Python was created by Guido van Rossum and first released "
               "in 1991.\nIt emphasizes code readability.\n"
               "Python supports multiple programming paradigms.")
    r = quick_answer("Who created Python?", content)
    assert "Guido van Rossum" in r["answer"]


def test_when_extracts_date():
    content = ("JavaScript is used for web development.\n"
               "JavaScript was created in 1995 by Brendan Eich at "
               "Netscape.\nIt has become one of the most popular "
               "programming languages.\nModern JavaScript includes many "
               "new features.")
    r = quick_answer("When was JavaScript created?", content)
    assert "1995" in r["answer"]


# ── real-world Wikipedia content ─────────────────────────────────────────

PYTHON_WIKI = """Python is a high-level, general-purpose programming language. Its design philosophy emphasizes code readability with the use of significant indentation. Python is dynamically typed and garbage-collected. It supports multiple programming paradigms, including structured, object-oriented and functional programming.
Guido van Rossum began working on Python in the late 1980s as a successor to the ABC programming language and first released it in 1991 as Python 0.9.0. Python 2.0 was released in 2000. Python 3.0, released in 2008, was a major revision not completely backward-compatible with earlier versions. Python consistently ranks as one of the most popular programming languages.
Python was conceived in the late 1980s by Guido van Rossum at Centrum Wiskunde & Informatica (CWI) in the Netherlands as a successor to the ABC programming language, which was inspired by SETL, capable of exception handling and interfacing with the Amoeba operating system. Its implementation began in December 1989. Van Rossum shouldered sole responsibility for the project, as the lead developer, until 12 July 2018, when he announced his permanent vacation from his responsibilities as Python's chief architect.
Python's large standard library provides tools suited to many tasks and is commonly cited as one of its greatest strengths. For Internet-facing applications, many standard formats and protocols such as MIME and HTTP are supported. It includes modules for creating graphical user interfaces, connecting to relational databases, generating pseudorandom numbers, arithmetic with arbitrary-precision decimals, manipulating regular expressions, and unit testing.
The main limitations of Python include its relatively slow execution speed compared to compiled languages like C++ or Java, the Global Interpreter Lock (GIL) which limits true multi-threading, high memory consumption for certain operations, and challenges in mobile and browser-based development."""


def _combined_full(r):
    return (r["answer"] + " "
            + " ".join(p["text"] for p in r["passages"]) + " "
            + " ".join(p["context"] for p in r["passages"])).lower()


def test_wiki_who_created_python():
    r = quick_answer("Who created Python?", PYTHON_WIKI)
    assert "guido van rossum" in _combined_full(r)


def test_wiki_when_first_released():
    c = _combined(quick_answer("When was Python first released?",
                               PYTHON_WIKI))
    assert "1991" in c


def test_wiki_where_created():
    c = _combined_full(quick_answer("Where was Python created?",
                                    PYTHON_WIKI))
    assert any(s in c for s in ("netherlands", "cwi", "centrum"))


def test_wiki_why_created():
    c = _combined_full(quick_answer("Why was Python created?", PYTHON_WIKI))
    assert "successor" in c or "abc" in c


def test_wiki_limitations():
    c = _combined(quick_answer("What are the limitations of Python?",
                               PYTHON_WIKI)).lower()
    assert any(s in c for s in ("slow", "gil", "memory", "limit"))


def test_wiki_functional_programming():
    c = _combined(quick_answer("Does Python support functional programming?",
                               PYTHON_WIKI)).lower()
    assert "functional" in c


def test_wiki_built_via_synonym():
    c = _combined_full(quick_answer("Who built Python?", PYTHON_WIKI))
    assert "guido" in c or "van rossum" in c


def test_wiki_memory_handling():
    c = _combined(quick_answer("How does Python handle memory?",
                               PYTHON_WIKI)).lower()
    assert "garbage-collected" in c or "memory" in c
