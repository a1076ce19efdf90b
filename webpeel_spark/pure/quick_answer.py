"""Quick Answer — LLM-free question answering (port of quick-answer.ts).

BM25 over stemmed sentences + question-type boosts + sliding windows
(1-3 sentences) + synonym expansion + multi-signal confidence; direct
pattern extraction (infoboxes, "developed by X" definitions) bypasses
BM25 for structured content.  All regexes and constants follow the
reference; ASCII word semantics (JS ``\\w``) are forced with re.ASCII.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from .bm25_filter import ContentBlock, score_bm25
from .stemmer import stem
from .synonyms import expand_with_synonyms

STOPWORDS = frozenset((
    "what is the how do a an where when why which can does are was were be "
    "been being have has had will would could should may might shall must "
    "did i you he she it we they me him her us them my your his its our "
    "their this that these those of in on at by for with about into to from "
    "up out and or but if so as not no than then also"
).split())

_A = re.ASCII


def detect_question_type(question: str) -> str:
    q = question.lower().strip()
    if re.search(r"how\s+many|how\s+much|how\s+long|what\s+price|what\s+cost|pricing", q):
        return "how_many"
    if re.match(r"^(is|does|can|will|are|has|do|did|was|were|could|should|would)\b", q, re.I):
        return "yes_no"
    if re.search(r"when\b", q):
        return "when"
    if re.search(r"where\b", q):
        return "where"
    if re.search(r"why\b", q):
        return "why"
    if re.search(r"who\b", q):
        return "who"
    if re.search(r"what\s+(?:company|person|people|team|group|organization|organisation|developer|author|creator|founder)\b", q):
        return "who"
    if re.search(r"what\b", q):
        return "what"
    if re.search(r"how\s+(?:do|does|can|to|is|are|was|were|will|would|could|should)\b", q):
        return "how"
    if re.search(r"how\b", q):
        return "how"
    return "other"


def tokenize(text: str) -> List[str]:
    """Stemmed tokens (quick-answer.ts:85-96)."""
    t = re.sub(r"[^\w\s]", " ", text.lower(), flags=_A)
    return [stem(x) for x in re.split(r"\s+", t) if len(x) > 1]


def tokenize_raw(text: str) -> List[str]:
    t = re.sub(r"[^\w\s]", " ", text.lower(), flags=_A)
    return [x for x in re.split(r"\s+", t) if len(x) > 1]


def tokenize_question(question: str) -> List[str]:
    return [stem(t) for t in tokenize_raw(question) if t not in STOPWORDS]


_ABBREVS = re.compile(
    r"\b(Mr|Mrs|Ms|Dr|Prof|Sr|Jr|St|vs|etc|e\.g|i\.e|U\.S|U\.K|Jan|Feb|Mar|"
    r"Apr|Jun|Jul|Aug|Sep|Oct|Nov|Dec|No|Vol|pp)\.")
_SENT_END = re.compile(r"[.!?]+(?:\s+|\n+|$)")
_LIST_ITEM = re.compile(r"^[\s]*[-*+]\s+(.+)$", re.M)


def split_into_sentences(content: str) -> List[Dict]:
    """quick-answer.ts:122-213 — abbreviation/URL/number-safe splitting,
    plus markdown list items as pseudo-sentences."""
    sentences: List[Dict] = []
    placeholder_map: Dict[str, str] = {}
    idx_box = [0]

    def protect(pattern, prefix, text, flags=0):
        def repl(m):
            ph = f"\x00{prefix}{idx_box[0]}\x00"
            idx_box[0] += 1
            placeholder_map[ph] = m.group(0)
            return ph
        return re.sub(pattern, repl, text, flags=flags)

    protected = protect(r"https?://[^\s)>]+", "URL", content)
    protected = protect(_ABBREVS, "ABBR", protected)
    protected = protect(r"\b(\d+\.\d+(?:\.\d+)+)", "VER", protected)
    protected = protect(r"\b(\d+)\.(\d+)", "NUM", protected)

    def restore(s: str) -> str:
        for ph, orig in placeholder_map.items():
            if ph in s:
                s = s.replace(ph, orig)
        return s

    last_end = 0
    for m in _SENT_END.finditer(protected):
        end = m.end()
        sentence = protected[last_end:end].strip()
        last_end = end
        sentence = restore(sentence)
        if sentence:
            sentences.append({"text": sentence, "start": m.start()})
    if last_end < len(protected):
        remaining = restore(protected[last_end:].strip())
        if remaining:
            sentences.append({"text": remaining, "start": last_end})

    for lm in _LIST_ITEM.finditer(content):
        item = lm.group(1).strip()
        if 10 <= len(item) <= 800:
            dup = any(item in s["text"] or s["text"] in item for s in sentences)
            if not dup:
                sentences.append({"text": item, "start": lm.start()})

    return [s for s in sentences if 10 <= len(s["text"]) <= 800]


def compute_boost(sentence: str, question_type: str,
                  is_topic_sentence: bool) -> float:
    """quick-answer.ts:219-327 — answer-signal boosting per question type."""
    boost = 0.0
    s = sentence.lower()
    if is_topic_sentence:
        boost += 0.1
    if question_type == "how_many":
        if re.search(r"\$[\d,.]+|\d+[,.]?\d*\s*(per|/|month|year|week|day|request|api|call|token|user|minute|second|hour|degree|meter|mile|kg|lb)", sentence, re.I):
            boost += 0.3
        elif re.search(r"\b\d+\b", sentence):
            boost += 0.15
    elif question_type == "how":
        if re.search(r"\b(by using|through|works by|in order to|step|first|then|next|finally|process|method|approach|technique|way to|can be done)\b", s, re.I):
            boost += 0.4
        if re.search(r"\b(install|run|execute|configure|set up|use|import|require|enable|disable|create|build|deploy)\b", s, re.I):
            boost += 0.2
    elif question_type == "when":
        if re.search(r"\b(january|february|march|april|may|june|july|august|september|october|november|december|\d{4}|\d+\s*(days?|weeks?|months?|years?))\b", sentence, re.I):
            boost += 0.3
        if re.search(r"\b(released|launched|published|introduced|created|started|began|founded|established|invented)\s+(in|on|at|around)?\s*\d", sentence, re.I):
            boost += 0.4
    elif question_type == "where":
        if (re.search(r"\b(located|headquartered|based|founded|established)\s+(in|at)\b", s, re.I)
                or re.search(r"\b(?:in|at)\s+(?:the\s+)?[A-Z][a-z]+(?:(?:\s+[A-Z][a-z]+)*|(?:,\s+[A-Z][a-z]+)*)\b", sentence)
                or re.search(r"\b(city|country|state|region|continent|capital|office|campus|location|address)\b", s, re.I)):
            boost += 0.6
        if re.search(r"\b(street|avenue|boulevard|road|highway|route|district|province|county|netherlands|amsterdam|berlin|london|paris|tokyo|beijing|moscow|france|germany|japan|china|india|canada|australia|san francisco|new york|los angeles|seattle|chicago|boston|austin|miami)\b", s, re.I):
            boost += 0.4
        if re.search(r"\b(born|raised|grew up|native|hometown|birthplace|originally from)\b", s, re.I):
            boost += 0.4
    elif question_type == "what":
        if re.search(r"\b(is a|is an|are a|refers to|means|defined as|known as)\b", s):
            boost += 0.5
    elif question_type == "why":
        if re.search(r"\b(because|due to|reason|therefore|since|as a result|consequently|thus)\b", s):
            boost += 0.4
        if re.search(r"\b(as a successor|successor to|in order to|so that|to allow|to provide|to enable|to support|to replace|to improve|to address|to solve)\b", s, re.I):
            boost += 0.4
    elif question_type == "who":
        if (re.search(r"\b(created|designed|developed|built|invented|founded|authored|introduced|proposed|conceived|released|launched|established)\s+(?:\w+\s+){0,4}by\b", s, re.I)
                or re.search(r"\b[A-Z][a-z]+\s+(?:[A-Z][a-z]+\s+)?(?:created|designed|developed|built|invented|founded|authored|introduced|conceived|began)\b", sentence)):
            boost += 0.5
        if (re.search(r"\b[A-Z][a-z]+\s+[A-Z][a-z]+\b", sentence)
                and not re.match(r"^(The|A|An|In|On|At)\b", sentence)):
            boost += 0.2
        if re.search(r"\b(ceo|cto|founder|president|director|manager|team|company|organization|engineer|professor|researcher)\b", s, re.I):
            boost += 0.2
    elif question_type == "yes_no":
        if re.search(r"\b(yes|no|not|does not|doesn't|cannot|can't|isn't|aren't|won't|supports?|enables?|allows?|provides?|includes?)\b", s, re.I):
            boost += 0.3
    return boost


def _sentence_around(text: str, idx: int, match_len: int) -> str:
    sent_start = max(0, text.rfind(".", 0, idx) + 1)
    sent_end = text.find(".", idx + match_len)
    return text[sent_start: sent_end + 1 if sent_end > 0 else None].strip()


def try_direct_extraction(content: str, question_type: str,
                          topic_terms: List[str]) -> Optional[Dict]:
    """quick-answer.ts:338-465 — infobox / definition pattern shortcuts."""
    if not topic_terms:
        return None
    topic_pattern = "|".join(re.escape(t) for t in topic_terms)

    if question_type == "who":
        is_creation = re.search(
            r"\b(?:creat|built|invent|found|design|start|conceiv|originat|develop|made|wrote|began)\w*",
            " ".join(topic_terms), re.I) is not None
        m = re.search(r"(?:Original\s+author|Creator|Inventor|Designed\s+by|Created\s+by|Founded\s+by|Founders)\s*[·:]\s*(.+)", content, re.I)
        if m and m.group(1):
            value = m.group(1).split("\n")[0].strip()[:300]
            if len(value) > 2:
                return {"text": value,
                        "context": m.group(0).split("\n")[0].strip()[:500],
                        "confidence": 0.92}
        if not is_creation:
            m = re.search(r"(?:Developers|Developer|Maintainer|Author)\s*[·:]\s*(.+)", content, re.I)
            if m and m.group(1):
                value = m.group(1).split("\n")[0].strip()[:300]
                if len(value) > 2:
                    return {"text": value,
                            "context": m.group(0).split("\n")[0].strip()[:500],
                            "confidence": 0.92}

    infobox_patterns = [
        (("when",), re.compile(rf"(?:{topic_pattern}).*?(?:First\s+appeared|Released|Founded|Established|Created|Launch\s+date|Initial\s+release)\s*[·:]\s*(.+)", re.I)),
        (("what",), re.compile(rf"(?:{topic_pattern}).*?(?:Type|Genre|Category|Classification)\s*[·:]\s*(.+)", re.I)),
        (("where",), re.compile(r"(?:Headquarters|Headquartered|Location|Address|HQ|Head\s+office|Based\s+in)\s*[·:]\s*(.+)", re.I)),
    ]
    for types, pat in infobox_patterns:
        if question_type not in types:
            continue
        m = pat.search(content)
        if m and m.group(1):
            value = m.group(1).split("\n")[0].strip()[:300]
            if len(value) > 2:
                return {"text": value,
                        "context": m.group(0).split("\n")[0].strip()[:500],
                        "confidence": 0.92}

    if question_type == "who":
        first20 = content[: max(500, int(len(content) * 0.2))]
        m = re.search(r"(?:developed|designed|created|built|invented|founded|authored|introduced|coined|conceived|released|started|launched|begun|proposed|established)\s+(?:\w+\s+){0,4}by\s+(\S+(?:\s+\S+){0,3})", first20, re.I)
        if m and m.group(1):
            candidate = m.group(1).strip()
            first_word = candidate.split()[0]
            proper = (re.match(r"^[A-Z]", first_word)
                      and first_word not in ("The", "A", "An", "This", "That",
                                             "Its", "Their", "Our", "Some",
                                             "Many", "Most", "All", "Each",
                                             "Every"))
            if proper:
                idx = first20.find(m.group(0))
                full = _sentence_around(first20, idx, len(m.group(0)))
                return {"text": full or m.group(0), "context": full,
                        "confidence": 0.88}

    if question_type == "when":
        first30 = content[: max(600, int(len(content) * 0.3))]
        m = re.search(r"(?:released|launched|first appeared|founded|established|created|introduced|conceived|opened|invented)\s+(?:\w+\s+){0,2}(?:in|on)\s+(\d{1,2}\s+\w+\s+\d{4}|\w+\s+\d{1,2},?\s+\d{4}|\d{4})", first30, re.I)
        if m:
            idx = first30.find(m.group(0))
            full = _sentence_around(first30, idx, len(m.group(0)))
            return {"text": full or m.group(0), "context": full,
                    "confidence": 0.88}

    return None


def extract_entity(passage: str, question_type: str) -> Optional[str]:
    if question_type == "who":
        m = re.search(r"\bby\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,3})", passage)
        if m:
            return m.group(1)
        m = re.search(r"([A-Z][a-z]+(?:\s+[A-Z][a-z]+){1,3})\s+(?:created|founded|designed|developed|built|invented|authored|introduced)", passage)
        if m:
            return m.group(1)
        return None
    if question_type == "when":
        m = re.search(r"\b(\d{1,2}\s+\w+\s+\d{4}|\w+\s+\d{1,2},?\s+\d{4}|\d{4})\b", passage)
        return m.group(1) if m else None
    return None


def has_expected_entity_type(text: str, question_type: str) -> bool:
    if question_type == "who":
        return re.search(r"[A-Z][a-z]+\s+[A-Z][a-z]+", text) is not None
    if question_type == "when":
        return re.search(r"\b\d{4}\b|\b(january|february|march|april|may|june|july|august|september|october|november|december)\b", text, re.I) is not None
    if question_type in ("how_many", "how_much"):
        return re.search(r"\b\d+\b", text) is not None
    if question_type == "where":
        return re.search(r"\b(in|at|near|located|based|headquarter)\b", text, re.I) is not None
    return True


def clean_content_for_qa(content: str) -> str:
    """quick-answer.ts:515-608 — strip markdown + citation noise."""
    c = content
    c = re.sub(r"!\[[^\]]*\]\([^)]*\)", "", c)
    c = re.sub(r"\[([^\]]*)\]\([^)]*\)", r"\1", c)
    c = re.sub(r"\*{1,3}([^*]+)\*{1,3}", r"\1", c)
    c = re.sub(r"`([^`]+)`", r"\1", c)
    c = re.sub(r"^#{1,6}\s+", "", c, flags=re.M)
    c = re.sub(r"^---+$", "", c, flags=re.M)
    c = (c.replace("&amp;", "&").replace("&lt;", "<")
         .replace("&gt;", ">").replace("&nbsp;", " "))
    c = re.sub(r"&#\d+;", "", c)
    c = re.sub(r"CS1[_\s]\w+[:\s][^\n]*", "", c, flags=re.I)
    c = re.sub(r"Category:[^\n]*", "", c, flags=re.I)
    c = re.sub(r"\[\d{1,4}\]", "", c)
    c = re.sub(r"\b(arXiv|doi|ISBN|ISSN|Bibcode|PMID|S2CID|JSTOR|OCLC)\s*[:=]\s*\S+", "", c, flags=re.I)
    c = re.sub(r"^https?://\S+$", "", c, flags=re.M)
    c = re.sub(r"\b(retrieved|archived from the original)\b[^\n]{0,100}", "", c, flags=re.I)
    c = re.sub(r"^#{1,3}\s*External\s+links[\s\S]*$", "", c, flags=re.I | re.M)
    c = re.sub(r"^#{1,3}\s*(?:See\s+also|Notes|Further\s+reading)\s*\n(?:(?!^#{1,3}\s).*\n?)*",
               "", c, flags=re.I | re.M)
    c = re.sub(r"^#{1,3}\s*References\s*$", "", c, flags=re.I | re.M)

    kept = []
    for line in c.split("\n"):
        t = line.strip()
        if not t:
            kept.append(line)
            continue
        if t.startswith("^"):
            continue
        if len(t) < 10:
            kept.append(line)
            continue
        alpha = len(re.findall(r"[a-zA-Z]", t))
        if len(t) > 30 and alpha / len(t) < 0.4:
            continue
        kept.append(line)
    c = "\n".join(kept)
    return re.sub(r"\n{3,}", "\n\n", c)


_REFERENT_RE = re.compile(
    r"\b(?:the\s+)?(?:platform|company|service|product|tool|application|system|framework|library|project|organization|software|language|program|site|website|app|api|sdk|package|module|engine|firm|startup|corporation)\b|^(?:It|They|He|She)\s",
    re.I | re.M)

MAX_QA_CHARS = 20000


def quick_answer(question: str, content: str, max_passages: int = 3,
                 max_chars: int = 2000, url: str = "") -> Dict:
    """quick-answer.ts:612-982 — the full pipeline."""
    empty = {"question": question, "answer": "", "confidence": 0.0,
             "passages": [], "source": url, "method": "bm25"}
    if not content or not content.strip():
        return empty
    if not question or not question.strip():
        return empty

    cleaned = clean_content_for_qa(content)
    qa_content = cleaned
    if len(qa_content) > MAX_QA_CHARS:
        qa_content = qa_content[: int(len(qa_content) * 0.7)]

    question_type = detect_question_type(question)
    topic_terms_raw = [t for t in tokenize_raw(question) if t not in STOPWORDS]
    direct = try_direct_extraction(cleaned, question_type, topic_terms_raw)
    if direct:
        answer = direct["text"]
        if len(answer) > max_chars:
            answer = answer[:max_chars] + "…"
        return {"question": question, "answer": answer,
                "confidence": direct["confidence"],
                "passages": [{"text": direct["text"],
                              "score": direct["confidence"],
                              "context": direct["context"]}],
                "source": url, "method": "bm25"}

    sentences = split_into_sentences(qa_content)
    if not sentences:
        return empty

    query_terms = tokenize_question(question)
    if not query_terms:
        fallback = tokenize(question)
        if not fallback:
            return empty
        query_terms.extend(fallback)

    expanded = expand_with_synonyms(query_terms)
    unique_query_terms = list(dict.fromkeys(e.term for e in expanded))

    scoring_blocks = [ContentBlock(" ".join(tokenize(s["text"])), i)
                      for i, s in enumerate(sentences)]

    # topic propagation for coreference-ish referents (ts:700-747)
    if question_type in ("where", "who", "when"):
        topic_idx = {i for i, b in enumerate(scoring_blocks)
                     if any(t in b.raw for t in query_terms)}
        if topic_idx:
            injection = " " + " ".join(query_terms)
            small = len(sentences) < 15
            for i in range(len(sentences)):
                if i in topic_idx:
                    continue
                if not _REFERENT_RE.search(sentences[i]["text"]):
                    continue
                near = small or any(abs(i - j) <= 5 for j in topic_idx)
                if near:
                    scoring_blocks[i] = ContentBlock(
                        scoring_blocks[i].raw + injection, i)

    bm25_scores = score_bm25(scoring_blocks, unique_query_terms)
    max_possible = max(max(bm25_scores), 0.001) if bm25_scores else 0.001

    total_sentences = len(sentences)
    sentence_scores = []
    for i, s in enumerate(sentences):
        is_topic = i == 0 or "\n" in qa_content[max(0, s["start"] - 2): s["start"]]
        base = bm25_scores[i]
        boost = compute_boost(s["text"], question_type, is_topic)
        max_pos = 0.15 if question_type in ("why", "how") else 0.4
        ratio = i / total_sentences
        sent_tokens = tokenize(s["text"])
        matches = sum(1 for t in unique_query_terms if t in sent_tokens)
        coverage = (matches / min(len(unique_query_terms), 5)
                    if unique_query_terms else 0)
        raw_pos = (max_pos if ratio < 0.1
                   else max_pos * (1 - (ratio - 0.1) / 0.4) if ratio < 0.5
                   else 0)
        pos_boost = raw_pos * coverage
        sl = s["text"].lower()
        def_boost = (0.3 if question_type in ("what", "other")
                     and re.search(r"\b(is a|is an|was a|are a|refers to|is the|was the)\b", sl)
                     else 0)
        early_def = (0.5 if question_type == "what" and ratio < 0.05
                     and re.search(r"\b(is a|is an|are a|refers to|means|defined as|known as)\b", sl)
                     else 0)
        total = base + (boost + pos_boost + def_boost + early_def) * max_possible
        sentence_scores.append({"text": s["text"], "index": i,
                                "score": total, "base": base})

    windows = []
    for i in range(len(sentences)):
        windows.append({"text": sentences[i]["text"], "indices": [i],
                        "start": i, "score": sentence_scores[i]["score"]})
    for i in range(len(sentences) - 1):
        sc = (sentence_scores[i]["score"] + sentence_scores[i + 1]["score"]) / 2
        windows.append({"text": sentences[i]["text"] + " " + sentences[i + 1]["text"],
                        "indices": [i, i + 1], "start": i, "score": sc * 0.95})
    if len(sentences) >= 5:
        for i in range(len(sentences) - 2):
            sc = (sentence_scores[i]["score"] + sentence_scores[i + 1]["score"]
                  + sentence_scores[i + 2]["score"]) / 3
            windows.append({
                "text": " ".join(sentences[j]["text"] for j in (i, i + 1, i + 2)),
                "indices": [i, i + 1, i + 2], "start": i, "score": sc * 0.90})

    sorted_windows = sorted(windows, key=lambda w: -w["score"])

    selected = []
    used: set = set()
    for win in sorted_windows:
        if len(selected) >= max_passages:
            break
        if any(i in used for i in win["indices"]):
            continue
        for i in win["indices"]:
            used.add(i)
        first_idx, last_idx = win["indices"][0], win["indices"][-1]
        parts = []
        if first_idx > 0 and (first_idx - 1) not in used:
            parts.append(sentences[first_idx - 1]["text"])
        parts.append(win["text"])
        if last_idx < len(sentences) - 1 and (last_idx + 1) not in used:
            parts.append(sentences[last_idx + 1]["text"])
        if first_idx > 0:
            used.add(first_idx - 1)
        if last_idx < len(sentences) - 1:
            used.add(last_idx + 1)
        selected.append({"text": win["text"],
                         "score": min(1.0, round(win["score"] / (max_possible or 1), 4)),
                         "context": " ".join(parts), "start": first_idx,
                         "indices": win["indices"]})

    top = sorted_windows[0] if sorted_windows else None
    top_base = (max(sentence_scores[i]["base"] for i in top["indices"])
                if top else 0)
    mean_score = sum(bm25_scores) / len(bm25_scores)
    score_gap = (top_base - mean_score) / max_possible if max_possible > 0 else 0

    top_tokens = tokenize(top["text"] if top else "")
    direct_matches = sum(1 for t in query_terms if t in top_tokens)
    matched = 0
    for t in query_terms:
        if t in top_tokens:
            matched += 1
            continue
        syns = expand_with_synonyms([t])
        if any((not e.is_original) and e.term in top_tokens for e in syns):
            matched += 1
    synonym_matches = matched - direct_matches
    coverage = ((direct_matches + synonym_matches * 0.7) / len(query_terms)
                if query_terms else 0)

    position_signal = (0.1 if (top["start"] if top else 999) < len(sentences) * 0.2
                       else 0)
    type_match = 0.20 if has_expected_entity_type(top["text"] if top else "",
                                                  question_type) else 0

    raw_conf = min(1.0, max(0.0, 0.1 + score_gap * 0.35 + coverage * 0.25
                            + position_signal + type_match))

    top_text = (top["text"] if top else "").lower()
    noise_penalty = 0.5 if (
        re.search(r"\bcs1[_\s]", top_text, re.I)
        or re.search(r"\bcategory:", top_text, re.I)
        or re.search(r"\b(archived|retrieved)\s+(from|on)\b", top_text, re.I)
        or re.search(r"\b(isbn|issn|doi|arxiv|bibcode|pmid)\b", top_text, re.I)
        or len(re.findall(r"https?://", top_text)) > 2
    ) else 0
    ui_penalty = 0.3 if (
        re.search(r"\b(sign in|sign up|log in|log out|subscribe|newsletter|cookie|privacy policy|terms of service)\b", top_text, re.I)
        or re.search(r"\b(skip to|main menu|navigation|sidebar|footer|header|breadcrumb)\b", top_text, re.I)
    ) else 0
    confidence = max(0.0, raw_conf - noise_penalty - ui_penalty)

    answer_text = (selected[0]["context"] if selected else "") or \
                  (selected[0]["text"] if selected else "")
    if question_type in ("who", "when") and selected:
        entity = extract_entity(selected[0]["text"], question_type)
        if entity and entity in selected[0]["text"]:
            answer_text = selected[0]["text"]
    if len(answer_text) > max_chars:
        answer_text = re.sub(r"\s+\S*$", "", answer_text[:max_chars]) + "…"

    total_chars = 0
    final_passages = []
    for p in selected:
        ctx = p["context"]
        if len(ctx) + total_chars > max_chars:
            ctx = re.sub(r"\s+\S*$", "",
                         ctx[: max(0, max_chars - total_chars)]) + "…"
        total_chars += len(ctx)
        final_passages.append({"text": p["text"], "score": p["score"],
                               "context": ctx})

    return {"question": question, "answer": answer_text,
            "confidence": round(confidence, 4), "passages": final_passages,
            "source": url, "method": "bm25"}
