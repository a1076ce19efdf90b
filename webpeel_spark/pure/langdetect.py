"""Language detection.

Two detectors:

1. ``detect_language_from_url`` — the reference's ccTLD → BCP-47 map
   (/root/reference/src/core/language-detect.ts:7-89), ported verbatim
   including its deliberate quirks (``.ar`` → Spanish for Argentina).
2. ``detect_language_ngram`` — our addition for training-data pipelines:
   a dependency-free character-n-gram/stopword heuristic over plain text
   (the reference has no content-based language ID; a 100 TB corpus
   pipeline needs one).  Deterministic and cheap; designed for use inside
   a vectorized UDF.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urlsplit

TLD_TO_LANGUAGE = {
    "jp": "ja", "cn": "zh", "de": "de", "fr": "fr", "kr": "ko", "br": "pt",
    "ru": "ru", "es": "es", "it": "it", "nl": "nl", "se": "sv", "tw": "zh-TW",
    "th": "th", "vn": "vi", "pl": "pl", "in": "hi", "id": "id",
    "ar": "es",  # Argentina (.ar) — Spanish, not Arabic (language-detect.ts:25)
    "pt": "pt", "mx": "es", "be": "nl", "ch": "de", "at": "de", "dk": "da",
    "fi": "fi", "no": "nb", "hu": "hu", "cz": "cs", "sk": "sk", "ro": "ro",
    "bg": "bg", "hr": "hr", "gr": "el", "tr": "tr", "ua": "uk", "il": "he",
    "sa": "ar", "ae": "ar", "eg": "ar",
}


def detect_language_from_url(url: str) -> Optional[str]:
    try:
        hostname = (urlsplit(url).hostname or "").lower()
    except ValueError:
        return None
    if not hostname:
        return None
    if hostname.startswith("www."):
        hostname = hostname[4:]
    parts = hostname.split(".")
    if len(parts) < 2:
        return None
    return TLD_TO_LANGUAGE.get(parts[-1])


# ── content-based n-gram heuristic (our scale addition) ──────────────────

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was", "it", "on"},
    "es": {"el", "la", "de", "que", "en", "los", "del", "las", "por", "una", "con", "para"},
    "fr": {"le", "la", "les", "des", "est", "dans", "une", "pour", "que", "qui", "sur", "avec"},
    "de": {"der", "die", "und", "das", "von", "mit", "ist", "den", "für", "auf", "ein", "nicht"},
    # ("como", not "как" — a review caught the Russian word in this
    # set: "как" is top-frequency Russian, so one poisoned entry made
    # Cyrillic text vote 'pt' while the oracle, generated from the
    # same constant, stayed green on the wrong answer)
    "pt": {"de", "que", "não", "uma", "para", "com", "os", "do", "da", "em", "um", "como"},
    "it": {"di", "che", "il", "per", "con", "una", "del", "gli", "della", "nel", "sono", "più"},
    "nl": {"de", "het", "een", "van", "en", "dat", "is", "voor", "met", "aan", "niet", "zijn"},
}

_SCRIPT_RANGES = [
    ("zh", 0x4E00, 0x9FFF),
    ("ja", 0x3040, 0x30FF),
    ("ko", 0xAC00, 0xD7AF),
    ("ru", 0x0400, 0x04FF),
    ("ar", 0x0600, 0x06FF),
    ("he", 0x0590, 0x05FF),
    ("th", 0x0E00, 0x0E7F),
    ("hi", 0x0900, 0x097F),
    ("el", 0x0370, 0x03FF),
]

_WORD_RE = re.compile(r"[a-zàâäçèéêëîïôöùûüñáíóúãõßа-яα-ω]+", re.I)


# inverted stopword index: word → tuple of candidate languages
_STOPWORD_LANGS: dict = {}
for _lang, _sw in _STOPWORDS.items():
    for _w in _sw:
        _STOPWORD_LANGS.setdefault(_w, []).append(_lang)

_LANG_ORDER = list(_STOPWORDS)  # preserves original max() tie-break order


def _stopword_vote(sample: str) -> str:
    words = _WORD_RE.findall(sample.lower())
    if not words:
        return "und"
    votes = {lang: 0 for lang in _LANG_ORDER}
    get = _STOPWORD_LANGS.get
    for w in words:
        langs = get(w)
        if langs:
            for lang in langs:
                votes[lang] += 1
    best = max(votes, key=lambda k: votes[k])
    if votes[best] == 0:
        return "und"
    return best


def detect_language_ngram(text: str, sample_chars: int = 2000) -> str:
    """Cheap deterministic language ID: script ranges, then stopword votes.

    Returns a BCP-47 primary subtag, or 'und' when undecidable.
    """
    if not text:
        return "und"
    sample = text[:sample_chars]

    # ASCII fast path: no non-Latin codepoints possible, the script
    # histogram is all zeros by construction — identical outcome to the
    # slow path, minus the per-char scan
    if sample.isascii():
        return _stopword_vote(sample)

    # 1) non-Latin scripts by codepoint histogram
    counts = {s: 0 for s, _, _ in _SCRIPT_RANGES}
    latin = 0
    total = 0
    for ch in sample:
        cp = ord(ch)
        if ch.isalpha():
            total += 1
            if cp < 0x0250:
                latin += 1
            else:
                for lang, lo, hi in _SCRIPT_RANGES:
                    if lo <= cp <= hi:
                        counts[lang] += 1
                        break
    if total == 0:
        return "und"
    best_script = max(counts, key=lambda k: counts[k])
    if counts[best_script] > total * 0.3:
        # Hiragana/Katakana presence distinguishes ja from zh
        if best_script == "zh" and any(0x3040 <= ord(c) <= 0x30FF for c in sample):
            return "ja"
        return best_script

    # 2) Latin languages by stopword voting
    return _stopword_vote(sample)
