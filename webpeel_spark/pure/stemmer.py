"""Porter stemmer (port of /root/reference/src/core/stemmer.ts).

Standard Porter steps 1a-5b plus the reference's irregular-verb
normalization table (stemmer.ts:307-472) applied before stemming, so
stem("built") == stem("build").  Words ≤ 2 chars pass through.
"""

from __future__ import annotations

from typing import List

_VOWELS = "aeiou"


def _is_vowel_at(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return True
    if c == "y" and i > 0 and not _is_vowel_at(word, i - 1):
        return True
    return False


def _measure(stem_: str) -> int:
    m = 0
    in_vowel = False
    for i in range(len(stem_)):
        v = _is_vowel_at(stem_, i)
        if in_vowel and not v:
            m += 1
            in_vowel = False
        elif not in_vowel and v:
            in_vowel = True
    return m


def _contains_vowel(stem_: str) -> bool:
    return any(_is_vowel_at(stem_, i) for i in range(len(stem_)))


def _ends_double_consonant(stem_: str) -> bool:
    n = len(stem_)
    if n < 2:
        return False
    return stem_[n - 1] == stem_[n - 2] and not _is_vowel_at(stem_, n - 1)


def _ends_cvc(stem_: str) -> bool:
    n = len(stem_)
    if n < 3:
        return False
    c3 = stem_[n - 1]
    return (not _is_vowel_at(stem_, n - 1)
            and _is_vowel_at(stem_, n - 2)
            and not _is_vowel_at(stem_, n - 3)
            and c3 not in "wxy")


def _step1a(word: str) -> str:
    if word.endswith("sses"):
        return word[:-2]
    if word.endswith("ies"):
        return word[:-2]
    if word.endswith("ss"):
        return word
    if word.endswith("s") and len(word) > 1:
        return word[:-1]
    return word


def _step1b_fixup(word: str) -> str:
    if word.endswith("at"):
        return word + "e"
    if word.endswith("bl"):
        return word + "e"
    if word.endswith("iz"):
        return word + "e"
    if (_ends_double_consonant(word) and not word.endswith("ll")
            and not word.endswith("ss") and not word.endswith("zz")):
        return word[:-1]
    if _measure(word) == 1 and _ends_cvc(word):
        return word + "e"
    return word


def _step1b(word: str) -> str:
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            return word[:-1]
        return word
    if word.endswith("ed"):
        stem_ = word[:-2]
        if _contains_vowel(stem_):
            return _step1b_fixup(stem_)
        return word
    if word.endswith("ing"):
        stem_ = word[:-3]
        if _contains_vowel(stem_):
            return _step1b_fixup(stem_)
        return word
    return word


def _step1c(word: str) -> str:
    if word.endswith("y") and len(word) > 2:
        stem_ = word[:-1]
        if _contains_vowel(stem_):
            return stem_ + "i"
    return word


_STEP2_RULES = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3_RULES = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4_RULES = [
    ("ement", ""), ("ment", ""), ("ance", ""), ("ence", ""), ("able", ""),
    ("ible", ""), ("ism", ""), ("ate", ""), ("iti", ""), ("ous", ""),
    ("ive", ""), ("ize", ""), ("ant", ""), ("ent", ""), ("al", ""),
    ("er", ""), ("ic", ""), ("ou", ""),
]


def _apply_rules(word: str, rules, min_measure: int) -> str:
    for suffix, replacement in rules:
        if word.endswith(suffix):
            stem_ = word[: -len(suffix)]
            if _measure(stem_) > min_measure:
                return stem_ + replacement
            return word
    return word


def _step4(word: str) -> str:
    if word.endswith("ion"):
        stem_ = word[:-3]
        if _measure(stem_) > 1 and (stem_.endswith("s") or stem_.endswith("t")):
            return stem_
        return word
    return _apply_rules(word, _STEP4_RULES, 1)


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem_ = word[:-1]
        m = _measure(stem_)
        if m > 1:
            return stem_
        if m == 1 and not _ends_cvc(stem_):
            return stem_
    return word


def _step5b(word: str) -> str:
    if word.endswith("ll") and _measure(word) > 1:
        return word[:-1]
    return word


# stemmer.ts:307-472 — irregular verb forms → base (ambiguous words
# like "found"/"left"/"bound" intentionally excluded, as the reference)
IRREGULAR_FORMS = {
    "built": "build", "ran": "run", "made": "make", "wrote": "write",
    "written": "write", "began": "begin", "begun": "begin", "gave": "give",
    "given": "give", "took": "take", "taken": "take", "went": "go",
    "gone": "go", "came": "come", "saw": "see", "seen": "see",
    "knew": "know", "known": "know", "thought": "think", "told": "tell",
    "said": "say", "got": "get", "gotten": "get", "bought": "buy",
    "brought": "bring", "sent": "send", "spent": "spend", "kept": "keep",
    "held": "hold", "stood": "stand", "lost": "lose", "paid": "pay",
    "met": "meet", "led": "lead", "grew": "grow", "grown": "grow",
    "drew": "draw", "drawn": "draw", "broke": "break", "broken": "break",
    "spoke": "speak", "spoken": "speak", "chose": "choose",
    "chosen": "choose", "fell": "fall", "fallen": "fall", "drove": "drive",
    "driven": "drive", "rose": "rise", "risen": "rise", "flew": "fly",
    "flown": "fly", "threw": "throw", "thrown": "throw", "wore": "wear",
    "worn": "wear", "hid": "hide", "hidden": "hide", "sat": "sit",
    "swam": "swim", "swum": "swim", "sang": "sing", "sung": "sing",
    "rang": "ring", "rung": "ring", "drank": "drink", "drunk": "drink",
    "woke": "wake", "woken": "wake", "froze": "freeze", "frozen": "freeze",
    "stole": "steal", "stolen": "steal", "tore": "tear", "torn": "tear",
    "shook": "shake", "shaken": "shake", "forgave": "forgive",
    "forgiven": "forgive", "forgot": "forget", "forgotten": "forget",
    "bit": "bite", "bitten": "bite", "blew": "blow", "blown": "blow",
    "caught": "catch", "taught": "teach", "fought": "fight",
    "sought": "seek", "sold": "sell", "won": "win", "fed": "feed",
    "felt": "feel", "meant": "mean", "lent": "lend", "bent": "bend",
    "dug": "dig", "stuck": "stick", "struck": "strike",
    "stricken": "strike", "swore": "swear", "sworn": "swear",
    "spun": "spin", "hung": "hang", "slid": "slide", "shone": "shine",
    "shot": "shoot", "slept": "sleep", "swept": "sweep", "crept": "creep",
    "wept": "weep", "dealt": "deal", "dreamt": "dream", "learnt": "learn",
    "burnt": "burn", "leant": "lean", "leapt": "leap", "spelt": "spell",
    "spilt": "spill",
}


def stem(word: str) -> str:
    """Porter-stem one word (lowercased); ≤2 chars pass through."""
    if not word:
        return word
    lower = word.lower()
    if len(lower) <= 2:
        return lower
    w = IRREGULAR_FORMS.get(lower, lower)
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _apply_rules(w, _STEP2_RULES, 0)
    w = _apply_rules(w, _STEP3_RULES, 0)
    w = _step4(w)
    w = _step5a(w)
    w = _step5b(w)
    return w


def stem_tokens(tokens: List[str]) -> List[str]:
    return [stem(t) for t in tokens]
