"""Synonym expansion for query broadening (port of synonyms.ts).

Stemmed synonym groups; originals weight 1.0, expansions 0.5, first
group wins for words appearing in multiple groups (synonyms.ts:155-163).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Set

from .stemmer import stem

SYNONYM_GROUPS: List[List[str]] = [
    ["price", "cost", "fee", "charge", "rate", "pricing", "subscription", "plan"],
    ["create", "build", "make", "develop", "construct", "design", "author", "write", "conceive"],
    ["fast", "quick", "rapid", "speedy", "swift", "performant", "efficient"],
    ["big", "large", "huge", "enormous", "massive", "significant", "substantial"],
    ["small", "tiny", "little", "minor", "minimal", "compact", "lightweight"],
    ["error", "bug", "issue", "problem", "fault", "defect", "failure", "crash"],
    ["start", "begin", "launch", "initiate", "commence", "found", "establish", "release", "introduce"],
    ["stop", "end", "finish", "terminate", "halt", "cease", "conclude"],
    ["use", "utilize", "employ", "leverage", "apply", "adopt"],
    ["help", "assist", "support", "aid", "guide", "facilitate"],
    ["show", "display", "render", "present", "exhibit", "demonstrate"],
    ["get", "obtain", "acquire", "retrieve", "fetch", "receive", "gain"],
    ["send", "transmit", "deliver", "dispatch", "forward", "emit"],
    ["change", "modify", "alter", "update", "revise", "adjust", "edit"],
    ["delete", "remove", "eliminate", "erase", "clear", "purge", "drop"],
    ["allow", "permit", "enable", "authorize", "grant", "let"],
    ["prevent", "block", "prohibit", "restrict", "deny", "forbid", "disable"],
    ["location", "place", "position", "site", "area", "region", "spot"],
    ["person", "individual", "user", "member", "participant", "developer"],
    ["feature", "capability", "functionality", "ability", "function", "capacity"],
    ["limit", "restrict", "constrain", "cap", "bound", "throttle"],
    ["install", "setup", "configure", "deploy", "provision"],
    ["compare", "contrast", "versus", "differ", "distinction", "difference"],
    ["require", "need", "demand", "necessitate", "depend"],
    ["advantage", "benefit", "pro", "strength", "upside", "merit", "feature", "perk"],
    ["disadvantage", "drawback", "con", "weakness", "downside", "limitation"],
    ["learn", "study", "understand", "explore", "discover", "research"],
    ["test", "verify", "validate", "check", "confirm", "inspect"],
    ["connect", "integrate", "link", "combine", "join", "merge", "attach"],
    ["document", "describe", "explain", "detail", "outline", "specify"],
    ["improve", "optimize", "enhance", "upgrade", "refine", "boost"],
    ["base", "headquarter", "locate", "situate"],
    ["platform", "service", "product", "tool", "application", "system", "software"],
    ["move", "transfer", "migrate", "shift", "relocate", "transition"],
    ["exist", "available", "present", "accessible", "offered"],
    ["symptom", "sign", "indication", "manifestation"],
    ["treatment", "therapy", "cure", "remedy", "medication", "medicine"],
    ["diagnosis", "assessment", "evaluation", "examination"],
    ["disease", "illness", "condition", "disorder", "ailment", "sickness"],
    ["revenue", "income", "earnings", "sales", "turnover"],
    ["expense", "cost", "spending", "expenditure", "outlay"],
    ["profit", "gain", "return", "margin", "surplus"],
    ["invest", "fund", "finance", "capitalize", "back"],
    ["important", "significant", "crucial", "critical", "vital", "essential", "key"],
    ["minor", "trivial", "negligible", "insignificant", "marginal"],
    ["say", "state", "declare", "announce", "claim", "assert", "mention"],
    ["ask", "question", "inquire", "query", "request"],
    ["answer", "reply", "respond", "response"],
    ["think", "believe", "consider", "regard", "view", "deem"],
    ["think", "believe", "consider", "regard", "view", "deem"],
    ["decide", "determine", "conclude", "resolve", "settle"],
    ["result", "outcome", "consequence", "effect", "impact", "aftermath"],
    ["cause", "reason", "factor", "trigger", "source", "origin"],
    ["many", "numerous", "several", "multiple", "various", "countless"],
    ["few", "scarce", "rare", "limited", "sparse"],
    ["before", "prior", "previous", "preceding", "earlier", "former"],
    ["after", "subsequent", "following", "later", "next", "succeeding"],
    ["recent", "latest", "newest", "current", "contemporary", "modern"],
    ["old", "ancient", "historical", "legacy", "outdated", "obsolete"],
]

STEMMED_SYNONYM_GROUPS: List[List[str]] = [
    list(dict.fromkeys(stem(w) for w in group)) for group in SYNONYM_GROUPS
]

# values are LISTS in group order (JS Set preserves insertion order)
_SYNONYM_INDEX: Dict[str, List[str]] = {}
for _group in STEMMED_SYNONYM_GROUPS:
    for _word in _group:
        if _word not in _SYNONYM_INDEX:
            _SYNONYM_INDEX[_word] = [w for w in _group if w != _word]


class ExpandedTerm(NamedTuple):
    term: str
    weight: float
    is_original: bool


def expand_with_synonyms(terms: List[str]) -> List[ExpandedTerm]:
    """Originals (weight 1.0) first, then unseen synonyms (weight 0.5)."""
    result: List[ExpandedTerm] = []
    seen: Set[str] = set()
    for term in terms:
        if term not in seen:
            seen.add(term)
            result.append(ExpandedTerm(term, 1.0, True))
    for term in terms:
        for syn in _SYNONYM_INDEX.get(term, ()):
            if syn not in seen:
                seen.add(syn)
                result.append(ExpandedTerm(syn, 0.5, False))
    return result
