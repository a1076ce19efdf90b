"""Schema-driven structured JSON extraction — zero-key heuristic path.

Port of the reference's structured-extraction engine
(``src/core/structured-extract.ts:1-597``): a Firecrawl-compatible
JSON-schema extractor.  The reference has two paths — an external LLM
call and a heuristic regex fallback; the LLM transport is out of scope
(external service), but everything else is pure and ported here:

* ``heuristic_extract*`` — field-name-aware regex extraction for
  string / boolean / number fields (structured-extract.ts:153-432);
* ``coerce_value`` / ``validate_and_coerce`` — the JSON-schema type
  coercion applied to ANY raw mapping, LLM or otherwise
  (structured-extract.ts:41-90);
* ``parse_llm_json`` — code-fence/raw JSON parsing used on model
  output (structured-extract.ts:96-116) — pure string → dict;
* ``simple_to_extraction_schema`` / ``is_type_schema`` helpers
  (structured-extract.ts:579-597).

``extract_structured`` here IS the reference's no-``llmConfig`` branch,
including the domain-hints overlay (structured-extract.ts:534-568).
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, Dict, List, Optional, Tuple

# ── JS-compat primitives ────────────────────────────────────────────────

_NUM_PREFIX = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


def _parse_float_js(s: str) -> Optional[float]:
    """JS ``parseFloat``: longest numeric prefix, NaN → None."""
    m = _NUM_PREFIX.match(s.strip())
    if not m:
        return None
    try:
        return float(m.group(0))
    except ValueError:
        return None


def _js_str(value: Any) -> str:
    """JS ``String(value)`` for the scalar types coercion sees.
    Shared helper (cli_helpers imports it too — keep the one copy)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if math.isinf(value):
            return "Infinity" if value > 0 else "-Infinity"
        if value.is_integer():
            return str(int(value))
        return str(value)
    return str(value)


def _num_out(n: float):
    """JSON-number convention: integral floats come back as ints."""
    return int(n) if isinstance(n, float) and n.is_integer() else n


# ── schema validation / coercion (structured-extract.ts:41-90) ──────────

def coerce_value(value: Any, expected_type: str) -> Any:
    if value is None:
        return None
    if expected_type == "string":
        return value if isinstance(value, str) else _js_str(value)
    if expected_type == "boolean":
        if isinstance(value, bool):
            return value
        s = _js_str(value).lower().strip()
        if s in ("true", "yes", "1", "open", "enabled"):
            return True
        if s in ("false", "no", "0", "closed", "disabled"):
            return False
        return None
    if expected_type == "number":
        if isinstance(value, bool):
            # JS typeof true is 'boolean', falls to parseFloat("true") → NaN
            return None
        if isinstance(value, (int, float)):
            return None if (isinstance(value, float)
                            and math.isnan(value)) else _num_out(float(value))
        n = _parse_float_js(_js_str(value).replace(",", ""))
        return None if n is None else _num_out(n)
    if expected_type == "array":
        return value if isinstance(value, list) else [value]
    if expected_type == "object":
        return value if isinstance(value, (dict, list)) else None
    return value


def validate_and_coerce(raw: Dict[str, Any],
                        schema: Dict[str, Any]) -> Tuple[Dict[str, Any],
                                                         List[str]]:
    data: Dict[str, Any] = {}
    missing_required: List[str] = []
    required = schema.get("required") or []
    for field, field_def in schema["properties"].items():
        coerced = coerce_value(raw.get(field), field_def["type"])
        data[field] = coerced
        if coerced is None and field in required:
            missing_required.append(field)
    return data, missing_required


# ── model-output JSON parsing (structured-extract.ts:96-116) ────────────

def parse_llm_json(text: str) -> Dict[str, Any]:
    """Parse JSON out of free text: code fences first, then raw, then
    the first ``{...}`` block."""
    stripped = text.strip()
    m = re.search(r"```(?:json)?\s*\n?([\s\S]+?)\n?```", stripped)
    if m and m.group(1):
        return json.loads(m.group(1).strip())
    try:
        return json.loads(stripped)
    except (json.JSONDecodeError, ValueError):
        om = re.search(r"\{[\s\S]+\}", stripped)
        if om:
            return json.loads(om.group(0))
        raise ValueError(
            f"Could not parse JSON from LLM response: {stripped[:200]}")


# ── heuristic field extractors (structured-extract.ts:126-386) ──────────

_MD_DECOR = re.compile(r"[*_`]")
_MD_DECOR_BRACKETS = re.compile(r"[*_`\[\]]")
# stand-in for JS \p{Emoji_Presentation}\p{Extended_Pictographic}️ —
# Python re lacks Unicode property classes; these ranges cover the emoji
# the reference's domain extractors prepend (📦🎬🎵🎮⭐💻📜🍴 etc.)
_LEADING_EMOJI = re.compile(
    "^[\U0001F000-\U0001FAFF←-⯿〰〽⭐⭕"
    "️‍]+\\s*")


def extract_page_title(content: str) -> Optional[str]:
    m = re.search(r"^#\s+(.+)$", content, re.MULTILINE)
    if m and m.group(1):
        return _MD_DECOR.sub("", m.group(1)).strip()
    return None


def extract_description(content: str) -> Optional[str]:
    lines = [l for l in content.split("\n") if l.strip()]
    seen_h1 = False
    for line in lines:
        if line.startswith("#"):
            seen_h1 = True
            continue
        if line.startswith("*") and line.endswith("*"):
            continue  # byline
        if seen_h1 and len(line) > 30:
            return _MD_DECOR.sub("", line).strip()[:300]
    return None


def extract_company_from_title(title: str) -> Optional[str]:
    m = re.match(r"([^|·\-—]+)[|·\-—]", title)
    if m and m.group(1):
        return m.group(1).strip()
    return title.strip()[:60]


def heuristic_extract_string(field_name: str, content: str,
                             page_url: Optional[str] = None) -> Optional[str]:
    lf = field_name.lower()
    human_name = field_name.replace("_", " ")
    title = extract_page_title(content)

    if re.search(r"company|brand|organization|org_name", lf):
        if title:
            return extract_company_from_title(title)
        m = re.search(r"^#{1,3}\s+(.+)$", content, re.MULTILINE)
        if m and m.group(1):
            return _MD_DECOR_BRACKETS.sub("", m.group(1)).strip()[:60]

    if re.fullmatch(r"title|name|product_name|product|heading", lf):
        raw_title = title
        if raw_title is None:
            m = re.search(r"^#{1,3}\s+(.+)$", content, re.MULTILINE)
            raw_title = m.group(1) if m else None
        if raw_title:
            t = re.sub(r"!\[[^\]]*\]\([^)]*\)", "", raw_title)
            t = re.sub(r"\[([^\]]+)\]\([^)]*\)", r"\1", t)
            t = re.sub(r"\(https?://[^)]+\)", "", t)
            t = _MD_DECOR_BRACKETS.sub("", t)
            t = re.sub(r"&[a-z]+;", "", t)
            t = _LEADING_EMOJI.sub("", t)
            return re.sub(r"\s+", " ", t).strip()[:150]

    if re.search(r"description|summary|about|overview", lf):
        return extract_description(content)

    if re.fullmatch(r"url|website|link|homepage|site", lf):
        if page_url:
            return page_url

    if re.search(r"creator|designer|founder|inventor|invented_by|created_by",
                 lf):
        m = (re.search(r"(?:created?|designed?|founded?|invented?)\s+by\s+"
                       r"([A-Z][^\n,·|–—]+?)(?:\s*[,·|–—]|\s+in\s+\d{4}|\.)",
                       content, re.IGNORECASE)
             or re.search(r"(?:creator|designer|founder|inventor)[:\s]+"
                          r"([A-Z][^\n,·|]+?)(?:\s*[,·|–—]|\.)",
                          content, re.IGNORECASE))
        if m and m.group(1):
            return _MD_DECOR_BRACKETS.sub("", m.group(1)).strip()[:80]

    if re.search(r"director", lf):
        m = (re.search(r"Director[:\s*]+([^\n|,]+)", content, re.IGNORECASE)
             or re.search(r"Directed by[:\s]+([^\n|,]+)", content,
                          re.IGNORECASE))
        if m and m.group(1):
            return _MD_DECOR.sub("", m.group(1)).strip()[:100]

    if re.fullmatch(r"version", lf):
        m = (re.search(r"\*\*Version:\*\*\s*([\d]+\.[\d]+[.\d]*)", content,
                       re.IGNORECASE)
             or re.search(r"version[:\s]+v?([\d]+\.[\d]+[.\d]*)", content,
                          re.IGNORECASE)
             or re.search(r"v?([\d]+\.[\d]+\.[\d]+)", content))
        if m and m.group(1):
            return m.group(1)

    if re.search(r"author|writer|by", lf):
        m = (re.search(r"\*By\s+([^·\n*]+)", content, re.IGNORECASE)
             or re.search(r"Author[:\s]+([^\n,]+)", content, re.IGNORECASE))
        if m and m.group(1):
            return m.group(1).strip()[:100]

    if re.search(r"date|published|updated|modified", lf):
        m = (re.search(r"(\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov"
                       r"|Dec)[a-z]*\s+\d{1,2},?\s+\d{4}\b)", content,
                       re.IGNORECASE)
             or re.search(r"(\d{4}-\d{2}-\d{2})", content))
        if m and m.group(1):
            return m.group(1)

    if re.search(r"email|contact", lf):
        m = re.search(r"[\w.+-]+@[\w-]+\.[a-z]{2,}", content, re.IGNORECASE)
        if m:
            return m.group(0)

    if re.search(r"price|cost|pricing|fee", lf):
        m = (re.search(r"\$\s*[\d,]+(?:\.\d{2})?(?:\s*/\s*\w+)?", content)
             or re.search(r"(free|no cost|no charge)", content,
                          re.IGNORECASE))
        if m:
            return m.group(0).strip()

    if re.search(r"language|lang|tech", lf):
        m = (re.search(r"💻\s*(\w[\w#+.-]+)", content)
             or re.search(r"Language[:\s]+(\w[\w#+.-]+)", content,
                          re.IGNORECASE))
        if m and m.group(1):
            return m.group(1)

    if re.search(r"stars?", lf):
        m = (re.search(r"⭐\s*([\d,]+)\s*stars?", content, re.IGNORECASE)
             or re.search(r"([\d,]+)\s*stars?", content, re.IGNORECASE))
        if m and m.group(1):
            return m.group(1).replace(",", "")

    if re.search(r"license", lf):
        m = (re.search(r"📜\s*(\w+)", content)
             or re.search(r"License[:\s]+(MIT|Apache|GPL|BSD|ISC|AGPL|MPL)"
                          r"[^\s]*", content, re.IGNORECASE))
        if m and m.group(1):
            return m.group(1)

    # generic exact-ish patterns (structured-extract.ts:262-271)
    esc_human = re.escape(human_name)
    esc_field = re.escape(field_name)
    patterns = [
        rf"(?:^|\n)[ \t]*{esc_human}[:\s]+([^\n]{{5,200}})",
        rf'"{esc_field}"\s*:\s*"([^"]{{1,300}})"',
        rf"\*{{1,2}}{esc_human}\*{{0,2}}[:\s]+([^\n]{{5,200}})",
        rf"#+\s*{esc_human}\s*\n+([^\n]{{5,300}})",
    ]
    for pattern in patterns:
        m = re.search(pattern, content, re.IGNORECASE)
        if m and m.group(1):
            return re.sub(r"[|*_`]", "", m.group(1).strip())[:300]

    return None


def heuristic_extract_boolean(field_name: str,
                              content: str) -> Optional[bool]:
    lf = field_name.lower()
    ctx = content.lower()

    if re.search(r"free_tier|has_free|is_free", lf):
        if re.search(r"free tier|free plan|\$0|no cost|no charge"
                     r"|free forever", ctx):
            return True
        if re.search(r"no free|paid only|subscription required", ctx):
            return False

    if re.search(r"open_source|is_open|oss", lf):
        if re.search(r"open[- ]source|mit license|apache license|gpl"
                     r"|bsd license|📜\s*mit|📜\s*apache", ctx):
            return True
        if re.search(r"closed[- ]source|proprietary|commercial license",
                     ctx):
            return False

    if re.search(r"has_api|api_available|has_rest", lf):
        if re.search(r"rest api|graphql api|api endpoint|api key|/v1/|/api/",
                     ctx):
            return True

    if re.search(r"requires_auth|has_auth|is_authenticated", lf):
        if re.search(r"login|sign in|authentication|api key|bearer token",
                     ctx):
            return True

    human_name = field_name.replace("_", " ").lower()
    field_idx = ctx.find(field_name.lower())
    if field_idx == -1:
        field_idx = ctx.find(human_name)
    if field_idx != -1:
        window = ctx[max(0, field_idx - 80):field_idx + 200]
        for pos in ("yes", "true", "open source", "open-source", "available",
                    "enabled", "supported", "free", "included"):
            if pos in window:
                return True
        for neg in ("no", "false", "closed", "proprietary", "unavailable",
                    "disabled", "not supported", "excluded"):
            if neg in window:
                return False
    return None


def heuristic_extract_number(field_name: str, content: str):
    lf = field_name.lower()

    def _num(s: str):
        n = _parse_float_js(s.replace(",", ""))
        return None if n is None else _num_out(n)

    if re.search(r"stars?", lf):
        m = (re.search(r"⭐\s*([\d,]+)", content)
             or re.search(r"([\d,]+)\s*stars?", content, re.IGNORECASE))
        if m and m.group(1):
            return _num(m.group(1))

    if re.search(r"forks?", lf):
        m = (re.search(r"🍴\s*([\d,]+)", content)
             or re.search(r"([\d,]+)\s*forks?", content, re.IGNORECASE))
        if m and m.group(1):
            return _num(m.group(1))

    if re.search(r"rating|score", lf):
        m = (re.search(r"⭐\s*([\d.]+)/", content)
             or re.search(r"([\d.]+)\s*/\s*10", content)
             or re.search(r"([\d.]+)\s*/\s*5", content))
        if m and m.group(1):
            return _num(m.group(1))

    if re.search(r"year", lf):
        explicit = re.search(r"\bYear[:\s]+(\d{4})\b", content, re.IGNORECASE)
        if explicit:
            return int(explicit.group(1))
        if re.search(r"creat|found|release|launch|start|born|inception", lf):
            m = (re.search(r"(?:created?|founded?|released?|launched?"
                           r"|started?|born|inception)[^\d]*"
                           r"(\b(?:19|20)\d{2}\b)", content, re.IGNORECASE)
                 or re.search(r"\b(?:in|year)\s+(\b(?:19|20)\d{2}\b)",
                              content, re.IGNORECASE)
                 or re.search(r"(\b(?:19|20)\d{2}\b)", content))
            if m and m.group(1):
                return int(m.group(1))
        m = re.search(r"\b((?:19|20)\d{2})\b", content)
        if m:
            return int(m.group(1))

    if re.search(r"downloads?", lf):
        m = (re.search(r"weekly\s+downloads[^\d]*([\d,]+)", content,
                       re.IGNORECASE)
             or re.search(r"downloads?[^\d]*([\d,]+)", content,
                          re.IGNORECASE))
        if m and m.group(1):
            return _num(m.group(1))

    if re.search(r"population", lf):
        m = re.search(r"population[^\d]*([\d,]+)", content, re.IGNORECASE)
        if m and m.group(1):
            return _num(m.group(1))

    human_name = re.escape(field_name).replace("_", r"[\s_-]*")
    m = re.search(rf"{human_name}[^\d]*(\d[\d,]*\.?\d*)", content,
                  re.IGNORECASE)
    if m and m.group(1):
        return _num(m.group(1))
    return None


# ── heuristic extraction over a schema (structured-extract.ts:388-432) ──

def heuristic_extract(content: str, schema: Dict[str, Any]) -> Dict[str, Any]:
    data: Dict[str, Any] = {}
    fields_found = 0
    total_fields = len(schema["properties"])

    for field, field_def in schema["properties"].items():
        ftype = field_def["type"]
        value = None
        if ftype == "string":
            value = heuristic_extract_string(field, content)
        elif ftype == "boolean":
            value = heuristic_extract_boolean(field, content)
        elif ftype == "number":
            value = heuristic_extract_number(field, content)
        # array/object: heuristic returns null (not enough context)
        if value is not None:
            fields_found += 1
        data[field] = value

    fill_rate = fields_found / total_fields if total_fields > 0 else 0.0
    if fields_found == 0:
        confidence = 0.1
    elif fields_found == total_fields:
        confidence = 0.65 + fill_rate * 0.05
    else:
        confidence = 0.3 + fill_rate * 0.2

    return {"data": data, "confidence": round(confidence, 2),
            "tokensUsed": 0}


# ── entry point — the zero-key path (structured-extract.ts:446-569) ─────

def extract_structured(content: str, schema: Dict[str, Any],
                       domain_hints: Optional[Dict[str, Any]] = None
                       ) -> Dict[str, Any]:
    """Heuristic structured extraction with the domain-hints overlay.
    The reference's LLM branch (an external service call) is out of
    scope; this is its ``llmConfig``-less path, bit-for-bit."""
    if not content or not content.strip():
        return {"data": {}, "confidence": 0, "tokensUsed": 0}

    if (not isinstance(schema, dict) or schema.get("type") != "object"
            or not isinstance(schema.get("properties"), dict)):
        raise ValueError(
            'Invalid schema: must be { type: "object", properties: { ... } }')

    heuristic = heuristic_extract(content, schema)

    if domain_hints:
        props = schema["properties"]
        hint_merged = 0
        for field, hint_value in domain_hints.items():
            if field in props and hint_value is not None:
                expected = props[field]["type"]
                if isinstance(hint_value, bool):
                    actual = "boolean"
                elif isinstance(hint_value, (int, float)):
                    actual = "number"
                elif isinstance(hint_value, str):
                    actual = "string"
                elif isinstance(hint_value, (dict, list)):
                    actual = "object"
                else:
                    actual = type(hint_value).__name__
                num_ok = (expected == "number" and actual == "string"
                          and _parse_float_js(hint_value.replace(",", ""))
                          is not None and re.fullmatch(
                              r"\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*",
                              hint_value) is not None)
                if (actual == expected or num_ok
                        or (expected == "string" and actual != "object")):
                    heuristic["data"][field] = (
                        _num_out(float(hint_value)) if expected == "number"
                        and not isinstance(hint_value, bool)
                        else hint_value)
                    hint_merged += 1
        if hint_merged > 0:
            filled = sum(1 for v in heuristic["data"].values()
                         if v is not None)
            total = len(props)
            heuristic["confidence"] = round(
                min(0.90, 0.65 + (filled / total) * 0.25), 2)

    return heuristic


# ── schema helpers (structured-extract.ts:579-597) ──────────────────────

def simple_to_extraction_schema(simple: Dict[str, str]) -> Dict[str, Any]:
    return {"type": "object",
            "properties": {f: {"type": t} for f, t in simple.items()}}


_TYPE_NAMES = {"string", "boolean", "number", "array", "object", "integer"}


def is_type_schema(obj: Dict[str, Any]) -> bool:
    values = list(obj.values())
    return bool(values) and all(
        isinstance(v, str) and v in _TYPE_NAMES for v in values)
