"""CSS-selector / schema-driven field extraction.

Port of extractStructured (/root/reference/src/core/extract.ts:68-151):
``selectors`` maps field → CSS selector with optional ``@attr`` suffix
("a@href" extracts the attribute); single match → scalar, multiple →
list.  ``schema`` properties are resolved by trying common CSS patterns
derived from the field name, with type coercion (number/boolean/array).
The LLM path (extract.ts:11-60) is an external service — out of scope.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

from ..dom import parse_html, select

_ATTR_RE = re.compile(r"^(.+?)@([a-zA-Z-]+)$")
_NUM_STRIP_RE = re.compile(r"[^0-9.\-]")


def extract_structured(html: str, selectors: Optional[Dict[str, str]] = None,
                       schema: Optional[dict] = None) -> Dict[str, Any]:
    root = parse_html(html)
    result: Dict[str, Any] = {}

    if selectors:
        for field, selector_raw in selectors.items():
            m = _ATTR_RE.match(selector_raw)
            css = m.group(1) if m else selector_raw
            attr = m.group(2) if m else None
            elements = select(root, css)
            if not elements:
                result[field] = None
            elif attr:
                if len(elements) == 1:
                    result[field] = elements[0].get(attr)
                else:
                    result[field] = [el.get(attr) for el in elements]
            elif len(elements) == 1:
                result[field] = elements[0].text().strip()
            else:
                result[field] = [el.text().strip() for el in elements]

    if schema:
        properties = schema.get("properties", schema)
        for field, spec in properties.items():
            if field in result:
                continue  # already extracted by selector
            field_lower = field.lower()
            candidates = [
                f'[itemprop="{field_lower}"]',
                f"[data-{field_lower}]",
                f".{field_lower}",
                f"#{field_lower}",
                f'[class*="{field_lower}"]',
                f'meta[name="{field_lower}"]',
                f'meta[property="og:{field_lower}"]',
            ]
            for sel in candidates:
                els = select(root, sel)
                if not els:
                    continue
                el = els[0]
                value = el.get("content") or el.text().strip()
                if not value:
                    continue
                spec_type = (spec or {}).get("type") if isinstance(spec, dict) else None
                if spec_type == "number":
                    # JS parseFloat: parse the LEADING float of the
                    # stripped string; NaN → try next candidate
                    stripped = _NUM_STRIP_RE.sub("", value)
                    m2 = re.match(r"[+-]?(?:\d+\.?\d*|\.\d+)", stripped)
                    if not m2:
                        continue
                    result[field] = float(m2.group(0))
                    break
                if spec_type == "boolean":
                    result[field] = value.lower() in ("true", "yes", "1")
                    break
                if spec_type == "array":
                    result[field] = [e.text().strip() for e in els]
                    break
                result[field] = value
                break
            if field not in result:
                result[field] = None

    return result
