"""Design-token structural diff (design-compare.ts:35-315).

``build_design_comparison`` is the reference's own "pure synchronous
function — straightforward to test and reuse" over two pre-extracted
DesignAnalysis token objects: 15 gap checks (scheme, background,
layout system, max-width, base size, heading/body families, weight,
modular scale, shadows, gradients, four quality signals), severity
scoring (10 − 1.5·high − 0.8·medium − 0.3·low, floored at 1) and the
summary string.  The token COLLECTOR (design-analysis.ts, Playwright
``page.evaluate``) stays N/A — the batch face diffs a table of
already-collected token JSONs against a reference design, same as the
domain-verify scoring port.  Suite's 12 pure cases ported in
tests/test_design_compare_ref.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

from .structured_extract import _parse_float_js

SEVERITY_DEDUCTIONS = {"high": 1.5, "medium": 0.8, "low": 0.3}


def _parse_float(s: Any) -> Any:
    """JS parseFloat — shared helper ('16px' → 16, exponents
    included), None for NaN."""
    return _parse_float_js(str(s or ""))


def _gap(prop, desc, subject, reference, severity, suggestion):
    return {"property": prop, "description": desc, "subject": subject,
            "reference": reference, "severity": severity,
            "suggestion": suggestion}


def build_design_comparison(subject_url: str, reference_url: str,
                            subject: Dict[str, Any],
                            reference: Dict[str, Any]) -> Dict[str, Any]:
    """design-compare.ts:49-315."""
    gaps: List[Dict[str, str]] = []
    s_pal, r_pal = subject["palette"], reference["palette"]
    s_lay, r_lay = subject["layout"], reference["layout"]
    s_ts, r_ts = subject["typeScale"], reference["typeScale"]
    s_fx, r_fx = subject["visualEffects"], reference["visualEffects"]
    s_q, r_q = subject["qualitySignals"], reference["qualitySignals"]

    if s_pal["scheme"] != r_pal["scheme"]:
        gaps.append(_gap(
            "palette.scheme", "Color scheme differs", s_pal["scheme"],
            r_pal["scheme"], "medium",
            f"Switch to a {r_pal['scheme']} color scheme. Update "
            f"background and text colors accordingly."))

    s_bg = (s_pal["dominant"] or [""])[0]
    r_bg = (r_pal["dominant"] or [""])[0]
    if s_bg and r_bg and s_bg.lower() != r_bg.lower():
        gaps.append(_gap(
            "palette.dominant[0]", "Primary background color differs",
            s_bg, r_bg, "low",
            f"Consider using {r_bg} as the primary background color."))

    if s_lay["gridSystem"] != r_lay["gridSystem"]:
        gaps.append(_gap(
            "layout.gridSystem", "Layout system differs",
            s_lay["gridSystem"], r_lay["gridSystem"], "medium",
            f"Migrate to CSS {r_lay['gridSystem']} to match the "
            f"reference layout system."))

    if (s_lay["maxWidth"] != "none" and r_lay["maxWidth"] != "none"
            and s_lay["maxWidth"] != r_lay["maxWidth"]):
        gaps.append(_gap(
            "layout.maxWidth", "Container max-width differs",
            s_lay["maxWidth"], r_lay["maxWidth"], "low",
            f"Set max-width to {r_lay['maxWidth']} to match the "
            f"reference layout."))

    s_base = _parse_float(s_ts["baseSize"])
    r_base = _parse_float(r_ts["baseSize"])
    if s_base is not None and r_base is not None \
            and abs(s_base - r_base) >= 2:
        gaps.append(_gap(
            "typeScale.baseSize", "Base font size differs significantly",
            s_ts["baseSize"], r_ts["baseSize"], "medium",
            f"Set the root font-size to {r_ts['baseSize']} (e.g., "
            f"html {{ font-size: {r_ts['baseSize']}; }})."))

    s_head = s_ts["headingStyle"]["family"].lower()
    r_head = r_ts["headingStyle"]["family"].lower()
    if s_head and r_head and s_head != r_head:
        gaps.append(_gap(
            "typeScale.headingStyle.family", "Heading font family differs",
            s_ts["headingStyle"]["family"], r_ts["headingStyle"]["family"],
            "high",
            f"Use \"{r_ts['headingStyle']['family']}\" as the heading "
            f"font family. Add it via Google Fonts or your font "
            f"provider."))

    s_body = s_ts["bodyStyle"]["family"].lower()
    r_body = r_ts["bodyStyle"]["family"].lower()
    if s_body and r_body and s_body != r_body:
        gaps.append(_gap(
            "typeScale.bodyStyle.family", "Body font family differs",
            s_ts["bodyStyle"]["family"], r_ts["bodyStyle"]["family"],
            "high",
            f"Set body {{ font-family: \"{r_ts['bodyStyle']['family']}\","
            f" sans-serif; }}."))

    if s_ts["bodyStyle"]["weight"] != r_ts["bodyStyle"]["weight"]:
        gaps.append(_gap(
            "typeScale.bodyStyle.weight", "Body font weight differs",
            str(s_ts["bodyStyle"]["weight"]),
            str(r_ts["bodyStyle"]["weight"]), "low",
            f"Set body {{ font-weight: {r_ts['bodyStyle']['weight']}; }}."))

    if not s_ts["isModular"] and r_ts["isModular"]:
        ratio = r_ts.get("ratio")
        gaps.append(_gap(
            "typeScale.isModular",
            "Reference uses a modular type scale; subject does not",
            "non-modular",
            f"modular (ratio: {ratio})" if ratio is not None else "modular",
            "medium",
            (f"Adopt a modular type scale with ratio {ratio}. Use a tool "
             f"like https://type-scale.com to generate sizes.")
            if ratio is not None
            else "Adopt a modular type scale for consistent typography."))

    if not s_fx["shadows"] and r_fx["shadows"]:
        gaps.append(_gap(
            "visualEffects.shadows",
            "Reference uses box shadows; subject has none", "no shadows",
            f"{len(r_fx['shadows'])} shadow(s)", "low",
            "Add subtle box-shadow to cards and interactive elements "
            "(e.g., box-shadow: 0 2px 8px rgba(0,0,0,0.1))."))

    if not s_fx["gradients"] and r_fx["gradients"]:
        gaps.append(_gap(
            "visualEffects.gradients",
            "Reference uses gradients; subject has none", "no gradients",
            f"{len(r_fx['gradients'])} gradient(s)", "low",
            "Add CSS gradients to hero sections or accent elements to "
            "add visual depth."))

    for signal, desc, suggestion in (
        ("spacingConsistency",
         "Spacing consistency is notably lower than the reference",
         "Align margin and padding values to a 4px or 8px grid for "
         "consistent spacing."),
        ("typographyConsistency",
         "Typography consistency is notably lower than the reference",
         "Reduce the number of distinct font sizes and establish a "
         "clear type hierarchy."),
        ("colorHarmony",
         "Color harmony is notably lower than the reference",
         "Reduce the color palette to 3–5 primary colors. Use "
         "tints/shades instead of completely different hues."),
        ("visualHierarchy",
         "Visual hierarchy is weaker than the reference",
         "Increase the h1 font size relative to body text (aim for "
         "2× or more) to strengthen visual hierarchy."),
    ):
        diff = r_q[signal] - s_q[signal]
        if diff >= 0.2:
            gaps.append(_gap(
                f"qualitySignals.{signal}", desc,
                str(s_q[signal]), str(r_q[signal]),
                "high" if diff >= 0.4 else "medium", suggestion))

    score = 10.0
    for gap in gaps:
        score -= SEVERITY_DEDUCTIONS[gap["severity"]]
    score = max(1.0, math.floor(score * 10 + 0.5) / 10)  # Math.round

    high = [g for g in gaps if g["severity"] == "high"]
    medium = [g for g in gaps if g["severity"] == "medium"]
    low = [g for g in gaps if g["severity"] == "low"]
    if not gaps:
        summary = ("Subject closely matches the reference design. "
                   "No significant gaps detected.")
    else:
        parts = []
        if high:
            parts.append(f"{len(high)} high-severity")
        if medium:
            parts.append(f"{len(medium)} medium-severity")
        if low:
            parts.append(f"{len(low)} low-severity")
        plural = "" if len(gaps) == 1 else "s"
        score_disp = int(score) if score == int(score) else score
        summary = (f"Found {len(gaps)} design gap{plural} "
                   f"({', '.join(parts)}) with a design score of "
                   f"{score_disp}/10.")
        if high:
            summary += " Priority: " + \
                ", ".join(g["property"] for g in high) + "."

    return {"subjectUrl": subject_url, "referenceUrl": reference_url,
            "score": score, "gaps": gaps, "subjectAnalysis": subject,
            "referenceAnalysis": reference, "summary": summary}
