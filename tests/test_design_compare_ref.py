"""design-compare.ts port — the reference suite's pure block
(buildDesignComparison, 12 cases) ported case-for-case; the HTTP
route block is N/A (express/screenshot service)."""

from __future__ import annotations

import copy

from webpeel_spark.pure.design_compare import build_design_comparison


def make_analysis(**overrides):
    base = {
        "visualEffects": {
            "glassmorphism": [], "animations": [], "transforms": [],
            "filters": [],
            "shadows": [{"selector": "div.card", "properties": {
                "box-shadow": "0 2px 8px rgba(0,0,0,0.1)",
                "type": "drop"}}],
            "gradients": [{"selector": "section.hero", "properties": {
                "background-image":
                    "linear-gradient(90deg,#6366f1,#a855f7)",
                "type": "linear", "colors": "#6366f1,#a855f7"}}],
        },
        "palette": {
            "dominant": ["#ffffff", "#000000"],
            "backgrounds": ["#ffffff"], "texts": ["#111827"],
            "accents": ["#6366f1"],
            "gradientColors": ["#6366f1", "#a855f7"], "scheme": "light",
        },
        "layout": {"sections": [], "gridSystem": "flexbox",
                   "maxWidth": "1280px",
                   "breakpoints": ["(max-width: 768px)"]},
        "typeScale": {
            "sizes": ["12px", "14px", "16px", "20px", "24px", "32px",
                      "48px"],
            "isModular": True, "ratio": 1.25, "baseSize": "16px",
            "families": ["Inter"],
            "headingStyle": {"family": "Inter", "weights": [700]},
            "bodyStyle": {"family": "Inter", "weight": 400,
                          "lineHeight": "24px"},
        },
        "qualitySignals": {"spacingConsistency": 0.9,
                           "typographyConsistency": 0.9,
                           "colorHarmony": 0.9, "visualHierarchy": 1.0,
                           "overall": 0.93},
    }
    base = copy.deepcopy(base)
    base.update(overrides)
    return base


def _find(result, prop):
    return next((g for g in result["gaps"] if g["property"] == prop), None)


def test_identical_analyses_score_10():
    a = make_analysis()
    r = build_design_comparison("https://subject.com",
                                "https://reference.com", a, a)
    assert r["score"] == 10
    assert r["gaps"] == []
    assert "No significant gaps" in r["summary"]


def test_heading_family_high_severity():
    subject = make_analysis(typeScale={
        "sizes": ["16px"], "isModular": False, "baseSize": "16px",
        "families": ["Georgia"],
        "headingStyle": {"family": "Georgia", "weights": [700]},
        "bodyStyle": {"family": "Georgia", "weight": 400,
                      "lineHeight": "24px"}})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    g = _find(r, "typeScale.headingStyle.family")
    assert g and g["severity"] == "high"
    assert g["subject"] == "Georgia" and g["reference"] == "Inter"
    assert "Inter" in g["suggestion"]


def test_body_family_high_severity():
    subject = make_analysis(typeScale={
        "sizes": ["16px"], "isModular": False, "baseSize": "16px",
        "families": ["Times New Roman"],
        "headingStyle": {"family": "Inter", "weights": [700]},
        "bodyStyle": {"family": "Times New Roman", "weight": 400,
                      "lineHeight": "24px"}})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    g = _find(r, "typeScale.bodyStyle.family")
    assert g and g["severity"] == "high"
    assert "font-family" in g["suggestion"]


def test_scheme_mismatch_medium():
    subject = make_analysis(palette={
        "dominant": ["#000000"], "backgrounds": ["#000000"],
        "texts": ["#ffffff"], "accents": ["#6366f1"],
        "gradientColors": [], "scheme": "dark"})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    g = _find(r, "palette.scheme")
    assert g and g["severity"] == "medium"
    assert g["subject"] == "dark" and g["reference"] == "light"


def _no_fx():
    return {"glassmorphism": [], "shadows": [], "gradients": [],
            "animations": [], "transforms": [], "filters": []}


def test_missing_shadows_low():
    r = build_design_comparison(
        "https://s.com", "https://r.com",
        make_analysis(visualEffects=_no_fx()), make_analysis())
    g = _find(r, "visualEffects.shadows")
    assert g and g["severity"] == "low"
    assert "box-shadow" in g["suggestion"]


def test_missing_gradients_low():
    r = build_design_comparison(
        "https://s.com", "https://r.com",
        make_analysis(visualEffects=_no_fx()), make_analysis())
    g = _find(r, "visualEffects.gradients")
    assert g and g["severity"] == "low"


def test_spacing_diff_at_04_boundary_is_high():
    subject = make_analysis(qualitySignals={
        "spacingConsistency": 0.5, "typographyConsistency": 0.9,
        "colorHarmony": 0.9, "visualHierarchy": 1.0, "overall": 0.83})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    g = _find(r, "qualitySignals.spacingConsistency")
    assert g and g["severity"] == "high"  # 0.9-0.5 = 0.4 >= 0.4


def test_spacing_diff_above_04_is_high():
    subject = make_analysis(qualitySignals={
        "spacingConsistency": 0.3, "typographyConsistency": 0.9,
        "colorHarmony": 0.9, "visualHierarchy": 1.0, "overall": 0.78})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    assert _find(r, "qualitySignals.spacingConsistency")["severity"] \
        == "high"


def test_non_modular_vs_modular():
    subject = make_analysis(typeScale={
        "sizes": ["16px", "18px", "22px"], "isModular": False,
        "baseSize": "16px", "families": ["Inter"],
        "headingStyle": {"family": "Inter", "weights": [700]},
        "bodyStyle": {"family": "Inter", "weight": 400,
                      "lineHeight": "24px"}})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    g = _find(r, "typeScale.isModular")
    assert g and g["severity"] == "medium"
    assert "1.25" in g["suggestion"]


def test_score_deductions():
    subject = make_analysis(
        typeScale={
            "sizes": ["16px"], "isModular": False, "baseSize": "16px",
            "families": ["Times New Roman"],
            "headingStyle": {"family": "Times New Roman",
                             "weights": [400]},
            "bodyStyle": {"family": "Inter", "weight": 400,
                          "lineHeight": "24px"}},
        palette={"dominant": ["#000000"], "backgrounds": ["#000000"],
                 "texts": ["#ffffff"], "accents": [],
                 "gradientColors": [], "scheme": "dark"})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    high = [g for g in r["gaps"] if g["severity"] == "high"]
    medium = [g for g in r["gaps"] if g["severity"] == "medium"]
    assert len(high) >= 1 and len(medium) >= 1
    assert 1 <= r["score"] <= 7.7


def test_score_floor_is_1():
    subject = make_analysis(
        palette={"dominant": ["#000"], "backgrounds": ["#000"],
                 "texts": ["#fff"], "accents": [], "gradientColors": [],
                 "scheme": "dark"},
        layout={"sections": [], "gridSystem": "none",
                "maxWidth": "960px", "breakpoints": []},
        typeScale={"sizes": ["12px"], "isModular": False,
                   "baseSize": "12px", "families": ["Comic Sans MS"],
                   "headingStyle": {"family": "Comic Sans MS",
                                    "weights": [400]},
                   "bodyStyle": {"family": "Comic Sans MS",
                                 "weight": 400, "lineHeight": "18px"}},
        qualitySignals={"spacingConsistency": 0.1,
                        "typographyConsistency": 0.1,
                        "colorHarmony": 0.1, "visualHierarchy": 0.1,
                        "overall": 0.1},
        visualEffects=_no_fx())
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    assert r["score"] >= 1


def test_urls_and_analysis_passthrough():
    s, ref = make_analysis(), make_analysis()
    r = build_design_comparison("https://subject.com",
                                "https://reference.com", s, ref)
    assert r["subjectUrl"] == "https://subject.com"
    assert r["referenceUrl"] == "https://reference.com"
    assert r["subjectAnalysis"] is s and r["referenceAnalysis"] is ref


def test_summary_mentions_priority():
    subject = make_analysis(typeScale={
        "sizes": ["16px"], "isModular": False, "baseSize": "16px",
        "families": ["Georgia"],
        "headingStyle": {"family": "Georgia", "weights": [700]},
        "bodyStyle": {"family": "Georgia", "weight": 400,
                      "lineHeight": "24px"}})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    assert "gap" in r["summary"]
    assert "high-severity" in r["summary"]
    assert "Priority:" in r["summary"]


def test_quality_signal_suggestions_byte_exact():
    """Round-6 review: the reference strings use en-dash '3–5' and
    '2×' (design-compare.ts:259,275) — pin the exact bytes."""
    subject = make_analysis(qualitySignals={
        "spacingConsistency": 0.9, "typographyConsistency": 0.9,
        "colorHarmony": 0.3, "visualHierarchy": 0.4, "overall": 0.5})
    r = build_design_comparison("https://s.com", "https://r.com",
                                subject, make_analysis())
    color = _find(r, "qualitySignals.colorHarmony")
    assert color["suggestion"] == (
        "Reduce the color palette to 3–5 primary colors. Use "
        "tints/shades instead of completely different hues.")
    hier = _find(r, "qualitySignals.visualHierarchy")
    assert hier["suggestion"] == (
        "Increase the h1 font size relative to body text (aim for "
        "2× or more) to strengthen visual hierarchy.")
