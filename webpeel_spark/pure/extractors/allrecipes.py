"""Allrecipes / recipe-site extractor (ee/extractors/allrecipes.ts port):
Schema.org Recipe JSON-LD (incl. @graph and HowToSection nesting) with
an HTML class-based fallback."""

from __future__ import annotations

import json
import re
from typing import List

from ...dom import parse_html, select, select_first


def _try_json(raw: str):
    try:
        return json.loads(raw)
    except Exception:
        return None


def _parse_duration(d: str) -> str:
    if not d:
        return ""
    h = re.search(r"(\d+)H", d)
    m = re.search(r"(\d+)M", d)
    return " ".join(p for p in (f"{h.group(1)}h" if h else "",
                                f"{m.group(1)}m" if m else "") if p)


def allrecipes_extractor(html: str, url: str):
    from . import DomainExtractResult

    try:
        root = parse_html(html)

        recipe = None
        for el in select(root, 'script[type="application/ld+json"]'):
            if recipe is not None:
                break
            parsed = _try_json(el.text() or "")
            candidates = parsed if isinstance(parsed, list) else [parsed]
            for item in candidates:
                if not isinstance(item, dict):
                    continue
                t = item.get("@type")
                if t == "Recipe" or (isinstance(t, list) and "Recipe" in t):
                    recipe = item
                    break
                graph = item.get("@graph")
                if isinstance(graph, list):
                    g = next((x for x in graph if isinstance(x, dict)
                              and x.get("@type") == "Recipe"), None)
                    if g:
                        recipe = g
                        break

        ingredients: List[str] = []
        instructions: List[str] = []
        prep = cook = total = servings = rating = review_count = ""
        description = ""

        def meta(attr, name):
            el = select_first(root, f'meta[{attr}="{name}"]')
            return (el.get("content") or "") if el is not None else ""

        if recipe:
            title = recipe.get("name") or ""
            description = recipe.get("description") or ""
            ingredients = [i.strip() for i in (recipe.get("recipeIngredient") or [])]
            for step in recipe.get("recipeInstructions") or []:
                if isinstance(step, str):
                    instructions.append(step.strip())
                elif isinstance(step, dict):
                    if step.get("text"):
                        instructions.append(step["text"].strip())
                    elif (step.get("@type") == "HowToSection"
                          and step.get("itemListElement")):
                        for s in step["itemListElement"]:
                            if isinstance(s, dict) and s.get("text"):
                                instructions.append(s["text"].strip())
            prep = _parse_duration(recipe.get("prepTime") or "")
            cook = _parse_duration(recipe.get("cookTime") or "")
            total = _parse_duration(recipe.get("totalTime") or "")
            servings = str(recipe.get("recipeYield") or "")
            agg = recipe.get("aggregateRating") or {}
            rating = str(agg["ratingValue"]) if agg.get("ratingValue") else ""
            review_count = str(agg["reviewCount"]) if agg.get("reviewCount") else ""
        else:
            h1 = select_first(root, "h1")
            title = (h1.text().strip() if h1 is not None else "") \
                or meta("property", "og:title")
            description = meta("property", "og:description")
            for el in select(root, '[class*="ingredient"]'):
                text = el.text().strip()
                if text and len(text) < 200:
                    ingredients.append(text)
            for el in select(root, '[class*="instruction"] li, [class*="step"] li'):
                text = el.text().strip()
                if text:
                    instructions.append(text)

        if not title:
            return None

        structured = {"title": title, "description": description,
                      "ingredients": ingredients, "instructions": instructions,
                      "prepTime": prep, "cookTime": cook, "totalTime": total,
                      "servings": servings, "rating": rating,
                      "reviewCount": review_count, "url": url}

        time_parts = " | ".join(p for p in (
            f"Prep: {prep}" if prep else "", f"Cook: {cook}" if cook else "",
            f"Total: {total}" if total else "") if p)
        meta_line = " | ".join(p for p in (
            time_parts, f"Servings: {servings}" if servings else "",
            (f"Rating: {rating}" + (f" ({review_count} reviews)" if review_count else ""))
            if rating else "") if p)

        ingredients_md = ("## Ingredients\n\n"
                          + "\n".join(f"- {i}" for i in ingredients)
                          if ingredients else "")
        instructions_md = ("## Instructions\n\n"
                           + "\n".join(f"{i + 1}. {s}" for i, s in enumerate(instructions))
                           if instructions else "")

        clean = (f"# 🍽️ {title}\n\n"
                 + (f"*{meta_line}*\n\n" if meta_line else "")
                 + (description + "\n\n" if description else "")
                 + f"{ingredients_md}\n\n{instructions_md}").strip()

        return DomainExtractResult("allrecipes.com", "recipe", structured, clean)
    except Exception:
        return None
