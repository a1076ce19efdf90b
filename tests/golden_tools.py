"""Golden-fixture helpers: the byte-identity contract for extraction.

The corpus is the deterministic synthetic pages table (seed=42).  Golden
records freeze, per url: content sha256 (byte identity), title, branch,
method, word_count, quality, language.  Regenerate ONLY on a deliberate
behaviour change:  python tests/golden_tools.py regen
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "extraction_v1.json")
CORPUS_N = 150
SEED = 42


def compute_records() -> dict:
    from webpeel_spark.pure.pipeline import extract_page
    from webpeel_spark.sources.corpus import generate_rows

    records = {}
    for row in generate_rows(CORPUS_N, seed=SEED):
        r = extract_page(row["url"], row["html"])
        records[row["url"]] = {
            "fingerprint": r["fingerprint"],
            "title": r["title"],
            "branch": r["branch"],
            "method": r["method"],
            "word_count": r["word_count"],
            "quality": r["quality"],
            "language": r["language"],
            "content_len": r["content_len"],
            "status": r["status"],
        }
    return records


def regen() -> None:
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(compute_records(), f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    if sys.argv[1:] == ["regen"]:
        regen()
    else:
        print(__doc__)
