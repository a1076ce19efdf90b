"""Single-core cProfile of the pure extraction hot path.

Runs extract_page over N deterministic corpus pages (same generator
the bench uses) and prints the cumulative-time hot spots.  Purely
diagnostic — not part of the test or bench surface.

Usage: python tools/profile_extract.py [n_pages] [sort]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webpeel_spark.pure.pipeline import DEFAULT_OPTIONS, extract_page  # noqa: E402
from webpeel_spark.sources.corpus import generate_rows  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    sort = sys.argv[2] if len(sys.argv) > 2 else "cumulative"
    rows = generate_rows(n, seed=7)
    payloads = [(r["url"], r["html"]) for r in rows]

    # untimed warm-up (imports, regex compiles, JIT-ish caches)
    for url, html in payloads[:32]:
        extract_page(url, html, DEFAULT_OPTIONS)

    t0 = time.perf_counter()
    for url, html in payloads:
        extract_page(url, html, DEFAULT_OPTIONS)
    dt = time.perf_counter() - t0
    print(f"plain: {n} pages in {dt:.3f}s = {n / dt:.1f} docs/s/core")

    prof = cProfile.Profile()
    prof.enable()
    for url, html in payloads:
        extract_page(url, html, DEFAULT_OPTIONS)
    prof.disable()
    st = pstats.Stats(prof)
    st.sort_stats(sort).print_stats(35)


if __name__ == "__main__":
    main()
