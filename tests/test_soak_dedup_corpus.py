"""The dedup-soak corpus builder (tools/soak_dedup.py) backs the
BENCH_dedup_scale_r09.json scale artifact: its recall numbers are only
meaningful if the planted ground truth is what the docstring claims.
These checks run without Spark (pure pyarrow) so they are cheap enough
to keep the artifact's reproducibility pinned in the default suite."""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tools.soak_dedup import VARIANT_CLUSTER, VARIANT_OFFSET, build_docs  # noqa: E402


def _shingles(text: str, k: int = 3) -> set:
    w = text.split()
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def test_corpus_is_deterministic_and_planted_as_documented(tmp_path):
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    n1, meta1 = build_docs(2000, p1, with_variant_cluster=True)
    n2, _ = build_docs(2000, p2, with_variant_cluster=True)

    t1 = pq.read_table(p1)
    t2 = pq.read_table(p2)
    h = lambda t: hashlib.sha256(  # noqa: E731
        "\x00".join(t.column("text").to_pylist()).encode()).hexdigest()
    assert h(t1) == h(t2), "same seed must produce byte-identical corpora"
    assert n1 == n2 == 200  # 10% of 2000

    texts = dict(zip(t1.column("doc_id").to_pylist(),
                     t1.column("text").to_pylist()))
    assert meta1["n_rows"] == 2000 + VARIANT_CLUSTER

    # planted near-dup pairs (i-9, i) for i % 10 == 9: exactly one word
    # differs, shingle-Jaccard comfortably above the 0.7 soak gate
    for i in (9, 999, 1999):
        a, b = _shingles(texts[i - 9]), _shingles(texts[i])
        j = len(a & b) / len(a | b)
        assert j >= 0.8, f"planted pair ({i-9},{i}) jaccard {j:.3f}"
        assert texts[i - 9] != texts[i]

    # mass exact duplicates: kinds 7/8 share a template byte-identically
    assert texts[7] == texts[8]
    assert texts[7] != texts[17]  # different block → different template

    # the engineered variant cluster is near-identical but NOT
    # byte-identical (must survive exact collapse to flood a bucket)
    v0, v1 = texts[VARIANT_OFFSET], texts[VARIANT_OFFSET + 1]
    assert v0 != v1
    sa, sb = _shingles(v0), _shingles(v1)
    assert len(sa & sb) / len(sa | sb) >= 0.9

    # without the cluster the id space is exactly 0..n-1
    _, meta_plain = build_docs(1000, str(tmp_path / "c.parquet"),
                               with_variant_cluster=False)
    assert meta_plain["n_rows"] == 1000
