"""Dedup/similarity scale soak (round 9): measure the three
sub-quadratic near-dup operators — MinHash LSH, SimHash band-pairs,
SRP embedding LSH — at multiples of the bench corpus and report wall
growth, planted-pair recall, and the capped-bucket metrics, so the
"candidate volume is bounded, caps are reported" scale claims carry
measured numbers instead of plan-audit argument.  (`ngram_jaccard` is
the repo's EXACT verifier — documented as within-block quadratic — so
it is deliberately not soaked; minhash is its scale path.)

    python tools/soak_dedup.py [--scales 4,16] [--cores 32]

Corpus per scale M (deterministic, numpy seed 42; base unit = the
5,000-doc bench table, so M=4 → 20k docs / 8k vectors):

* 70% unique docs — 80-150 words sampled from a 220-word vocabulary
  (two such docs share essentially no 3-shingles);
* 20% mass exact duplicates — N/100 boilerplate templates × ~20
  byte-identical copies each (the cookie-wall/404 pattern the
  exact-collapse pre-pass exists for);
* 10% planted near-duplicates — copy the unique doc 9 slots back and
  replace ONE interior word (3 shingles change: shingle-Jaccard
  ≈ (S-3)/(S+3) ≥ 0.85, well above the 0.7 gate), ids recognizable as
  (i-9, i) with i % 10 == 9, so recall is a cheap filter not a join;
* at the LARGEST scale only: one 3,000-doc "variant cluster" (shared
  template + per-doc unique suffix, ids ≥ 50M) engineered to overflow
  minhash's bucket_cap=2000 — the dropped-bucket metrics must report
  it, and its absence from the output is the documented cap behavior,
  not silent loss.

Embeddings per scale: M × 2,000 unit-norm gaussian vectors (dim 64),
plus 1% scaled clones (cosine exactly 1.0 — structural recall 1.0),
1% noise near-dups (v + 0.02·g renormalized, cosine ≈ 0.987; exact
cosine recorded at construction, only pairs ≥ 0.9501 counted as
expected), and — round 10 — 1% NEAR-THRESHOLD pairs with construction-
exact cosines uniform in [0.94, 0.96] (the 0.95±1e-4 band excluded),
measured at BOTH tables=6 and tables=8 so the table-count sizing rule
carries boundary-region recall, not just the saturated cosine-1.0 /
0.987 cohorts.  Random gaussian pairs at dim 64 sit 7σ+ below the
0.95 gate, so false positives are structurally absent.

Expectations asserted (everything else is reported, not gated):
minhash recall = 1.0 on planted word-edit pairs (band miss prob
≈ 2e-5 at J ≥ 0.85 with 8×4 banding); embedding clone recall = 1.0
(structural); embedding noise-pair recall ≥ 0.8 (closed-form ≈ 0.97
at cosine 0.987 with 6 tables); simhash recall is REPORTED only —
one word in ~115 flips ~3±2 of 64 bits, so Hamming ≤ 6 catches most
but not all planted pairs, and that miss rate is the operator's
honest nature (minhash is the high-recall text path).

Prints ONE JSON line; numbers land in BENCH.md's soak section.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DOCS = 5000       # the sf0.1 bench documents table size
BASE_VECS = 2000       # the sf0.1 bench embeddings table size
CLONE_OFFSET = 10_000_000
NOISE_OFFSET = 20_000_000
BOUNDARY_OFFSET = 30_000_000
VARIANT_OFFSET = 50_000_000
VARIANT_CLUSTER = 3000  # > minhash bucket_cap (2000): must be dropped+reported

_VOCAB = (
    "spark batch line column order small sort fast value scan part "
    "vector query agg table hash slow filter customer stream key group "
    "cluster executor arrow parquet row shard merge join scatter gather "
    "index bloom cache spill shuffle stage task core node rack disk "
    "memory page fault lock queue wait signal event clock epoch delta "
    "union project select where having window frame bound range limit "
    "offset fetch insert update delete upsert schema field type null "
    "true false int long float double string binary struct array map "
    "read write open close flush sync seek tell chunk block extent "
    "file path name dir tree leaf root branch graph edge vertex walk "
    "visit mark sweep trace scope frame stack heap slab arena pool "
    "alloc free grow shrink pack unpack encode decode parse emit token "
    "lexer symbol rule state machine accept reject retry backoff jitter "
    "quota budget meter gauge count sum mean sigma skew mode rank tie "
    "split fold train test valid label class score loss grad step rate "
    "decay warm cold hot cool fresh stale dirty clean pure mixed dense "
    "sparse wide narrow deep flat tall short long brief quick slowest "
    "first last next prev head tail mid upper lower inner outer cross "
).split()


def _texts_from_matrix(words: np.ndarray, idx: np.ndarray,
                       lengths: np.ndarray) -> list:
    return [" ".join(words[row[:n]]) for row, n in zip(idx, lengths)]


def build_docs(n_docs: int, out_path: str, with_variant_cluster: bool):
    """Write the doc corpus parquet; return (planted_pair_count, meta)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    words = np.array(_VOCAB)
    v = len(words)
    max_len = 150

    lengths = rng.integers(80, max_len + 1, size=n_docs)
    idx = rng.integers(0, v, size=(n_docs, max_len))
    texts = _texts_from_matrix(words, idx, lengths)

    n_templates = max(1, n_docs // 100)
    t_len = rng.integers(80, max_len + 1, size=n_templates)
    t_idx = rng.integers(0, v, size=(n_templates, max_len))
    templates = _texts_from_matrix(words, t_idx, t_len)

    doc_ids, out_texts = [], []
    n_planted = 0
    for i in range(n_docs):
        k = i % 10
        if k in (7, 8):                      # mass exact duplicate
            text = templates[(i // 10) % n_templates]
        elif k == 9:                         # planted near-dup of i-9
            base = texts[i - 9].split()
            pos = 3 + (i * 7) % (len(base) - 6)
            base[pos] = f"mut{i}"
            text = " ".join(base)
            n_planted += 1
        else:                                # unique
            text = texts[i]
        doc_ids.append(i)
        out_texts.append(text)

    if with_variant_cluster:
        # near-identical but NOT byte-identical: survives exact
        # collapse, floods one LSH bucket past the cap
        stem = templates[0]
        for j in range(VARIANT_CLUSTER):
            doc_ids.append(VARIANT_OFFSET + j)
            out_texts.append(f"{stem} u{j}")

    tbl = pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                    "text": pa.array(out_texts, pa.string())})
    pq.write_table(tbl, out_path)
    return n_planted, {"n_rows": len(doc_ids), "templates": n_templates}


def build_embeddings(n_vecs: int, out_path: str):
    """Write the vector corpus parquet; return (n_clones, noise_expected)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    dim = 64
    base = rng.standard_normal((n_vecs, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    n_planted = max(1, n_vecs // 100)
    clones = (base[:n_planted] * 0.5).astype(np.float32)

    noise_src = base[n_planted:2 * n_planted]
    noisy = noise_src + 0.02 * rng.standard_normal(noise_src.shape)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    cosines = np.sum(noise_src * noisy, axis=1)
    # >= 0.9501 (not round-to-4dp >= 0.95): a pair in [0.94995, 0.95)
    # would otherwise count as expected yet be correctly excluded by
    # the operator's exact >= 0.95 verify, deflating noise_recall
    # (r10 ADVICE — matches the module docstring's stated rule)
    noise_expected = int(np.sum(cosines >= 0.9501))

    # Near-THRESHOLD cohort (r9 verdict #6): the clone cohort proves
    # structural recall at cosine 1.0 and the noise cohort sits at
    # ~0.987 where SRP collision probability is still near-saturated;
    # neither measures the 0.95-boundary region where table count
    # actually matters.  Plant pairs with construction-exact cosines
    # uniform in [0.94, 0.96]: w = c·v + sqrt(1-c²)·u with u ⊥ v.
    # Expectation is computed from the STORED float32 vectors with the
    # operator's own formula (float64 dot / norms), and targets within
    # 1e-4 of 0.95 are nudged out so float32 rounding can never flip a
    # pair across the gate.
    n_boundary = n_planted
    b_src = base[2 * n_planted:2 * n_planted + n_boundary]
    c_tgt = 0.94 + 0.02 * rng.random(n_boundary)
    c_tgt = np.where(np.abs(c_tgt - 0.95) < 1e-4,
                     c_tgt + np.where(c_tgt >= 0.95, 2e-4, -2e-4), c_tgt)
    g = rng.standard_normal(b_src.shape)
    u = g - np.sum(g * b_src, axis=1, keepdims=True) * b_src
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    b_vec = (c_tgt[:, None] * b_src
             + np.sqrt(1.0 - c_tgt ** 2)[:, None] * u).astype(np.float32)
    s32 = b_src.astype(np.float32).astype(np.float64)
    w32 = b_vec.astype(np.float64)
    cos32 = (np.sum(s32 * w32, axis=1)
             / (np.linalg.norm(s32, axis=1) * np.linalg.norm(w32, axis=1)))
    boundary = {
        "n": n_boundary,
        "expected_idx": set(np.nonzero(cos32 >= 0.95)[0].tolist()),
        "cosines": cos32,
    }

    ids = np.concatenate([
        np.arange(n_vecs, dtype=np.int64),
        np.arange(n_planted, dtype=np.int64) + CLONE_OFFSET,
        np.arange(n_planted, dtype=np.int64) + NOISE_OFFSET,
        np.arange(n_boundary, dtype=np.int64) + BOUNDARY_OFFSET,
    ])
    vecs = np.concatenate([base.astype(np.float32), clones,
                           noisy.astype(np.float32), b_vec])
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    pq.write_table(tbl, out_path)
    return n_planted, noise_expected, boundary


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def run_scale(spark, scale: int, tmpdir: str, largest: bool) -> dict:
    from pyspark.sql import functions as F

    from webpeel_spark.operators.dedup import (
        minhash_near_duplicates, simhash_near_duplicates,
    )
    from webpeel_spark.operators.similarity import cosine_near_duplicate_pairs

    n_docs = BASE_DOCS * scale
    n_vecs = BASE_VECS * scale
    docs_path = os.path.join(tmpdir, f"docs_{scale}.parquet")
    vecs_path = os.path.join(tmpdir, f"vecs_{scale}.parquet")
    n_planted, meta = build_docs(n_docs, docs_path, with_variant_cluster=largest)
    n_clones, noise_expected, boundary = build_embeddings(n_vecs, vecs_path)

    docs = spark.read.parquet(docs_path)
    vecs = spark.read.parquet(vecs_path)
    res = {"scale": scale, "n_docs": meta["n_rows"],
           "n_vecs": n_vecs + 2 * n_clones + boundary["n"]}

    planted_found = (
        lambda out: out.filter((F.col("id_b") - F.col("id_a") == 9)
                               & (F.col("id_b") % 10 == 9)
                               & (F.col("id_b") < VARIANT_OFFSET)).count())

    mh_metrics: dict = {}
    out, wall = _timed(lambda: minhash_near_duplicates(
        docs, min_jaccard=0.7, metrics=mh_metrics))
    found = planted_found(out)
    res["minhash"] = {
        "wall_sec": wall, "docs_per_sec": round(meta["n_rows"] / wall, 1),
        "pairs": out.count(), "planted": n_planted, "found": found,
        "recall": round(found / n_planted, 4), "metrics": mh_metrics,
    }

    # bucket_cap lowered to minhash's 2000 (default 10000): the
    # engineered variant cluster is ~3000 mutually-near docs, and the
    # point at scale is that such a cluster lands on the REPORTED
    # dropped-bucket path in both text ops — under the default cap it
    # instead floods the verify join with C(3000,2) legitimate pairs
    # (the output is correct but quadratic in the cluster, which is
    # exactly what a production cap bounds)
    sh_metrics: dict = {}
    out, wall = _timed(lambda: simhash_near_duplicates(
        docs, max_hamming=6, bucket_cap=2000, metrics=sh_metrics))
    found = planted_found(out)
    res["simhash"] = {
        "wall_sec": wall, "docs_per_sec": round(meta["n_rows"] / wall, 1),
        "pairs": out.count(), "planted": n_planted, "found": found,
        "recall": round(found / n_planted, 4), "metrics": sh_metrics,
    }

    # 6- vs 8-table A/B (r9 verdict #6): same corpus, same process, so
    # the table count is the only variable.  "embedding" stays the
    # 6-table production config (growth/gates read it); "embedding_t8"
    # carries the extra-tables measurement.
    n_total_vecs = n_vecs + 2 * n_clones + boundary["n"]
    for key, n_tables in (("embedding", 6), ("embedding_t8", 8)):
        emb_metrics: dict = {}
        out, wall = _timed(lambda: cosine_near_duplicate_pairs(
            vecs, threshold=0.95, tables=n_tables, metrics=emb_metrics))
        out = out.localCheckpoint(eager=True)  # one materialization, 4 readers
        clone_found = out.filter(
            (F.col("id_b") >= CLONE_OFFSET)
            & (F.col("id_b") < NOISE_OFFSET)
            & (F.col("id_b") - F.col("id_a") == CLONE_OFFSET)).count()
        noise_found = out.filter(
            (F.col("id_b") >= NOISE_OFFSET)
            & (F.col("id_b") < BOUNDARY_OFFSET)
            & (F.col("id_b") - F.col("id_a")
               == NOISE_OFFSET - n_clones)).count()
        b_rows = out.filter(
            (F.col("id_b") >= BOUNDARY_OFFSET)
            & (F.col("id_b") < VARIANT_OFFSET)
            & (F.col("id_b") - F.col("id_a")
               == BOUNDARY_OFFSET - 2 * n_clones)).select("id_b").collect()
        b_found_idx = {int(r["id_b"]) - BOUNDARY_OFFSET for r in b_rows}
        expected = boundary["expected_idx"]
        b_hits = len(b_found_idx & expected)
        false_admits = len(b_found_idx - expected)
        res[key] = {
            "tables": n_tables, "wall_sec": wall,
            "vecs_per_sec": round(n_total_vecs / wall, 1),
            "pairs": out.count(),
            "clones": n_clones, "clones_found": clone_found,
            "clone_recall": round(clone_found / n_clones, 4),
            "noise_expected": noise_expected, "noise_found": noise_found,
            "noise_recall": round(noise_found / max(noise_expected, 1), 4),
            "boundary_planted": boundary["n"],
            "boundary_expected": len(expected),
            "boundary_found": b_hits,
            "boundary_recall": round(b_hits / max(len(expected), 1), 4),
            "boundary_false_admits": false_admits,
            "metrics": emb_metrics,
        }
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="4,16",
                    help="comma list of multiples of the 5k-doc bench unit")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from webpeel_spark.session import get_spark
    spark = get_spark(app_name="soak-dedup", cores=args.cores)
    tmpdir = tempfile.mkdtemp(prefix="wp_dedup_soak_")
    try:
        # untimed warm pass at the smallest scale: pays Python worker
        # start + JIT once, like bench.py's _warm_workers
        warm = run_scale(spark, 1, tmpdir, largest=False)
        results = [run_scale(spark, m, tmpdir, largest=(m == max(scales)))
                   for m in scales]

        growth = {}
        if len(results) >= 2:
            lo, hi = results[0], results[-1]
            n_ratio = hi["n_docs"] / lo["n_docs"]
            for op in ("minhash", "simhash", "embedding"):
                growth[op] = {
                    "n_ratio": round(n_ratio, 2),
                    "wall_ratio": round(
                        hi[op]["wall_sec"] / lo[op]["wall_sec"], 2),
                }

        # hard gates (everything else is reported)
        for r in results:
            assert r["minhash"]["recall"] == 1.0, \
                f"minhash recall {r['minhash']['recall']} at scale {r['scale']}"
            assert r["embedding"]["clone_recall"] == 1.0, \
                f"clone recall {r['embedding']['clone_recall']}"
            assert r["embedding"]["noise_recall"] >= 0.8, \
                f"noise recall {r['embedding']['noise_recall']}"
            # the exact >= threshold verify must never admit a planted
            # below-boundary pair, at either table count; boundary
            # RECALL is reported, not gated (it is the measurement)
            for key in ("embedding", "embedding_t8"):
                assert r[key]["boundary_false_admits"] == 0, \
                    f"{key} admitted below-threshold pairs at scale " \
                    f"{r['scale']}"
        largest = results[-1]
        assert largest["minhash"]["metrics"].get("dropped_buckets", 0) > 0, \
            "variant cluster did not trip the minhash bucket cap report"

        try:
            load1, load5, _ = os.getloadavg()
        except OSError:
            load1 = load5 = -1.0
        print(json.dumps({
            "soak": "dedup_scale", "cores": args.cores,
            "warm_pass_scale": warm["scale"], "scales": results,
            "growth": growth,
            "loadavg_1m": round(load1, 2), "loadavg_5m": round(load5, 2),
        }))
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
