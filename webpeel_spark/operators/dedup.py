"""Deduplication operators for training-data pipelines.

Four families, all designed for 100 TB scale:

* exact          — md5 hash-agg (one shuffle, map-side combine);
* MinHash + LSH  — shingle → minhash signature → banded bucket join →
                   verified Jaccard.  Signatures and bands are built
                   with builtin Catalyst expressions (xxhash64,
                   transform, array_min, slice) — fully JVM-side, no
                   Python in the hot path.  The only shuffles are the
                   band-bucket groupBy and the verify join;
* SimHash        — 64-bit signature via a vectorized numpy pandas_udf
                   (bit-counting is not expressible efficiently in
                   Catalyst); near-dups = signatures at Hamming
                   distance ≤ t found by banding the 64 bits;
* n-gram Jaccard — exact pairwise verification used by both families
                   (array_intersect/array_union sizes).

The reference engine has no corpus-level dedup (its JS ``Set`` dedups
links per page, metadata.ts:253) — these operators are the scale
additions the north rule's training-data use case needs.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Mersenne prime for the universal-hash family.  31-bit so that
# (h mod p) * a + b stays < 2^63 (Spark ANSI mode rejects overflow).
_MERSENNE = (1 << 31) - 1


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, dup_count, doc_ids)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("dup_count"),
             F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text",
                order_col: Optional[str] = None) -> DataFrame:
    """Keep one row per distinct text (lowest order_col wins when given).

    Implemented as a window-free reduce: groupBy(hash) + min_by — a
    single shuffle with partial aggregation, no skew risk (hashes are
    uniform).
    """
    h = F.md5(F.col(text_col)).alias("__h")
    if order_col is None:
        return df.dropDuplicates([text_col])
    return (
        df.withColumn("__h", F.md5(F.col(text_col)))
        .groupBy("__h")
        .agg(F.min_by(F.struct(*df.columns), F.col(order_col)).alias("__row"))
        .select("__row.*")
    )


def word_shingles(col, k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string> (JVM-side)."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    shingle = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    return F.array_distinct(
        F.when(n >= k, shingle).otherwise(F.array(F.concat_ws(" ", words)))
    )


def _hash_params(num_hashes: int, seed: int = 7) -> List:
    """Deterministic (a, b) pairs for the universal hash family."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _MERSENNE - 1), rng.randrange(0, _MERSENNE - 1))
            for _ in range(num_hashes)]


def minhash_signature(col, num_hashes: int = 32, seed: int = 7,
                      pre_hashed: bool = False) -> Column:
    """array<bigint> MinHash signature over a shingle array column.

    h_i(s) = (a_i * xxhash64(s) + b_i) mod p, signature_i = min over
    shingles — all builtin expressions.  The shared ``base`` subtree is
    computed once per row via subexpression elimination (measured: this
    32-column shape beats a zip_with reformulation 10×).  With
    ``pre_hashed`` the column already holds xxhash64 values.
    """
    params = _hash_params(num_hashes, seed)
    if pre_hashed:
        base = F.transform(col, lambda h: F.pmod(h, F.lit(_MERSENNE)))
    else:
        base = F.transform(col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    sig_cols = [
        F.array_min(
            F.transform(base, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MERSENNE)))
        )
        for a, b in params
    ]
    return F.array(*sig_cols)


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.7,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs: (id_a, id_b, jaccard) with jaccard ≥ threshold.

    Plan shape: one narrow stage builds shingles+signature per doc; one
    explode+groupBy finds band-bucket candidates (shuffle #1 on
    uniformly-hashed band keys — no skew); one self-join verifies exact
    shingle Jaccard on candidates only (shuffle #2, candidate set is
    tiny relative to input).  Scales linearly in corpus size for
    corpora whose duplicate rate is bounded.
    """
    from ..plans.partitioning import fan_out

    rows_per_band = num_hashes // bands
    sigs = (
        fan_out(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col).alias("id"),
            # hashed distinct shingles: verify-join Jaccard on bigints is
            # ~5× cheaper than on the original shingle strings, and the
            # signature needs only the hashes anyway
            F.array_distinct(
                F.transform(word_shingles(F.col(text_col), shingle_k),
                            lambda s: F.xxhash64(s))
            ).alias("shingles"),
        )
        .withColumn("sig", minhash_signature(F.col("shingles"), num_hashes, seed,
                                             pre_hashed=True))
        .persist()  # consumed 3× below (banding + both verify sides); at
        # 10^12 rows write signatures to a table instead of caching
    )

    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    candidates = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_set("id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode(_pairs_expr(F.sort_array("ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )

    left = sigs.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    right = sigs.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter  # |A∪B| without a 2nd array op
    verified = (
        candidates.join(left, "id_a").join(right, "id_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def _pairs_expr(ids_col) -> Column:
    """All ordered pairs (a<b) from a sorted array — pure Catalyst."""
    return F.flatten(
        F.transform(
            ids_col,
            lambda a, i: F.transform(
                F.slice(ids_col, i + 2, F.greatest(F.size(ids_col) - i - 1, F.lit(0))),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    block_col: Optional[str] = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard within blocks (lang/length bucket).

    Quadratic within a block — use only with strong blocking or small
    partitions; minhash_near_duplicates is the scale path.

    Pair pruning before any array work: J(A,B) ≥ t requires
    t ≤ |A|/|B| ≤ 1/t, so pairs failing the size-ratio test are dropped
    on two int columns.  Shingles are xxhash64-hashed so the intersect
    compares bigints, not strings.
    """
    from ..plans.partitioning import fan_out

    base = fan_out(df.select(F.col(id_col), F.col(text_col),
                             *( [F.col(block_col)] if block_col else [] ))).select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(word_shingles(F.col(text_col), shingle_k),
                        lambda s: F.xxhash64(s))
        ).alias("sh"),
        (F.col(block_col) if block_col else F.lit(0)).alias("blk"),
    ).withColumn("n", F.size("sh")).persist()
    a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                    F.col("n").alias("n_a"), "blk")
    b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                    F.col("n").alias("n_b"), "blk")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.col("n_a") + F.col("n_b") - inter
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.col("n_a") >= F.col("n_b") * min_jaccard)
                & (F.col("n_b") >= F.col("n_a") * min_jaccard))
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


# ── SimHash ──────────────────────────────────────────────────────────────

def _make_simhash_udf():
    """64-bit SimHash pandas_udf — created lazily so the module imports
    cleanly on executors (no DDL parsing at import time).

    Token hashing is md5-truncated-to-64-bits (C speed, deterministic
    across processes — Python's hash() is per-run salted; two crc32
    passes are NOT independent: CRC is affine, so the high word would
    be a deterministic function of the low word and SimHash quality
    collapses — measured as a 3× near-dup-pair explosion).  Weighted
    votes come from token COUNTS so each distinct token hashes once."""

    def simhash(texts: pd.Series) -> pd.Series:
        from collections import Counter
        from hashlib import md5

        import numpy as np

        out = np.zeros(len(texts), dtype=np.int64)
        for row_i, t in enumerate(texts):
            if not t:
                continue
            counts = Counter(t.lower().split())
            if not counts:
                continue
            n_tok = sum(counts.values())
            uniq = list(counts)
            hashes = np.fromiter(
                (int.from_bytes(md5(tok.encode("utf-8")).digest()[:8], "little")
                 for tok in uniq),
                dtype=np.uint64, count=len(uniq),
            )
            weights = np.fromiter((counts[tok] for tok in uniq),
                                  dtype=np.int64, count=len(uniq))
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            votes = (bits * weights[:, None]).sum(axis=0) * 2 - n_tok
            sig = np.uint64(0)
            for bit_idx in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(bit_idx)
            out[row_i] = np.int64(sig)
        return pd.Series(out)

    return pandas_udf(simhash, "long")


def hash_token(token: str) -> int:
    """Deterministic 64-bit FNV-1a (Python's hash() is salted per run)."""
    h = 0xCBF29CE484222325
    for byte in token.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    from ..plans.partitioning import fan_out

    simhash64 = _make_simhash_udf()
    return fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("simhash"))


def simhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash banding: split 64 bits into 4 16-bit
    bands; pairs agreeing on ≥1 band are candidates (catches all pairs
    with Hamming distance ≤ 3), then verified by exact popcount."""
    sigs = simhash_signatures(df, text_col, id_col)
    bands = sigs.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned(F.col("simhash"), i * 16)
                     .bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for i in range(4)
        ])).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.key").persist()
    # persisted: the self-join below would otherwise run the SimHash
    # UDF twice over the full corpus

    candidates = (
        bands.alias("x").join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band")) & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"),
                F.col("x.simhash").alias("sig_a"), F.col("y.simhash").alias("sig_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        candidates.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
