"""Similarity search over embedding columns (array<float>).

Two paths:

* ``cosine_topk``     — brute-force exact top-k against one query
                        vector.  The dot product is a builtin
                        ``aggregate(zip_with(...))`` expression
                        (JVM-side); top-k is orderBy+limit which Spark
                        executes as per-partition TakeOrdered + driver
                        merge — no full sort, no shuffle of the data.
* ``srp_lsh_topk``    — the scale path: signed-random-projection LSH.
                        A seeded hyperplane matrix (numpy, broadcast in
                        the UDF closure) maps vectors to b-bit buckets
                        with one vectorized matmul per Arrow batch;
                        search touches only the query's bucket (plus
                        multiprobe neighbours), so cost per query drops
                        from O(N) to O(N / 2^bits) expected.

Also ``cosine_near_duplicate_pairs`` — embedding near-dup detection for
training-data dedup (bucket join + exact verify).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_digits: int = 4) -> DataFrame:
    """Exact top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity_col(F.col(vec_col), q), round_digits).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _srp_planes(dim: int, bits: int, seed: int) -> "object":
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits)).astype("float64")


def srp_bucket_udf(dim: int, bits: int = 12, seed: int = 13):
    """pandas_udf: array<float> → int bucket via signed random projection.

    One numpy matmul per Arrow batch — the planes live in the closure
    and are created once per executor (broadcast-equivalent).
    """
    import numpy as np

    planes = _srp_planes(dim, bits, seed)
    powers = (1 << np.arange(bits)).astype("int64")

    @pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack([np.asarray(v, dtype="float64") for v in vecs])
        signs = (mat @ planes) > 0
        return pd.Series((signs @ powers).astype("int64"))

    return bucket


def srp_lsh_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 bits: int = 8, seed: int = 13,
                 multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: search only the query's SRP bucket (+ neighbours
    at Hamming distance ≤ multiprobe)."""
    import numpy as np

    dim = len(query_vec)
    planes = _srp_planes(dim, bits, seed)
    qsig = (np.asarray(query_vec, dtype="float64") @ planes) > 0
    powers = (1 << np.arange(bits)).astype("int64")
    qbucket = int(qsig @ powers)

    probe_buckets = {qbucket}
    if multiprobe >= 1:
        for i in range(bits):
            probe_buckets.add(qbucket ^ (1 << i))
    if multiprobe >= 2:
        for i in range(bits):
            for j in range(i + 1, bits):
                probe_buckets.add(qbucket ^ (1 << i) ^ (1 << j))

    bucketed = df.withColumn("__bucket", srp_bucket_udf(dim, bits, seed)(F.col(vec_col)))
    candidates = bucketed.filter(F.col("__bucket").isin(list(probe_buckets)))
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def cosine_near_duplicate_pairs(df: DataFrame, threshold: float = 0.95,
                                vec_col: str = "embedding",
                                id_col: str = "vec_id",
                                bits: int = 8, seed: int = 13) -> DataFrame:
    """Embedding near-dup pairs: SRP bucket join (same-bucket candidates)
    then exact cosine verify.  At scale the bucket count grows with
    corpus size (bits ↑) to keep per-bucket candidate sets bounded."""
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], f"id_a long, id_b long, cosine double"
        )
    from ..plans.partitioning import fan_out

    dim = len(first[0])
    bucketed = fan_out(df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )).withColumn("__bucket", srp_bucket_udf(dim, bits, seed)(F.col("v"))
    ).persist()  # self-joined below — avoid running the bucket UDF twice

    a = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "__bucket")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "__bucket")
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_similarity_col(F.col("v_a"), F.col("v_b")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
