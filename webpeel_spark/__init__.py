"""webpeel_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the capabilities of webpeel/webpeel
(reference at /root/reference, TypeScript) as a Spark batch pipeline:

* ``webpeel_spark.dom``       — dependency-free DOM + CSS selectors
* ``webpeel_spark.pure``      — pure-Python extraction functions
                                 (no Spark imports; unit-testable alone)
* ``webpeel_spark.operators`` — Spark operators (Arrow-batched UDF stages,
                                 dedup, similarity, text analysis)
* ``webpeel_spark.sources``   — readers + the deterministic synthetic
                                 Common-Crawl-style pages corpus
* ``webpeel_spark.plans``     — partitioning/salting, checkpointed
                                 progress tables, resume logic
"""

__version__ = "0.1.0"
