"""Multimodal column plumbing — image/audio/video as opaque binary.

``decode_stub=True`` (default) produces a deterministic fake feature
vector from the bytes; ``decode_stub=False`` probes for PIL at the
decode site (the OCR-seam pattern) and decodes real pixel features
when it is importable — in this container (no PIL/ffmpeg) the probe
misses and the row gets an ``unimplemented:`` status instead.
Header METADATA decode is real as of round 6: every payload is sniffed
by magic bytes (pure/imagemeta.py, stdlib-only) and image rows carry
(format, width, height) — the fields a training pipeline actually
filters on (min-resolution gates, format routing).  Everything
Spark-side — schema, Arrow batch shape, ``mapInPandas`` signature,
partitioning — is real and tested; swapping in a pixel decoder is a
one-function change.

Schema convention for a multimodal table:
    (item_id: long, kind: string, payload: binary,
     meta: struct<width:int, height:int, sample_rate:int, duration_ms:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, IntegerType, LongType, StringType, StructField,
    StructType,
)

FEATURE_SCHEMA = StructType([
    StructField("item_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("features", ArrayType(FloatType())),
    StructField("status", StringType()),
])


def _fake_features(payload: bytes, dim: int = 16):
    """Deterministic pseudo-features: sha256 bytes → [0,1) floats."""
    import numpy as np

    digest = hashlib.sha256(payload).digest()
    reps = (dim * 4 + len(digest) - 1) // len(digest)
    raw = (digest * reps)[: dim * 4]
    arr = np.frombuffer(raw, dtype=np.uint32, count=dim).astype("float64")
    return (arr / 2**32).astype("float32")


def _pixel_decoder():
    """Capability probe (the OCR-seam pattern, pure/ocr.py:41): return
    PIL's Image module when importable, else None.  Probed per call so
    tests can inject a stub engine via sys.modules, exactly like
    tests/test_ocr_seam.py does for pytesseract."""
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except Exception:
        return None


def _decode_real(payload: bytes, kind: str, feature_dim: int = 16):
    """Real pixel features when a decoder is present (round-7: no
    longer an unconditional raise).

    Images: PIL decode → grayscale → feature_dim-pixel thumbnail →
    [0,1] floats (deterministic for a given payload + PIL build).
    Audio/video stay a DECLARED seam: ffmpeg is not in this container
    and a fake sample decode would be padding, not plumbing."""
    if kind != "image":
        raise NotImplementedError(
            f"real {kind} decode requires ffmpeg, which is not available "
            "in this environment — plug a decoder in here")
    Image = _pixel_decoder()
    if Image is None:
        raise NotImplementedError(
            "real image decode requires PIL, which is not available in "
            "this environment — plug a decoder in here")
    import io

    import numpy as np

    img = Image.open(io.BytesIO(payload)).convert("L")
    side = max(1, int(feature_dim ** 0.5))
    rows = max(1, -(-feature_dim // side))  # ceil
    img = img.resize((side, rows))
    arr = np.asarray(img, dtype="float64").reshape(-1)[:feature_dim]
    if arr.size < feature_dim:
        arr = np.pad(arr, (0, feature_dim - arr.size))
    return (arr / 255.0).astype("float32").tolist()


def extract_features(df: DataFrame, decode_stub: bool = True,
                     feature_dim: int = 16,
                     num_partitions: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    df columns: item_id long, kind string, payload binary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..pure.imagemeta import parse_image_header

        for pdf in batches:
            rows = []
            for item_id, kind, payload in zip(
                pdf["item_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:
                    payload = b""
                elif isinstance(payload, memoryview):
                    payload = payload.tobytes()
                meta = parse_image_header(payload)
                try:
                    if decode_stub:
                        feats = _fake_features(payload, feature_dim).tolist()
                    else:
                        feats = _decode_real(payload, kind, feature_dim)
                    status = "ok"
                except NotImplementedError as e:
                    feats = []
                    status = f"unimplemented: {e}"
                except Exception as e:  # bad payload under a real decoder
                    feats = []
                    status = f"error: {type(e).__name__}: {e}"
                rows.append((
                    int(item_id), kind, len(payload),
                    hashlib.sha256(payload).hexdigest(),
                    meta["format"] if meta else None,
                    meta["width"] if meta else None,
                    meta["height"] if meta else None,
                    feats, status,
                ))
            yield pd.DataFrame(
                rows,
                columns=["item_id", "kind", "n_bytes", "sha256",
                         "format", "width", "height", "features", "status"],
            )

    pruned = df.select("item_id", "kind", "payload")
    if num_partitions:
        pruned = pruned.repartition(num_partitions, F.xxhash64(F.col("item_id").cast("string")))
    return pruned.mapInPandas(run, FEATURE_SCHEMA)


def synthetic_multimodal_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake multimodal table for plumbing tests."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        rows.append((i, kind, payload))
    return spark.createDataFrame(rows, "item_id long, kind string, payload binary")
