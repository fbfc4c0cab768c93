"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED (the container has no image/audio
libraries — see `decode_image_stub`): the Spark-side contract — schema,
batch shape, partitioning, column pruning (binary bytes only enter the
executor when the stage consumes them) — is real and tested
(tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, magic string, "
    "width int, height int, feature array<float>"
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<!DO": "html",
}


def sniff_magic(prefix: bytes) -> str:
    for sig, name in _MAGIC.items():
        if prefix.startswith(sig):
            return name
    return "unknown"


try:  # real decode backend when importable (the plots.py backend pattern)
    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


def _decode_image_pil(payload: bytes) -> tuple[int, int, list[float]]:
    """PIL backend: true (width, height) + 8-bucket luminance histogram of a
    16×16 grayscale thumbnail as the stand-in feature vector (same shape
    and normalisation as the stub, so downstream schemas are identical)."""
    import io

    import numpy as np

    img = _PILImage.open(io.BytesIO(payload))
    width, height = img.size
    px = np.asarray(img.convert("L").resize((16, 16)), dtype=np.int64).ravel()
    feat = np.bincount(px // 32, minlength=8)[:8].astype(np.float64)
    total = float(feat.sum()) or 1.0
    return width, height, (feat / total).tolist()


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Feature-flagged decode: PIL for payloads whose magic bytes identify a
    real image format (when PIL is importable), the deterministic stub for
    everything else — so the fixture corpora (html bytes) produce identical
    values with or without PIL installed, and the suite stays green either
    way (tests/test_multimodal.py)."""
    if HAVE_PIL and sniff_magic(payload[:4]) in ("png", "jpeg"):
        try:
            return _decode_image_pil(payload)
        except Exception:  # truncated/corrupt image → deterministic fallback
            return decode_image_stub(payload)
    return decode_image_stub(payload)


def decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: real deployments swap in PIL/libvips here
    (decode_image above does exactly that when PIL is importable).

    Returns (width, height, 8-dim feature) derived from the bytes — stable,
    so tests can assert exact values through the full Spark plumbing.
    """
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    # 8-byte-bucket histogram as the stand-in feature vector
    feat = [0.0] * 8
    for i, b in enumerate(payload[:256]):
        feat[b % 8] += 1.0
    total = sum(feat) or 1.0
    return width, height, [f / total for f in feat]


def extract_features(media: DataFrame, batch_size: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batch shape matters: payloads are large, so callers should set
    spark.sql.execution.arrow.maxRecordsPerBatch low (session.py default
    4096; lower for >1 MiB media).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                w, h, feat = decode_image(payload)
                rows.append(
                    (
                        int(mid),
                        kind,
                        len(payload),
                        sniff_magic(payload[:4]),
                        w,
                        h,
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "magic",
                    "width", "height", "feature",
                ],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def pages_to_media(pages: DataFrame) -> DataFrame:
    """Adapter: the pages table's html bytes as a media table (the only
    binary column in the fixtures)."""
    return pages.select(
        F.xxhash64("url").alias("media_id"),
        F.lit("html").alias("kind"),
        F.col("html").alias("payload"),
        F.create_map(F.lit("url"), F.col("url")).alias("meta"),
    )
