"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a stub
(``decode_image`` raises NotImplementedError; ``fake_feature_extract`` is
the deterministic stand-in used by tests and queries). Everything around
it — schema, batch iteration, partition-preserving plan shape, typed
output — is the real operator: swapping the stub for PIL/librosa changes
one function body, not the plan.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
binary payloads stay in the executor — nothing collects to the driver.
Batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
— for multi-MB blobs set it low (e.g. 64) so a batch fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, first_byte int, "
    "checksum_prefix string"
)


def with_binary_payload(
    docs: DataFrame, text_col: str = "text", media_type: str = "image/fake"
) -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of the text stand in
    for real media payloads) plus its type tag."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")) \
               .withColumn("media_type", F.lit(media_type))


def decode_image(payload: bytes) -> "object":
    """Real decode would return an ndarray; no codec libs in this
    environment."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available; use "
        "fake_feature_extract for the deterministic pipeline-shape test"
    )


def fake_feature_extract(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: (n_bytes, first_byte, md5-prefix)."""
    import hashlib

    return (
        len(payload),
        payload[0] if payload else -1,
        hashlib.md5(payload).hexdigest()[:8],
    )


def extract_media_meta(df: DataFrame) -> DataFrame:
    """mapInPandas metadata/feature extraction over binary payloads.

    One Arrow batch in, one out; the stub body is where resize /
    frame-sample / spectrogram code goes.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_feature_extract)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [f[0] for f in feats],
                "first_byte": [f[1] for f in feats],
                "checksum_prefix": [f[2] for f in feats],
            })

    return df.select("doc_id", "media_type", "payload").mapInPandas(
        op, schema=MEDIA_META_SCHEMA
    )
