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


# ---------------------------------------------------------------------------
# Frame sampling (video → frame rows) and resize plumbing

FRAME_BYTES = 256
FRAME_MS = 40  # 25 fps

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, ts_ms int, n_bytes int, "
    "frame_payload binary, checksum_prefix string"
)


def fake_frames(payload: bytes) -> list[bytes]:
    """Deterministic stand-in for a video demuxer: the payload sliced
    into fixed ``FRAME_BYTES`` chunks (last chunk ragged). A real
    implementation swaps this one function for av/ffmpeg frame
    iteration — the fan-out plan shape is identical."""
    return [
        payload[i:i + FRAME_BYTES]
        for i in range(0, len(payload), FRAME_BYTES)
    ]


def frame_sample(
    df: DataFrame, every_n: int = 2, max_frames: int = 8
) -> DataFrame:
    """Sample every ``every_n``-th frame (≤ ``max_frames``) from each
    binary payload: ONE input row fans out to k frame rows — the
    mapInPandas generator shape for demux-style operators (explode-like
    fan-out without materializing all frames first).

    Output carries the frame payload (downstream embeds/augments it)
    plus (frame_idx, ts_ms, n_bytes, md5-prefix). Partition-preserving:
    no shuffle — frames stay on their video's executor.
    """

    if every_n <= 0 or max_frames <= 0:
        raise ValueError(
            f"every_n/max_frames must be positive, got {every_n}/{max_frames}"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "frame_idx", "ts_ms", "n_bytes",
                "frame_payload", "checksum_prefix",
            )}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = fake_frames(payload)[::every_n][:max_frames]
                for j, fr in enumerate(frames):
                    out["doc_id"].append(did)
                    out["frame_idx"].append(j * every_n)
                    out["ts_ms"].append(j * every_n * FRAME_MS)
                    out["n_bytes"].append(len(fr))
                    out["frame_payload"].append(fr)
                    out["checksum_prefix"].append(
                        hashlib.md5(fr).hexdigest()[:8]
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        op, schema=FRAME_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, dst_w int, dst_h int, "
    "scale double"
)


def resize_meta(
    df: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Resize plumbing: source dimensions derive deterministically from
    the payload (a real decoder reads them from the header — one
    function body swap), target is aspect-preserving fit into
    (target_w, target_h). One row per row, no shuffle; the scale factor
    is what an augmentation stage consumes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            src_w = (n % 640 + 16).astype("int32")
            src_h = (n % 480 + 16).astype("int32")
            scale = pd.concat(
                [target_w / src_w, target_h / src_h], axis=1
            ).min(axis=1).clip(upper=1.0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "src_w": src_w,
                "src_h": src_h,
                "dst_w": (src_w * scale).astype("int32"),
                "dst_h": (src_h * scale).astype("int32"),
                "scale": scale.round(6),
            })

    return df.select("doc_id", "payload").mapInPandas(
        op, schema=RESIZE_SCHEMA
    )
