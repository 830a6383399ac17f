"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
functions via ``mapInPandas``.

The decode/feature-extract kernels are STUBBED (this container has no
image/audio libraries): ``decode_image_meta`` computes deterministic
fake dimensions from the payload bytes, and ``decode_image_pixels``
raises NotImplementedError where a real ``PIL.Image.open`` call would
go. The Spark-side contract — schema, batch iteration, partitioning,
UDF signature — is real and tested; swapping the kernel for a real
decoder changes no plan shape.

Scale notes: binary payloads ride as Parquet BYTE_ARRAY; keep them in
their own column family/table keyed by content hash so metadata-only
queries never scan blobs; ``spark.sql.files.maxPartitionBytes`` sizes
scan partitions so one batch of payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, content_md5 string"
)


def decode_image_meta(payload: bytes) -> dict:
    """STUB decode: deterministic fake metadata derived from payload
    bytes. A real implementation calls PIL/libvips here."""
    import hashlib

    n = len(payload)
    return {
        "n_bytes": n,
        "format": ["png", "jpeg", "webp"][n % 3],
        "width": 64 + (n % 640),
        "height": 64 + ((n * 7) % 480),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


def decode_image_pixels(payload: bytes):
    """Real pixel decode — requires an image library not present in
    this environment."""
    raise NotImplementedError(
        "pixel decode requires PIL/libvips; install and replace this stub")


def extract_image_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """Binary column -> typed metadata via mapInPandas (Arrow batches,
    one Python roundtrip per batch, not per row)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_image_meta(p) for p in pdf[payload_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema=META_SCHEMA)


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_index,
    frame_payload) rows; the decoder is stubbed to slice the payload
    deterministically (a real impl hands the batch to ffmpeg)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                n_frames = max(1, len(p) // 100)
                for i in range(0, n_frames, every_n):
                    rows.append((did, i, p[i * 100:(i + 1) * 100]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_index", "frame_payload"])
            rows = []

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema="doc_id long, frame_index int, frame_payload binary")


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224,
                  id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Resize plumbing: (doc_id, width, height, payload) with the
    kernel STUBBED — the fake 'resize' re-derives a payload slice
    sized proportionally to target area so downstream size-dependent
    logic is exercisable; a real impl calls PIL.Image.resize on the
    decoded pixels. Plan shape (Arrow batches, one roundtrip per
    batch, binary in/out) is the production contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                meta = decode_image_meta(p)
                scale = (target_w * target_h) / max(1, meta["width"] * meta["height"])
                n_out = max(1, int(len(p) * min(1.0, scale)))
                outs.append((did, target_w, target_h, p[:n_out]))
            yield pd.DataFrame(
                outs, columns=["doc_id", "width", "height", "payload"])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema="doc_id long, width int, height int, payload binary")


def extract_image_features(df: DataFrame, dim: int = 16,
                           id_col: str = "doc_id",
                           payload_col: str = "payload") -> DataFrame:
    """Feature-extraction plumbing: binary -> float vector
    (array<double>), the shape an image-embedding model (CLIP/CNN)
    produces. The kernel is a deterministic fake — md5-seeded byte
    histogram projection — so the output feeds the ANN/similarity
    operators (cosine_topk, lsh_topk, ivf_topk) for end-to-end
    multimodal-retrieval pipelines without an ML runtime."""
    import hashlib

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, vecs = [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                seed = int.from_bytes(hashlib.md5(p).digest()[:4], "big")
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                rng = np.random.default_rng(seed)
                v = hist + rng.standard_normal(dim) * 0.01
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).tolist())
                ids.append(did)
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, schema="doc_id long, embedding array<double>")
