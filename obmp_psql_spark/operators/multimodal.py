"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
functions via ``mapInPandas``.

Kernels come in two flavors selected by the ``kernel`` parameter:
``"pil"`` uses Pillow when importable (real decode/resize — this
container ships without image libraries, so PIL-equipped deployments
get the real path with zero API change); ``"fake"`` computes
deterministic fake metadata/bytes from the payload (the differential
oracle and the no-image-libs fallback); ``"auto"`` (default) picks
pil when available, fake otherwise. The Spark-side contract — schema,
batch iteration, partitioning, UDF signature — is identical for both,
so swapping kernels changes no plan shape.

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

try:  # optional dependency: real image kernels when present
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None

HAS_PIL = _PILImage is not None

META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, content_md5 string"
)


def _resolve_kernel(kernel: str) -> str:
    if kernel == "auto":
        return "pil" if HAS_PIL else "fake"
    if kernel == "pil" and not HAS_PIL:
        raise ImportError("kernel='pil' requested but Pillow is not installed")
    if kernel not in ("pil", "fake"):
        raise ValueError(f"unknown kernel {kernel!r}; use 'auto'|'pil'|'fake'")
    return kernel


def decode_image_meta(payload: bytes, kernel: str = "auto") -> dict:
    """Payload -> typed metadata. ``pil`` kernel reads the real
    format/dimensions (undecodable payloads get format=None and 0x0);
    ``fake`` derives deterministic values from the byte count — the
    oracle-reproducible path used when no image library exists."""
    import hashlib

    n = len(payload)
    if _resolve_kernel(kernel) == "pil":
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                fmt, w, h = (im.format or "").lower(), im.width, im.height
        except Exception:  # undecodable bytes: typed nulls, not a crash
            fmt, w, h = None, 0, 0
        return {"n_bytes": n, "format": fmt, "width": w, "height": h,
                "content_md5": hashlib.md5(payload).hexdigest()}
    return {
        "n_bytes": n,
        "format": ["png", "jpeg", "webp"][n % 3],
        "width": 64 + (n % 640),
        "height": 64 + ((n * 7) % 480),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


def decode_image_pixels(payload: bytes):
    """Payload -> HxWxC uint8 pixel array (PIL kernel only)."""
    if not HAS_PIL:
        raise NotImplementedError(
            "pixel decode requires PIL/libvips; install Pillow to enable")
    import io

    import numpy as np

    with _PILImage.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


def extract_image_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       kernel: str = "auto") -> DataFrame:
    """Binary column -> typed metadata via mapInPandas (Arrow batches,
    one Python roundtrip per batch, not per row)."""
    kernel = _resolve_kernel(kernel)  # resolve driver-side: fail fast

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_image_meta(p, kernel) for p in pdf[payload_col]]
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
                  id_col: str = "doc_id", payload_col: str = "payload",
                  kernel: str = "auto") -> DataFrame:
    """Resize: (doc_id, width, height, payload). The ``pil`` kernel
    decodes, ``Image.resize``s, and re-encodes PNG (undecodable
    payloads pass through untouched at 0x0); the ``fake`` kernel
    re-derives a payload slice sized proportionally to target area so
    downstream size-dependent logic stays exercisable without image
    libs. Plan shape (Arrow batches, one roundtrip per batch, binary
    in/out) is the production contract for both."""
    kernel = _resolve_kernel(kernel)

    def resize_one(p: bytes):
        if kernel == "pil":
            import io

            try:
                with _PILImage.open(io.BytesIO(p)) as im:
                    out = io.BytesIO()
                    im.convert("RGB").resize((target_w, target_h)) \
                      .save(out, format="PNG")
                    return target_w, target_h, out.getvalue()
            except Exception:
                return 0, 0, p
        meta = decode_image_meta(p, kernel)
        scale = (target_w * target_h) / max(1, meta["width"] * meta["height"])
        n_out = max(1, int(len(p) * min(1.0, scale)))
        return target_w, target_h, p[:n_out]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = [(did, *resize_one(p))
                    for did, p in zip(pdf[id_col], pdf[payload_col])]
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
