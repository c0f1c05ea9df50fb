"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Real pipelines carry images/audio/video as binary columns next to typed
metadata and run decode / feature-extraction / resize / frame-sampling
as Pandas UDFs.  This container has no image/audio libraries, so the
DECODE step is stubbed (``decode_image`` raises ``NotImplementedError``
unless Pillow appears; ``fake_decode_meta`` is the deterministic stand-
in) — but everything Spark-side is REAL and tested: the binary schema,
the ``mapInPandas`` batch shape (pandas Series of ``bytes``), the
output schema contract, and partition-preserving execution.

Scale shape: mapInPandas streams Arrow record batches through Python —
no per-row pickling; decode parallelism = partition count; no shuffle.
"""

from __future__ import annotations

import hashlib

__all__ = [
    "with_binary_payload",
    "binary_features",
    "decode_image",
    "fake_decode_meta",
    "resize_meta",
    "sample_frames",
]


def with_binary_payload(df, text_col: str = "text", payload_col: str = "payload"):
    """Derive an opaque binary column (UTF-8 bytes of the text — the
    deterministic stand-in for image bytes) + its media-type metadata."""
    from pyspark.sql import functions as F

    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def binary_features(df, id_col: str, payload_col: str = "payload"):
    """Arrow-batched feature extraction over a binary column:
    → (id, n_bytes, head_hash) where head_hash is the shared 60-bit md5
    of the first 8 payload bytes (oracle-checkable in DuckDB)."""
    import pandas as pd

    out_schema = f"{id_col} bigint, n_bytes bigint, head_hash bigint"

    def extract(batches):
        for pdf in batches:
            payload = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "head_hash": payload.map(
                        lambda b: int(hashlib.md5(bytes(b)[:8]).hexdigest()[:15], 16)
                    ).astype("int64"),
                }
            )

    return df.mapInPandas(extract, schema=out_schema)


def decode_image(payload: bytes):
    """Decode an image payload → (width, height, mode).

    STUB: Pillow is not available in this container; the Spark plumbing
    around this call (binary column → mapInPandas → struct output) is
    real and tested via ``fake_decode_meta``."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed here; "
            "use fake_decode_meta for the deterministic test path"
        ) from e
    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, img.mode


def fake_decode_meta(payload: bytes):
    """Deterministic stand-in for decode: pretends the payload is a
    (w × h) image derived from its bytes."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, "L"


def resize_meta(df, id_col: str, payload_col: str = "payload", target: int = 224):
    """RESIZE stage: decode (stubbed via ``fake_decode_meta``) → compute
    aspect-preserving target dimensions to fit ``target``².  A real
    pipeline would also emit the resized pixels; the dimension math, the
    Arrow batch shape, and the output schema contract are the real,
    tested parts.  → (id, width, height, out_w, out_h)."""
    import math as _math

    import pandas as pd

    out_schema = (
        f"{id_col} bigint, width bigint, height bigint, out_w bigint, out_h bigint"
    )

    def resize(batches):
        for pdf in batches:
            rows = {id_col: [], "width": [], "height": [], "out_w": [], "out_h": []}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                w, h, _ = fake_decode_meta(bytes(b))
                scale = min(target / w, target / h)
                rows[id_col].append(i)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_w"].append(max(1, int(_math.floor(w * scale))))
                rows["out_h"].append(max(1, int(_math.floor(h * scale))))
            yield pd.DataFrame(rows)

    return df.mapInPandas(resize, schema=out_schema)


def sample_frames(
    df,
    id_col: str,
    payload_col: str = "payload",
    frame_bytes: int = 16,
    every: int = 4,
):
    """FRAME-SAMPLE stage: treat the payload as a video of fixed-size
    frames and keep every ``every``-th one — the 1→N ``mapInPandas``
    shape (one input row explodes into many output rows inside the same
    Arrow batch, no shuffle).  → (id, frame_idx, frame_hash)."""
    import pandas as pd

    out_schema = f"{id_col} bigint, frame_idx bigint, frame_hash bigint"

    def sample(batches):
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                for fi in range(0, len(raw) // frame_bytes, every):
                    frame = raw[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(i)
                    idxs.append(fi)
                    hashes.append(
                        int(hashlib.md5(frame).hexdigest()[:15], 16)
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return df.mapInPandas(sample, schema=out_schema)
