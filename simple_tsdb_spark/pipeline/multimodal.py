"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column (or a reference to object storage for very large blobs)
next to a typed metadata struct; run decode / feature-extraction as
Arrow-batched ``mapInPandas`` so each Python worker sees columnar batches,
never rows.  The decode step itself is STUBBED here (no image/audio libs
in this container — see ``DecoderNotAvailable``), with a deterministic
fake decoder so the Spark-side plumbing — schema, batch iteration,
partition-parallelism — is real and tested.

``attach_blob``/``extract_blob_features`` use the documents table's text
bytes as the stand-in payload, which also gives them a DuckDB oracle
(byte length / md5 are engine-portable).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DecoderNotAvailable(NotImplementedError):
    """Raised by the real decode path: media libraries are not bundled."""


def attach_blob(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a payload column as (binary blob, metadata struct)."""
    blob = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.length(blob).alias("n_bytes"),
        F.lit("utf-8").alias("encoding"),
    )
    return df.select(F.col(id_col), blob.alias("payload"), meta.alias("media_meta"))


def attach_blob_meta_oracle(table: str = "documents") -> str:
    """Oracle for the metadata surface (structs flattened for comparison)."""
    return f"""
SELECT doc_id, 'text/plain' AS mime,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       md5(text) AS payload_md5
FROM {table}
"""


def decode_media(payload: bytes, mime: str) -> object:
    """The real decode hook — image/audio/video libs are not bundled."""
    raise DecoderNotAvailable(
        f"no decoder for {mime}: bundle pillow/torchaudio/pyav and replace "
        "the fake decoder in extract_blob_features"
    )


def _fake_decode_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real decoder: (width, height, mean)
    derived from the bytes, so tests can assert plumbing end-to-end."""
    n = len(payload)
    width = (n % 64) + 1
    height = (n // 64) % 64 + 1
    mean = (sum(payload[:32]) / max(1, min(n, 32))) / 255.0
    return width, height, mean


def resize_images(
    df: DataFrame, *, width: int, height: int, use_real_decoder: bool = False
) -> DataFrame:
    """Resize plumbing over (doc_id, payload, media_meta): real decode is
    stubbed (DecoderNotAvailable); the fake path emits a deterministic
    resized-payload digest so schema/batching are exercised end-to-end.

    Output: doc_id, out_width, out_height, resized_md5.
    """
    import hashlib

    w, h = int(width), int(height)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_decoder:
                for m, p in zip(pdf["mime"], pdf["payload"]):
                    decode_media(bytes(p), m)
            digests = [
                hashlib.md5(bytes(p) + f":{w}x{h}".encode()).hexdigest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": w,
                    "out_height": h,
                    "resized_md5": digests,
                }
            )

    base = df.select("doc_id", "payload", F.col("media_meta.mime").alias("mime"))
    return base.mapInPandas(
        batches, schema="doc_id long, out_width int, out_height int, resized_md5 string"
    )


def sample_frames(
    df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled 'frame' (byte
    window stands in for a video frame).  Demonstrates the 1→N mapInPandas
    expansion shape a real frame sampler has.

    Output: doc_id, frame_idx, frame_offset, frame_md5.
    """
    import hashlib

    step, cap = int(every_n_bytes), int(max_frames)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                for idx, off in enumerate(range(0, len(b), step)):
                    if idx >= cap:
                        break
                    rows.append(
                        (
                            doc_id,
                            idx,
                            off,
                            hashlib.md5(b[off : off + step]).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_offset", "frame_md5"]
            )

    return df.select("doc_id", "payload").mapInPandas(
        batches, schema="doc_id long, frame_idx int, frame_offset int, frame_md5 string"
    )


def extract_blob_features(
    df: DataFrame, *, use_real_decoder: bool = False, batch_hint: int = 2
) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, media_meta).

    Output: doc_id, n_bytes, payload_md5, width, height, mean_sample.
    The md5/n_bytes columns are computed JVM-side (cheap, portable); the
    decode-shaped features run in ``mapInPandas`` batches.
    """
    base = df.select(
        "doc_id",
        "payload",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("media_meta.mime").alias("mime"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_decoder:
                # Real path: per-mime decode — stubbed in this container.
                for m, p in zip(pdf["mime"], pdf["payload"]):
                    decode_media(bytes(p), m)
            feats = [_fake_decode_features(bytes(p)) for p in pdf["payload"]]
            out = pdf[["doc_id", "n_bytes", "payload_md5"]].copy()
            out["width"] = [f[0] for f in feats]
            out["height"] = [f[1] for f in feats]
            out["mean_sample"] = [f[2] for f in feats]
            yield out

    schema = (
        "doc_id long, n_bytes int, payload_md5 string, "
        "width int, height int, mean_sample double"
    )
    return base.mapInPandas(batches, schema=schema)


def blob_features_oracle(table: str = "documents") -> str:
    """DuckDB twin of ``extract_blob_features`` over the fake decoder.

    The mapInPandas path computes every output as a deterministic
    function of the payload bytes, so even the Python-side batch code
    sits behind the hash gate: byte values come from ``hex(blob)`` pairs
    (DuckDB has no direct blob-byte accessor), and the mean replicates
    Python's two-step ``(sum/den)/255.0`` float op order.  A real media
    decoder would drop this oracle (decode_media stays the honest stub).
    """
    n = "octet_length(CAST(text AS BLOB))"
    h = "hex(CAST(text AS BLOB))"
    bytesum = (
        f"COALESCE(list_sum(list_transform(generate_series(1, LEAST({n}, 32)), "
        f"i -> ('0x' || substr({h}, 2*i-1, 2))::BIGINT)), 0)"
    )
    return f"""
SELECT doc_id,
       CAST({n} AS INTEGER) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(({n} % 64) + 1 AS INTEGER) AS width,
       CAST((({n} // 64) % 64) + 1 AS INTEGER) AS height,
       ({bytesum} / GREATEST(1, LEAST({n}, 32))) / 255.0 AS mean_sample
FROM {table}
"""
