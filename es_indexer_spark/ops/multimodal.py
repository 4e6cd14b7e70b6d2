"""Multimodal column plumbing: image/audio/video as opaque ``binary`` + typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this container — it
raises ``NotImplementedError`` unless the deterministic fake is requested), but the
Spark-side plumbing is real and tested: schema, Arrow batch shape, ``mapInPandas``
signatures, and partition behavior are exactly what a real decoder would plug into.

Pattern (mirrors the reference's asset handling: assets are opaque hrefs + typed
metadata, stacmodel/.../StacCollectionModel.java `assets` + SURVEY.md §1.2
`flattened`): payload stays an opaque binary column; all structure lives in a typed
metadata struct that Catalyst can prune/filter without touching the bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<format:string, width:int, height:int, n_bytes:long>"
)

FEATURE_DIM = 8
FEATURE_SCHEMA = "doc_id long, feature array<double>"
# flat variant: one double column per dimension (hashable / SQL-comparable —
# array cells can't be canonicalized by generic row-hash comparators)
FEATURE_FLAT_SCHEMA = "doc_id long, " + ", ".join(
    f"feature_{i} double" for i in range(FEATURE_DIM)
)


def pack_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministically derive a fake media column from text (test harness for the
    plumbing): payload = utf-8 bytes, meta = typed struct."""
    text = F.col(text_col)
    payload = F.encode(text, "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.length(text) % 640).cast("int").alias("width"),
            (F.length(text) % 480).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, fmt: str, real: bool = False) -> np.ndarray:
    """The decode seam. A real deployment installs pillow/ffmpeg and implements this;
    the container has neither, so the real path is an explicit stub."""
    if real:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this "
            "environment; plug a real decoder in here"
        )
    # deterministic fake: 8 doubles from the payload sha256
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[: FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64) / 2**32


def extract_features(media_df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over the binary column — the real Arrow batch
    shape a decoder UDF sees (one pdf per batch, payload as bytes objects)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, m["format"]).tolist()
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def extract_features_flat(
    media_df: DataFrame, batch_hint: int = 1024, ndigits: int = 6
) -> DataFrame:
    """Feature extraction with one rounded double column per dimension
    (``feature_0..feature_{D-1}``) instead of an array — the contract-facing
    shape: hashable rows, replayable by a SQL oracle (the fake decode is
    sha256-derived, so DuckDB can recompute each dimension from the hex digest)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.asarray(
                [decode_media(p, m["format"]) for p, m in zip(pdf["payload"], pdf["meta"])]
            ).reshape(len(pdf), FEATURE_DIM)
            out = {"doc_id": pdf["doc_id"]}
            for i in range(FEATURE_DIM):
                out[f"feature_{i}"] = np.round(feats[:, i], ndigits)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, schema=FEATURE_FLAT_SCHEMA)


def resize_media(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing over the binary column: mapInPandas 1->1 with a new meta
    struct. The pixel resample itself sits behind the decode seam (stubbed —
    the deterministic fake re-derives a payload of len ∝ target area), but the
    schema, Arrow batch shape, and partition behavior are the real thing."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            for p in pdf["payload"]:
                h = hashlib.sha256(p).digest()
                need = max(1, (width * height) // 64)
                out_payload.append((h * (need // len(h) + 1))[:need])
            meta = [
                {"format": "fake/resized", "width": width, "height": height,
                 "n_bytes": len(b)}
                for b in out_payload
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": out_payload, "meta": meta}
            )

    return media_df.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, payload binary, "
    "meta struct<format:string, width:int, height:int, n_bytes:long>"
)


def sample_frames(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing (video analog): mapInPandas 1->N — each input row
    fans out to its every-Nth frame. Frame count and bytes are derived
    deterministically from the payload (decode stub); the 1->N Arrow batch
    shape, schema, and partition behavior are exactly what a real ffmpeg-backed
    decoder drops into."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads, metas = [], [], [], []
            for doc_id, p, m in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                n_frames = max(1, int(m["n_bytes"]) // 1000 + 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    fb = hashlib.sha256(p + fi.to_bytes(4, "little")).digest()
                    payloads.append(fb)
                    metas.append(
                        {"format": "fake/frame", "width": int(m["width"]),
                         "height": int(m["height"]), "n_bytes": len(fb)}
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "payload": payloads, "meta": metas}
            )

    return media_df.mapInPandas(run, schema=FRAME_SCHEMA)
