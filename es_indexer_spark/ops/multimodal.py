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


# ---------------------------------------------------------- real decoders
# Pure-numpy decoders for two public container formats — PPM (P6, the
# netpbm image container) and WAV (RIFF PCM audio) — so the decode seam is
# a real code path, not a stub. Richer formats (PNG/JPEG/MP4) still need
# external libraries; they dispatch to ValueError with a clear message.


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (height, width, 3) uint8 array. Full header
    grammar: 'P6', whitespace-separated width/height/maxval with
    '#'-comment support, a single whitespace byte, then raw RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(height, width, 3) uint8 → binary PPM (P6) bytes."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAV (PCM 8/16-bit) → (samples float64 in [-1, 1] shaped
    (n, channels), sample_rate). Walks the chunk list (fmt/data may be
    preceded by LIST/fact chunks)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format {audio_format})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:  # 8-bit WAV is unsigned
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"{bits}-bit PCM not supported")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float64 [-1, 1] (n,) or (n, channels) → 16-bit PCM WAV bytes."""
    s = np.atleast_2d(np.asarray(samples, dtype=np.float64).T).T
    pcm = np.clip(s * 32767.0, -32768, 32767).astype("<i2").tobytes()
    ch, bits = s.shape[1], 16
    fmt = (
        (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * ch * bits // 8).to_bytes(4, "little")
        + (ch * bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _image_features(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    return np.array([
        img.shape[1], img.shape[0],
        f[..., 0].mean(), f[..., 1].mean(), f[..., 2].mean(),
        f.std(), f.min(), f.max(),
    ])


def _audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    mono = x.mean(axis=1)
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(1, mono.size - 1)
    return np.array([
        rate, mono.size, mono.mean(), mono.std(),
        float(np.sqrt(np.mean(mono**2))), zc, mono.min(), mono.max(),
    ])


def decode_media(payload: bytes, fmt: str) -> np.ndarray:
    """The decode seam: payload bytes → FEATURE_DIM doubles. Real paths for
    the public PPM (P6) and WAV (RIFF PCM) containers (pure numpy, no
    external libraries); the ``fake/*`` harness formats keep the
    deterministic sha256 fake (SQL-replayable by the contract oracle);
    anything else raises with the library it would need."""
    if fmt.startswith("fake/"):
        # deterministic fake: 8 doubles from the payload sha256
        h = hashlib.sha256(payload).digest()
        return (
            np.frombuffer(h[: FEATURE_DIM * 4], dtype=np.uint32).astype(np.float64)
            / 2**32
        )
    if payload[:2] == b"P6" or fmt in ("image/ppm", "image/x-portable-pixmap"):
        return _image_features(decode_ppm(payload))
    if payload[:4] == b"RIFF" or fmt in ("audio/wav", "audio/x-wav"):
        return _audio_features(*decode_wav(payload))
    raise ValueError(
        f"no built-in decoder for {fmt!r}: PPM (P6) and PCM WAV decode "
        "natively; other formats need pillow/ffmpeg plugged in here"
    )


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


def resize_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pure numpy index gather) — the standard
    pixel-center mapping: out[y, x] = in[floor((y+.5)*H/h), floor((x+.5)*W/w)]."""
    src_h, src_w = img.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * src_h / height), src_h - 1).astype(int)
    xs = np.minimum(((np.arange(width) + 0.5) * src_w / width), src_w - 1).astype(int)
    return img[ys[:, None], xs[None, :]]


def resize_media(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize over the binary column: mapInPandas 1->1 with a new meta struct.
    PPM (P6) payloads take the REAL path — decode, nearest-neighbor resample,
    re-encode; the ``fake/*`` harness formats keep the deterministic fake
    payload (len ∝ target area) so the plumbing tests stay library-free."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, meta = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                if bytes(p[:2]) == b"P6":
                    b = encode_ppm(resize_image(decode_ppm(bytes(p)), width, height))
                    fmt = "image/ppm"
                else:
                    h = hashlib.sha256(bytes(p)).digest()
                    need = max(1, (width * height) // 64)
                    b = (h * (need // len(h) + 1))[:need]
                    fmt = "fake/resized"
                out_payload.append(b)
                meta.append(
                    {"format": fmt, "width": width, "height": height,
                     "n_bytes": len(b)}
                )
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
