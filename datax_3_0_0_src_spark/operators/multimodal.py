"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a small typed metadata
struct, processed in Arrow batches via ``mapInPandas`` (never per-row Python).
The decode/feature-extraction kernels are STUBBED behind deterministic fakes
(the real codec libraries are not in this container — marked clearly below);
the Spark-side plumbing — schema, batch shape, partitioning, UDF signature —
is real and tested, so swapping in a real decoder is a one-function change.

Scale notes: payloads never pass through the driver; feature extraction is a
narrow map (no shuffle); downstream dedup/similarity reuse the embedding
operators (operators.similarity) on the extracted feature vectors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = (
    "media_type string, byte_len long, header_hex string, "
    "width int, height int, n_frames int"
)


def _sniff_type(b: bytes | None) -> str:
    if not b:
        return "empty"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if b[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio/wav"
    if b[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def _fake_decode_dims(b: bytes) -> tuple[int, int, int]:
    """STUB: deterministic fake decoder.

    A real implementation would parse the container (PIL/libav); those libs
    are not installed here. The fake derives stable pseudo-dimensions from the
    payload bytes so tests are deterministic. Raise-on-use variant:
    ``decode_image_real`` below.
    """
    h = int.from_bytes(b[:8].ljust(8, b"\0"), "little")
    return 16 + h % 4096, 16 + (h >> 12) % 4096, 1 + (h >> 24) % 300


def decode_image_real(b: bytes):  # pragma: no cover - stub
    raise NotImplementedError(
        "real image decode requires PIL/opencv, not present in this container; "
        "swap this into extract_media_meta's batch loop when available"
    )


def extract_media_meta(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, media metadata) via Arrow-batched mapInPandas."""
    out_ddl = f"{id_col} long, {MEDIA_META_DDL}"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = []
            for b in payloads:
                b = bytes(b) if b is not None else None
                mt = _sniff_type(b)
                if b:
                    w, h, nf = _fake_decode_dims(b)
                    metas.append((mt, len(b), b[:8].hex(), w, h, nf))
                else:
                    metas.append((mt, 0, "", None, None, None))
            out = pd.DataFrame(
                metas,
                columns=["media_type", "byte_len", "header_hex",
                         "width", "height", "n_frames"],
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(gen, out_ddl)


def media_feature_vectors(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload", dim: int = 16
) -> DataFrame:
    """STUB feature extractor: deterministic pseudo-embedding per payload.

    Real systems put a vision/audio model here; the fake hashes byte windows
    into a stable float vector so the downstream ANN/dedup path (which is
    real) can be exercised end-to-end.
    """
    out_ddl = f"{id_col} long, feature array<float>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                b = bytes(b) if b is not None else b""
                arr = np.frombuffer(b.ljust(dim * 8, b"\0")[: dim * 8], dtype=np.uint64)
                v = ((arr % np.uint64(10_007)).astype(np.float32) / 10_007.0) - 0.5
                feats.append(v.tolist())
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "feature": feats})

    return df.mapInPandas(gen, out_ddl)


def frame_sample_plan(
    df: DataFrame, *, every_n: int = 30, id_col: str = "doc_id"
) -> DataFrame:
    """Expand each video row into (id, frame_idx) sampling rows — the
    distributed fan-out side of frame sampling (decode itself is stubbed)."""
    meta = df
    if "n_frames" not in df.columns:
        meta = extract_media_meta(df, id_col=id_col)
    return meta.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
                       F.lit(every_n))
        ).alias("frame_idx"),
    )
