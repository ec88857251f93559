"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a small typed metadata
struct, processed in Arrow batches via ``mapInPandas`` (never per-row Python
UDF calls). Container *header* parsing is real, pure-Python, and needs no
codec libraries: PNG IHDR, JPEG SOF marker scan, RIFF/WAVE fmt+data chunks,
MP4 ftyp/moov/mvhd/tkhd box walk. Full pixel/sample DECODE (which would need PIL/libav, not
present in this container) remains out of scope — ``media_feature_vectors``
is the one declared stand-in (a deterministic pseudo-embedding in place of a
vision/audio model) so the downstream ANN/dedup path can be exercised.

Scale notes: payloads never pass through the driver; metadata extraction is a
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

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _sniff_type(b: bytes | None) -> str:
    if not b:
        return "empty"
    if b[:8] == PNG_SIG:
        return "image/png"
    if b[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio/wav"
    if b[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def parse_png(b: bytes) -> tuple[int, int, int] | None:
    """PNG IHDR: width/height are big-endian uint32 right after the first
    chunk header (signature 8B + length 4B + 'IHDR' 4B)."""
    if len(b) < 24 or b[:8] != PNG_SIG or b[12:16] != b"IHDR":
        return None
    w = int.from_bytes(b[16:20], "big")
    h = int.from_bytes(b[20:24], "big")
    return w, h, 1


def parse_jpeg(b: bytes) -> tuple[int, int, int] | None:
    """JPEG: walk the marker segments to the first SOF0-3 frame header;
    height/width are big-endian uint16 at +5/+7 into the segment."""
    if b[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        seg_len = int.from_bytes(b[i + 2:i + 4], "big")
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
            h = int.from_bytes(b[i + 5:i + 7], "big")
            w = int.from_bytes(b[i + 7:i + 9], "big")
            return w, h, 1
        i += 2 + seg_len
    return None


def parse_wav(b: bytes) -> tuple[int, int, int] | None:
    """RIFF/WAVE chunk walk: 'fmt ' gives channels/sample_rate/block_align,
    'data' gives the payload size. Mapped into the shared meta shape as
    (width=sample_rate, height=channels, n_frames=data_bytes/block_align)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    sr = ch = ba = None
    data_sz = None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        sz = int.from_bytes(b[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            ch = int.from_bytes(b[i + 10:i + 12], "little")
            sr = int.from_bytes(b[i + 12:i + 16], "little")
            ba = int.from_bytes(b[i + 20:i + 22], "little")
        elif cid == b"data":
            data_sz = sz
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if sr is None:
        return None
    nf = (data_sz // ba) if (data_sz and ba) else 0
    return sr, ch or 0, nf


def parse_mp4(b: bytes) -> tuple[int, int, int] | None:
    """ISO BMFF (MP4) box walk: ``moov/mvhd`` gives (timescale, duration) and
    the first ``trak/tkhd`` carrying a nonzero 16.16 fixed-point size gives
    the visual dimensions. Mapped into the shared meta shape as
    (width, height, n_frames=duration in mvhd timescale ticks — at a
    ticks-per-frame timescale, e.g. 30 for a 30 fps title, ticks == frames).
    Header walk only (no codec work); truncated/garbled boxes end the walk
    and yield null fields, never an error."""
    if len(b) < 16 or b[4:8] != b"ftyp":
        return None

    def boxes(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            sz = int.from_bytes(b[i:i + 4], "big")
            if sz < 8 or i + sz > hi:
                return
            yield b[i + 4:i + 8], i + 8, i + sz
            i += sz

    w = h = dur = None
    for typ, lo, hi in boxes(0, len(b)):
        if typ != b"moov":
            continue
        for t2, lo2, hi2 in boxes(lo, hi):
            if t2 == b"mvhd" and hi2 - lo2 >= 20:
                ver = b[lo2]
                if ver == 1 and hi2 - lo2 >= 32:
                    dur = int.from_bytes(b[lo2 + 24:lo2 + 32], "big")
                else:  # v0: ver/flags(4) ctime(4) mtime(4) timescale(4) dur(4)
                    dur = int.from_bytes(b[lo2 + 16:lo2 + 20], "big")
            elif t2 == b"trak":
                for t3, lo3, hi3 in boxes(lo2, hi2):
                    if t3 != b"tkhd" or w:
                        continue
                    # v0: width/height at content offsets +76/+80; v1 +88/+92
                    off = 88 if b[lo3] == 1 else 76
                    if hi3 - lo3 >= off + 8:
                        tw = int.from_bytes(b[lo3 + off:lo3 + off + 4], "big") >> 16
                        th = int.from_bytes(b[lo3 + off + 4:lo3 + off + 8], "big") >> 16
                        if tw and th:
                            w, h = tw, th
    if dur is None and w is None:
        return None
    return w, h, dur


_PARSERS = {
    "image/png": parse_png,
    "image/jpeg": parse_jpeg,
    "audio/wav": parse_wav,
    "video/mp4": parse_mp4,
}


def extract_media_meta(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, media metadata) via Arrow-batched mapInPandas — real container
    header parsing (no codec libs needed); unparseable/unknown payloads get
    null dimensions, never an error (dirty media is a data fact, not a crash).
    """
    out_ddl = f"{id_col} long, {MEDIA_META_DDL}"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[payload_col]:
                b = bytes(b) if b is not None else None
                mt = _sniff_type(b)
                if not b:
                    metas.append((mt, 0, "", None, None, None))
                    continue
                dims = _PARSERS.get(mt, lambda _b: None)(b)
                w, h, nf = dims if dims else (None, None, None)
                metas.append((mt, len(b), b[:8].hex(), w, h, nf))
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
    """STAND-IN feature extractor: deterministic pseudo-embedding per payload.

    Real systems put a vision/audio model here (not available in this
    container); the stand-in hashes byte windows into a stable float vector so
    the downstream ANN/dedup path (which is real) can be exercised end-to-end.
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
    """Expand each media row into (id, frame_idx) sampling rows — the
    distributed fan-out side of frame sampling (frame decode needs codec libs,
    so rows where the container carries no frame count sample frame 0 only)."""
    meta = df
    if "n_frames" not in df.columns:
        meta = extract_media_meta(df, id_col=id_col)
    return meta.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0),
                       F.greatest(F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(0)),
                       F.lit(every_n))
        ).alias("frame_idx"),
    )
