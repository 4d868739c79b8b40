"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested; the
actual codec calls are stubbed because no image/audio libraries exist
in this sandbox:

- ``decode_media``      — REAL header parse (stdlib ``struct``) for
  PNG / GIF / BMP / WAV containers: genuine width/height/duration read
  from the byte stream (see ``parse_media_header``; golden-tested
  against the committed binary fixture ``fixtures/media_real.parquet``).
  Unrecognized payloads fall back to deterministic digest-derived
  pseudo-metadata so the synthetic text-derived corpus stays oracle-
  checkable. ``real_codecs=True`` raises ``NotImplementedError`` at the
  exact point a PIXEL/SAMPLE decode (Pillow/ffmpeg) would go — header
  metadata needs no external codec.
- ``resize_images`` / ``sample_frames`` — same pattern: deterministic
  fake transform of the metadata, stubbed codec point.
- ``embed_media``       — fake feature vector (digest-seeded floats) in
  the exact shape a CLIP-style encoder would return, so downstream
  similarity ops (operators/similarity.py) run unchanged on media.

Scale notes: mapInPandas streams Arrow batches — peak memory is
O(batch), not O(partition); binary payloads ride columnar through the
scan, and metadata-only stages prune the bytes column (select before
the UDF), so a width/height filter never deserializes pixels.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, src_url string"
)
DECODED_SCHEMA = (
    "media_id long, kind string, container string, n_bytes long, digest string, "
    "width int, height int, duration_s double"
)

_KINDS = ["image", "audio", "video"]


def synth_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents`` (the
    sandbox stand-in for a WARC/object-store scan): content = utf-8
    bytes of the text, kind cycles by doc_id."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.concat(F.lit("s3://corpus/"), F.col("doc_id")).alias("src_url"),
    )


def _nibble(hexdigest: str, i: int) -> int:
    return int(hexdigest[i], 16)


def _fake_header(kind: str, raw: bytes) -> tuple[int, int, float, str]:
    """Deterministic digest-derived pseudo-metadata (width, height,
    duration, digest). Identical in any engine that can md5 the bytes."""
    d = hashlib.md5(raw).hexdigest()
    width = 64 + _nibble(d, 0) * 16
    height = 64 + _nibble(d, 1) * 16
    duration = 0.0 if kind == "image" else float(1 + _nibble(d, 2))
    return width, height, duration, d


def parse_media_header(raw: bytes):
    """Real container-header parse — pure stdlib ``struct``, no codec
    library. Returns ``(container, width, height, duration_s)`` or
    ``None`` when the bytes are not a recognized container.

    Magic checks are strict enough that UTF-8 text can never
    false-positive: PNG's signature has a non-ASCII byte; GIF is
    validated STRUCTURALLY — nonzero dims, the logical-screen flags
    byte's global-color-table length must land the cursor on a valid
    block introducer (extension 0x21 / image descriptor 0x2C / trailer
    0x3B) and the file must end with the 0x3B trailer (r2 ADVICE: the
    old NUL-in-dims heuristic silently rejected any real GIF with both
    dims in 256..65535); BMP and RIFF/WAV validate their internal size
    fields against the actual byte length.
    """
    n = len(raw)
    if n >= 24 and raw[:8] == b"\x89PNG\r\n\x1a\n" and raw[12:16] == b"IHDR":
        w, h = struct.unpack(">II", raw[16:24])
        return ("png", w, h, 0.0)
    if n >= 14 and raw[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", raw[6:10])
        flags = raw[10]
        gct_bytes = (3 << ((flags & 0x07) + 1)) if flags & 0x80 else 0
        first_block = 13 + gct_bytes
        if (
            w > 0
            and h > 0
            and n > first_block
            and raw[first_block] in (0x21, 0x2C, 0x3B)
            and raw[-1] == 0x3B
        ):
            return ("gif", w, h, 0.0)
    if n >= 26 and raw[:2] == b"BM" and struct.unpack("<I", raw[2:6])[0] == n:
        w, h = struct.unpack("<ii", raw[18:26])
        return ("bmp", w, abs(h), 0.0)
    if (
        n >= 12
        and raw[:4] == b"RIFF"
        and raw[8:12] == b"WAVE"
        and struct.unpack("<I", raw[4:8])[0] == n - 8
    ):
        pos, rate, block_align, data_len = 12, None, None, None
        while pos + 8 <= n:  # RIFF chunk walk (chunks are word-aligned)
            cid = raw[pos : pos + 4]
            clen = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
            if cid == b"fmt " and pos + 24 <= n:
                _tag, _ch, rate = struct.unpack("<HHI", raw[pos + 8 : pos + 16])
                block_align = struct.unpack("<H", raw[pos + 20 : pos + 22])[0]
            elif cid == b"data":
                data_len = clen
            pos += 8 + clen + (clen & 1)
        if rate and block_align and data_len is not None:
            return ("wav", 0, 0, data_len / (rate * block_align))
    return None


def decode_media(media: DataFrame, *, real_codecs: bool = False) -> DataFrame:
    """binary → typed metadata via Arrow-batched mapInPandas.

    Container headers (PNG/GIF/BMP/WAV) are parsed for REAL; anything
    else gets the deterministic digest-derived fallback (container
    'raw'). ``real_codecs=True`` marks where pixel/sample decoding
    would run — unavailable in this sandbox (no Pillow/ffmpeg).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_codecs:
                # Pillow / soundfile / pyav PIXEL decode goes here.
                raise NotImplementedError("no media codecs in this sandbox")
            containers, widths, heights, durations, digests, sizes = [], [], [], [], [], []
            for k, c in zip(pdf["kind"], pdf["content"]):
                raw = bytes(c)
                sizes.append(len(raw))
                parsed = parse_media_header(raw)
                if parsed is not None:
                    cont, w, h, dur = parsed
                    digests.append(hashlib.md5(raw).hexdigest())
                else:
                    cont = "raw"
                    w, h, dur, d = _fake_header(k, raw)
                    digests.append(d)
                containers.append(cont)
                widths.append(w)
                heights.append(h)
                durations.append(dur)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "container": containers,
                    "n_bytes": np.array(sizes, dtype=np.int64),
                    "digest": digests,
                    "width": np.array(widths, dtype=np.int32),
                    "height": np.array(heights, dtype=np.int32),
                    "duration_s": np.array(durations, dtype=np.float64),
                }
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


def resize_images(decoded: DataFrame, *, max_side: int = 128) -> DataFrame:
    """Metadata-side resize plan (aspect-preserving clamp to max_side).

    Pure column math — the pixel resample itself is the stubbed codec
    step; the new dims are what the real kernel would produce.
    """
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return decoded.where(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("new_width"),
        F.floor(F.col("height") * scale).cast("int").alias("new_height"),
    )


def sample_frames(decoded: DataFrame, *, fps: float = 1.0) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled timestamp.

    ``sequence`` + ``explode`` — frame extraction itself is the codec
    stub; the sampled timestamps and output cardinality are real.
    """
    n = F.floor(F.col("duration_s") * fps).cast("int")
    ts = F.transform(F.sequence(F.lit(0), n - 1), lambda i: i.cast("double") / fps)
    return (
        decoded.where(F.col("kind") == "video")
        .select("media_id", "duration_s", F.explode(ts).alias("frame_ts"))
    )


def embed_media(media: DataFrame, *, dims: int = 8) -> DataFrame:
    """Fake CLIP-style encoder: digest-seeded unit-scale floats.

    Real shape, fake values: downstream ANN ops consume this exactly as
    they would a real encoder's output.
    """

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for c in pdf["content"]:
                d = hashlib.md5(bytes(c)).digest()
                v = np.frombuffer(d[:dims], dtype=np.uint8).astype(np.float64)
                # single rounding to float32 — matches CAST(b/255.0-0.5 AS FLOAT)
                vecs.append((v / 255.0 - 0.5).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return media.mapInPandas(_embed, "media_id long, embedding array<float>")
