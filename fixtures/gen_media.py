"""Deterministic REAL-container media fixture (PNG / GIF / BMP / WAV).

Builds genuine binary containers with pure stdlib (``struct`` +
``zlib`` — no Pillow/ffmpeg needed to WRITE headers), with known
dimensions/durations chosen by formula, and commits:

- ``fixtures/media_real.parquet``  — the media table
  (media_id, kind, content:binary, src_url), Spark-readable;
- ``fixtures/media_real_golden.py`` — the expected decode output
  (media_id, kind, container, n_bytes, digest, width, height,
  duration_s), used both by the pytest golden test and as the
  DuckDB VALUES oracle for the ``multi_decode_real`` driver query.

The golden values for width/height/duration come from the GENERATOR's
parameters (not from running the parser), so the oracle is independent
of ``parse_media_header`` — a parser bug cannot self-certify.

Everything is a pure function of ``media_id`` — no wall clock, no RNG
state — so regeneration is bit-identical.
"""

from __future__ import annotations

import hashlib
import struct
import sys
import zlib
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

HERE = Path(__file__).resolve().parent
N_ROWS = 48
WAV_RATE = 8000


def _png(width: int, height: int, seed: int) -> bytes:
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + bytes((seed + 3 * x + y) % 256 for x in range(width * 3))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _gif(width: int, height: int, seed: int) -> bytes:
    hdr = b"GIF89a" + struct.pack("<HH", width, height) + bytes([0xF0, 0, 0])
    palette = bytes([seed % 256, (seed * 7) % 256, (seed * 13) % 256, 255, 255, 255])
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    lzw = b"\x02\x02\x4c\x01\x00"  # minimal 2-bit LZW stream
    return hdr + palette + img + lzw + b"\x3b"


def _bmp(width: int, height: int, seed: int) -> bytes:
    row = ((width * 3 + 3) // 4) * 4  # rows pad to 4 bytes
    pix = bytes((seed + i) % 256 for i in range(row * height))
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return hdr + dib + pix


def _wav(duration_s: float, seed: int) -> bytes:
    n = int(duration_s * WAV_RATE)  # mono 16-bit PCM
    data = struct.pack(
        "<%dh" % n, *[((seed * 31 + i * 7) % 2000) - 1000 for i in range(n)]
    )
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_rows() -> list[dict]:
    rows = []
    for i in range(N_ROWS):
        container = ("png", "gif", "bmp", "wav")[i % 4]
        width = 16 + (7 * i) % 48
        height = 12 + (5 * i) % 40
        if container == "gif" and i % 8 == 1:
            # r2 ADVICE: dims in 256..65535 put NO NUL byte in the GIF
            # logical-screen-descriptor dimension words — exactly the
            # shape the old NUL-sniff silently mis-binned as 'raw'
            width += 256
            height += 300
        if container == "png":
            content, kind, w, h, dur = _png(width, height, i), "image", width, height, 0.0
        elif container == "gif":
            content, kind, w, h, dur = _gif(width, height, i), "image", width, height, 0.0
        elif container == "bmp":
            content, kind, w, h, dur = _bmp(width, height, i), "image", width, height, 0.0
        else:
            # quarters of a second are exact in IEEE754 and in
            # data_len / (rate * block_align) with n = dur * 8000
            dur = (i % 10 + 1) * 0.25
            content, kind, w, h = _wav(dur, i), "audio", 0, 0
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "container": container,
                "content": content,
                "src_url": f"s3://corpus/real/{i}",
                "n_bytes": len(content),
                "digest": hashlib.md5(content).hexdigest(),
                "width": w,
                "height": h,
                "duration_s": dur,
            }
        )
    return rows


def main() -> None:
    rows = build_rows()
    table = pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.binary()),
            "src_url": pa.array([r["src_url"] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, HERE / "media_real.parquet")

    golden = [
        (
            r["media_id"], r["kind"], r["container"], r["n_bytes"],
            r["digest"], r["width"], r["height"], r["duration_s"],
        )
        for r in rows
    ]
    lines = ",\n    ".join(repr(g) for g in golden)
    (HERE / "media_real_golden.py").write_text(
        '"""GENERATED by fixtures/gen_media.py — do not edit by hand.\n\n'
        "Expected decode_media output over fixtures/media_real.parquet:\n"
        "(media_id, kind, container, n_bytes, digest, width, height, duration_s).\n"
        '"""\n\nEXPECTED = [\n    ' + lines + ",\n]\n"
    )
    print(f"wrote {N_ROWS} rows to {HERE / 'media_real.parquet'}")


if __name__ == "__main__":
    sys.exit(main())
