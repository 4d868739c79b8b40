"""Multimodal plumbing under the DuckDB oracle.

The media table derives deterministically from ``documents`` (content =
utf-8 bytes of the text, SURVEY-§1.2 ``html:binary`` shape), so the
oracle can recompute the mapInPandas stages' outputs in pure SQL:
digest = md5 of the bytes, fake header fields are digest nibbles —
see ``operators/multimodal.py``.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from crawlers_spark.harness.common import load
from crawlers_spark.operators.multimodal import (
    decode_media,
    embed_media,
    resize_images,
    sample_frames,
    synth_media,
)

_NIB = "strpos('0123456789abcdef', substr(md5(text), {i}, 1)) - 1"

# synthetic media content is utf-8 text — never a PNG/GIF/BMP/WAV
# container (the sniffer's magics can't occur in text, see
# parse_media_header) — so every row takes the 'raw' fallback lane
_SQL_DECODED = f"""
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         'raw' AS container,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         md5(text) AS digest,
         CAST(64 + ({_NIB.format(i=1)}) * 16 AS INT) AS width,
         CAST(64 + ({_NIB.format(i=2)}) * 16 AS INT) AS height,
         CASE WHEN doc_id % 3 = 0 THEN 0.0
              ELSE CAST(1 + ({_NIB.format(i=3)}) AS DOUBLE) END AS duration_s
  FROM documents
"""


def q_decode(spark, sf):
    return decode_media(synth_media(load(spark, sf, "documents")))


SQL_DECODE = f"SELECT * FROM ({_SQL_DECODED})"


# ---------------------------------------- REAL container decode lane
def q_decode_real(spark, sf):
    """decode_media over the committed binary fixture of GENUINE
    PNG/GIF/BMP/WAV containers (fixtures/media_real.parquet) — real
    width/height/duration parsed from the byte stream, not digest
    fakes. The oracle is the generator's golden values (dimensions
    chosen by formula at fixture-build time, independent of the
    parser), inlined as a VALUES table."""
    path = Path(__file__).resolve().parents[2] / "fixtures" / "media_real.parquet"
    return decode_media(spark.read.parquet(str(path)))


def _golden_values_sql() -> str:
    from fixtures.media_real_golden import EXPECTED

    rows = ",\n  ".join(
        f"({mid}, '{kind}', '{cont}', {nb}, '{dg}', {w}, {h}, {dur!r})"
        for (mid, kind, cont, nb, dg, w, h, dur) in EXPECTED
    )
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id, kind, container,
       CAST(n_bytes AS BIGINT) AS n_bytes, digest,
       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       CAST(duration_s AS DOUBLE) AS duration_s
FROM (VALUES
  {rows}
) t(media_id, kind, container, n_bytes, digest, width, height, duration_s)
"""


SQL_DECODE_REAL = _golden_values_sql()


def q_resize(spark, sf):
    return resize_images(decode_media(synth_media(load(spark, sf, "documents"))), max_side=128)


SQL_RESIZE = f"""
SELECT media_id, width, height,
       CAST(floor(width * scale) AS INT) AS new_width,
       CAST(floor(height * scale) AS INT) AS new_height
FROM (
  SELECT media_id, width, height,
         CASE WHEN greatest(width, height) > 128
              THEN 128 / CAST(greatest(width, height) AS DOUBLE)
              ELSE 1.0 END AS scale
  FROM ({_SQL_DECODED}) WHERE kind = 'image')
"""


def q_frames(spark, sf):
    return sample_frames(decode_media(synth_media(load(spark, sf, "documents"))), fps=1.0)


SQL_FRAMES = f"""
SELECT media_id, duration_s,
       unnest(list_transform(range(0, CAST(floor(duration_s * 1.0) AS BIGINT)),
                             i -> CAST(i AS DOUBLE) / 1.0)) AS frame_ts
FROM ({_SQL_DECODED}) WHERE kind = 'video'
"""


def q_embed(spark, sf):
    """Exploded to ``(media_id, dim, value)`` rows: an ``array<float>``
    cell is unsortable by the driver's pandas canonicalizer
    (CORRECTNESS_r02 red row); the exploded form is the same vector one
    component per row. ``embed_media`` itself still emits the dense
    array the ANN operators consume."""
    emb = embed_media(synth_media(load(spark, sf, "documents")), dims=8)
    return emb.select(
        "media_id", F.posexplode("embedding").alias("dim", "value")
    ).select(
        "media_id",
        F.col("dim").cast("long").alias("dim"),
        F.col("value").cast("double").alias("value"),
    )


SQL_EMBED = """
SELECT doc_id AS media_id, CAST(j AS BIGINT) AS dim,
       CAST(CAST(
         (strpos('0123456789abcdef', substr(md5(text), CAST(2*j+1 AS INT), 1)) - 1) * 16.0
          + (strpos('0123456789abcdef', substr(md5(text), CAST(2*j+2 AS INT), 1)) - 1)
         AS DOUBLE) / 255.0 - 0.5 AS FLOAT) :: DOUBLE AS value
FROM documents CROSS JOIN range(0, 8) r(j)
"""


QUERIES = {
    "multi_decode_media": (q_decode, SQL_DECODE),
    "multi_decode_real": (q_decode_real, SQL_DECODE_REAL),
    "multi_resize_plan": (q_resize, SQL_RESIZE),
    "multi_frame_sample": (q_frames, SQL_FRAMES),
    "multi_embed_media": (q_embed, SQL_EMBED),
}
